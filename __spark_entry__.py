"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (full CDC path) on sf0.001.
queries()      — every implemented operator from SURVEY.md §2 + extensions.
oracle_sql()   — DuckDB-equivalent SQL per query (correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from connemara_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wal2json CDC stream parsed + applied onto the customer
    snapshot (parse → route → per-key ordered fold → merge)."""
    return _q.REGISTRY["cdc_apply_customer"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracles()
