"""Physical-plan introspection + scale-readiness assertions.

The reference's performance posture is operational (prepared-statement
caches, hash routing, batched IO — SURVEY §4); on Spark the equivalent
guarantees are *plan properties*: filters reach the parquet scan, small
dimensions broadcast, hot paths stay inside whole-stage codegen, and no
accidental cartesian products appear. This module turns those properties
into testable assertions so every operator's plan is checked in CI, not
eyeballed once.

All helpers parse ``df.explain("formatted")`` output — stable across Spark
3.x/4.x — plus the executed-plan string for AQE-finalized checks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text of a DataFrame (no stdout side
    effects)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every file scan — the column-pruning witness."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (each is a full data
    re-materialization at scale — the thing to minimize)."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", simple_plan(df)))


def broadcast_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastExchange|BroadcastHashJoin|BroadcastNestedLoopJoin", simple_plan(df)))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    p = simple_plan(df)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


def wholestage_codegen_ids(df: DataFrame) -> list[int]:
    """Distinct WholeStageCodegen span ids — wider/fewer spans = more of the
    plan fused into single JVM loops."""
    return sorted({int(x) for x in re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))})


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-UDF evaluation operators in the plan (slow path at scale —
    should be empty for all hot-path operators, ArrowEvalPython only where a
    pandas UDF is deliberate)."""
    return re.findall(r"(BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas)", simple_plan(df))


# ---------------------------------------------------------------- assertions


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    """Assert some predicate on ``column`` reached a file scan."""
    pf = pushed_filters(df)
    if not any(column.lower() in f.lower() for f in pf):
        raise AssertionError(f"no pushed filter on {column!r}; PushedFilters={pf}")


def assert_columns_pruned(df: DataFrame, table_width_ceiling: int) -> None:
    """Assert every file scan reads at most ``table_width_ceiling`` columns."""
    for s in scan_schemas(df):
        ncols = s.count(":")
        if ncols > table_width_ceiling:
            raise AssertionError(f"scan reads {ncols} columns (> {table_width_ceiling}): {s[:200]}")


def assert_no_cartesian(df: DataFrame) -> None:
    if has_cartesian(df):
        raise AssertionError("plan contains a cartesian/broadcast-nested-loop join:\n" + simple_plan(df)[:2000])


def assert_broadcast_join(df: DataFrame) -> None:
    if not has_broadcast_hash_join(df):
        raise AssertionError("expected a BroadcastHashJoin:\n" + simple_plan(df)[:2000])


def assert_no_python_udf(df: DataFrame) -> None:
    nodes = python_eval_nodes(df)
    if nodes:
        raise AssertionError(f"plan evaluates Python on the data path: {nodes}")


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    c = exchange_count(df)
    if c > n:
        raise AssertionError(f"plan has {c} shuffle exchanges (> {n}):\n" + simple_plan(df)[:2000])
