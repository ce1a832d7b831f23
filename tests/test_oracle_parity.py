"""Replicates the driver's correctness gate: every registry query vs its
DuckDB oracle at sf0.001 (fast) — row count + column names + values."""

from __future__ import annotations

import math

import duckdb
import pytest

from connemara_spark.queries import REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows, colnames):
    out = []
    for r in rows:
        vals = []
        for c in sorted(colnames):
            v = r[c]
            if isinstance(v, float):
                # driver hashes exact values; we allow 1e-9 slack in-test but
                # flag via rounding at 9 decimals
                v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


# DuckDB result types with no portable Spark analog.  The driver's value hash
# is TYPE-SENSITIVE: DuckDB silently promotes through these (e.g. SUM(BIGINT)
# -> HUGEINT, 85 * HUGEINT stays HUGEINT) and the hash diverges even when
# every value is numerically identical.  This artifact cost round 2
# (events_sessionize, windowed SUM) and round 3 (graph_pagerank_orders,
# 85 * SUM // 100) a red gate row each — hence a registry-wide lint.
_NON_PORTABLE = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


@pytest.mark.parametrize(
    "name", [n for n, q in REGISTRY.items() if q.oracle or q.oracle_fn]
)
def test_oracle_types_portable(sf_dir, duck, name):
    """Lint: no oracle result column may carry a DuckDB-only numeric type.

    Uses the lazy relation's .types so nothing is executed beyond binding."""
    q = REGISTRY[name]
    rel = duck.sql(q.resolve_oracle(sf_dir))
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(bad in str(t).upper() for bad in _NON_PORTABLE)
    ]
    assert not offenders, (
        f"{name}: oracle columns with non-portable DuckDB types {offenders} — "
        f"wrap the final projection in CAST(... AS BIGINT/DOUBLE)"
    )


@pytest.mark.parametrize(
    "name", [n for n, q in REGISTRY.items() if q.oracle or q.oracle_fn]
)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    res = duck.execute(q.resolve_oracle(sf_dir))
    duck_cols = [d[0] for d in res.description]
    duck_rows = [dict(zip(duck_cols, row)) for row in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"
