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
