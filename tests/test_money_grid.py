"""Cross-engine exactness of functions.money: the grid snap must produce
bit-identical DECIMAL values in Spark and DuckDB for every divergence
class the bare cast gets wrong (near-tie shortest reprs, exact .xx5 ties,
negatives, large magnitudes, NULL). This is the unit pin behind the r10
registry-wide grid-exact money migration — see functions/money.py."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from connemara_spark.functions.money import (
    grid_cents,
    grid_dec,
    grid_dec_sql,
    grid_double,
)

ADVERSARIAL = [
    # near-tie 17-digit shortest reprs: the class where the PLAIN cast
    # diverges (Spark 1.72, DuckDB 1.73)
    1.7249999999999999, 1.9649999999999999, 2.7649999999999997,
    3.8049999999999997, -1.7249999999999999,
    # exact binary ties on the .xx5 grid
    2.675, 2.625, -2.675, -2.625, 0.005, 1.005, 99.995, -99.995,
    # 3-decimal off-grid values
    0.001, 12.345, 0.0049999999999998, 0.0050000000000002,
    # ordinary on-grid money
    85.33, -7231.11, 0.0, 44473.56, 1234.57,
    None,
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_grid_dec_matches_duckdb_twin(spark, duck):
    df = spark.createDataFrame([(v,) for v in ADVERSARIAL], "x double")
    # DECIMAL(4,2) (the rate type) only fits |x| < 100 — run that leg on
    # the rate-sized subset
    small = F.when(F.abs("x") < 99.99, F.col("x"))
    got = {
        r["x"]: (str(r["d12"]), str(r["d4"]), str(r["cents"]), str(r["gd"]))
        for r in df.select(
            "x",
            grid_dec("x", "decimal(12,2)").alias("d12"),
            grid_dec(small, "decimal(4,2)").alias("d4"),
            grid_cents("x").alias("cents"),
            grid_double("x").alias("gd"),
        ).collect()
    }
    for v in ADVERSARIAL:
        vs = v if (v is not None and abs(v) < 99.99) else None
        d12 = duck.execute(f"select {grid_dec_sql('?', 'DECIMAL(12,2)')}", [v]).fetchone()[0]
        d4 = duck.execute(f"select {grid_dec_sql('?', 'DECIMAL(4,2)')}", [vs]).fetchone()[0]
        cents = duck.execute("select cast(floor(? * 100 + 0.5) as bigint)", [v]).fetchone()[0]
        gd = duck.execute("select cast(floor(? * 100 + 0.5) as bigint) / 100", [v]).fetchone()[0]
        assert got[v] == (str(d12), str(d4), str(cents), str(gd)), (v, got[v], d12, d4, cents, gd)


def test_plain_cast_diverges_on_near_ties(spark, duck):
    """Documents WHY the grid exists: the bare double->DECIMAL cast really
    does disagree between engines on the near-tie class (if an engine
    upgrade ever makes them agree, this pin tells us the grid could be
    retired)."""
    v = 1.7249999999999999
    s = spark.createDataFrame([(v,)], "x double").select(
        F.col("x").cast("decimal(12,2)").alias("c")
    ).collect()[0]["c"]
    d = duck.execute("select cast(? as decimal(12,2))", [v]).fetchone()[0]
    assert str(s) == "1.72" and str(d) == "1.73"


def test_grid_is_identity_on_grid_values(spark):
    """On <=2-decimal doubles (all current driver testdata) the grid snap
    is value-identical to the plain cast — the migration changed nothing
    for on-grid data."""
    vals = [85.33, -7231.11, 0.01, -0.01, 0.0, 9999.99, 44473.56]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = df.select(
        F.col("x").cast("decimal(12,2)").alias("plain"),
        grid_dec("x", "decimal(12,2)").alias("grid"),
    ).collect()
    for r in rows:
        assert r["plain"] == r["grid"], r
