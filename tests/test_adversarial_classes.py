"""Cross-engine divergence classes beyond money (r10 verdict #5): each
class from tools/make_adversarial_testdata.py gets its behavior PINNED
here, so a driver data-regeneration can't surprise a gate the way the r9
near-tie reprs did. Companion evidence: the full oracle-parity suite run
under each class's dataset (SCALE.md r11 section).

  timestamp  — µs boundary near-ties: PROVEN IMMUNE (both engines do
               integer µs arithmetic; truncation/window assignment agree
               at ±1µs around second/half-second/hour edges)
  collation  — ORDER BY tie suffixes: PROVEN IMMUNE (both engines compare
               UTF-8 strings bytewise by default)
  floatsum   — out-of-domain money: FAILS LOUDLY (Spark ANSI overflow on
               the DECIMAL cast), never silently diverges
  floatsum_down — in-domain magnitude mixing: grid-decimal sums stay
               order-independent (exact decimal addition after the snap)
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_timestamp_boundary_near_ties_cross_engine(spark):
    """date_trunc + hour-window assignment at ±1µs boundary near-ties is
    bit-identical between Spark and DuckDB: timestamps are integer
    microseconds in both engines, so there is no rounding to diverge —
    the immunity the adversarial 'timestamp' sweep measured, pinned on
    the exact tie points the generator emits."""
    offs = [0, 1, 500000, 499999, 3599999999, 1800000001]
    base = "2024-03-07 13:00:00"
    rows = [(i, o) for i, o in enumerate(offs)]
    sdf = (
        spark.createDataFrame(rows, "i int, us long")
        .select(
            "i",
            F.timestamp_micros(
                F.unix_micros(F.lit(base).cast("timestamp")) + F.col("us")
            ).alias("ts"),
        )
        .select(
            "i",
            F.date_trunc("hour", "ts").cast("string").alias("tr_hour"),
            F.date_trunc("second", "ts").cast("string").alias("tr_sec"),
            F.window("ts", "30 minutes").start.cast("string").alias("w30"),
        )
    )
    got = {r["i"]: (r["tr_hour"], r["tr_sec"], r["w30"]) for r in sdf.collect()}

    con = duckdb.connect()
    want = {}
    for i, o in rows:
        tr_h, tr_s, w30 = con.execute(
            f"""SELECT
              CAST(date_trunc('hour',   x) AS VARCHAR),
              CAST(date_trunc('second', x) AS VARCHAR),
              CAST(CAST(to_timestamp(floor(epoch(x) / 1800) * 1800)
                   AS TIMESTAMP) AS VARCHAR)
            FROM (SELECT TIMESTAMP '{base}' + to_microseconds({o}) AS x)"""
        ).fetchone()
        want[i] = (tr_h, tr_s, w30)
    con.close()
    assert got == want


def test_collation_tie_suffixes_cross_engine(spark):
    """ORDER BY over the collation-bait suffix set (trailing space, case
    flip, non-ASCII 2-byte codepoint, '~') sorts IDENTICALLY in Spark and
    DuckDB: both compare UTF-8 bytes with no locale by default."""
    names = ["x", "x ", "xa", "xA", "xä", "x~", "X", "x\t"]
    got = [
        r["s"]
        for r in spark.createDataFrame([(s,) for s in names], "s string")
        .orderBy("s")
        .collect()
    ]
    con = duckdb.connect()
    want = [
        t[0]
        for t in con.execute(
            "SELECT s FROM (VALUES "
            + ", ".join(f"($${s}$$)" for s in names)
            + ") v(s) ORDER BY s"
        ).fetchall()
    ]
    con.close()
    assert got == want


def test_floatsum_out_of_domain_fails_loudly(spark):
    """Money driven out of its DECIMAL domain must FAIL, not silently
    drift: under ANSI mode the grid cast raises NUMERIC_VALUE_OUT_OF_RANGE
    — the behavior the 'floatsum' sweep measured on 22 gates (both
    engines refuse; no silent divergence)."""
    from connemara_spark.functions.money import grid_dec

    df = spark.createDataFrame([(20971.52,)], "x double").select(
        grid_dec(F.col("x"), "decimal(4,2)").alias("d")
    )
    if spark.conf.get("spark.sql.ansi.enabled") == "true":
        with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
            df.collect()
    else:
        assert df.collect()[0]["d"] is None  # non-ANSI: NULL, still no drift


def test_grid_sum_order_independent_under_magnitude_mixing(spark):
    """The in-domain order probe's algebra, pinned: values spanning 2^0
    .. 2^-20 snap onto the cent grid per row (exact IEEE ops), and the
    DECIMAL sum of the snapped values is exact integer arithmetic — so
    ANY aggregation order gives the same total, Spark partial aggregation
    included. A raw double sum of the same values is order-sensitive
    (shown here driver-side), which is why no gate may emit one."""
    import random

    from connemara_spark.functions.money import grid_dec_sql

    rng = random.Random(7)
    vals = [
        round(rng.uniform(0.01, 999.99), 2) * (2.0 ** -rng.choice([0, 5, 10, 15, 20]))
        for _ in range(4000)
    ]
    # raw double sums in two different orders differ (the hazard)
    s_fwd = 0.0
    for v in vals:
        s_fwd += v
    s_rev = 0.0
    for v in reversed(vals):
        s_rev += v
    assert s_fwd != s_rev  # order-sensitive with this magnitude spread

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    grid = grid_dec_sql("x")
    one = df.coalesce(1).selectExpr(f"SUM({grid}) AS t").collect()[0]["t"]
    many = df.repartition(16).selectExpr(f"SUM({grid}) AS t").collect()[0]["t"]
    assert one == many  # grid-decimal sum: partitioning cannot move it

    con = duckdb.connect()
    import pandas as pd

    pdf = pd.DataFrame({"x": vals})  # noqa: F841 (duckdb replacement scan)
    want = con.execute(f"SELECT SUM({grid}) FROM pdf").fetchone()[0]
    con.close()
    assert str(one) == str(want)
