"""Z-order layout: Morton key math + clustering rewrite properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from connemara_spark.operators.layout import morton_key, zorder_layout
from connemara_spark.plans import inspect as plans


def test_morton_key_bit_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (3, 3), (5, 9)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton_key("x", "y", bits=8).alias("z")).collect()
    }
    # canonical Morton values: x bits land even, y bits odd
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(3, 3)] == 15
    # 5=0b101, 9=0b1001 -> interleave: z = sum x_b<<2b + y_b<<(2b+1)
    expect = sum(((5 >> b) & 1) << (2 * b) for b in range(8)) + sum(
        ((9 >> b) & 1) << (2 * b + 1) for b in range(8)
    )
    assert got[(5, 9)] == expect


def test_zorder_layout_partitions_are_z_contiguous_and_2d_local(spark):
    # 4 point clusters at the corners of a 256x256 grid; a z-ordered
    # 4-file layout must give each file a BOUNDED x-range AND y-range
    # (linear layouts scatter one of the two)
    pts = []
    for cx, cy in [(10, 10), (10, 240), (240, 10), (240, 240)]:
        pts += [(cx + i % 5, cy + i // 5) for i in range(25)]
    df = spark.createDataFrame(pts, "x long, y long")
    laid = zorder_layout(df, "x", "y", bits=8, n_files=4)

    def spans(it):
        rows = list(it)
        if not rows:
            return
        xs = [r["x"] for r in rows]
        ys = [r["y"] for r in rows]
        yield (max(xs) - min(xs), max(ys) - min(ys), len(rows))

    got = laid.rdd.mapPartitions(spans).collect()
    assert sum(n for _, _, n in got) == 100
    for dx, dy, _n in got:
        assert dx <= 64 and dy <= 64  # both dimensions bounded per file


def test_zorder_plan_one_shuffle_no_udf(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    laid = zorder_layout(df, "x", "y", bits=8, n_files=2)
    plans.assert_no_python_udf(laid)
    plan = plans.simple_plan(laid)
    assert "rangepartitioning" in plan  # the single clustering shuffle


def test_morton_key_int_columns_not_wrapped(spark):
    # IntegerType inputs: shiftleft on raw int masks shift distance mod 32;
    # the bigint cast inside morton_key must keep high bits correct
    df = spark.createDataFrame([(40000, 40000)], "x int, y int")
    z = df.select(morton_key("x", "y", bits=16).alias("z")).collect()[0]["z"]
    expect = sum(((40000 >> b) & 1) << (2 * b) for b in range(16)) + sum(
        ((40000 >> b) & 1) << (2 * b + 1) for b in range(16)
    )
    assert z == expect
