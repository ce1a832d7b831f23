"""As-of join operator: backward semantics, ties, unmatched rows, plan shape."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from connemara_spark import plans
from connemara_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-10 00:00:00")),
            (2, "k1", _ts("2024-01-20 00:00:00")),
            (3, "k2", _ts("2024-01-05 00:00:00")),
            (4, "k3", _ts("2024-01-05 00:00:00")),  # key with no right rows
        ],
        ["lid", "k", "lts"],
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-08 00:00:00"), "a"),
            ("k1", _ts("2024-01-15 00:00:00"), "b"),
            ("k2", _ts("2024-01-05 00:00:00"), "c"),  # exact tie: at-or-before matches
            ("k2", _ts("2024-01-06 00:00:00"), "d"),  # after left ts: excluded
        ],
        ["k", "rts", "v"],
    )

    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts", how="left")
    got = {r.lid: (r.v, r.rts) for r in out.collect()}
    assert got[1] == ("a", _ts("2024-01-08 00:00:00"))
    assert got[2] == ("b", _ts("2024-01-15 00:00:00"))
    assert got[3] == ("c", _ts("2024-01-05 00:00:00"))
    assert got[4] == (None, None)

    inner = asof_join(left, right, on="k", left_ts="lts", right_ts="rts", how="inner")
    assert sorted(r.lid for r in inner.collect()) == [1, 2, 3]


def test_asof_single_shuffle_no_python(spark):
    left = spark.range(100).select(
        F.col("id").alias("lid"),
        (F.col("id") % 5).alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("lts"),
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_micros(F.col("id") * 7_000_000).alias("rts"),
        F.col("id").alias("payload"),
    )
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
    # union+window ⇒ exactly one hash shuffle on the key, no join explosion
    assert plans.exchange_count(out) == 1
    plans.assert_no_python_udf(out)
    assert out.count() == 100


def test_range_self_join_blocks_not_cartesian(spark):
    import datetime as dt

    from connemara_spark.operators.rangejoin import range_self_join

    rows = [
        (1, 7, dt.datetime(2024, 1, 1, 0, 0, 0)),
        (2, 7, dt.datetime(2024, 1, 1, 0, 0, 30)),   # 30s from id 1 — pair
        (3, 7, dt.datetime(2024, 1, 1, 0, 2, 0)),    # 90s from id 2 — no pair (gap=60)
        (4, 8, dt.datetime(2024, 1, 1, 0, 0, 10)),   # other key — never pairs with 7s
        (5, 7, dt.datetime(2024, 1, 1, 0, 2, 59)),   # 59s from id 3 across a bucket edge
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = range_self_join(
        df, key_cols=["user_id"], ts_col="ts", max_gap_seconds=60, id_col="event_id"
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert pairs == {(1, 2), (3, 5)}
    # the plan must be a hash join on (key, bucket) — never nested-loop
    plans.assert_no_cartesian(out)
    plans.assert_no_python_udf(out)


def test_asof_forward_and_tolerance(spark):
    from connemara_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 00:00:10"), (2, "k", "2024-01-01 00:01:00")],
        "id long, k string, lts string",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:10", "r0"), ("k", "2024-01-01 00:00:30", "r1")],
        "k string, rts string, rv string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    fwd = {
        r["id"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts", direction="forward"
        ).collect()
    }
    # id=1 matches the equal-timestamp right row (at-or-after inclusivity);
    # id=2 has no right row at or after -> null
    assert fwd == {1: "r0", 2: None}

    # tolerance: id=1's backward match is exact (gap 0), id=2's nearest
    # backward row is 30s away -> nulled at 10s tolerance
    tol = {
        r["id"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            direction="backward", tolerance_seconds=10.0,
        ).collect()
    }
    assert tol == {1: "r0", 2: None}

    # inner + tolerance drops the out-of-tolerance row entirely
    inner = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        direction="backward", tolerance_seconds=10.0, how="inner",
    ).collect()
    assert [r["id"] for r in inner] == [1]
