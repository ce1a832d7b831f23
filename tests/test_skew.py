"""Salted join: result identity with the plain join, salt spreading, and
the widened shuffle key in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connemara_spark import plans
from connemara_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of one hot key + a tail of 100 normal keys
    big = spark.range(0, 10_100).select(
        F.when(F.col("id") < 10_000, F.lit(0)).otherwise(F.col("id") % 100 + 1).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(101)], "k long, label string")
    return big, small


def test_salted_inner_matches_plain_join(skewed):
    big, small = skewed
    got = salted_join(big, small, "k", n_salts=8).groupBy("k").count()
    want = big.join(small, "k").groupBy("k").count()
    assert {(r["k"], r["count"]) for r in got.collect()} == {
        (r["k"], r["count"]) for r in want.collect()
    }


def test_salted_left_keeps_unmatched(spark, skewed):
    big, _ = skewed
    tiny = spark.createDataFrame([(0, "hot")], "k long, label string")
    out = salted_join(big, tiny, "k", n_salts=4, how="left")
    rows = out.collect()
    assert len(rows) == 10_100  # every big row exactly once
    assert sum(1 for r in rows if r["label"] == "hot") == 10_000
    assert sum(1 for r in rows if r["label"] is None) == 100


def test_salt_actually_spreads_hot_key(skewed):
    big, small = skewed
    joined = salted_join(big.hint("merge"), small, "k", n_salts=8)
    # the shuffle key must be (k, __salt): hot-key rows land in multiple
    # shuffle partitions
    plan = plans.formatted_plan(joined)
    assert "__salt" in plan
    # AQE would (correctly) re-coalesce this tiny test output into one
    # partition; turn coalescing off so the probe observes the salted
    # exchange itself
    spark = big.sparkSession
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        n_parts = (
            salted_join(big.hint("merge"), small, "k", n_salts=8)
            .filter(F.col("k") == 0)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert n_parts > 1


def test_rejects_unsupported_how(skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="full")
