"""Bucketed tables must make key-joins and key-aggs shuffle-free — the
physical plan is asserted, not eyeballed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connemara_spark import plans
from connemara_spark.queries import load
from connemara_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    write_bucketed(
        load(spark, sf_dir, "orders"),
        "b_orders",
        bucket_col="o_custkey",
        n_buckets=4,
        path=str(base / "orders"),
    )
    write_bucketed(
        load(spark, sf_dir, "customer"),
        "b_customer",
        bucket_col="c_custkey",
        n_buckets=4,
        path=str(base / "customer"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # hint on the INPUT relation forces the sort-merge path, so the assert
    # is about bucketing, not a small-table broadcast
    o = read_bucketed(spark, "b_orders").hint("merge")
    c = read_bucketed(spark, "b_customer")
    joined = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "c_name", "o_totalprice"
    )
    plan = plans.formatted_plan(joined)
    assert "SortMergeJoin" in plan and "BroadcastExchange" not in plan
    assert plans.exchange_count(joined) == 0
    assert joined.count() > 0


def test_bucketed_groupby_has_no_shuffle(spark, bucketed):
    o = read_bucketed(spark, "b_orders")
    agg = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    assert plans.exchange_count(agg) == 0
    assert agg.count() > 0


def test_unbucketed_baseline_does_shuffle(spark, sf_dir):
    # the same join without bucket metadata pays the exchanges the
    # bucketed path eliminates
    o = load(spark, sf_dir, "orders").hint("merge")
    c = load(spark, sf_dir, "customer")
    joined = o.join(c, o["o_custkey"] == c["c_custkey"])
    assert plans.exchange_count(joined) >= 2


def test_bucketed_results_match_unbucketed(spark, sf_dir, bucketed):
    o, c = read_bucketed(spark, "b_orders"), read_bucketed(spark, "b_customer")
    got = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment").count().collect()
    )
    oo, cc = load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    want = (
        oo.join(cc, oo["o_custkey"] == cc["c_custkey"])
        .groupBy("c_mktsegment").count().collect()
    )
    assert {(r["c_mktsegment"], r["count"]) for r in got} == {
        (r["c_mktsegment"], r["count"]) for r in want
    }
