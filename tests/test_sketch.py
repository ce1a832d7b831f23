"""Deterministic sketches: KMV distinct counting and Count-Min frequency."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_kmv_matches_python_reference_and_error_bound(spark):
    from connemara_spark.operators.sketch import kmv_distinct

    vals = [f"item-{i}" for i in range(2000)]
    rows = [("g", v) for v in vals] + [("g", v) for v in vals[:500]]  # dups
    df = spark.createDataFrame(rows, "grp string, v string")
    out = kmv_distinct(df, ["grp"], "v", k=128).collect()[0]
    assert out["n_distinct"] == 2000

    # python replay of the estimator
    hs = sorted(int(hashlib.md5(v.encode()).hexdigest()[:15], 16) for v in set(vals))
    est = 127.0 / (hs[127] / float(1 << 60))
    assert abs(out["kmv_estimate"] - round(est, 4)) < 1e-9
    # k=128 -> ~9% std error; allow 4 sigma
    assert out["rel_error"] < 0.36


def test_kmv_underfull_group_returns_exact(spark):
    from connemara_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a", f"x{i}") for i in range(10)], "grp string, v string"
    )
    out = kmv_distinct(df, ["grp"], "v", k=128).collect()[0]
    assert out["kmv_estimate"] == 10.0 and out["rel_error"] == 0.0


def test_cms_one_sided_and_exact_without_collisions(spark):
    from connemara_spark.operators.sketch import cms_counts, cms_lookup

    # few distinct keys vs 65536 buckets -> collisions vanishingly unlikely;
    # estimates must equal exact counts, and are NEVER below them
    rows = [("apple",)] * 5 + [("pear",)] * 3 + [("plum",)] * 1
    df = spark.createDataFrame(rows, "w string")
    cms = cms_counts(df, "w", d=3, w_hex=4)
    items = spark.createDataFrame([("apple",), ("pear",), ("plum",)], "w string")
    got = {r["w"]: r["cms_estimate"] for r in cms_lookup(cms, items, "w", d=3, w_hex=4).collect()}
    exact = {"apple": 5, "pear": 3, "plum": 1}
    for k, v in exact.items():
        assert got[k] >= v            # one-sided always
        assert got[k] == v            # no collisions at this width
