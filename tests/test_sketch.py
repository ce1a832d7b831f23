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


def test_exact_heavy_hitters_matches_groupby_any_partitioning(spark):
    """The two-pass operator must equal the exact groupBy-HAVING answer on
    skewed data for EVERY partition layout (MG is order/partition
    sensitive internally; the exact second pass must erase that), with the
    decrement path genuinely exercised (k << distinct keys)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from connemara_spark.operators.sketch import exact_heavy_hitters

    # skew: key "hot" ~30%, "warm" ~12%, 200-key uniform tail
    rows = (["hot"] * 300 + ["warm"] * 120 + [f"t{i % 200}" for i in range(580)])
    pdf = pd.DataFrame({"k": rows})
    num, den = 1, 10  # freq > N/10 -> k = 10 counters vs 202 distinct
    for parts in (1, 3, 8):
        df = spark.createDataFrame(pdf).repartition(parts)
        got = sorted(map(tuple, exact_heavy_hitters(df, "k", num=num, den=den).collect()))
        n = df.count()
        want = sorted(
            map(tuple,
                df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
                .filter(F.col("cnt") * den > n * num).collect())
        )
        assert got == want == [("hot", 300), ("warm", 120)], (parts, got, want)


def test_mg_summaries_bounded_and_total(spark):
    """Each partition emits at most k candidate rows plus exactly one
    null-key total row; the totals sum to the non-null row count."""
    import pandas as pd
    from pyspark.sql import functions as F

    from connemara_spark.operators.sketch import mg_summaries

    pdf = pd.DataFrame({"k": [f"v{i % 50}" for i in range(1000)] + [None] * 7})
    df = spark.createDataFrame(pdf).repartition(4)
    summ = mg_summaries(df, "k", k=5).toPandas()
    totals = summ[summ["k"].isnull()]
    cands = summ[summ["k"].notnull()]
    assert len(totals) == 4
    assert int(totals["__cnt"].sum()) == 1000  # nulls excluded from N
    # <= k survivors per partition: global bound is enough to pin here
    assert len(cands) <= 4 * 5


def test_exact_heavy_hitters_empty_and_all_null(spark):
    from connemara_spark.operators.sketch import exact_heavy_hitters

    empty = spark.createDataFrame([], "k string")
    assert exact_heavy_hitters(empty, "k", num=1, den=5).count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "k string")
    assert exact_heavy_hitters(nulls, "k", num=1, den=5).count() == 0


def test_hdr_quantile_rollup_error_bound_and_edges(spark):
    """The HDR bucket is the value with all but the top 1+3 significant
    bits zeroed: every estimate must sit within [exact * (1 - 1/8), exact]
    for positive values (the bucket LOWER bound never exceeds the true
    quantile, and its relative error is < 2^-sub_bits). Zero and negative
    cents clamp to bucket 0."""
    import random

    from pyspark.sql import functions as F

    from connemara_spark.operators.sketch import hdr_bucket_lo, hdr_quantile_rollup

    rng = random.Random(7)
    rows = [("a", rng.randint(1, 10_000_000)) for _ in range(5000)]
    rows += [("b", rng.randint(1, 500)) for _ in range(333)]
    df = spark.createDataFrame(rows, "g string, cents long")
    out = {r["g"]: r.asDict() for r in hdr_quantile_rollup(df, "g", "cents").collect()}
    assert out["a"]["n"] == 5000 and out["b"]["n"] == 333
    for g in ("a", "b"):
        for q in (50, 90, 99):
            est, exact = out[g][f"p{q}_est"], out[g][f"p{q}_exact"]
            assert est <= exact, (g, q, est, exact)
            assert est >= exact * (1 - 1 / 8) - 1e-9, (g, q, est, exact)

    # edges: zero and negative cents land in bucket 0 (never negative)
    edge = spark.createDataFrame(
        [(0,), (-250,), (1,), (7,), (8,)], "cents long"
    ).select(hdr_bucket_lo("cents").alias("lo"), "cents")
    got = {r["cents"]: r["lo"] for r in edge.collect()}
    assert got[0] == 0 and got[-250] == 0
    # values below 2^(sub_bits+1) are exact (no bits dropped)
    assert got[1] == 1 and got[7] == 7 and got[8] == 8
