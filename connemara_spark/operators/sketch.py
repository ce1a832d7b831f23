"""Deterministic streaming-mergeable sketches: KMV distinct counting and
Count-Min frequency estimation.

Unlike approx_count_distinct (HLL++) these are built from md5-derived
hashes, so the SAME sketch — bit for bit — is computable in any SQL engine:
the accuracy claims sit under the cross-engine value-hash gate instead of
"trust the library". Both are one-pass, bounded-memory, and mergeable
(union of KMV sets / elementwise sum of CMS counters), which is what makes
them the 100 TB path for cardinality and frequency questions where an
exact groupBy-distinct would shuffle the full key set.

- kmv_distinct: per group, keep the k smallest distinct hash values; the
  k-th smallest, as a fraction u of the hash space, estimates distinct
  count as (k-1)/u. Error ~ 1/sqrt(k).
- cms_counts / cms_lookup: d hash rows x w buckets of counters; a key's
  estimate is the MIN over rows of its bucket counters — always >= exact
  (one-sided), integer-only, zero float drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 16^15 == 2^60: the hash-fraction denominator, exactly representable in a
# double, so v/HASH_SPACE is the same IEEE value in every engine.
HASH_SPACE = float(1 << 60)


def hash60(col: Column) -> Column:
    """md5-derived 60-bit integer (first 15 hex chars) — the portable
    uniform hash both sketches draw from."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    k: int = 128,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    One shuffle on (group, hash) for the distinct, then a per-group window
    to find the k-th smallest — the window input is already deduplicated,
    and at production scale the per-group top-k collapses further via a
    partial `min_by`-style reduction. ``with_exact`` adds the exact
    distinct count for accuracy reporting (the eval harness column — drop
    it at scale; computing it is the very shuffle the sketch avoids).
    """
    hashed = (
        df.select(*group_cols, hash60(F.col(value_col)).alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    kth = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(F.max("__h").alias("__vk"), F.count("*").alias("__nk"))
    )
    est = F.when(
        F.col("__nk") < k, F.col("__nk").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("__vk").cast("double") / F.lit(HASH_SPACE)))
    out = kth.select(*group_cols, F.round(est, 4).alias("kmv_estimate"))
    if with_exact:
        exact = (
            hashed.groupBy(*group_cols).agg(F.count("*").alias("n_distinct"))
        )
        out = (
            out.join(exact, group_cols)
            .withColumn(
                "rel_error",
                F.round(
                    F.abs(F.col("kmv_estimate") - F.col("n_distinct"))
                    / F.col("n_distinct"),
                    6,
                ),
            )
        )
    return out


def cms_counts(
    df: DataFrame,
    value_col: str,
    *,
    d: int = 3,
    w_hex: int = 2,
) -> DataFrame:
    """Build the Count-Min counter table: one row per (hash row, bucket)
    with its total count. ``w_hex`` hex chars give 16^w_hex buckets. The
    whole sketch is d x 16^w_hex rows — broadcastable at any corpus size."""
    rows = [
        df.select(
            F.lit(r).alias("cms_row"),
            F.substring(F.md5(F.concat(F.lit(f"{r}#"), F.col(value_col))), 1, w_hex).alias("bucket"),
        )
        for r in range(d)
    ]
    u = rows[0]
    for other in rows[1:]:
        u = u.union(other)
    return u.groupBy("cms_row", "bucket").agg(F.count("*").alias("c"))


def cms_lookup(
    cms: DataFrame,
    items: DataFrame,
    value_col: str,
    *,
    d: int = 3,
    w_hex: int = 2,
) -> DataFrame:
    """Estimate each item's frequency: min over the d rows of its bucket
    counters. The counter table broadcasts; integer-only math."""
    probes = None
    for r in range(d):
        p = items.select(
            F.col(value_col),
            F.lit(r).alias("cms_row"),
            F.substring(F.md5(F.concat(F.lit(f"{r}#"), F.col(value_col))), 1, w_hex).alias("bucket"),
        )
        probes = p if probes is None else probes.union(p)
    return (
        probes.join(F.broadcast(cms), ["cms_row", "bucket"])
        .groupBy(value_col)
        .agg(F.min("c").alias("cms_estimate"))
    )


def mg_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Pass 1 of exact distributed heavy hitters: one Misra–Gries summary
    of at most ``k`` counters PER PARTITION (Arrow-batched; the dict folds
    across the partition's record batches, so state is O(k) regardless of
    partition size). Emits ``(key, __cnt)`` rows — the counter's surviving
    lower bound — plus ONE null-key row per partition carrying the
    partition's total row count, so the caller gets N without a second
    scan of the input.

    Guarantee (Misra–Gries 1982; mergeable-summaries form, Agarwal et al.
    2013): a counter only dies by a decrement, and a partition's total
    decrement is < n_p/(k+1). Hence any key with global frequency
    > N/(k+1) has, in at least one partition, local frequency
    > n_p/(k+1) — and therefore SURVIVES that partition's summary. The
    union of partition summaries is a guaranteed superset of the true
    heavy hitters at threshold 1/(k+1), at most k·P rows total.

    This is the genuinely-imperative per-partition path (bounded-state
    stream folding has no DataFrame expression); everything around it
    stays JVM-side.
    """
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")

    def part(batches):
        # counters live in ONE pandas Series (object index = keys): the
        # per-batch merge is an index-aligned C-side add, and the MG trim
        # is a vectorized np.partition + boolean mask — no per-key Python
        # loop anywhere (the former dict fold capped the pass at ~180k
        # rows/s; same math, same results, batch-for-batch).
        counters = pd.Series(dtype="int64")
        total = 0
        for pdf in batches:
            s = pdf[key_col]
            total += int(len(s))
            vc = s.value_counts(dropna=True)
            counters = vc.astype("int64") if counters.empty else counters.add(
                vc, fill_value=0
            ).astype("int64")
            if len(counters) > k:
                # batched MG decrement: subtract the (|C|-k)-th smallest
                # count from every counter and drop the non-positive —
                # at least |C|-k counters die, total decrement per row
                # stays within the classic bound
                vals = counters.to_numpy()
                d = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
                counters = counters[counters > d] - int(d)
        keys = counters.index.tolist()
        yield pd.DataFrame(
            {key_col: keys + [None], "__cnt": counters.to_numpy().tolist() + [total]}
        )

    src = df.select(F.col(key_col).cast("string").alias(key_col)).filter(
        F.col(key_col).isNotNull()
    )
    return src.mapInPandas(part, schema=f"{key_col} string, __cnt long")


def exact_heavy_hitters(
    df: DataFrame, key_col: str, *, num: int, den: int
) -> DataFrame:
    """EXACT keys with frequency > N·num/den, in two passes — the
    100 TB shape for heavy hitters over a key domain too large to
    groupBy outright (web-scale tokens, URLs, user ids):

    1. ``mg_summaries`` folds each partition into <= ceil(den/num)
       Misra–Gries counters — the shuffle-free candidate pass whose
       union provably contains every true heavy hitter (superset, never
       a miss).
    2. The candidates (<= k·P keys, broadcastable) semi-join back and
       ONLY they are exactly counted — the groupBy's key domain is the
       bounded candidate set, so map-side combine caps the shuffle at
       |candidates| rows per task instead of the full distinct-key set.

    The comparison is integer-exact (``cnt·den > N·num``) so the result
    is bit-reproducible in any engine — no float threshold drift. Null
    keys are excluded (from N and from candidacy). Returns
    ``(key_col, cnt)``, exact counts, deterministic regardless of
    partitioning or arrival order (pass 2 never trusts pass 1's counts).
    """
    import math

    if num < 1 or den < 1:
        raise ValueError(f"threshold num/den must be positive (got {num}/{den})")
    k = math.ceil(den / num)
    # one tiny frame (<= k rows per partition + 1), two consumers
    summ = mg_summaries(df, key_col, k).localCheckpoint()
    n = summ.filter(F.col(key_col).isNull()).agg(
        F.sum("__cnt").cast("long")
    ).collect()[0][0] or 0
    cands = summ.filter(F.col(key_col).isNotNull()).select(key_col).distinct()
    src = df.select(F.col(key_col).cast("string").alias(key_col)).filter(
        F.col(key_col).isNotNull()
    )
    return (
        src.join(F.broadcast(cands), key_col, "inner")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * F.lit(int(den)) > F.lit(int(n)) * F.lit(int(num)))
    )


def hdr_bucket_lo(cents_col: str, *, sub_bits: int = 3) -> Column:
    """HDR-histogram-style log bucket of a non-negative integer ``cents``
    column: keep the top ``1 + sub_bits`` significant bits, zero the rest —
    the bucket's LOWER BOUND in cents. Pure integer ops (bin-string length
    for floor(log2), shifts for the truncation), so the bucketing is
    bit-identical in any engine (no log()/float anywhere); relative error
    of the lower bound is < 2^-sub_bits (12.5% at the default).

    The number of distinct buckets is bounded by ~63 * 2^sub_bits
    regardless of data volume — a (group, bucket) histogram is the
    map-side-combinable, mergeable, bounded-state quantile shape for
    telemetry at 100 TB (the exact windowed quantile needs a per-group
    sort of every row)."""
    c = f"greatest({cents_col}, 0L)"
    sh = f"greatest(length(bin({c})) - 1 - {sub_bits}, 0)"
    return F.expr(
        f"CASE WHEN {c} > 0 THEN shiftleft(shiftright({c}, {sh}), {sh}) ELSE 0L END"
    )


def hdr_bucket_lo_sql(cents_expr: str, *, sub_bits: int = 3) -> str:
    """DuckDB twin of ``hdr_bucket_lo`` (>> and << on BIGINT, same
    bin-length floor(log2))."""
    c = f"GREATEST({cents_expr}, 0)"
    sh = f"GREATEST(length(bin({c})) - 1 - {sub_bits}, 0)"
    return f"(CASE WHEN {c} > 0 THEN ({c} >> {sh}) << {sh} ELSE 0 END)"


def hdr_quantile_rollup(
    df: DataFrame,
    group_col: str,
    cents_col: str,
    *,
    q_pcts: tuple[int, ...] = (50, 90, 99),
    sub_bits: int = 3,
) -> DataFrame:
    """Per-group quantile estimates from the bounded HDR histogram, next to
    the EXACT rank-selected quantiles for an on-gate error-bound demo.

    Sketch leg (the 100 TB path): one map-side-combined groupBy on
    (group, bucket) — state O(groups x buckets) — then a window over the
    BUCKETS (<= ~500 rows per group, never the data); estimate for q = the
    smallest bucket lower bound whose cumulative count reaches
    ceil(q% * N), an integer-exact comparison (cum * 100 >= q * N).

    Exact leg (test-scale witness only; drop it at volume): row_number
    over each group's cents orders every row — the value at rank
    ceil(q% * N / 100). Both legs return cents/100 as DOUBLE (exact)."""
    g = group_col
    hist = (
        df.select(F.col(g), hdr_bucket_lo(cents_col, sub_bits=sub_bits).alias("__lo"))
        .groupBy(g, "__lo")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    wb = Window.partitionBy(g).orderBy("__lo")
    wg = Window.partitionBy(g)
    hb = hist.withColumn("__cum", F.sum("__c").over(wb)).withColumn(
        "__n", F.sum("__c").over(wg)
    )
    est_aggs = [F.max("__n").cast("long").alias("n")]
    for q in q_pcts:
        est_aggs.append(
            (
                F.min(
                    F.when(F.col("__cum") * 100 >= F.lit(q) * F.col("__n"), F.col("__lo"))
                ).cast("double")
                / 100.0
            ).alias(f"p{q}_est")
        )
    est = hb.groupBy(g).agg(*est_aggs)

    wr = Window.partitionBy(g).orderBy(cents_col)
    rows = (
        df.select(F.col(g), F.col(cents_col))
        .withColumn("__rn", F.row_number().over(wr))
        .withColumn("__n", F.count(F.lit(1)).over(wg))
    )
    ex_aggs = []
    for q in q_pcts:
        target = F.floor((F.lit(q) * F.col("__n") + 99) / 100)
        ex_aggs.append(
            (
                F.min(F.when(F.col("__rn") == target, F.col(cents_col))).cast("double")
                / 100.0
            ).alias(f"p{q}_exact")
        )
    exact = rows.groupBy(g).agg(*ex_aggs)
    order = [g, "n"]
    for q in q_pcts:
        order += [f"p{q}_est", f"p{q}_exact"]
    return est.join(exact, g).select(*order)
