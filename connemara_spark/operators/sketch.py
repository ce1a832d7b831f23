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
