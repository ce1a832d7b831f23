"""Range (interval) join — bucket-blocked, never a cartesian.

Spark compiles a plain inequality join ``a.ts BETWEEN b.ts - w AND b.ts + w``
to BroadcastNestedLoop/cartesian — O(n·m) at scale. The standard scalable
re-expression blocks both sides into fixed-width time buckets: a row joins
only rows in its own or the adjacent bucket, turning the plan into a hash
join on (key, bucket) followed by the exact range predicate. Cost:
candidates ≈ rows sharing a (key, ~2·width window) — the output size's own
order of magnitude.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connemara_spark.functions.pg import extract_epoch


def range_self_join(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    max_gap_seconds: int,
    id_col: str,
) -> DataFrame:
    """All pairs (id_a < id_b) with equal keys and ``|ts_a - ts_b| <=
    max_gap_seconds``.

    Blocking: each row lands in bucket ``floor(epoch/gap)`` and joins
    buckets {b-1, b, b+1} via an exploded 3-bucket probe side — a hash join
    on (keys…, bucket); the exact predicate filters the candidates. Output:
    (*key_cols, id_a, id_b, ts_a, ts_b, gap_seconds).
    """
    epoch = extract_epoch(ts_col)
    bucket = F.floor(epoch / max_gap_seconds).cast("long")

    base = df.select(
        *key_cols,
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
        bucket.alias("__b"),
    )
    probe = base.withColumn(
        "__b", F.explode(F.array(F.col("__b") - 1, F.col("__b"), F.col("__b") + 1))
    )

    a, b = probe.alias("a"), base.alias("b")
    cond = (F.col("a.__b") == F.col("b.__b")) & (F.col("a.id") < F.col("b.id"))
    for k in key_cols:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    gap = F.abs(extract_epoch(F.col("a.ts")) - extract_epoch(F.col("b.ts")))
    return (
        a.join(b, cond)
        .filter(gap <= max_gap_seconds)
        .select(
            *[F.col(f"a.{k}").alias(k) for k in key_cols],
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.ts").alias("ts_a"),
            F.col("b.ts").alias("ts_b"),
            F.round(gap, 6).alias("gap_seconds"),
        )
        # a pair can match via the home bucket AND a shared adjacent probe
        # bucket — dedupe on the pair identity
        .dropDuplicates(["id_a", "id_b"])
    )
