"""Time-series regularization: per-key resampling onto a fixed grid with
forward-fill — the gap-filling pass an event stream needs before windowed
feature extraction or rate computations.

Scale shape: the grid is generated PER KEY from that key's own [min, max]
span (``sequence`` + ``explode`` — map-side, no driver loop, no global
calendar table), so grid size is Σ_key span/step, not keys x global-span.
The fill window partitions by key — no unpartitioned windows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    step: str = "1 hour",
    trunc_unit: str = "hour",
    aggs: dict[str, F.Column] | None = None,
    fill_cols: list[str] | None = None,
) -> DataFrame:
    """Resample events onto a per-key ``step`` grid and forward-fill.

    1. bucket events to ``date_trunc(trunc_unit, ts)`` and aggregate
       (default: ``n_events`` count) — one hash shuffle;
    2. per key, generate the dense bucket grid between that key's first and
       last bucket (``sequence`` over the per-key min/max — a per-row
       expression after the same aggregation's key shuffle);
    3. left-join buckets onto the grid and forward-fill ``fill_cols`` with
       ``last(col, ignorenulls=True)`` over the per-key ordered window.

    Emits one row per (key, bucket) with ``is_gap`` = 1 for filled rows.
    """
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    fill_cols = fill_cols if fill_cols is not None else list(aggs)

    bucket = F.date_trunc(trunc_unit, F.col(ts_col))
    bucketed = df.groupBy(
        F.col(key_col).alias("key"), bucket.alias("bucket")
    ).agg(*[expr.alias(name) for name, expr in aggs.items()])
    spans = bucketed.groupBy("key").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = spans.select(
        "key",
        F.explode(F.sequence("b0", "b1", F.expr(f"INTERVAL {step}"))).alias("bucket"),
    )
    joined = grid.join(bucketed, ["key", "bucket"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn(
        "is_gap", F.when(F.col(list(aggs)[0]).isNull(), F.lit(1)).otherwise(F.lit(0))
    )
    for c in fill_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.withColumnRenamed("key", key_col)
