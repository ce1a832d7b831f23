"""As-of (time-travel) join — a composition of native DataFrame ops.

Spark has no ASOF JOIN; the scalable re-expression is the union+window
pattern: tag both sides, union on (key, time), and carry the most recent
right-side row forward with ``last(..., ignorenulls=True)`` over a
running window. Compared to a range join this is ONE hash shuffle on the
key, no candidate-pair explosion, and no driver-side state — it survives
100× data growth as long as single keys fit a partition (salt/AQE for
pathological keys).

Semantics match DuckDB/standard ASOF ``backward`` joins: for each left row,
the right row with the greatest ``right_ts <= left_ts`` for the same key.
Right rows tied on (key, right_ts) must be pre-deduplicated by the caller
for deterministic output (same requirement as any ASOF engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    how: str = "left",
) -> DataFrame:
    """Backward as-of join of ``left`` to ``right`` on key + time.

    Result: every left row (``how='left'``; ``'inner'`` drops unmatched)
    plus all non-key right columns from the latest right row at-or-before
    ``left_ts``. Right columns keep their names; collisions with left
    column names must be resolved by the caller beforehand.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_payload = [c for c in right.columns if c not in keys]

    lhs = left.withColumn("_t", F.col(left_ts)).withColumn("_is_left", F.lit(1))
    rhs = right.withColumn("_t", F.col(right_ts)).withColumn("_is_left", F.lit(0))

    # One unioned relation; missing columns become NULL on the other side.
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at equal timestamps (at-or-before
    # inclusivity), then the running last() of the right payload struct is
    # the as-of match for every left row.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_asof",
        F.last(
            F.when(
                F.col("_is_left") == 0,
                F.struct(F.lit(1).alias("_matched"), *[F.col(c) for c in right_payload]),
            ),
            ignorenulls=True,
        ).over(w),
    )

    out = carried.filter(F.col("_is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("_asof._matched").isNotNull())
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(c) for c in right_payload],
    )
