"""As-of (time-travel) join — a composition of native DataFrame ops.

Spark has no ASOF JOIN; the scalable re-expression is the union+window
pattern: tag both sides, union on (key, time), and carry the most recent
right-side row forward with ``last(..., ignorenulls=True)`` over a
running window. Compared to a range join this is ONE hash shuffle on the
key, no candidate-pair explosion, and no driver-side state — it survives
100× data growth as long as single keys fit a partition (salt/AQE for
pathological keys).

Semantics match DuckDB/standard ASOF joins: for each left row, the right
row with the greatest ``right_ts <= left_ts`` (``backward``) or smallest
``right_ts >= left_ts`` (``forward``) for the same key, optionally
bounded by a match tolerance (pandas merge_asof semantics). Right rows
tied on (key, right_ts) must be pre-deduplicated by the caller for
deterministic output (same requirement as any ASOF engine).
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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join of ``left`` to ``right`` on key + time.

    ``direction='backward'`` (default): latest right row at-or-before
    ``left_ts``; ``'forward'``: earliest right row at-or-after. With
    ``tolerance_seconds`` set, matches farther than the tolerance are
    treated as no-match (pandas merge_asof semantics) — nulled under
    ``how='left'``, dropped under ``'inner'``.

    Result: every left row (``how='left'``; ``'inner'`` drops unmatched)
    plus all non-key right columns from the matched row. Right columns
    keep their names; collisions with left column names must be resolved
    by the caller beforehand. Same single-shuffle union+window shape in
    both directions.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_payload = [c for c in right.columns if c not in keys]

    lhs = left.withColumn("_t", F.col(left_ts)).withColumn("_is_left", F.lit(1))
    rhs = right.withColumn("_t", F.col(right_ts)).withColumn("_is_left", F.lit(0))

    # One unioned relation; missing columns become NULL on the other side.
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    match_struct = F.when(
        F.col("_is_left") == 0,
        F.struct(
            F.lit(1).alias("_matched"),
            F.col("_t").alias("_rt"),
            *[F.col(c) for c in right_payload],
        ),
    )
    if direction == "backward":
        # Right rows sort BEFORE left rows at equal timestamps (at-or-
        # before inclusivity); running last() of the right payload struct
        # is the as-of match for every left row.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        asof = F.last(match_struct, ignorenulls=True).over(w)
    else:
        # Mirror image: right rows sort AFTER left rows at equal
        # timestamps (at-or-after inclusivity); the first() right struct
        # in the forward-looking frame is the match.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        asof = F.first(match_struct, ignorenulls=True).over(w)
    carried = unioned.withColumn("_asof", asof)

    if tolerance_seconds is not None:
        from connemara_spark.functions.pg import extract_epoch

        gap = (
            extract_epoch(F.col("_t")) - extract_epoch(F.col("_asof._rt"))
            if direction == "backward"
            else extract_epoch(F.col("_asof._rt")) - extract_epoch(F.col("_t"))
        )
        carried = carried.withColumn(
            "_asof", F.when(gap <= tolerance_seconds, F.col("_asof"))
        )

    out = carried.filter(F.col("_is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("_asof._matched").isNotNull())
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(c) for c in right_payload],
    )
