"""Incremental view maintenance: equi-join view deltas from CDC states.

The consolidation store's reason to exist is cross-source joins
(`/root/reference/docs/index.rst:9-12`); the natural next ask is keeping
a JOIN VIEW current as CDC applies — without recomputing the join. The
classic delta rule (ΔV = ΔA⋈B' ∪ A⋈ΔB, Blakeley et al. 1986 "Efficiently
Updating Materialized Views") reduces here to: only join keys TOUCHED by
either side's delta can change a view row, so the view diff restricted
to touched keys IS the view delta.

Shape at 100 TB: the touched-key set is |Δ|-sized and broadcasts; all
four state tables are semi-join-pruned to touched keys BEFORE the join
(with bucketed silver tables the semi join prunes at the scan), so work
scales with the delta, not the view. The per-key diff is exceptAll over
1:1 join rows — a hash aggregation on the touched subset only.

Crucially the pruning must also reach UPSTREAM of the states: when a
state table is itself produced by a CDC fold, fold the touched keys only
(``apply_changes(..., keys=touched)`` — semantics-preserving because the
per-key fold is independent across keys). Otherwise the fold recomputes
the full table and only the diff is |Δ|-cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_view_delta(
    a_old: DataFrame,
    a_new: DataFrame,
    b_old: DataFrame,
    b_new: DataFrame,
    *,
    key_a: str,
    key_b: str,
    touched: DataFrame,
    view_cols: list[str],
) -> DataFrame:
    """Row-level delta of the equi-join view ``A ⋈_{key_a=key_b} B``
    between (a_old, b_old) and (a_new, b_new), computed only over
    ``touched`` join keys (single-column DataFrame: keys present in either
    side's CDC delta). Returns ``op ('ins'|'del')`` + ``view_cols``:
    applying the delta to the old view yields the new view exactly."""
    t = F.broadcast(
        touched.select(F.col(touched.columns[0]).alias("__k")).distinct()
    )

    def view(a: DataFrame, b: DataFrame) -> DataFrame:
        a_t = a.join(t, a[key_a] == t["__k"], "left_semi")
        b_t = b.join(t, b[key_b] == t["__k"], "left_semi")
        j = a_t.join(b_t, a_t[key_a] == b_t[key_b])
        # resolve each view column explicitly (A side wins a name shared by
        # both inputs — e.g. when key_a == key_b)
        return j.select(
            *[
                (a_t[c] if c in a_t.columns else b_t[c]).alias(c)
                for c in view_cols
            ]
        )

    old_v = view(a_old, b_old)
    new_v = view(a_new, b_new)
    return new_v.exceptAll(old_v).select(F.lit("ins").alias("op"), "*").unionByName(
        old_v.exceptAll(new_v).select(F.lit("del").alias("op"), "*")
    )
