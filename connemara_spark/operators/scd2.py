"""SCD2 history reconstruction — every version of every row from a CDC stream.

The reference's replayer materializes only the FINAL state of each table
(replay.pl:879-960); its archive sink (process_spool.pl) keeps the raw events
but nothing queryable. This operator turns the same per-key ordered fold used
by ``apply_changes`` into a type-2 slowly-changing-dimension history: one
output row per (key, version) with ``[valid_from_lsn, valid_to_lsn)``
validity and an ``is_current`` flag.

Why a fold and not just ``LEAD()``: partial-column updates (the TOAST
omission case, replay.pl:186-194) must inherit omitted columns from the
PREVIOUS version, which a per-row window cannot express. The fold carries the
running row state and appends a closed version on every transition:

    delete            -> close the open version, no new one
    insert            -> close (if any), open with event values
    update            -> close, open with overlay of PRESENT columns

Cost model is identical to ``apply_changes``: ONE hash shuffle (groupBy key),
per-key state bounded by events-per-key-per-batch, all native Catalyst
expressions (no Python UDFs), so it scales wherever the apply fold does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connemara_spark.catalog import TableSpec
from connemara_spark.operators.apply import (
    _effective_spec,
    _events_per_key,
    _prepared,
    _spec_sig,
    events_for_table,
)


def scd2_history(events: DataFrame, spec: TableSpec) -> DataFrame:
    """Reconstruct full version history from a parsed CDC event stream.

    ``events`` is ``parse_events`` output. Returns one row per version:
    ``*pk_cols, *value_cols, valid_from_lsn, valid_to_lsn, is_current`` where
    ``valid_to_lsn`` is NULL for the current (open) version and versions are
    half-open ``[from, to)`` intervals in LSN order. Deletes close the last
    version without opening a new one. History starts at the stream (no
    snapshot seed): the first event of a key opens its first version.
    """
    spec, _ = _effective_spec(spec)
    ev = events_for_table(events, spec)
    per_key = _events_per_key(ev)
    # the whole expression set depends only on the spec — prepared once
    # per signature like the apply fold (see apply._make_fold's NOTE)
    prep = _prepared(("scd2_history", _spec_sig(spec)), lambda: _build_scd2(spec))
    state = per_key.select("__pk", prep["state_col"])
    return state.select("__pk", F.explode(prep["versions"]).alias("v")).select(
        *prep["final_sel"]
    )


def _build_scd2(spec: TableSpec) -> dict:
    cols = [c.name for c in spec.columns]
    non_pk = [c for c in cols if c not in spec.pk_cols]

    null_vals = F.struct(*[F.lit(None).cast(c.spark_type).alias(c.name) for c in spec.columns])
    ver_type = "array<struct<valid_from_lsn:bigint,valid_to_lsn:bigint,vals:struct<{}>>>".format(
        ",".join(f"{c.name}:{c.spark_type.simpleString()}" for c in spec.columns)
    )

    def fold(acc: Column, e: Column) -> Column:
        # Close the currently-open version (if any) at this event's LSN.
        closed = F.when(
            acc["exists"],
            F.concat(
                acc["closed"],
                F.array(
                    F.struct(
                        acc["from"].alias("valid_from_lsn"),
                        e["lsn_start"].cast("bigint").alias("valid_to_lsn"),
                        acc["vals"].alias("vals"),
                    )
                ),
            ),
        ).otherwise(acc["closed"])
        overlay = F.struct(
            *[F.when(e["has"][c], e["vals"][c]).otherwise(acc["vals"][c]).alias(c) for c in cols]
        )
        mk = lambda exists, vals, frm: F.struct(
            exists.alias("exists"), vals.alias("vals"), frm.alias("from"), closed.alias("closed")
        )
        return (
            F.when(e["op"] == "delete", mk(F.lit(False), null_vals, F.lit(None).cast("bigint")))
            .when(e["op"] == "insert", mk(F.lit(True), e["vals"], e["lsn_start"].cast("bigint")))
            .otherwise(mk(F.lit(True), overlay, e["lsn_start"].cast("bigint")))
        )

    init = F.struct(
        F.lit(False).alias("exists"),
        null_vals.alias("vals"),
        F.lit(None).cast("bigint").alias("from"),
        F.expr(f"CAST(array() AS {ver_type})").alias("closed"),
    )

    # closed versions ++ the still-open one (valid_to NULL) if the key exists.
    versions = F.when(
        F.col("__st.exists"),
        F.concat(
            F.col("__st.closed"),
            F.array(
                F.struct(
                    F.col("__st.from").alias("valid_from_lsn"),
                    F.lit(None).cast("bigint").alias("valid_to_lsn"),
                    F.col("__st.vals").alias("vals"),
                )
            ),
        ),
    ).otherwise(F.col("__st.closed"))

    return {
        "state_col": F.aggregate(F.col("__evs"), init, fold).alias("__st"),
        "versions": versions,
        "final_sel": [
            *[F.col(f"__pk.{k}").alias(k) for k in spec.pk_cols],
            *[F.col(f"v.vals.{c}").alias(c) for c in non_pk],
            F.col("v.valid_from_lsn").alias("valid_from_lsn"),
            F.col("v.valid_to_lsn").alias("valid_to_lsn"),
            F.col("v.valid_to_lsn").isNull().alias("is_current"),
        ],
    }
