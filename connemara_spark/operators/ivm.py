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


def join_view_delta_staged(
    a_flat: DataFrame,
    b_flat: DataFrame,
    *,
    key_a: str,
    key_b: str,
    cols_a: list[str],
    cols_b: list[str],
) -> DataFrame:
    """View delta computed DIRECTLY from two staged folds' per-key frames
    (``apply_changes_cut``'s ``flat`` output: ``__pk, __s0, __s1``) —
    skipping the materialize-two-views-and-exceptAll detour entirely.

    With single-column PKs each side contributes at most ONE row per join
    key to the view, so the per-key delta is decidable locally after one
    |Δ|-sized full-outer join of the two flat frames: the old view row
    exists iff both sides' ``__s0.exists``; same for new; emit del/ins
    when the rows differ (null-safe struct compare). ``exceptAll`` is a
    bag set-diff — two extra hash-aggregation shuffles over both full view
    states — that this shape never needs: same rows, ~half the exchanges.

    ``cols_a``/``cols_b``: the view columns taken from each side, in view
    order (concatenated a-side then b-side). The join key must be in
    ``cols_a`` position-compatible with the caller's view contract.
    """
    a = a_flat.select(
        F.col(f"__pk.{key_a}").alias("__ka"),
        F.col("__s0.exists").alias("__a0e"),
        F.col("__s0.vals").alias("__a0v"),
        F.col("__s1.exists").alias("__a1e"),
        F.col("__s1.vals").alias("__a1v"),
    )
    b = b_flat.select(
        F.col(f"__pk.{key_b}").alias("__kb"),
        F.col("__s0.exists").alias("__b0e"),
        F.col("__s0.vals").alias("__b0v"),
        F.col("__s1.exists").alias("__b1e"),
        F.col("__s1.vals").alias("__b1v"),
    )
    j = a.join(b, a["__ka"] == b["__kb"], "inner")

    def row(av: str, bv: str) -> F.Column:
        return F.struct(
            *[F.col(f"{av}.{c}").alias(c) for c in cols_a],
            *[F.col(f"{bv}.{c}").alias(c) for c in cols_b],
        )

    old_e = F.coalesce(F.col("__a0e"), F.lit(False)) & F.coalesce(
        F.col("__b0e"), F.lit(False)
    )
    new_e = F.coalesce(F.col("__a1e"), F.lit(False)) & F.coalesce(
        F.col("__b1e"), F.lit(False)
    )
    old_r = F.when(old_e, row("__a0v", "__b0v"))
    new_r = F.when(new_e, row("__a1v", "__b1v"))
    changed = ~old_r.eqNullSafe(new_r)
    out_cols = [*cols_a, *cols_b]
    emitted = F.array_compact(
        F.array(
            F.when(changed & old_e, F.struct(F.lit("del").alias("op"), old_r.alias("r"))),
            F.when(changed & new_e, F.struct(F.lit("ins").alias("op"), new_r.alias("r"))),
        )
    )
    ex = j.select(F.explode(emitted).alias("e"))
    return ex.select(
        F.col("e.op").alias("op"),
        *[F.col(f"e.r.{c}").alias(c) for c in out_cols],
    )


def touched_keys(events: DataFrame, spec) -> DataFrame:
    """Distinct PKs a parsed CDC batch can affect — including BOTH halves
    of a PK-change split (the delete'd old key and the insert'd new key).
    Columns = ``spec.pk_cols``; this is the |delta|-sized set every
    incremental-maintenance consumer scopes its work to."""
    from connemara_spark.operators.apply import events_for_table

    ev = events_for_table(events, spec)
    return ev.select(
        *[F.col(f"__pk.{c}").alias(c) for c in spec.pk_cols]
    ).distinct()


def apply_view_delta(old_view: DataFrame, delta: DataFrame) -> DataFrame:
    """Patch a materialized view with a row-level delta: bag-minus the
    ``del`` rows, append the ``ins`` rows. ``old_view + delta == new_view``
    is the operator's contract (test-pinned)."""
    dels = delta.filter(F.col("op") == "del").drop("op")
    inss = delta.filter(F.col("op") == "ins").drop("op")
    return old_view.exceptAll(dels).unionByName(inss)


from contextlib import contextmanager


@contextmanager
def _static_patch_plan(spark):
    """Run a maintainer patch with AQE OFF, restoring the session setting
    after. The patch plans are static-shaped by construction — every join
    side that should broadcast carries an explicit hint, and the delta
    legs are |Δ|-bounded — so AQE has nothing to re-plan; what it does add
    on a microbatch is one scheduler job per query stage (measured: 99 →
    57 jobs, 14.5s → 10.7s for four MinMax patches at sf0.1; the broadcast
    materialization jobs dominate). At 100 TB the same logic holds: the
    patch's only table-sized leg (the rare extremum-exhaustion recompute)
    is already an explicit broadcast semi join that prunes at the scan.

    With AQE off, every patch exchange runs at the session's full
    ``spark.sql.shuffle.partitions`` — task-count overhead AQE coalescing
    would otherwise remove. Patch frames are |Δ|-bounded (touched keys /
    touched groups) at ANY table size, so the exchange width is pinned to
    ``SPARK_GRAFT_PATCH_SHUFFLE`` (default 8) independently of the core
    count: the knob tracks delta volume, not cluster size — a deployment
    with huge per-batch deltas raises the env, the plan shape is
    unchanged. Results are partition-count invariant (aggregations and
    equi-joins only)."""
    import os

    patch_parts = os.environ.get("SPARK_GRAFT_PATCH_SHUFFLE", "8")
    before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    before_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", patch_parts)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)
        spark.conf.set("spark.sql.shuffle.partitions", before_parts)


def _patch_gate(s, g: str):
    """One tiny action on the checkpointed per-group patch frame ``s``
    (columns ``g`` + ``__rescan``, |touched groups| rows) returning
    ``(touched group values, rescan group values)``.

    This REPLACES the former ``count()`` rescan gate at the same cost —
    one scheduler job over checkpoint blocks — and returns strictly more:
    with the group values on the driver, the write plan can prune the
    keep side and the rescan leg with literal IN-lists instead of two
    broadcast semi/anti joins. Each broadcast exchange is its own
    scheduler job plus planning work, and in a per-batch maintenance
    protocol those driver costs ARE the bill (the data legs are
    |Δ|-bounded). Callers fall back to the broadcast-join shape above
    ``SPARK_GRAFT_PATCH_GROUP_LITERALS`` (default 4096) — at production
    delta sizes the broadcast plan is the right one, and the gate frame
    stays delta-bounded either way."""
    rows = s.select(g, "__rescan").collect()
    return [r[0] for r in rows], [r[0] for r in rows if r[1]]


def _group_literal_cap() -> int:
    import os

    return int(os.environ.get("SPARK_GRAFT_PATCH_GROUP_LITERALS", "4096"))


def _not_in_groups(col, values):
    """Keep-side predicate matching LEFT ANTI join semantics exactly,
    including NULLs on either side (NULL never matches, so NULL-group
    rows are KEPT; a NULL in ``values`` matches nothing)."""
    return ~F.coalesce(col.isin(*values), F.lit(False))


def _vread(view, path: str) -> DataFrame:
    """Read one view version directory with the view's schema cached on
    the maintainer instance: the schema is invariant across versions of
    one view, so only the FIRST read in a maintainer's lifetime pays the
    parquet footer-inference job (each uncached read costs a 1-task
    inference job plus a driver gap — several per batch across the
    patch ladder)."""
    sch = getattr(view, "_vschema", None)
    if sch is not None:
        return view.spark.read.schema(sch).parquet(path)
    df = view.spark.read.parquet(path)
    view._vschema = df.schema
    return df


def gc_view_versions(view_dir: str, *, keep_last: int = 2) -> list[int]:
    """Retire old materialized view version directories (``vNNNNNN``) —
    every maintained view writes one per batch, so an un-GC'd view_dir
    grows linearly with stream length. Keeps the newest ``keep_last``
    versions up to and including CURRENT; the patch protocol only ever
    reads the CURRENT version (its base), so ``keep_last=1`` is already
    crash-safe — a retried batch re-reads the committed CURRENT, never an
    older version. Returns the removed version numbers."""
    import json
    import os
    import re
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (CURRENT must survive)")
    ptr = os.path.join(view_dir, "CURRENT")
    if not os.path.exists(ptr):
        return []
    with open(ptr) as fh:
        current = json.load(fh)["version"]
    removed = []
    for e in sorted(os.listdir(view_dir)):
        # {6,} not {6}: versions are written f"v{v:06d}", which grows to 7+
        # digits past 1,000,000 — an exactly-6 match would silently stop
        # retiring them right when a long-lived stream needs GC most
        m = re.fullmatch(r"v(\d{6,})", e)
        if m and int(m.group(1)) <= current - keep_last:
            shutil.rmtree(os.path.join(view_dir, e))
            removed.append(int(m.group(1)))
    return removed


class MaintainedTwoTableJoinView:
    """Keep an equi-join view over TWO CDC-fed tables materialized and
    CURRENT — the consolidation engine's defining query (cross-source
    joins are the reference's reason to exist, docs/index.rst:9-12) as an
    incrementally-maintained artifact. Both sides stream: a batch may
    touch either or both tables, and the view patch covers the union of
    their touched join keys.

    Same replacement-at-touched-keys discipline as ``MaintainedJoinView``
    (retry-idempotent: the patch derives from the NEW states alone), with
    the join-key set = touched A-side PKs ∪ touched B-side PKs. Both join
    columns must be their table's single PK — that is what makes a B-side
    delta addressable as a set of join keys without before-images (a
    non-PK join column would need the old AND new join-key values of each
    changed B row).
    """

    def __init__(
        self,
        spark,
        store,
        spec_a,
        spec_b,
        *,
        key_a: str,
        key_b: str,
        view_cols: list[str],
        view_dir: str,
    ):
        import os

        for spec, key, side in ((spec_a, key_a, "A"), (spec_b, key_b, "B")):
            if spec.pk_cols != [key]:
                raise ValueError(
                    f"{side}-side join column {key!r} must be the table's "
                    f"single PK (got pk_cols={spec.pk_cols!r}): touched-key "
                    "pruning happens in PK space on both sides"
                )
        if key_a not in view_cols:
            raise ValueError(
                f"view_cols must include the join key {key_a!r} "
                "(touched-key replacement deletes view rows by key)"
            )
        cols_a = {c.name for c in spec_a.columns}
        cols_b = {c.name for c in spec_b.columns}
        ambiguous = [
            c
            for c in view_cols
            if c != key_a and c != key_b and c in cols_a and c in cols_b
        ]
        if ambiguous:
            # _join would silently resolve these to the A side; a caller
            # expecting the B-side value would get wrong view contents with
            # no error — refuse instead
            raise ValueError(
                f"view_cols {ambiguous!r} exist in both {spec_a.target_name} "
                f"and {spec_b.target_name} — rename one side's column in its "
                "spec or drop the ambiguous name from view_cols"
            )
        self.spark = spark
        self.store = store
        self.spec_a = spec_a
        self.spec_b = spec_b
        self.key_a = key_a
        self.key_b = key_b
        self.view_cols = view_cols
        self.view_dir = view_dir
        # The projection contract, PINNED at construction. check_schema must
        # compare the catalog against what this view was BUILT to project —
        # the spec objects themselves are the catalog's live entries, which
        # EngineCatalog.rename_column mutates in place, so deriving the
        # needed set from spec.columns at check time can never see a rename
        # (the staleness check would silently pass and the next patch would
        # fail or null-fill). Caught by the cdc_two_source_ddl_join_view
        # gate.
        self._need_a = frozenset(spec_a.pk_cols) | {
            c for c in view_cols if c in cols_a
        }
        self._need_b = frozenset(spec_b.pk_cols) | {
            c for c in view_cols if c in cols_b
        }
        os.makedirs(view_dir, exist_ok=True)
        self._touched = None

    def _current(self) -> int:
        import json
        import os

        ptr = os.path.join(self.view_dir, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as fh:
                return json.load(fh)["version"]
        return 0

    def _join(self, a: DataFrame, b: DataFrame) -> DataFrame:
        j = a.join(b, a[self.key_a] == b[self.key_b])
        return j.select(
            *[
                (a[c] if c in a.columns else b[c]).alias(c)
                for c in self.view_cols
            ]
        )

    def read_view(self) -> DataFrame:
        import os

        v = self._current()
        if v == 0:
            return self._join(
                self.store.read(self.spec_a), self.store.read(self.spec_b)
            )
        return _vread(self, os.path.join(self.view_dir, f"v{v:06d}"))

    def check_schema(self, catalog) -> None:
        """Fail loudly when DDL removed OR RENAMED a column this view
        projects from either table. The needed sets were pinned at
        construction (``_need_a``/``_need_b``) — deriving them from the
        spec objects here would race the catalog's in-place evolution and
        miss every rename (see __init__)."""
        for spec, need in ((self.spec_a, self._need_a), (self.spec_b, self._need_b)):
            cur = catalog.get(spec.database, spec.schema, spec.table)
            missing = sorted(need - set(cur.column_names))
            if missing:
                raise RuntimeError(
                    f"maintained two-table join view lost column(s) {missing} "
                    f"of {spec.target_name} to DDL — drop and rebuild the view"
                )

    def gc_view(self, *, keep_last: int = 2) -> list[int]:
        """Retire old view version directories (see gc_view_versions)."""
        return gc_view_versions(self.view_dir, keep_last=keep_last)

    def before_apply(self, parsed_events: DataFrame) -> None:
        ta = touched_keys(parsed_events, self.spec_a).select(
            F.col(self.key_a).alias("__k")
        )
        tb = touched_keys(parsed_events, self.spec_b).select(
            F.col(self.key_b).alias("__k")
        )
        # lazy, NOT localCheckpoint'd: both drivers of this protocol keep
        # parsed_events cached until after_apply returns, so the pin costs
        # zero jobs here and each consumer evaluates the |delta|-sized
        # distinct over the warm cache (multi-batch pipelines are
        # job-floor-bound; an eager pin was one whole job per maintainer
        # per batch). Derivation is from the IMMUTABLE parsed batch only —
        # never the store — so post-apply evaluation sees identical keys.
        self._touched = ta.union(tb).distinct()

    def after_apply(self) -> None:
        # static plan for the whole patch (see _static_patch_plan)
        with _static_patch_plan(self.spark):
            self._after_apply_impl()

    def _patch_frame(self):
        """Build (current version, patched view frame) WITHOUT committing —
        ``_after_apply_impl`` writes it; plan audits explain it."""
        import os

        v0 = self._current()
        # steady state over a bucketed silver store: both new-state reads
        # prune to the touched keys' buckets at path selection (replacement
        # only needs touched keys). The first materialization (v0 == 0)
        # reads full — its base is the complete join.
        prune = v0 > 0 and hasattr(self.store, "read_for_keys")
        if prune:
            new_a = self.store.read_for_keys(
                self.spec_a, self._touched.select(F.col("__k").alias(self.key_a))
            )
            new_b = self.store.read_for_keys(
                self.spec_b, self._touched.select(F.col("__k").alias(self.key_b))
            )
        else:
            new_a = self.store.read(self.spec_a)
            new_b = self.store.read(self.spec_b)
        t = F.broadcast(self._touched)
        a_t = new_a.join(t, new_a[self.key_a] == t["__k"], "left_semi")
        b_t = new_b.join(t, new_b[self.key_b] == t["__k"], "left_semi")
        repl = self._join(a_t, b_t)
        base = (
            # first materialization: full join of the CURRENT states (they
            # already include this batch — replacement overwrites the
            # touched keys either way, so this is retry-safe too)
            self._join(new_a, new_b)
            if v0 == 0
            else _vread(self, os.path.join(self.view_dir, f"v{v0:06d}"))
        )
        kept = base.join(t, base[self.key_a] == t["__k"], "left_anti")
        return v0, kept.unionByName(repl)

    def _after_apply_impl(self) -> None:
        import json
        import os

        v0, patched = self._patch_frame()
        v = v0 + 1
        patched.write.mode("overwrite").parquet(
            os.path.join(self.view_dir, f"v{v:06d}")
        )
        tmp = os.path.join(self.view_dir, "CURRENT.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": v}, fh)
        os.replace(tmp, os.path.join(self.view_dir, "CURRENT"))
        self._touched = None


class MaintainedAggView:
    """Keep a grouped aggregate ``(group, n_rows, total)`` over a CDC-fed
    table materialized and CURRENT, incrementally — the deployment shape
    of ``incremental_group_agg``: per microbatch the patch costs
    O(touched keys), never a base-table rescan.

    Protocol (driven by ``StreamingReplayer(maintainers=[...])``):
    ``before_apply(parsed_events)`` pins the batch's touched keys and the
    pre-apply store version; ``after_apply()`` diffs the table's state
    BETWEEN STORE VERSIONS at the touched keys and merges the -old/+new
    group deltas into the materialized aggregate.

    Crash recovery is version-anchored (the ParquetStore-native variant
    of the join view's replacement patch): the view pointer persists the
    STORE version it incorporates (``store_version``), and the delta is
    always computed from ``read_version(store_version)`` → current. If
    the process dies after the store advanced but before the view moved,
    the restarted batch recomputes the same old→new diff — the pinned
    frame a diff-from-memory would have lost is re-read from the retained
    version directory. Consequence: ``gc_versions`` must keep at least
    the view's ``store_version`` (keep_last >= 2 while a maintainer is
    attached); GC'ing it makes the next patch fail loudly (read_version
    raises), never silently.
    """

    def __init__(
        self,
        spark,
        store,
        spec,
        *,
        group_col: str,
        sum_col: str,
        sum_type: str = "decimal(12,2)",
        sum_expr: str | None = None,
        view_dir: str,
    ):
        import os

        self.spark = spark
        self.store = store
        self.spec = spec
        self.group_col = group_col
        self.sum_col = sum_col
        # optional SQL expression summed INSTEAD of the bare column (e.g. a
        # grid-exact money normalization); sum_col stays the DDL-tracked
        # dependency for check_schema
        self.sum_expr = sum_expr or sum_col
        self.sum_type = sum_type
        self.view_dir = view_dir
        # projection contract PINNED at construction (mirrors
        # MaintainedTwoTableJoinView): EngineCatalog.rename_column mutates
        # spec.pk_cols in place, so deriving the need-set lazily from the
        # live spec makes a PK rename structurally undetectable
        self._need = frozenset(spec.pk_cols) | {group_col, sum_col}
        os.makedirs(view_dir, exist_ok=True)
        self._touched = None
        self._v_pre = None

    def _meta(self) -> dict:
        import json
        import os

        ptr = os.path.join(self.view_dir, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as fh:
                return json.load(fh)
        return {"version": 0, "store_version": None}

    def read_view(self) -> DataFrame:
        import os

        m = self._meta()
        if m["version"] == 0:
            return self._full_agg(self.store.read(self.spec))
        return _vread(self, os.path.join(self.view_dir, f"v{m['version']:06d}"))

    def _full_agg(self, state: DataFrame) -> DataFrame:
        return state.groupBy(self.group_col).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr(self.sum_expr).cast(self.sum_type))
            .cast(self.sum_type)
            .alias("total"),
        )

    def check_schema(self, catalog) -> None:
        """Fail LOUDLY when mid-stream DDL removed a column this view
        aggregates (driven by StreamingReplayer after any batch that
        executed DDL). Without the check, the pinned spec would keep
        projecting the dropped column out of newer store files as NULLs
        and the aggregate would drift silently — violating the view's
        fail-loudly contract. An unrelated ADD COLUMN passes: the view's
        projection is a subset either way."""
        cur = catalog.get(self.spec.database, self.spec.schema, self.spec.table)
        need = self._need
        missing = sorted(need - set(cur.column_names))
        if missing:
            raise RuntimeError(
                f"maintained aggregate over {self.spec.target_name} lost "
                f"column(s) {missing} to DDL — drop and rebuild the view"
            )

    def gc_view(self, *, keep_last: int = 2) -> list[int]:
        """Retire old view version directories (see gc_view_versions)."""
        return gc_view_versions(self.view_dir, keep_last=keep_last)

    def before_apply(self, parsed_events: DataFrame) -> None:
        # lazy pin (see MaintainedTwoTableJoinView.before_apply): derives
        # from the immutable cached batch only, so evaluating it after the
        # store advanced yields identical keys at zero extra jobs
        self._touched = touched_keys(parsed_events, self.spec)
        self._v_pre = self.store.current_version(self.spec.target_name)

    def after_apply(self) -> None:
        # static plan for the whole patch (see _static_patch_plan)
        with _static_patch_plan(self.spark):
            self._after_apply_impl()

    def _after_apply_impl(self) -> None:
        import json
        import os

        m, patched, v_now = self._patch_frame()
        v = m["version"] + 1
        patched.write.mode("overwrite").parquet(
            os.path.join(self.view_dir, f"v{v:06d}")
        )
        tmp = os.path.join(self.view_dir, "CURRENT.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": v, "store_version": v_now}, fh)
        os.replace(tmp, os.path.join(self.view_dir, "CURRENT"))
        self._touched = self._v_pre = None

    def _patch_frame(self):
        """Build (meta, patched view frame, store version) WITHOUT
        committing — ``after_apply`` writes it; plan audits explain it."""
        import os

        from connemara_spark.operators.apply import group_agg_net, merge_group_agg

        m = self._meta()
        # the store version this view last incorporated: committed metadata
        # when it exists; the pre-apply pin only for the very first batch
        # (on a first-batch retry the pin is post-batch — then old == new,
        # the delta is empty, and the bootstrap aggregate below already
        # contains the batch: still correct)
        applied = m["store_version"] if m["version"] > 0 else self._v_pre
        # Steady state over a bucketed silver store: prune BOTH version
        # reads to the touched keys' buckets at path selection — the diff
        # below only inspects touched keys, and a bucket is the complete
        # per-key world for everything in it, so untouched buckets of
        # either version are never listed or read. The bootstrap batch
        # (m["version"] == 0) still reads full: its base aggregate needs
        # the whole old state.
        prune = hasattr(self.store, "buckets_of") and m["version"] > 0
        if prune:
            bks = self.store.buckets_of(self.spec, self._touched)
            old = (
                self.store.read_version(self.spec, applied, buckets=bks)
                if applied
                else self.spark.createDataFrame([], self.spec.spark_schema())
            )
            new = self.store.read_buckets(self.spec, bks)
        else:
            old = (
                self.store.read_version(self.spec, applied)
                if applied
                else self.spark.createDataFrame([], self.spec.spark_schema())
            )
            new = self.store.read(self.spec)
        v_now = self.store.current_version(self.spec.target_name)

        pk = list(self.spec.pk_cols)
        t = F.broadcast(self._touched)  # touched_keys output is distinct
        old_t = old.join(t, on=pk, how="left_semi")
        new_t = new.join(t, on=pk, how="left_semi")
        # JOIN-FREE delta: the group aggregate is distributive, so the
        # per-key old↔new pairing a full-outer diff join would produce is
        # algebraically irrelevant — old touched rows contribute (-1,-val),
        # new touched rows (+1,+val), one map-side-combined groupBy nets
        # them (group_agg_net). This removed two shuffle exchanges of
        # touched-key rows from every patch (r8; EXPLAIN.md view_patch).
        net = group_agg_net(
            old_t, new_t,
            group_col=self.group_col, sum_col=self.sum_expr, sum_type=self.sum_type,
        )
        base = (
            self._full_agg(old)
            if m["version"] == 0
            else _vread(self, os.path.join(self.view_dir, f"v{m['version']:06d}"))
        )
        patched = merge_group_agg(
            base, net, group_col=self.group_col, sum_type=self.sum_type
        )
        return m, patched, v_now


class MaintainedJoinView:
    """Keep an equi-join view ``A ⋈ dim`` materialized and CURRENT under a
    CDC stream, incrementally — the deployment shape of the delta rule:
    per microbatch, work scales with that batch's touched-key set, never
    the view.

    Protocol (driven by ``StreamingReplayer`` when passed via
    ``maintainers=[...]``): ``before_apply(parsed_events)`` pins the OLD
    state (the store's current version — ParquetStore reads are
    version-pinned, so the frame stays old through the apply) and the
    batch's touched keys; after the replayer applies the batch,
    ``after_apply()`` patches the materialized view (versioned parquet,
    same write-then-advance pointer discipline as the silver store).

    The patch is REPLACEMENT at the touched keys — drop every view row
    whose join key is touched, re-insert the join of the NEW state at
    those keys — not an old-vs-new diff. Replacement makes recovery
    idempotent: if the process dies after the store advanced but before
    the view pointer moved, the restarted stream re-applies the batch
    (store apply is idempotent) and ``before_apply`` pins a state that
    already CONTAINS the batch. A diff of that state against itself is
    empty and would silently lose the batch's view changes forever;
    replacement recomputes the same correct rows from the new state
    alone, so the retry converges. Work remains |Δ|-scoped either way:
    the touched set broadcasts and prunes the state before the join.
    """

    def __init__(
        self,
        spark,
        store,
        spec,
        *,
        dim: DataFrame,
        key_a: str,
        key_b: str,
        view_cols: list[str],
        view_dir: str,
    ):
        import os

        self.spark = spark
        self.store = store
        self.spec = spec
        self.dim = dim
        # The touched-key set is computed in PK space (touched_keys), and
        # join_view_delta prunes on key_a — those spaces must coincide or
        # the pruning silently misses changed rows and the view goes stale.
        # A non-PK join column would need touched keys derived in key_a
        # space from the old+new states at the touched PKs; not supported.
        if spec.pk_cols != [key_a]:
            raise ValueError(
                f"MaintainedJoinView requires key_a == the spec's single PK "
                f"column (got key_a={key_a!r}, pk_cols={spec.pk_cols!r}): "
                "touched-key pruning happens in PK space"
            )
        # Replacement-at-key patching deletes view rows by join key, so the
        # materialized rows must carry it.
        if key_a not in view_cols:
            raise ValueError(
                f"view_cols must include the join key {key_a!r} "
                "(touched-key replacement deletes view rows by key)"
            )
        self.key_a = key_a
        self.key_b = key_b
        self.view_cols = view_cols
        self.view_dir = view_dir
        # pinned projection contract (see MaintainedTwoTableJoinView.__init__:
        # the catalog mutates spec.columns in place on rename, so the needed
        # set must be snapshotted at construction for check_schema to see it)
        mine = {c.name for c in spec.columns}
        self._need = frozenset(spec.pk_cols) | {c for c in view_cols if c in mine}
        os.makedirs(view_dir, exist_ok=True)
        self._old = None
        self._touched = None

    def _current(self) -> int:
        import json
        import os

        ptr = os.path.join(self.view_dir, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as fh:
                return json.load(fh)["version"]
        return 0

    def read_view(self) -> DataFrame:
        import os

        v = self._current()
        if v == 0:
            a = self.store.read(self.spec)
            return self._join(a)
        return _vread(self, os.path.join(self.view_dir, f"v{v:06d}"))

    def _join(self, a: DataFrame) -> DataFrame:
        j = a.join(self.dim, a[self.key_a] == self.dim[self.key_b])
        return j.select(
            *[
                (a[c] if c in a.columns else self.dim[c]).alias(c)
                for c in self.view_cols
            ]
        )

    def check_schema(self, catalog) -> None:
        """Fail loudly when DDL removed OR RENAMED a column this view
        projects from its table (needed set pinned at construction — see
        MaintainedTwoTableJoinView.check_schema)."""
        cur = catalog.get(self.spec.database, self.spec.schema, self.spec.table)
        missing = sorted(self._need - set(cur.column_names))
        if missing:
            raise RuntimeError(
                f"maintained join view over {self.spec.target_name} lost "
                f"column(s) {missing} to DDL — drop and rebuild the view"
            )

    def gc_view(self, *, keep_last: int = 2) -> list[int]:
        """Retire old view version directories (see gc_view_versions)."""
        return gc_view_versions(self.view_dir, keep_last=keep_last)

    def before_apply(self, parsed_events: DataFrame) -> None:
        self._old = self.store.read(self.spec)  # version-pinned OLD state
        # lazy pin (see MaintainedTwoTableJoinView.before_apply)
        self._touched = touched_keys(parsed_events, self.spec)

    def after_apply(self) -> None:
        # static plan for the whole patch (see _static_patch_plan)
        with _static_patch_plan(self.spark):
            self._after_apply_impl()

    def _after_apply_impl(self) -> None:
        import json
        import os

        # bucketed silver store: the new-state read prunes to the touched
        # keys' buckets at path selection (replacement only needs touched
        # keys; the semi join below narrows the bucket superset to them)
        new = (
            self.store.read_for_keys(self.spec, self._touched)
            if hasattr(self.store, "read_for_keys")
            else self.store.read(self.spec)
        )
        t = F.broadcast(
            self._touched.select(
                F.col(self._touched.columns[0]).alias("__k")
            ).distinct()
        )
        # replacement rows: the NEW state's join restricted to touched keys
        # (semi-join prunes before the dim join — |Δ|-sized work)
        a_t = new.join(t, new[self.key_a] == t["__k"], "left_semi")
        repl = self._join(a_t)
        # base view: the materialized version if one exists, else the join
        # of the PINNED OLD state (first materialization only; on a retry
        # after a post-apply crash the pinned state may already contain the
        # batch — harmless, replacement overwrites the touched keys either
        # way)
        v0 = self._current()
        base = (
            self._join(self._old)
            if v0 == 0
            else _vread(self, os.path.join(self.view_dir, f"v{v0:06d}"))
        )
        kept = base.join(t, base[self.key_a] == t["__k"], "left_anti")
        patched = kept.unionByName(repl)
        v = self._current() + 1
        patched.write.mode("overwrite").parquet(
            os.path.join(self.view_dir, f"v{v:06d}")
        )
        tmp = os.path.join(self.view_dir, "CURRENT.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": v}, fh)
        os.replace(tmp, os.path.join(self.view_dir, "CURRENT"))
        self._old = self._touched = None


class MaintainedMinMaxView:
    """Keep a grouped ``(group, n_rows, min_val, max_val)`` view over a
    CDC-fed table materialized incrementally — the classic NON-self-
    maintainable aggregate (Gupta & Mumick's taxonomy: MIN/MAX under
    deletions cannot be patched from the delta alone, because deleting a
    group's extremum exposes an unknown runner-up).

    The standard counter refinement makes the rescan RARE instead of
    per-batch: the view also stores the extremum's MULTIPLICITY
    (``min_cnt``/``max_cnt``). Per batch, over the touched keys only:

    - an insert below the min (or above the max) replaces it outright;
    - deletes/inserts AT the extremum adjust its multiplicity;
    - only when the multiplicity hits zero with no insert taking over is
      the group's aggregate recomputed — and then from the CURRENT state
      restricted to exactly those groups (a broadcast semi join the scan
      can push down), never a full-view rescan.

    Everything else mirrors ``MaintainedAggView``: the Replayer maintainer
    protocol (``before_apply`` pins touched keys + pre-apply store
    version, ``after_apply`` patches), version-anchored crash recovery
    (the view pointer records the store version it incorporates; the diff
    is always old-version → current), and touched-bucket pruning on a
    BucketStore for the delta legs. The recompute leg deliberately reads
    the FULL current state (pruned only by the group semi join): the
    touched keys' buckets do not contain a touched GROUP's other rows.

    At 100 TB: the delta legs are |Δ|-bounded; the recompute leg's
    frequency is bounded by actual extremum-exhaustion events (data-, not
    size-, driven), and its cost is one pushed-down filtered scan per
    affected batch. ``last_recompute_groups`` (always recorded since r10 —
    the count is one cheap job over the checkpointed patch summary, and it
    doubles as the skip condition for scheduling the recompute leg at all)
    exposes how often it fires.
    """

    def __init__(
        self,
        spark,
        store,
        spec,
        *,
        group_col: str,
        val_col: str,
        val_type: str = "decimal(12,2)",
        view_dir: str,
        debug_counters: bool = False,
    ):
        import os

        self.spark = spark
        self.store = store
        self.spec = spec
        self.group_col = group_col
        self.val_col = val_col
        self.val_type = val_type
        self.view_dir = view_dir
        self.debug_counters = debug_counters
        self.last_recompute_groups: int | None = None
        # pinned projection contract (see MaintainedAggView.__init__)
        self._need = frozenset(spec.pk_cols) | {group_col, val_col}
        os.makedirs(view_dir, exist_ok=True)
        self._touched = None
        self._v_pre = None

    # -- protocol plumbing shared with MaintainedAggView ---------------
    def _meta(self) -> dict:
        import json
        import os

        ptr = os.path.join(self.view_dir, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as fh:
                return json.load(fh)
        return {"version": 0, "store_version": None}

    def read_view(self) -> DataFrame:
        import os

        m = self._meta()
        if m["version"] == 0:
            return self._full_agg(self.store.read(self.spec))
        return _vread(self, os.path.join(self.view_dir, f"v{m['version']:06d}"))

    def _val(self):
        return F.col(self.val_col).cast(self.val_type)

    def _full_agg(self, state: DataFrame) -> DataFrame:
        """(group, n_rows, min_val, min_cnt, max_val, max_cnt) from
        scratch: one per-(group, value) count, then min_by/max_by picks
        the extremum's multiplicity — two map-side-combined shuffles, no
        join."""
        per_val = state.groupBy(
            F.col(self.group_col), self._val().alias("__v")
        ).agg(F.count(F.lit(1)).alias("__c"))
        nn = per_val.filter(F.col("__v").isNotNull())
        counts = state.groupBy(self.group_col).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        mm = nn.groupBy(self.group_col).agg(
            F.min("__v").alias("min_val"),
            F.min_by("__c", "__v").alias("min_cnt"),
            F.max("__v").alias("max_val"),
            F.max_by("__c", "__v").alias("max_cnt"),
        )
        return counts.join(mm, self.group_col, "left").select(
            self.group_col, "n_rows", "min_val", "min_cnt", "max_val", "max_cnt"
        )

    def _prep(self) -> dict:
        """Batch-invariant Column trees of the patch, prepared once per
        (group, value, type) signature and reused across every batch and
        maintainer instance (the same plan-fragment cache as the apply
        fold — a per-batch protocol otherwise pays the full py4j
        expression-construction cost per patch; see apply._make_fold's
        NOTE). Everything here references columns BY NAME only."""
        from connemara_spark.operators.apply import _prepared

        g = self.group_col

        def build() -> dict:
            ins_v = F.when(
                (F.col("__ins") > 0) & F.col("__v").isNotNull(), F.col("__v")
            )
            n_new = F.coalesce(F.col("__bn"), F.lit(0)) + F.col("__dn")
            surv_min = F.col("__bminc") + F.coalesce(F.col("__d_at_min"), F.lit(0))
            surv_max = F.col("__bmaxc") + F.coalesce(F.col("__d_at_max"), F.lit(0))
            new_group = F.col("__bn").isNull()
            ins_takes_min = F.col("__ins_min").isNotNull() & (
                new_group
                | F.col("__bmin").isNull()
                | (F.col("__ins_min") < F.col("__bmin"))
            )
            ins_takes_max = F.col("__ins_max").isNotNull() & (
                new_group
                | F.col("__bmax").isNull()
                | (F.col("__ins_max") > F.col("__bmax"))
            )
            min_ok = ins_takes_min | (
                ~new_group & F.col("__bmin").isNotNull() & (surv_min > 0)
            )
            max_ok = ins_takes_max | (
                ~new_group & F.col("__bmax").isNotNull() & (surv_max > 0)
            )
            # a group whose rows are all null-valued has null extrema on
            # both sides — self-maintainable trivially
            all_null = F.col("__ins_min").isNull() & (
                new_group | F.col("__bmin").isNull()
            )
            needs_rescan = (n_new > 0) & ~all_null & ~(min_ok & max_ok)
            return {
                "delta_old": [
                    F.col(g), self._val().alias("__v"), F.lit(-1).alias("__s")
                ],
                "delta_new": [
                    F.col(g), self._val().alias("__v"), F.lit(1).alias("__s")
                ],
                "per_val_aggs": [
                    F.sum("__s").alias("__ds"),
                    F.sum(F.when(F.col("__s") > 0, 1)).alias("__ins"),
                ],
                "base_sel": [
                    F.col(g),
                    F.col("n_rows").alias("__bn"),
                    F.col("min_val").alias("__bmin"),
                    F.col("min_cnt").alias("__bminc"),
                    F.col("max_val").alias("__bmax"),
                    F.col("max_cnt").alias("__bmaxc"),
                ],
                "s_aggs": [
                    F.sum("__ds").alias("__dn"),
                    F.sum(
                        F.when(F.col("__v") == F.col("__bmin"), F.col("__ds"))
                    ).alias("__d_at_min"),
                    F.sum(
                        F.when(F.col("__v") == F.col("__bmax"), F.col("__ds"))
                    ).alias("__d_at_max"),
                    F.min(ins_v).alias("__ins_min"),
                    F.max(ins_v).alias("__ins_max"),
                    # min_by/max_by skip rows whose ordering expr is NULL, so
                    # these pick the insert count AT the insert extremum
                    F.min_by(F.col("__ins"), ins_v).alias("__ins_minc"),
                    F.max_by(F.col("__ins"), ins_v).alias("__ins_maxc"),
                    F.first("__bn").alias("__bn"),
                    F.first("__bmin").alias("__bmin"),
                    F.first("__bminc").alias("__bminc"),
                    F.first("__bmax").alias("__bmax"),
                    F.first("__bmaxc").alias("__bmaxc"),
                ],
                "n_new": n_new,
                "needs_rescan": needs_rescan,
                "rows_sel": [
                    F.col(g),
                    F.col("__n_new").alias("n_rows"),
                    F.when(ins_takes_min, F.col("__ins_min"))
                    .otherwise(F.col("__bmin"))
                    .alias("min_val"),
                    F.when(
                        ins_takes_min,
                        F.col("__ins_minc")
                        # inserts AT an unchanged min also count toward its
                        # multiplicity; when the insert min TAKES OVER
                        # strictly below, nothing pre-existing sits at that
                        # value
                        ,
                    )
                    .otherwise(surv_min)
                    .alias("min_cnt"),
                    F.when(ins_takes_max, F.col("__ins_max"))
                    .otherwise(F.col("__bmax"))
                    .alias("max_val"),
                    F.when(ins_takes_max, F.col("__ins_maxc"))
                    .otherwise(surv_max)
                    .alias("max_cnt"),
                ],
            }

        return _prepared(("mm_patch", g, self.val_col, self.val_type), build)

    def check_schema(self, catalog) -> None:
        cur = catalog.get(self.spec.database, self.spec.schema, self.spec.table)
        need = self._need
        missing = sorted(need - set(cur.column_names))
        if missing:
            raise RuntimeError(
                f"maintained min/max view over {self.spec.target_name} lost "
                f"column(s) {missing} to DDL — drop and rebuild the view"
            )

    def gc_view(self, *, keep_last: int = 2) -> list[int]:
        """Retire old view version directories (see gc_view_versions)."""
        return gc_view_versions(self.view_dir, keep_last=keep_last)

    def before_apply(self, parsed_events: DataFrame) -> None:
        self._touched = touched_keys(parsed_events, self.spec)
        self._v_pre = self.store.current_version(self.spec.target_name)

    def after_apply(self) -> None:
        # static plan for the whole patch (see _static_patch_plan)
        with _static_patch_plan(self.spark):
            self._after_apply_impl()

    def _after_apply_impl(self) -> None:
        import json
        import os

        m, patched, v_now = self._patch_frame()
        v = m["version"] + 1
        vdir = os.path.join(self.view_dir, f"v{v:06d}")
        patched.write.mode("overwrite").parquet(vdir)
        tmp = os.path.join(self.view_dir, "CURRENT.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": v, "store_version": v_now}, fh)
        os.replace(tmp, os.path.join(self.view_dir, "CURRENT"))
        self._touched = self._v_pre = None

    # -- the patch ------------------------------------------------------
    def _patch_frame(self):
        import os

        m = self._meta()
        applied = m["store_version"] if m["version"] > 0 else self._v_pre
        prune = hasattr(self.store, "buckets_of") and m["version"] > 0
        if prune:
            bks = self.store.buckets_of(self.spec, self._touched)
            old = (
                self.store.read_version(self.spec, applied, buckets=bks)
                if applied
                else self.spark.createDataFrame([], self.spec.spark_schema())
            )
            new_t_src = self.store.read_buckets(self.spec, bks)
        else:
            old = (
                self.store.read_version(self.spec, applied)
                if applied
                else self.spark.createDataFrame([], self.spec.spark_schema())
            )
            new_t_src = self.store.read(self.spec)
        v_now = self.store.current_version(self.spec.target_name)

        pk = list(self.spec.pk_cols)
        t = F.broadcast(self._touched)
        g = self.group_col
        prep = self._prep()  # batch-invariant Column trees (see _prep)
        old_t = old.join(t, on=pk, how="left_semi")
        new_t = new_t_src.join(t, on=pk, how="left_semi")

        # the batch as a signed value multiset at the touched keys: old
        # rows leave (-1), new rows arrive (+1) — state diff, not event
        # rows, so partial (TOAST) updates and PK-change splits are
        # already resolved by the fold
        deltas = old_t.select(*prep["delta_old"]).unionByName(
            new_t.select(*prep["delta_new"])
        )
        # ONE (group, value) pre-aggregation feeds every per-group statistic
        # below — it replaces the former two-branch shape (a row-level join
        # with the base + a separate two-level ins_cnts aggregation + their
        # re-join), removing two shuffle exchanges and a join from every
        # patch. __ds is the net signed multiplicity at the value; __ins
        # counts the batch's insert rows at it (for the takeover
        # multiplicity). Left lazy: the whole patch runs as ONE action (the
        # view write), and the two consumers below (touched_groups, d) share
        # this subtree via exchange reuse instead of a checkpoint job.
        per_val = deltas.groupBy(g, "__v").agg(*prep["per_val_aggs"])
        touched_groups = per_val.select(g).distinct()

        base = (
            self._full_agg(old)
            if m["version"] == 0
            else _vread(self, os.path.join(self.view_dir, f"v{m['version']:06d}"))
        )
        # the view rows that can change, with their extremum bookkeeping
        base_t = base.join(F.broadcast(touched_groups), g, "left_semi")
        d = per_val.join(base_t.select(*prep["base_sel"]), g, "left")
        s = d.groupBy(g).agg(*prep["s_aggs"])

        s = s.withColumn("__n_new", prep["n_new"]).withColumn(
            "__rescan", prep["needs_rescan"]
        )

        def _rows(sf):
            return sf.filter(
                (F.col("__n_new") > 0) & ~F.col("__rescan")
            ).select(*prep["rows_sel"])

        # ONE materialization for the whole patch: `s` is |touched groups|-
        # sized and every downstream consumer — the keep-side anti join's
        # group set, the patched rows, the rescan gate and the rescan group
        # list — reads this checkpoint instead of re-deriving the delta
        # subtree (the former shape also checkpointed per_val separately and
        # re-built touched_groups from it on the write side).
        s = s.localCheckpoint()
        # tiny gating job on the checkpointed frame (see _patch_gate): in
        # the common batch (no extremum exhausted) it lets us skip
        # SCHEDULING the whole recompute subtree — a full-store scan plus
        # three aggregation exchanges that would produce zero rows — and
        # below the literal cap it also removes both write-side broadcast
        # exchanges (each its own scheduler job per batch).
        tg_vals, rescan_vals = _patch_gate(s, g)
        self.last_recompute_groups = len(rescan_vals)
        lit = len(tg_vals) <= _group_literal_cap()
        kept = (
            (base.filter(_not_in_groups(F.col(g), tg_vals)) if tg_vals else base)
            if lit
            else base.join(F.broadcast(s.select(g)), g, "left_anti")
        )
        patched = kept.unionByName(_rows(s))
        if rescan_vals:
            # the recompute leg MUST see the group's whole world: full
            # current state (not the touched buckets), pruned by the group
            # list (literal pushdown below the cap, broadcast semi above)
            state = self.store.read(self.spec)
            state = (
                state.filter(F.col(g).isin(*rescan_vals))
                if lit
                else state.join(
                    F.broadcast(s.filter(F.col("__rescan")).select(g)),
                    g,
                    "left_semi",
                )
            )
            patched = patched.unionByName(self._full_agg(state))
        return m, patched, v_now


class MaintainedTopKView:
    """Keep each group's TOP-K rows by a value column materialized
    incrementally — the BI leaderboard artifact ("top k accounts per
    segment"), and like MIN/MAX a NON-self-maintainable aggregate:
    deleting a stored top row pulls in a runner-up the delta alone does
    not know.

    The refinement is a SLACK BUFFER: the view stores each group's top
    ``k + slack`` (value, pk) pairs plus the group's total row count.
    Per batch, over the touched keys only:

    - stored pairs whose pk was touched are dropped (their value may have
      changed or the row may be gone);
    - the batch's new/updated rows merge in by sorted order;
    - the merged list re-trims to ``k + slack``.

    Only when a group's stored list falls below ``min(k, n_rows)`` — the
    buffer burned through faster than arrivals refilled it — is that
    group re-aggregated, from the current state restricted to exactly
    those groups (broadcast semi join + per-group window, output bounded
    at ``k + slack`` rows per group). Everything else follows the
    ``MaintainedMinMaxView`` protocol: version-anchored recovery,
    touched-bucket pruning for the delta legs, full-state read only on
    the rescan leg.

    Ordering is (value DESC, pk ASC) — total and engine-independent, so
    the exploded view is value-hash-gateable. ``group_col`` and the pk
    must be non-null (CDC spec columns).
    """

    def __init__(
        self,
        spark,
        store,
        spec,
        *,
        group_col: str,
        val_col: str,
        k: int,
        slack: int | None = None,
        val_type: str = "decimal(12,2)",
        view_dir: str,
        debug_counters: bool = False,
    ):
        import os

        self.spark = spark
        self.store = store
        self.spec = spec
        self.group_col = group_col
        self.val_col = val_col
        self.k = k
        self.slack = k if slack is None else slack
        self.val_type = val_type
        self.view_dir = view_dir
        self.debug_counters = debug_counters
        self.last_recompute_groups: int | None = None
        if len(spec.pk_cols) != 1:
            raise ValueError("MaintainedTopKView requires a single-column pk")
        self.pk = spec.pk_cols[0]
        # pinned projection contract (see MaintainedAggView.__init__)
        self._need = frozenset(spec.pk_cols) | {group_col, val_col}
        os.makedirs(view_dir, exist_ok=True)
        self._touched = None
        self._v_pre = None

    # -- protocol plumbing (MaintainedMinMaxView shape) -----------------
    def _meta(self) -> dict:
        import json
        import os

        ptr = os.path.join(self.view_dir, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as fh:
                return json.load(fh)
        return {"version": 0, "store_version": None}

    def read_view(self) -> DataFrame:
        """(group, n_rows, top array<struct<v, id>>) — top truncated to k
        for readers (the slack tail is maintenance state, not output)."""
        import os

        m = self._meta()
        raw = (
            self._full_agg(self.store.read(self.spec))
            if m["version"] == 0
            else _vread(self, os.path.join(self.view_dir, f"v{m['version']:06d}"))
        )
        return raw.select(
            self.group_col,
            "n_rows",
            F.slice("top", 1, self.k).alias("top"),
        )

    def _val(self):
        return F.col(self.val_col).cast(self.val_type)

    @staticmethod
    def _cmp(a, b):
        """(v DESC, id ASC) comparator — the view's total ordering."""
        return (
            F.when(a["v"] > b["v"], -1)
            .when(a["v"] < b["v"], 1)
            .when(a["id"] < b["id"], -1)
            .when(a["id"] > b["id"], 1)
            .otherwise(0)
        )

    def _full_agg(self, state: DataFrame) -> DataFrame:
        """(group, n_rows, top) from scratch: per-group window row_number
        bounds the collected list at k+slack BEFORE any collect_list, so
        the build never materializes a whole group in one array."""
        g = self.group_col
        prep = self._prep()
        rows = state.select(*prep["fa_rows_sel"])
        counts = rows.groupBy(g).agg(F.count(F.lit(1)).alias("n_rows"))
        top = (
            rows.filter(F.col("__v").isNotNull())
            .withColumn("__rn", prep["fa_rn"])
            .filter(F.col("__rn") <= self.k + self.slack)
            .groupBy(g)
            .agg(prep["fa_top_agg"])
        )
        return counts.join(top, g, "left").select(*prep["fa_final_sel"])

    def _prep(self) -> dict:
        """Batch-invariant Column trees of the patch and the full
        aggregate, prepared once per (group, value, type, k, slack, pk)
        signature — the same plan-fragment cache as the apply fold (see
        apply._make_fold's NOTE); the array_sort/filter/transform lambdas
        here are the most py4j-expensive expressions in the maintainer.
        Everything references columns BY NAME only."""
        from pyspark.sql.window import Window

        from connemara_spark.operators.apply import _prepared

        g = self.group_col
        lim = self.k + self.slack
        empty_top = f"array<struct<v:{self.val_type},id:bigint>>"

        def build() -> dict:
            kept = F.filter(
                F.coalesce(F.col("top"), F.array().cast(empty_top)),
                lambda x: ~F.array_contains(F.col("__touched_ids"), x["id"]),
            )
            # merge two sorted lists by re-sorting the concat (both
            # bounded: kept <= k+slack, adds <= |batch slice for group|)
            merged = F.slice(
                F.array_sort(F.concat(kept, F.col("__adds")), self._cmp), 1, lim
            )
            n_new = F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("__dn")
            # Trust model: see _patch_frame's comment block.
            base_top = F.coalesce(F.col("top"), F.array().cast(empty_top))
            unknowns = F.coalesce(
                F.col("n_rows") > F.size(base_top), F.lit(False)
            )
            cutoff = F.element_at(base_top, F.size(base_top))["v"]
            kept_ids = F.transform(kept, lambda x: x["id"])
            unsafe_flags = F.transform(
                merged,
                lambda x: F.coalesce(
                    unknowns
                    & ~(x["v"] > cutoff)
                    & ~F.array_contains(kept_ids, x["id"]),
                    F.lit(True),
                ),
            )
            first_unsafe = F.array_position(unsafe_flags, F.lit(True))
            trusted = F.when(
                first_unsafe > 0,
                F.slice(merged, F.lit(1), (first_unsafe - 1).cast("int")),
            ).otherwise(merged)
            need = F.greatest(F.least(F.lit(self.k), n_new), F.lit(0)).cast(
                "int"
            )
            w = Window.partitionBy(g).orderBy(
                F.col("__v").desc_nulls_last(), F.col("__id")
            )
            return {
                "delta_old": [
                    F.col(g),
                    self._val().alias("__v"),
                    F.col(self.pk).alias("__id"),
                    F.lit(-1).alias("__s"),
                ],
                "delta_new": [
                    F.col(g),
                    self._val().alias("__v"),
                    F.col(self.pk).alias("__id"),
                    F.lit(1).alias("__s"),
                ],
                "per_group_aggs": [
                    F.sum("__s").alias("__dn"),
                    F.collect_set("__id").alias("__touched_ids"),
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                (F.col("__s") > 0) & F.col("__v").isNotNull(),
                                F.struct(
                                    F.col("__v").alias("v"),
                                    F.col("__id").alias("id"),
                                ),
                            )
                        ),
                        self._cmp,
                    ).alias("__adds"),
                ],
                "merged": trusted,
                "n_new": n_new,
                "needs_rescan": (n_new > 0) & (F.size(trusted) < need),
                "patched_sel": [
                    F.col(g),
                    F.col("__n_new").alias("n_rows"),
                    F.col("__merged").alias("top"),
                ],
                "fa_rows_sel": [
                    F.col(g),
                    self._val().alias("__v"),
                    F.col(self.pk).alias("__id"),
                ],
                "fa_rn": F.row_number().over(w),
                "fa_top_agg": F.array_sort(
                    F.collect_list(
                        F.struct(F.col("__v").alias("v"), F.col("__id").alias("id"))
                    ),
                    self._cmp,
                ).alias("top"),
                "fa_final_sel": [
                    F.col(g),
                    F.col("n_rows"),
                    F.coalesce("top", F.array().cast(empty_top)).alias("top"),
                ],
            }

        return _prepared(
            ("tk_patch", g, self.val_col, self.val_type, self.k, self.slack, self.pk),
            build,
        )

    def check_schema(self, catalog) -> None:
        cur = catalog.get(self.spec.database, self.spec.schema, self.spec.table)
        need = self._need
        missing = sorted(need - set(cur.column_names))
        if missing:
            raise RuntimeError(
                f"maintained top-k view over {self.spec.target_name} lost "
                f"column(s) {missing} to DDL — drop and rebuild the view"
            )

    def gc_view(self, *, keep_last: int = 2) -> list[int]:
        """Retire old view version directories (see gc_view_versions)."""
        return gc_view_versions(self.view_dir, keep_last=keep_last)

    def before_apply(self, parsed_events: DataFrame) -> None:
        self._touched = touched_keys(parsed_events, self.spec)
        self._v_pre = self.store.current_version(self.spec.target_name)

    def after_apply(self) -> None:
        # static plan for the whole patch (see _static_patch_plan)
        with _static_patch_plan(self.spark):
            self._after_apply_impl()

    def _after_apply_impl(self) -> None:
        import json
        import os

        m, patched, v_now = self._patch_frame()
        v = m["version"] + 1
        patched.write.mode("overwrite").parquet(
            os.path.join(self.view_dir, f"v{v:06d}")
        )
        tmp = os.path.join(self.view_dir, "CURRENT.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": v, "store_version": v_now}, fh)
        os.replace(tmp, os.path.join(self.view_dir, "CURRENT"))
        self._touched = self._v_pre = None

    # -- the patch ------------------------------------------------------
    def _patch_frame(self):
        import os

        from pyspark.sql.window import Window

        m = self._meta()
        applied = m["store_version"] if m["version"] > 0 else self._v_pre
        prune = hasattr(self.store, "buckets_of") and m["version"] > 0
        if prune:
            bks = self.store.buckets_of(self.spec, self._touched)
            old = (
                self.store.read_version(self.spec, applied, buckets=bks)
                if applied
                else self.spark.createDataFrame([], self.spec.spark_schema())
            )
            new_t_src = self.store.read_buckets(self.spec, bks)
        else:
            old = (
                self.store.read_version(self.spec, applied)
                if applied
                else self.spark.createDataFrame([], self.spec.spark_schema())
            )
            new_t_src = self.store.read(self.spec)
        v_now = self.store.current_version(self.spec.target_name)

        g = self.group_col
        pk = list(self.spec.pk_cols)
        prep = self._prep()  # batch-invariant Column trees (see _prep)
        t = F.broadcast(self._touched)
        old_t = old.join(t, on=pk, how="left_semi")
        new_t = new_t_src.join(t, on=pk, how="left_semi")

        # per-group batch summary: touched pks (to evict from stored
        # lists), surviving new pairs (to merge), and the row-count delta
        deltas = old_t.select(*prep["delta_old"]).unionByName(
            new_t.select(*prep["delta_new"])
        )
        # left lazy: the patch materializes ONCE, at the folded `s` frame
        # below — the two consumers of this per-group fold (touched_groups'
        # semi join and s's left side) share the subtree via exchange reuse
        # inside that one checkpoint job
        per_group = deltas.groupBy(g).agg(*prep["per_group_aggs"])
        touched_groups = per_group.select(g)

        base = (
            self._full_agg(old)
            if m["version"] == 0
            else _vread(self, os.path.join(self.view_dir, f"v{m['version']:06d}"))
        )
        base_t = base.join(F.broadcast(touched_groups), g, "left_semi")
        s = per_group.join(base_t, g, "left")

        # Trust model for the merged list (prep["merged"]): the old stored
        # list held the group's true top-s, so every UNSTORED old row has
        # value <= the stored CUTOFF (the list's minimum). A merged entry
        # is safe at its position iff (a) the group has no unstored rows
        # at all, or (b) it outranks the cutoff outright, or (c) it WAS
        # stored (kept entries also beat unstored cutoff-ties: the
        # original sort admitted smaller pks first). A new arrival
        # at-or-below the cutoff is NOT safe — an unknown unstored row may
        # outrank it (without this, a low insert after evictions leapfrogs
        # the true runner-up; caught by the bucket-store prune-path test).
        # The stored list must stay the group's TRUE top-s or the next
        # batch's trust reasoning collapses — truncate at the first unsafe
        # position (an unsafe slack tail would later surface as a fake
        # runner-up); truncation shrinks the buffer until a rescan refills
        # it. Rescan when any of the first min(k, n') positions is unsafe
        # or the list runs short.
        s = (
            s.withColumn("__merged", prep["merged"])
            .withColumn("__n_new", prep["n_new"])
            .withColumn("__rescan", prep["needs_rescan"])
            .localCheckpoint()
        )

        patched_rows = s.filter(
            (F.col("__n_new") > 0) & ~F.col("__rescan")
        ).select(*prep["patched_sel"])
        # tiny checkpointed-frame job (see _patch_gate): on the common
        # batch (buffer never burned below k) it skips scheduling the
        # whole recompute subtree (full-store scan + window +
        # collect_list), and below the literal cap the write plan prunes
        # by IN-list instead of two broadcast exchanges (each a scheduler
        # job per batch).
        tg_vals, rescan_vals = _patch_gate(s, g)
        self.last_recompute_groups = len(rescan_vals)
        lit = len(tg_vals) <= _group_literal_cap()
        kept = (
            (base.filter(_not_in_groups(F.col(g), tg_vals)) if tg_vals else base)
            if lit
            else base.join(F.broadcast(s.select(g)), g, "left_anti")
        )
        patched = kept.unionByName(patched_rows)
        if rescan_vals:
            state = self.store.read(self.spec)
            state = (
                state.filter(F.col(g).isin(*rescan_vals))
                if lit
                else state.join(
                    F.broadcast(s.filter(F.col("__rescan")).select(g)),
                    g,
                    "left_semi",
                )
            )
            patched = patched.unionByName(self._full_agg(state))
        return m, patched, v_now


class MaintainedDistinctCountView:
    """Keep a grouped ``(group, n_rows, n_distinct)`` view — COUNT
    DISTINCT, the textbook NON-DISTRIBUTIVE aggregate — materialized
    incrementally over a CDC-fed table (the consolidation store exists so
    BI queries run against CDC-fed state, `/root/reference/docs/index.rst:9-12`;
    distinct-count panels are the canonical such query after sums and
    leaderboards).

    COUNT DISTINCT cannot be patched from the view row alone under
    inserts OR deletes (an arriving value may or may not be new; a
    leaving one may or may not be the last of its kind). The classical
    fix (Gupta & Mumick's support-relation construction) is exact: keep
    the per-(group, value) multiplicity multiset. A value's arrival is
    "new" iff its support count crosses 0 -> positive; its departure is
    "last" iff it crosses positive -> 0. Unlike MIN/MAX or TOP-K there
    is NO rescan leg, ever: the support multiset is itself
    self-maintainable, so every batch is |delta|-bounded by
    construction.

    Storage shape at 100 TB: the support multiset is O(distinct (group,
    value) pairs) — potentially table-sized — so the view must NOT
    rewrite it per batch. It lives in its own nested ``BucketStore``
    keyed on (group, value): a batch rewrites only the buckets its net
    pairs hash into, every other bucket carries forward via the
    copy-on-write manifest, and reads during the patch are pruned to
    those same buckets at path selection. The summary file (the actual
    view, O(groups)) is patched from the same joined frame's zero
    crossings.

    Crash recovery is version-anchored on BOTH stores: the view pointer
    records the base-store version AND the support version it
    incorporates. A retry re-reads those immutable versions, rewrites
    the same touched buckets with identical content (write_partial on
    top of the orphan manifest carries the same untouched buckets
    forward), and recommits — idempotent end to end. Retention on the
    support store must keep the pointer's support_version readable
    (``gc_support`` defaults to keep_last=2 for exactly that window).
    """

    def __init__(
        self,
        spark,
        store,
        spec,
        *,
        group_col: str,
        val_col: str,
        val_pg_type: str = "integer",
        view_dir: str,
        support_buckets: int = 16,
        debug_counters: bool = False,
    ):
        import os

        from connemara_spark.catalog import ColumnSpec, TableSpec
        from connemara_spark.stores import BucketStore

        self.spark = spark
        self.store = store
        self.spec = spec
        self.group_col = group_col
        self.val_col = val_col
        self.view_dir = view_dir
        self.debug_counters = debug_counters
        self.last_touched_buckets: int | None = None
        # pinned projection contract (see MaintainedAggView.__init__)
        self._need = frozenset(spec.pk_cols) | {group_col, val_col}
        os.makedirs(view_dir, exist_ok=True)
        gcol = next(c for c in spec.columns if c.name == group_col)
        # the support multiset: pk == (group, value) so the bucket key IS
        # the merge key — write_partial's stray-row check holds by
        # construction
        self.sspec = TableSpec(
            database=spec.database,
            schema=spec.schema,
            table=f"{spec.table}__distinct_support",
            columns=[
                ColumnSpec(group_col, gcol.pg_type),
                ColumnSpec("__v", val_pg_type),
                ColumnSpec("__c", "bigint"),
            ],
            pk_cols=[group_col, "__v"],
        )
        self.sstore = BucketStore(
            spark, os.path.join(view_dir, "support"), n_buckets=support_buckets
        )
        self._touched = None
        self._v_pre = None

    # -- protocol plumbing (MaintainedAggView shape) --------------------
    def _meta(self) -> dict:
        import json
        import os

        ptr = os.path.join(self.view_dir, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as fh:
                return json.load(fh)
        return {"version": 0, "store_version": None, "support_version": None}

    def read_view(self) -> DataFrame:
        import os

        m = self._meta()
        if m["version"] == 0:
            return self._full_agg(self.store.read(self.spec))
        return _vread(self, os.path.join(self.view_dir, f"v{m['version']:06d}"))

    def _val(self):
        return F.col(self.val_col).cast(self.sspec.columns[1].spark_type)

    def _full_agg(self, state: DataFrame) -> DataFrame:
        return state.groupBy(self.group_col).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(self._val()).alias("n_distinct"),
        )

    def _full_support(self, state: DataFrame) -> DataFrame:
        return (
            state.select(F.col(self.group_col), self._val().alias("__v"))
            .filter(F.col("__v").isNotNull())
            .groupBy(self.group_col, "__v")
            .agg(F.count(F.lit(1)).alias("__c"))
        )

    def _prep(self) -> dict:
        """Batch-invariant Column trees of the patch, prepared once per
        (group, value, type) signature — the same plan-fragment cache as
        the apply fold (see apply._make_fold's NOTE). Name references
        only; alias-qualified columns (``b.*``/``n.*``/``x.*``/``y.*``)
        resolve against the per-batch aliased frames identically every
        batch."""
        from connemara_spark.operators.apply import _prepared

        g = self.group_col

        def build() -> dict:
            return {
                "delta_old": [
                    F.col(g), self._val().alias("__v"), F.lit(-1).alias("__s")
                ],
                "delta_new": [
                    F.col(g), self._val().alias("__v"), F.lit(1).alias("__s")
                ],
                "per_val_agg": F.sum("__s").cast("long").alias("__dc"),
                "joined_cond": F.col(f"b.{g}").eqNullSafe(F.col(f"n.{g}"))
                & (F.col("b.__v") == F.col("n.__v")),
                "joined_sel": [
                    F.coalesce(F.col(f"b.{g}"), F.col(f"n.{g}")).alias(g),
                    F.coalesce(F.col("b.__v"), F.col("n.__v")).alias("__v"),
                    F.coalesce(F.col("b.__c"), F.lit(0))
                    .cast("long")
                    .alias("__c_old"),
                    F.col("n.__dc").alias("__dc"),
                ],
                "c_new": (
                    F.col("__c_old") + F.coalesce(F.col("__dc"), F.lit(0))
                ).cast("long"),
                "support_sel": [
                    F.col(g), F.col("__v"), F.col("__c_new").alias("__c")
                ],
                "dn_agg": F.sum("__dc").cast("long").alias("__dn"),
                "dd_agg": F.sum(
                    F.when(
                        (F.col("__c_old") == 0) & (F.col("__c_new") > 0), 1
                    )
                    .when((F.col("__c_old") > 0) & (F.col("__c_new") == 0), -1)
                    .otherwise(0)
                )
                .cast("long")
                .alias("__dd"),
                "gd_cond": F.col(f"x.{g}").eqNullSafe(F.col(f"y.{g}")),
                "gd_sel": [
                    F.coalesce(F.col(f"x.{g}"), F.col(f"y.{g}")).alias(g),
                    F.coalesce(F.col("x.__dn"), F.lit(0)).alias("__dn"),
                    F.coalesce(F.col("y.__dd"), F.lit(0)).alias("__dd"),
                ],
                "patched_cond": F.col(f"b.{g}").eqNullSafe(F.col(f"n.{g}")),
                "patched_sel": [
                    F.coalesce(F.col(f"b.{g}"), F.col(f"n.{g}")).alias(g),
                    (
                        F.coalesce(F.col("b.n_rows"), F.lit(0))
                        + F.coalesce(F.col("n.__dn"), F.lit(0))
                    )
                    .cast("long")
                    .alias("n_rows"),
                    (
                        F.coalesce(F.col("b.n_distinct"), F.lit(0))
                        + F.coalesce(F.col("n.__dd"), F.lit(0))
                    )
                    .cast("long")
                    .alias("n_distinct"),
                ],
            }

        sig = str(self.sspec.columns[1].spark_type)
        return _prepared(("dc_patch", g, self.val_col, sig), build)

    def check_schema(self, catalog) -> None:
        cur = catalog.get(self.spec.database, self.spec.schema, self.spec.table)
        need = self._need
        missing = sorted(need - set(cur.column_names))
        if missing:
            raise RuntimeError(
                f"maintained distinct-count view over {self.spec.target_name} "
                f"lost column(s) {missing} to DDL — drop and rebuild the view"
            )

    def gc_view(self, *, keep_last: int = 2) -> list[int]:
        """Retire old view version directories (see gc_view_versions)."""
        return gc_view_versions(self.view_dir, keep_last=keep_last)

    def before_apply(self, parsed_events: DataFrame) -> None:
        self._touched = touched_keys(parsed_events, self.spec)
        self._v_pre = self.store.current_version(self.spec.target_name)

    def after_apply(self) -> None:
        # static plan for the whole patch (see _static_patch_plan)
        with _static_patch_plan(self.spark):
            self._after_apply_impl()

    def _after_apply_impl(self) -> None:
        import json
        import os

        m, patched, v_now, new_support, bks = self._patch_frame()
        # support first, summary second, pointer last: every crash window
        # replays against the versions the pointer still records
        if bks is None:
            self.sstore.write(self.sspec, new_support)
            sv = self.sstore.current_version(self.sspec.target_name)
        elif not bks:
            # no net support change (bks == []): write_partial would commit
            # a content-identical manifest, churning support versions and
            # forcing more frequent gc_support for nothing — carry the
            # pointer's existing support version forward instead
            sv = m["support_version"]
        else:
            self.sstore.write_partial(self.sspec, new_support, buckets=bks)
            sv = self.sstore.current_version(self.sspec.target_name)
        v = m["version"] + 1
        patched.write.mode("overwrite").parquet(
            os.path.join(self.view_dir, f"v{v:06d}")
        )
        tmp = os.path.join(self.view_dir, "CURRENT.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": v, "store_version": v_now, "support_version": sv}, fh)
        os.replace(tmp, os.path.join(self.view_dir, "CURRENT"))
        self._touched = self._v_pre = None

    def gc_support(self, *, keep_last: int = 2) -> list[int]:
        """Retire old support versions (reference-counted); keep_last >= 2
        keeps the pointer's support_version readable across a crash-retry
        window."""
        return self.sstore.gc_versions(self.sspec, keep_last=keep_last)

    # -- the patch ------------------------------------------------------
    def _patch_frame(self):
        import os

        m = self._meta()
        applied = m["store_version"] if m["version"] > 0 else self._v_pre
        prune = hasattr(self.store, "buckets_of") and m["version"] > 0
        if prune:
            base_bks = self.store.buckets_of(self.spec, self._touched)
            old = (
                self.store.read_version(self.spec, applied, buckets=base_bks)
                if applied
                else self.spark.createDataFrame([], self.spec.spark_schema())
            )
            new = self.store.read_buckets(self.spec, base_bks)
        else:
            old = (
                self.store.read_version(self.spec, applied)
                if applied
                else self.spark.createDataFrame([], self.spec.spark_schema())
            )
            new = self.store.read(self.spec)
        v_now = self.store.current_version(self.spec.target_name)

        pk = list(self.spec.pk_cols)
        t = F.broadcast(self._touched)
        g = self.group_col
        prep = self._prep()  # batch-invariant Column trees (see _prep)
        old_t = old.join(t, on=pk, how="left_semi")
        new_t = new.join(t, on=pk, how="left_semi")

        # the batch as a signed value multiset at the touched keys (state
        # diff, not event rows — TOAST updates and PK splits are already
        # folded), pre-aggregated to (group, value) BEFORE materializing:
        # both consumers (the support net pairs and the per-group row-count
        # delta) derive from the per-value net counts, so checkpointing the
        # |touched (group,value) pairs|-sized fold replaces checkpointing
        # the row-level delta — fewer checkpoint bytes and one aggregation
        # exchange instead of two over the row-level frame
        deltas = old_t.select(*prep["delta_old"]).unionByName(
            new_t.select(*prep["delta_new"])
        )
        per_val = (
            deltas.groupBy(g, "__v").agg(prep["per_val_agg"]).localCheckpoint()
        )
        net_pairs = per_val.filter(
            F.col("__v").isNotNull() & (F.col("__dc") != 0)
        )

        if m["version"] == 0:
            # bootstrap: the support of the whole pre-batch state (one-time
            # full aggregate, like the other maintainers' base bootstrap)
            base_support = self._full_support(old)
            bks = None
        else:
            bks = self.sstore.buckets_of(self.sspec, net_pairs.select(g, "__v"))
            # version-anchored read: the COMMITTED support version, pruned
            # to the net pairs' buckets at path selection
            base_support = self.sstore.read_version(
                self.sspec, m["support_version"], buckets=bks
            )
        if self.debug_counters:
            self.last_touched_buckets = None if bks is None else len(bks)

        b = base_support.alias("b")
        n = net_pairs.alias("n")
        joined = (
            b.join(n, prep["joined_cond"], "full_outer")
            .select(*prep["joined_sel"])
            .withColumn("__c_new", prep["c_new"])
            # one materialization, two consumers (support rewrite + the
            # zero-crossing summary patch)
            .localCheckpoint()
        )
        # the complete new state of the touched buckets (untouched
        # co-resident pairs pass through via the full outer's base side)
        new_support = joined.filter(F.col("__c_new") > 0).select(
            *prep["support_sel"]
        )

        dn = per_val.groupBy(F.col(g)).agg(prep["dn_agg"])
        dd = (
            joined.filter(F.col("__dc").isNotNull())
            .groupBy(F.col(g))
            .agg(prep["dd_agg"])
        )
        x = dn.alias("x")
        y = dd.alias("y")
        gd = x.join(y, prep["gd_cond"], "full_outer").select(*prep["gd_sel"])

        base = (
            self._full_agg(old)
            if m["version"] == 0
            else _vread(self, os.path.join(self.view_dir, f"v{m['version']:06d}"))
        )
        bb = base.alias("b")
        nn = gd.alias("n")
        patched = (
            bb.join(nn, prep["patched_cond"], "full_outer")
            .select(*prep["patched_sel"])
            .filter(F.col("n_rows") > 0)
        )
        return m, patched, v_now, new_support, bks
