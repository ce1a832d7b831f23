"""Persisted IVF-PQ index: build/load lifecycle, path identity, staleness."""

from __future__ import annotations

import json
import os

import pytest


def _emb(spark, sf_dir):
    from connemara_spark.queries import load, spread

    return spread(load(spark, sf_dir, "embeddings")).select("vec_id", "embedding")


PARAMS = dict(dim=64, n_cells=32, m=8, k_cb=16, seed=42, train_seed=3)


def test_indexed_path_matches_in_session(spark, sf_dir, tmp_path):
    """The persisted-index query path returns row-identical results to the
    in-session ivfpq_topk with the same trained books — the two paths share
    _ivfpq_rank, and this pins the artifact roundtrip (f32 books through
    double parquet, codes through int arrays, cells through partition
    values)."""
    from connemara_spark.operators.annindex import build_ann_index, ivfpq_topk_indexed
    from connemara_spark.operators.similarity import ivfpq_topk, pq_train_codebooks

    emb = _emb(spark, sf_dir)
    d = str(tmp_path / "idx")
    build_ann_index(emb, d, **PARAMS)
    got = ivfpq_topk_indexed(emb, d, k=10, n_probe=4, rerank=50)

    books = pq_train_codebooks(emb, k_cb=16)
    want = ivfpq_topk(emb, k=10, n_cells=32, n_probe=4, codebooks=books, rerank=50)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_fresh_session_load_and_commit_protocol(spark, sf_dir, tmp_path):
    """load_ann_index needs only the directory (deployment shape: a fresh
    session reads the artifact, no retraining); an uncommitted build (no
    META) refuses to load."""
    from connemara_spark.operators.annindex import (
        build_ann_index, load_ann_index,
    )

    d = str(tmp_path / "idx")
    with pytest.raises(FileNotFoundError):
        load_ann_index(spark, d)

    emb = _emb(spark, sf_dir)
    meta_written = build_ann_index(emb, d, **PARAMS)
    meta, books, entries = load_ann_index(spark, d)
    assert meta == meta_written
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(cw) == 8 for b in books for cw in b)
    n = emb.count()
    assert entries.count() == n
    # every vector coded, cells within range, partition pruning available
    assert entries.filter("cell < 0 OR cell >= 32").count() == 0
    cell_dirs = [e for e in os.listdir(os.path.join(d, "entries.parquet")) if e.startswith("cell=")]
    assert len(cell_dirs) > 1  # cell-partitioned layout on disk


def test_ensure_rebuilds_on_stale_fingerprint(spark, sf_dir, tmp_path):
    """A source-data change (regenerated testdata) or a param change makes
    ensure_ann_index rebuild instead of serving the stale artifact."""
    from connemara_spark.operators.annindex import ensure_ann_index

    emb = _emb(spark, sf_dir)
    d = str(tmp_path / "idx")
    src = os.path.join(sf_dir, "embeddings.parquet")
    ensure_ann_index(emb, d, source_path=src, **PARAMS)
    meta_path = os.path.join(d, "META.json")
    t0 = os.path.getmtime(meta_path)

    # same source + params: served, not rebuilt
    ensure_ann_index(emb, d, source_path=src, **PARAMS)
    assert os.path.getmtime(meta_path) == t0

    # tampered fingerprint simulates regenerated source data: rebuild
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta["source_fingerprint"] = "stale"
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    ensure_ann_index(emb, d, source_path=src, **PARAMS)
    with open(meta_path) as fh:
        assert json.load(fh)["source_fingerprint"] != "stale"

    # param change: rebuild
    changed = dict(PARAMS, n_cells=16)
    ensure_ann_index(emb, d, source_path=src, **changed)
    with open(meta_path) as fh:
        assert json.load(fh)["n_cells"] == 16


def test_entries_partition_pruning(spark, sf_dir, tmp_path):
    """A probe-side read filtered to specific cells prunes the entries scan
    at the partition level (PartitionFilters, not a post-scan filter) —
    the on-disk inverted-list property the cell-partitioned layout exists
    for."""
    from connemara_spark.operators.annindex import build_ann_index

    emb = _emb(spark, sf_dir)
    d = str(tmp_path / "idx")
    build_ann_index(emb, d, **PARAMS)
    entries = spark.read.parquet(os.path.join(d, "entries.parquet"))
    probed = entries.filter(entries.cell.isin(3, 7))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    part = plan.split("PartitionFilters", 1)
    assert len(part) == 2 and "cell" in part[1][:200], plan
    # the cell predicate is handled at the partition level, not re-checked
    # per row after the scan
    data_filters = part[1].split("PushedFilters", 1)[0]
    assert "cell" in data_filters
    assert set(r["cell"] for r in probed.select("cell").distinct().collect()) <= {3, 7}


def test_incremental_append_matches_one_shot_build(spark, sf_dir, tmp_path):
    """Streaming-ingest path: vectors appended to a committed index (coded
    with the frozen books, parquet append into their cells only) serve
    queries row-identically to coding everything in one build with the
    same books."""
    from connemara_spark.operators.annindex import (
        append_to_ann_index, build_ann_index, ivfpq_topk_indexed, load_ann_index,
    )
    from connemara_spark.operators.similarity import ivfpq_topk

    emb = _emb(spark, sf_dir)
    half_a = emb.filter("vec_id % 2 = 0")
    half_b = emb.filter("vec_id % 2 = 1")

    d = str(tmp_path / "idx")
    build_ann_index(half_a, d, **PARAMS)
    meta, books, entries0 = load_ann_index(spark, d)
    n0 = entries0.count()

    append_to_ann_index(half_b, d)
    meta2, books2, entries1 = load_ann_index(spark, d)
    assert books2 == books  # frozen at train time
    assert entries1.count() == emb.count() and n0 == half_a.count()

    got = ivfpq_topk_indexed(emb, d, k=10, n_probe=4, rerank=50)
    want = ivfpq_topk(emb, k=10, n_cells=32, n_probe=4, codebooks=books, rerank=50)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_append_crash_retry_does_not_duplicate(spark, sf_dir, tmp_path):
    """A crashed append (staging dir written, META never renamed) is
    invisible to readers, and the retry overwrites the same staging dir —
    no duplicate vectors ever reach the query path, where they could fill
    multiple top-k slots and displace true neighbors."""
    import json

    from connemara_spark.operators.annindex import (
        _append_dir, append_to_ann_index, build_ann_index, load_ann_index,
    )

    emb = _emb(spark, sf_dir)
    half_a = emb.filter("vec_id % 2 = 0")
    half_b = emb.filter("vec_id % 2 = 1")
    d = str(tmp_path / "idx")
    build_ann_index(half_a, d, **PARAMS)

    # simulate the crash: the staged batch directory exists (copied from a
    # real append, then rolled back in META) but META never named it
    append_to_ann_index(half_b, d, batch_id="1")
    meta_path = os.path.join(d, "META.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta["appends"] = []
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    _, _, entries = load_ann_index(spark, d)
    assert entries.count() == half_a.count()  # orphan staging dir invisible

    # blind retry lands on the same batch id, overwrites the orphan
    append_to_ann_index(half_b, d)
    _, _, entries2 = load_ann_index(spark, d)
    assert entries2.count() == emb.count()
    assert entries2.select("vec_id").distinct().count() == emb.count()

    # re-appending a COMMITTED batch id is refused
    with pytest.raises(ValueError, match="already committed"):
        append_to_ann_index(half_b, d, batch_id="1")


def test_compact_merges_appends_into_one_generation(spark, sf_dir, tmp_path):
    """Compaction merges base + committed appends into one new entries
    generation with a single atomic META flip (entries_dir + appends
    cleared together — no read window sees appends twice or not at all),
    sweeps the retired dirs, and serves row-identical queries."""
    from connemara_spark.operators.annindex import (
        append_to_ann_index, build_ann_index, compact_ann_index,
        ivfpq_topk_indexed, load_ann_index,
    )

    emb = _emb(spark, sf_dir)
    half_a = emb.filter("vec_id % 2 = 0")
    half_b = emb.filter("vec_id % 2 = 1")
    d = str(tmp_path / "idx")
    build_ann_index(half_a, d, **PARAMS)
    append_to_ann_index(half_b, d)
    before = sorted(map(tuple, ivfpq_topk_indexed(emb, d, k=5, n_probe=4).collect()))

    meta = compact_ann_index(spark, d)
    assert meta["appends"] == [] and meta["entries_dir"] == "entries-g001.parquet"
    assert not os.path.isdir(os.path.join(d, "appends"))
    assert not os.path.isdir(os.path.join(d, "entries.parquet"))
    _, _, entries = load_ann_index(spark, d)
    assert entries.count() == emb.count()
    after = sorted(map(tuple, ivfpq_topk_indexed(emb, d, k=5, n_probe=4).collect()))
    assert after == before

    # idempotent no-op when nothing to merge
    assert compact_ann_index(spark, d)["generation"] == 1
    # the chain continues: append + compact again -> generation 2
    append_to_ann_index(half_b.limit(0), d)  # empty batch still commits
    compact_ann_index(spark, d)
    m2, _, entries2 = load_ann_index(spark, d)
    assert m2["generation"] == 2 and entries2.count() == emb.count()


def test_noop_compact_sweeps_crash_orphans(spark, sf_dir, tmp_path):
    """A crash between the compact's META flip and its post-commit sweep
    leaves the retired generation + appends tree on disk. With an EMPTY
    appends list, the next compact has nothing to merge — but it must
    still sweep those orphans rather than letting them linger until new
    appends accumulate (the docstring's 'a later compact removes' claim)."""
    import shutil

    from connemara_spark.operators.annindex import (
        append_to_ann_index, build_ann_index, compact_ann_index,
        load_ann_index,
    )

    emb = _emb(spark, sf_dir)
    d = str(tmp_path / "idx")
    build_ann_index(emb.filter("vec_id % 2 = 0"), d, **PARAMS)
    append_to_ann_index(emb.filter("vec_id % 2 = 1"), d)
    compact_ann_index(spark, d)

    # simulate the mid-sweep crash: resurrect a retired generation and an
    # uncommitted append staging dir that the crashed sweep never removed
    shutil.copytree(
        os.path.join(d, "entries-g001.parquet"), os.path.join(d, "entries.parquet")
    )
    shutil.copytree(
        os.path.join(d, "entries-g001.parquet"), os.path.join(d, "appends", "b9")
    )

    meta = compact_ann_index(spark, d)  # nothing to merge — still sweeps
    assert meta["generation"] == 1  # no new generation was written
    assert not os.path.isdir(os.path.join(d, "entries.parquet"))
    assert not os.path.isdir(os.path.join(d, "appends"))
    _, _, entries = load_ann_index(spark, d)
    assert entries.count() == emb.count()
    assert entries.select("vec_id").distinct().count() == emb.count()


def test_randomized_index_lifecycle_against_model(spark, sf_dir, tmp_path):
    """Model-based lifecycle fuzz for the persisted index: a seeded random
    sequence of appends, crash-orphaned appends (staged dir without META
    commit), blind retries, and compactions must keep the visible entry
    set equal to a model of committed vec_ids — never a duplicate, never
    a lost batch — and keep load round-trippable."""
    import random

    from pyspark.sql import functions as F

    from connemara_spark.operators.annindex import (
        _append_dir, append_to_ann_index, build_ann_index, compact_ann_index,
        delete_from_ann_index, load_ann_index, upsert_into_ann_index,
    )

    rng = random.Random(77)
    emb = _emb(spark, sf_dir)
    n = emb.count()
    base_ids = {r[0] for r in emb.filter("vec_id % 4 = 0").select("vec_id").collect()}
    remaining = sorted(
        r[0] for r in emb.filter("vec_id % 4 != 0").select("vec_id").collect()
    )
    d = str(tmp_path / "idx")
    build_ann_index(emb.filter("vec_id % 4 = 0"), d, **PARAMS)
    model = set(base_ids)
    pending_crash = None  # batch whose staging dir exists but META never named it

    for step in range(12):
        op = rng.choice(["append", "crash", "retry", "compact", "delete", "upsert"])
        if op == "delete" and len(model) > 5:
            take = sorted(rng.sample(sorted(model), rng.randint(1, 10)))
            delete_from_ann_index(
                emb.filter(F.col("vec_id").isin(take)).select("vec_id"),
                d,
                batch_id=f"del{step}",
            )
            model -= set(take)
            remaining.extend(take)  # deleted ids may be re-appended later
        elif op == "upsert" and len(model) > 5:
            # identity upsert: same vector under the same id — exercises
            # the paired tombstone+append without changing the model set
            take = sorted(rng.sample(sorted(model), rng.randint(1, 10)))
            upsert_into_ann_index(
                emb.filter(F.col("vec_id").isin(take)), d, batch_id=f"ups{step}"
            )
        elif op == "append" and remaining:
            take = [remaining.pop() for _ in range(min(len(remaining), rng.randint(5, 40)))]
            batch = emb.filter(F.col("vec_id").isin(take))
            append_to_ann_index(batch, d)
            model |= set(take)
        elif op == "crash" and remaining and pending_crash is None:
            # stage-by-append then roll META back: the on-disk state of a
            # crash between the parquet write and the META rename
            take = [remaining.pop() for _ in range(min(len(remaining), rng.randint(5, 20)))]
            batch = emb.filter(F.col("vec_id").isin(take))
            import json as _json

            with open(os.path.join(d, "META.json")) as fh:
                before = _json.load(fh)
            meta = append_to_ann_index(batch, d)
            crashed_id = meta["appends"][-1]
            with open(os.path.join(d, "META.json"), "w") as fh:
                _json.dump(before, fh)
            pending_crash = (crashed_id, take)
        elif op == "retry" and pending_crash is not None:
            crashed_id, take = pending_crash
            batch = emb.filter(F.col("vec_id").isin(take))
            append_to_ann_index(batch, d, batch_id=crashed_id)
            model |= set(take)
            pending_crash = None
        elif op == "compact":
            compact_ann_index(spark, d)
            if pending_crash is not None and not os.path.isdir(
                _append_dir(d, pending_crash[0])
            ):
                # compaction swept the orphan staging dir with appends/;
                # its ids were never committed, so the model is unchanged
                # and a later retry would stage fresh — drop the pending
                remaining.extend(pending_crash[1])
                pending_crash = None

        _, _, entries = load_ann_index(spark, d)
        got = {r[0] for r in entries.select("vec_id").collect()}
        assert got == model, f"step {step} after {op}: {len(got)} vs {len(model)}"
        assert entries.count() == len(model)  # no duplicates hiding in the bag


def test_delete_upsert_readd_visibility(spark, sf_dir, tmp_path):
    """Tombstone semantics in mutation-log order: a delete hides ids
    without touching the entries trees; an append AFTER the delete serves
    the id again; an upsert's paired tombstone+append serves exactly the
    new vector's codes (pinned against the partner id's original entry,
    same frozen books); compaction folds it all into one generation with
    the visible set unchanged."""
    from pyspark.sql import functions as F

    from connemara_spark.operators.annindex import (
        append_to_ann_index, build_ann_index, compact_ann_index,
        delete_from_ann_index, load_ann_index, upsert_into_ann_index,
    )

    emb = _emb(spark, sf_dir)
    d = str(tmp_path / "idx")
    build_ann_index(emb, d, **PARAMS)
    n = emb.count()
    hi = emb.agg(F.max("vec_id")).collect()[0][0]
    lo = emb.agg(F.min("vec_id")).collect()[0][0]

    def visible():
        _, _, e = load_ann_index(spark, d)
        return {r["vec_id"]: r["codes"] for r in e.collect()}

    before = visible()
    assert len(before) == n

    # delete every 5th id — entries trees untouched, ids hidden at read
    del_ids = emb.filter("vec_id % 5 = 0").select("vec_id")
    n_del = del_ids.count()
    delete_from_ann_index(del_ids, d)
    after_del = visible()
    assert len(after_del) == n - n_del
    assert all(k % 5 != 0 for k in after_del)

    # re-append a deleted id: the LATER append outranks the tombstone
    readd = emb.filter("vec_id % 25 = 0")
    n_readd = readd.count()
    assert n_readd > 0
    append_to_ann_index(readd, d)
    after_readd = visible()
    assert len(after_readd) == n - n_del + n_readd
    assert all(k % 25 == 0 for k in after_readd if k % 5 == 0)

    # upsert: ids % 5 == 1 get their PARTNER's vector (lo+hi-id); the
    # served codes must flip to the partner's original codes
    ups_src = emb.filter("vec_id % 5 = 1").select(
        "vec_id", (F.lit(lo) + F.lit(hi) - F.col("vec_id")).alias("partner")
    )
    partner_vecs = ups_src.join(
        emb.select(F.col("vec_id").alias("partner"), "embedding"), "partner"
    ).select("vec_id", "embedding")
    upsert_into_ann_index(partner_vecs, d)
    after_ups = visible()
    assert set(after_ups) == set(after_readd)  # same live ids, new vectors
    for r in ups_src.collect():
        vid, partner = r["vec_id"], r["partner"]
        assert after_ups[vid] == before[partner], (vid, partner)
        if partner % 5 not in (0, 1) or partner % 25 == 0:
            # partner itself still serves its original vector
            assert after_ups.get(partner, before[partner]) == before[partner]

    # compaction folds tombstones: one generation, same visible map
    meta = compact_ann_index(spark, d)
    assert meta["appends"] == [] and meta["deletes"] == [] and meta["log"] == []
    assert not os.path.isdir(os.path.join(d, "deletes"))
    assert visible() == after_ups


def test_cdc_batch_atomic_and_exactly_once(spark, sf_dir, tmp_path):
    """apply_cdc_to_ann_index: one micro-batch mixing deletes and upserts
    (including a delete+re-upsert of the SAME id, which must serve the
    upserted vector) commits atomically; replaying the same batch id
    raises — the exactly-once hook StreamingAnnCdc relies on."""
    import pytest
    from pyspark.sql import functions as F

    from connemara_spark.operators.annindex import (
        apply_cdc_to_ann_index, build_ann_index, load_ann_index,
    )

    emb = _emb(spark, sf_dir)
    d = str(tmp_path / "idx")
    build_ann_index(emb, d, **PARAMS)
    n = emb.count()
    lo = emb.agg(F.min("vec_id")).collect()[0][0]
    hi = emb.agg(F.max("vec_id")).collect()[0][0]
    _, _, e0 = load_ann_index(spark, d)
    before = {r["vec_id"]: r["codes"] for r in e0.collect()}

    deletes = emb.filter("vec_id % 7 = 0").select(
        "vec_id", F.lit(None).cast("array<float>").alias("embedding"),
        F.lit("delete").alias("op"),
    )
    # ids % 14 == 0 are in the delete set AND re-upserted in the same
    # batch with the partner vector — the upsert must win
    ups = (
        emb.filter("vec_id % 14 = 0")
        .select("vec_id", (F.lit(lo) + F.lit(hi) - F.col("vec_id")).alias("p"))
        .join(emb.select(F.col("vec_id").alias("p"), "embedding"), "p")
        .select("vec_id", "embedding", F.lit("upsert").alias("op"))
    )
    batch = deletes.unionByName(ups)
    apply_cdc_to_ann_index(batch, d, batch_id="stream-1")

    _, _, e1 = load_ann_index(spark, d)
    after = {r["vec_id"]: r["codes"] for r in e1.collect()}
    n_del = deletes.count()
    n_ups = ups.count()
    assert len(after) == n - n_del + n_ups
    for k, codes in after.items():
        if k % 14 == 0:
            assert codes == before[lo + hi - k]
        else:
            assert k % 7 != 0 and codes == before[k]

    with pytest.raises(ValueError, match="already committed"):
        apply_cdc_to_ann_index(batch, d, batch_id="stream-1")


def test_indexed_topk_never_serves_deleted_ids(spark, sf_dir, tmp_path):
    """The query path composes with tombstones for free (ivfpq_topk_indexed
    reads the visible view): deleted ids never appear as neighbors, and
    surviving neighbors are exactly the full-index results with the
    deleted candidates removed (deletion never reorders survivors)."""
    from connemara_spark.operators.annindex import (
        build_ann_index, delete_from_ann_index, ivfpq_topk_indexed,
    )

    emb = _emb(spark, sf_dir)
    d = str(tmp_path / "idx")
    build_ann_index(emb, d, **PARAMS)
    full = ivfpq_topk_indexed(emb, d, k=5, n_probe=4).collect()

    delete_from_ann_index(emb.filter("vec_id % 3 = 0").select("vec_id"), d)
    got = ivfpq_topk_indexed(emb, d, k=5, n_probe=4).collect()
    assert got and all(r["neighbor_id"] % 3 != 0 for r in got)

    # per query: survivors of the full top-5 must lead the new top-5 in
    # the same order (set semantics on the tail are fine — removing a
    # candidate admits the next one)
    from collections import defaultdict

    full_by_q = defaultdict(list)
    for r in sorted(full, key=lambda r: (r["query_id"], r["rank"])):
        if r["neighbor_id"] % 3 != 0:
            full_by_q[r["query_id"]].append(r["neighbor_id"])
    got_by_q = defaultdict(list)
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        got_by_q[r["query_id"]].append(r["neighbor_id"])
    for q, survivors in full_by_q.items():
        assert got_by_q[q][: len(survivors)] == survivors, q


def test_trained_centroids_balance_skewed_data_and_append_consistently(spark, sf_dir, tmp_path):
    """centroid_mode='trained': on a distribution the literal centroid grid
    does not cover (all-positive hash vectors — the ann_query_probe2
    finding: a handful of literal cells swallow the corpus and candidate
    volume explodes), k-means-trained coarse centroids must spread the
    inverted lists, and every later path (append, query) must read the
    PERSISTED centroids so cell assignment stays consistent for the
    index's lifetime."""
    from pyspark.sql import functions as F

    from connemara_spark.operators.annindex import (
        append_to_ann_index, build_ann_index, ivfpq_topk_indexed, load_ann_index,
    )

    dim, n = 64, 20000
    emb_expr = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("id") * dim + j, F.lit(0)), F.lit(997))
            / F.lit(997.0)
        ).cast("float"),
    )
    vecs = spark.range(n).select(F.col("id").alias("vec_id"), emb_expr.alias("embedding"))
    params = dict(dim=dim, n_cells=32, m=8, k_cb=16, sample_n=4000, iters=8)

    def hist(d):
        _, _, e = load_ann_index(spark, d)
        return {r["cell"]: r["n"] for r in e.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}

    d_lit = str(tmp_path / "lit")
    build_ann_index(vecs, d_lit, **params)
    d_tr = str(tmp_path / "tr")
    build_ann_index(vecs, d_tr, centroid_mode="trained", **params)

    h_lit, h_tr = hist(d_lit), hist(d_tr)
    assert sum(h_lit.values()) == sum(h_tr.values()) == n
    # the literal grid collapses this distribution; trained cells spread it
    assert max(h_tr.values()) < max(h_lit.values())
    assert max(h_tr.values()) < 5 * (n // 32)  # no mega-cell after training

    # append path reads the persisted trained centroids: build(half) +
    # append(half) must serve queries identically to one-shot build(all)
    half_a = vecs.filter("vec_id % 2 = 0")
    half_b = vecs.filter("vec_id % 2 = 1")
    d_inc = str(tmp_path / "inc")
    build_ann_index(half_a, d_inc, centroid_mode="trained", **params)
    append_to_ann_index(half_b, d_inc)
    d_one = str(tmp_path / "one")
    # one-shot twin trained on the SAME sample: restrict training input to
    # half_a's rows via the same sample_n over half_a
    build_ann_index(half_a, d_one, centroid_mode="trained", **params)
    append_to_ann_index(half_b, d_one, batch_id="x")
    q = vecs.filter("vec_id < 200")
    got = ivfpq_topk_indexed(q, d_inc, k=5, n_probe=4).collect()
    want = ivfpq_topk_indexed(q, d_one, k=5, n_probe=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    meta, _, _ = load_ann_index(spark, d_inc)
    assert meta["centroid_mode"] == "trained" and len(meta["centroids"]) == 32
