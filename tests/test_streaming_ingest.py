"""Streaming corpus ingest: cross-batch dedup via the corpus anti-join,
quality/repetition gating, idempotent replay."""

from __future__ import annotations

import pytest

from connemara_spark.streaming.ingest import RAW_DOC_SCHEMA, StreamingCorpusIngest

GOOD = (
    "the quick brown fox jumps over the lazy dog and keeps running through "
    "distinct meadows with many varied interesting words in long sentences"
)
SPAMMY = "buy buy buy buy buy buy buy buy buy buy"


def _land(spark, rows, landing_dir):
    spark.createDataFrame(rows, RAW_DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing_dir)


def _ingest(spark, tmp_path, **kw):
    return StreamingCorpusIngest(
        spark,
        landing_dir=str(tmp_path / "landing"),
        corpus_dir=str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        **kw,
    )


def test_ingest_dedups_within_and_across_batches(spark, tmp_path):
    ing = _ingest(spark, tmp_path)
    landing = str(tmp_path / "landing")

    # batch 1: two copies of the same text -> one survivor (smallest id)
    _land(spark, [(1, GOOD, "en", "s1"), (2, GOOD, "en", "s1"),
                  (3, GOOD + " extra tail", "en", "s2")], landing)
    ing.run_until_drained()
    got = spark.read.parquet(str(tmp_path / "corpus"))
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 3]

    # batch 2: re-crawl of doc 1's text under a new id + one new doc ->
    # only the new doc appends
    _land(spark, [(10, GOOD, "en", "s3"), (11, GOOD + " genuinely new words", "en", "s3")], landing)
    ing.run_until_drained()
    got = spark.read.parquet(str(tmp_path / "corpus"))
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 3, 11]
    # content hash is materialized for downstream exact-dedup consumers
    assert len({r["content_md5"] for r in got.collect()}) == 3


def test_ingest_rejects_repetitive_and_low_quality(spark, tmp_path):
    ing = _ingest(spark, tmp_path, min_quality=0.3)
    _land(spark, [(1, GOOD, "en", "s"), (2, SPAMMY, "en", "s")],
          str(tmp_path / "landing"))
    ing.run_until_drained()
    got = spark.read.parquet(str(tmp_path / "corpus")).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["quality_score"] >= 0.3 and got[0]["top_word_frac"] <= 0.2


def test_ingest_checkpoint_makes_replay_idempotent(spark, tmp_path):
    ing = _ingest(spark, tmp_path)
    _land(spark, [(1, GOOD, "en", "s")], str(tmp_path / "landing"))
    ing.run_until_drained()
    # drain again with nothing new: checkpoint skips the seen file, corpus
    # unchanged
    ing.run_until_drained()
    got = spark.read.parquet(str(tmp_path / "corpus")).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Re-arrivals of the same doc within the watermark horizon are dropped
    with bounded state; each key emits exactly once."""
    from datetime import datetime

    from pyspark.sql import types as T

    from connemara_spark.streaming.ingest import streaming_dedup_within_watermark

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def land(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(landing)

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            streaming_dedup_within_watermark(stream, keys=["doc_id"], delay="30 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()

    t0 = datetime(2024, 3, 1, 10, 0, 0)
    t1 = datetime(2024, 3, 1, 10, 10, 0)
    land([(1, t0, "a"), (2, t0, "b"), (1, t0, "a-dup-same-batch")])
    drain()
    # second query run, same checkpoint: a re-arrival of doc 1 within the
    # horizon plus a genuinely new doc
    land([(1, t1, "a-dup-next-batch"), (3, t1, "c")])
    drain()

    rows = spark.read.parquet(out).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [1, 2, 3]  # every key exactly once


def test_streaming_neardup_cross_batch(spark, tmp_path):
    """Near-copies (edited re-crawls) are suppressed across micro-batches
    via the persisted LSH band index; genuinely new docs append, and the
    index sidecars track exactly the corpus contents."""
    from connemara_spark.streaming.ingest import StreamingNearDupIngest

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four five"
    )
    near = base.replace("zulu", "edited") + " six"          # high jaccard vs base
    distinct_doc = (
        "completely different content talking about spark shuffles and "
        "parquet footers with no overlapping shingles at all in any window "
        "of five consecutive words anywhere across this entire document"
    )

    ing = StreamingNearDupIngest(
        spark,
        landing_dir=str(tmp_path / "landing"),
        corpus_dir=str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_dir=str(tmp_path / "lsh"),
        jaccard_threshold=0.5,
    )
    landing = str(tmp_path / "landing")

    # batch 1: base + an in-batch near-copy -> smallest id survives
    _land(spark, [(1, base, "en", "s"), (2, near, "en", "s")], landing)
    ing.run_until_drained()
    got = sorted(r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus")).collect())
    assert got == [1]

    # batch 2: a cross-batch near-copy of doc 1 + a genuinely new doc
    _land(spark, [(10, near, "en", "s"), (11, distinct_doc, "en", "s")], landing)
    ing.run_until_drained()
    got = sorted(r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus")).collect())
    assert got == [1, 11]

    # index sidecars cover exactly the corpus docs
    sig_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "lsh/sigs")).collect()
    )
    assert sig_ids == [1, 11]
    bands = spark.read.parquet(str(tmp_path / "lsh/bands"))
    assert sorted(set(r["doc_id"] for r in bands.collect())) == [1, 11]
    assert bands.count() == 2 * 32  # 32 band keys per doc


@pytest.mark.slow  # endurance: see pytest.ini — run with -m 'slow or not slow'
def test_streaming_neardup_agrees_with_batch_ground_truth(spark, tmp_path, sf_dir):
    """Ingest the real documents table in three micro-batches: afterwards no
    surviving pair may be a batch-LSH near-duplicate (est >= threshold on
    full signatures), i.e. the streaming path reaches the batch operator's
    dedup fixpoint for pairs it can see via exact band collisions."""
    from pyspark.sql import functions as F

    from connemara_spark.operators.dedup import minhash_sig_expr, word_shingle_hashes
    from connemara_spark.streaming.ingest import StreamingNearDupIngest

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
        .filter(F.col("doc_id") < 120)
    )
    ing = StreamingNearDupIngest(
        spark,
        landing_dir=str(tmp_path / "landing"),
        corpus_dir=str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_dir=str(tmp_path / "lsh"),
        jaccard_threshold=0.5,
        min_quality=-1.0,
        reject_repetitive=False,
    )
    for lo, hi in ((0, 40), (40, 80), (80, 120)):
        (docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
             .coalesce(1).write.mode("append").parquet(str(tmp_path / "landing")))
        ing.run_until_drained()

    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    sigs = corpus.select(
        "doc_id", word_shingle_hashes("text", 5).alias("hs")
    ).select("doc_id", minhash_sig_expr("hs").alias("sig"))
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb"))
    est = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "est",
            F.size(F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda m: m)) / F.lit(64.0),
        )
    )
    # surviving corpus must contain no pair with full-signature agreement
    # above the threshold (the estimator the cross-batch probe uses)
    bad = est.filter(F.col("est") >= 0.5).count()
    assert bad == 0
    # and it must not be trivially empty — real docs largely survive
    assert corpus.count() >= 100


def test_streaming_ann_ingest_bootstrap_append_and_replay(spark, sf_dir, tmp_path):
    """Streaming ANN index maintenance: the first drain bootstraps the
    index from the first micro-batch (frozen books), later drains append
    their batches META-gated; queries over the streamed index are
    row-identical to a one-shot build with the same books, and a
    checkpoint-replayed micro-batch is an idempotent skip — no vector is
    indexed twice."""
    import os

    from connemara_spark.operators.annindex import load_ann_index, ivfpq_topk_indexed
    from connemara_spark.operators.similarity import ivfpq_topk
    from connemara_spark.streaming.ingest import StreamingAnnIngest

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    half_a = emb.filter("vec_id % 2 = 0")
    half_b = emb.filter("vec_id % 2 = 1")

    landing = str(tmp_path / "landing")
    ingest = StreamingAnnIngest(
        spark,
        landing_dir=landing,
        index_dir=str(tmp_path / "idx"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        build_params=dict(n_cells=32, m=8, k_cb=16, sample_n=2000, iters=4),
    )
    # batch 1 bootstraps (trains + builds), batch 2 appends frozen-book
    half_a.repartition(1).write.mode("append").parquet(landing)
    ingest.run_until_drained()
    meta, books, entries = load_ann_index(spark, str(tmp_path / "idx"))
    assert entries.count() == half_a.count() and ingest.batches_appended == 1

    half_b.repartition(1).write.mode("append").parquet(landing)
    ingest.run_until_drained()
    _, books2, entries2 = load_ann_index(spark, str(tmp_path / "idx"))
    assert books2 == books  # frozen at bootstrap
    assert entries2.count() == emb.count()

    # streamed index serves queries identically to the in-session path
    got = ivfpq_topk_indexed(emb, str(tmp_path / "idx"), k=5, n_probe=4, rerank=50)
    want = ivfpq_topk(emb, k=5, n_cells=32, n_probe=4, codebooks=books, rerank=50)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # crash-replay simulation: the same stream batch id fires again after
    # its append committed (checkpoint lost the commit) — idempotent skip
    ingest._foreach_batch(half_b, 1)
    assert ingest.batches_skipped == 1
    _, _, entries3 = load_ann_index(spark, str(tmp_path / "idx"))
    assert entries3.count() == emb.count()
    assert entries3.select("vec_id").distinct().count() == emb.count()

    # BOOTSTRAP crash-replay: a crash between build_ann_index committing
    # META and the stream checkpoint advancing replays batch 0 against an
    # existing META — the bootstrap_batch marker makes it a skip, not a
    # re-append that would duplicate every bootstrap vector
    assert meta.get("bootstrap_batch") == "stream-0"
    ingest._foreach_batch(half_a, 0)
    assert ingest.batches_skipped == 2
    _, _, entries4 = load_ann_index(spark, str(tmp_path / "idx"))
    assert entries4.count() == emb.count()
    assert entries4.select("vec_id").distinct().count() == emb.count()


def test_streaming_ann_bootstrap_replay_from_fresh_process(spark, sf_dir, tmp_path):
    """The bootstrap-replay guard must survive a process restart: a NEW
    StreamingAnnIngest over an index whose META records bootstrap_batch
    skips the replayed batch 0 instead of appending it (the in-memory
    counters are gone — only META carries the evidence)."""
    import os

    from connemara_spark.operators.annindex import load_ann_index
    from connemara_spark.streaming.ingest import StreamingAnnIngest

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    ).limit(500)

    def make():
        return StreamingAnnIngest(
            spark,
            landing_dir=str(tmp_path / "landing"),
            index_dir=str(tmp_path / "idx"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            build_params=dict(n_cells=8, m=8, k_cb=8, sample_n=500, iters=2),
        )

    make()._foreach_batch(emb, 0)  # bootstrap build, then "crash"
    n = emb.count()
    replayed = make()  # restart: fresh object, no in-memory state
    replayed._foreach_batch(emb, 0)
    assert replayed.batches_skipped == 1 and replayed.batches_appended == 0
    _, _, entries = load_ann_index(spark, str(tmp_path / "idx"))
    assert entries.count() == n
    assert entries.select("vec_id").distinct().count() == n


def test_streaming_bootstrap_passes_centroid_mode(spark, tmp_path):
    """build_params reaches the bootstrap build: a stream bootstrapped with
    centroid_mode='trained' persists spherical centroids in META, and the
    appended second batch is coded with THOSE centroids (cells consistent
    across the stream's lifetime)."""
    import os

    from pyspark.sql import functions as F

    from connemara_spark.operators.annindex import load_ann_index
    from connemara_spark.streaming.ingest import StreamingAnnIngest

    dim = 64
    emb_expr = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("id") * dim + j, F.lit(0)), F.lit(997))
            / F.lit(997.0)
        ).cast("float"),
    )
    vecs = spark.range(4000).select(
        F.col("id").alias("vec_id"), emb_expr.alias("embedding")
    )
    land = str(tmp_path / "in")
    os.makedirs(land)
    for i, half in enumerate((vecs.filter("vec_id % 2 = 0"), vecs.filter("vec_id % 2 = 1"))):
        st = str(tmp_path / f"st{i}")
        half.coalesce(1).write.parquet(st)
        import glob
        import shutil as sh
        import time as t

        part = glob.glob(os.path.join(st, "part-*.parquet"))[0]
        dst = os.path.join(land, f"seg-{i:04d}.parquet")
        sh.move(part, dst)
        os.utime(dst, (t.time() + i, t.time() + i))
    ingest = StreamingAnnIngest(
        spark,
        landing_dir=land,
        index_dir=str(tmp_path / "idx"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        bootstrap=True,
        max_files_per_trigger=1,
        build_params={
            "n_cells": 16, "m": 8, "k_cb": 16, "sample_n": 2000, "iters": 6,
            "centroid_mode": "trained",
        },
        dim=dim,
    )
    ingest.run_until_drained()
    meta, _books, entries = load_ann_index(spark, str(tmp_path / "idx"))
    assert meta["centroid_mode"] == "trained" and len(meta["centroids"]) == 16
    assert entries.count() == 4000
    # appended half landed in the SAME trained cells its twin ids did in
    # the bootstrap (hash vectors of adjacent ids differ, so only check
    # balance: no literal-grid mega-cell)
    h = [r["n"] for r in entries.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert max(h) < 4 * (4000 // 16)
