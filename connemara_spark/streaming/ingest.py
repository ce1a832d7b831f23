"""Streaming corpus ingest: continuous document landing → dedup + quality
gate → append-only silver corpus.

The streaming face of the batch curation operators: files of raw documents
land continuously (crawler output, upload batches); each micro-batch is

1. exact-deduped WITHIN the batch on a content hash (md5 of the text —
   same key as the batch ``exact_dedup`` operator),
2. anti-joined against the hashes already in the silver corpus (so
   re-crawled or re-landed duplicates never append twice — this also makes
   replays after a checkpoint rollback idempotent),
3. filtered by the native quality + repetition rules
   (``quality_features`` / ``repetition_features``), and
4. appended to the silver corpus with its content hash materialized.

Scale notes: the anti-join's right side is only (content_md5) — one
pruned column of the silver corpus, shuffled on the hash key (or
broadcast while small). State is the corpus itself, not an executor state
store — the dedup key set survives restarts for free and is shared by any
number of concurrent readers. ``maxFilesPerTrigger`` bounds batch size
(backpressure); ``availableNow`` drains for tests/backfills.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

RAW_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


class StreamingCorpusIngest:
    """foreachBatch-driven ingest pipeline over a parquet landing zone."""

    def __init__(
        self,
        spark: SparkSession,
        *,
        landing_dir: str,
        corpus_dir: str,
        checkpoint_dir: str,
        min_quality: float = 0.0,
        reject_repetitive: bool = True,
        max_files_per_trigger: int = 16,
    ):
        self.spark = spark
        self.landing_dir = landing_dir
        self.corpus_dir = corpus_dir
        self.checkpoint_dir = checkpoint_dir
        self.min_quality = min_quality
        self.reject_repetitive = reject_repetitive
        self.max_files_per_trigger = max_files_per_trigger

    # -- batch body (same code path a backfill would run) ------------------

    def _existing_hashes(self) -> DataFrame | None:
        if not os.path.isdir(self.corpus_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(self.corpus_dir)
        ):
            return None
        # one pruned column of the silver corpus — the scan reads only
        # content_md5
        return self.spark.read.parquet(self.corpus_dir).select("content_md5")

    def process_batch(self, batch: DataFrame) -> DataFrame:
        from connemara_spark.operators.text import quality_features, repetition_features

        hashed = batch.withColumn("content_md5", F.md5(F.col("text")))
        # in-batch exact dedup: smallest doc_id wins per content hash —
        # deterministic regardless of arrival order inside the batch
        w_rank = F.row_number().over(
            Window.partitionBy("content_md5").orderBy("doc_id")
        )
        hashed = hashed.withColumn("__rk", w_rank).filter(F.col("__rk") == 1).drop("__rk")
        existing = self._existing_hashes()
        if existing is not None:
            hashed = hashed.join(existing, "content_md5", "left_anti")
        scored = quality_features(hashed, "text")
        scored = repetition_features(scored, "doc_id", "text")
        keep = scored.filter(F.col("quality_score") >= self.min_quality)
        if self.reject_repetitive:
            keep = keep.filter(~F.col("repetition_flag"))
        return keep.select(
            "doc_id", "text", "lang", "source", "content_md5",
            "quality_score", "top_word_frac",
        )

    def _foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        out = self.process_batch(batch)
        out.write.mode("append").parquet(self.corpus_dir)

    # -- stream wiring ------------------------------------------------------

    def start(self, *, available_now: bool = False, processing_time: str = "15 seconds"):
        stream = (
            self.spark.readStream.schema(RAW_DOC_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.landing_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self._foreach_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run_until_drained(self, timeout_sec: int = 300) -> None:
        q = self.start(available_now=True)
        # awaitTermination returns False on TIMEOUT with the query still
        # running (exception() is None then) — proceeding would hand the
        # caller a partially-ingested corpus; fail loudly instead.
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError(
                f"streaming drain did not finish within {timeout_sec}s"
            )
        if q.exception() is not None:
            raise q.exception()


class StreamingNearDupIngest(StreamingCorpusIngest):
    """Streaming ingest with cross-batch NEAR-duplicate suppression: the
    streaming face of ``minhash_lsh_pairs``.

    Alongside the silver corpus it maintains an LSH INDEX sidecar:

    - ``<index_dir>/bands`` — (doc_id, band, bh): 32 band-bucket keys per
      corpus document (~16 bytes each), the join surface new batches probe;
    - ``<index_dir>/sigs`` — (doc_id, sig array<bigint>): the 64-component
      MinHash signature, used to estimate Jaccard for candidate pairs
      WITHOUT re-reading corpus text.

    Per micro-batch: exact dedup (parent behavior) → in-batch near-dup
    (full ``minhash_lsh_pairs``, smallest id wins) → cross-batch probe
    (batch band keys ⋈ index bands on (band, bh), then signature-agreement
    estimate ≥ ``jaccard_threshold`` drops the batch doc) → survivors
    append to corpus AND to both index sidecars.

    Scale shape: the only per-batch work proportional to corpus size is
    the pruned (band, bh, doc_id) scan — ~50 bytes/doc, hash-joined on the
    band key. Signatures join back only for the candidate sliver. Estimated
    (not exact) Jaccard cross-batch is the deliberate trade: exact would
    need corpus shingle sets (a text re-scan per batch); the estimator's
    error is O(1/√num_hashes), the standard MinHash deployment choice.
    Replays after checkpoint rollback stay idempotent through the exact
    content-hash anti-join (parent) — a replayed batch's docs are already
    in the corpus and drop before the near-dup stage.
    """

    def __init__(self, *args, index_dir: str, jaccard_threshold: float = 0.5,
                 k: int = 5, num_hashes: int = 64, bands: int = 32, seed: int = 42,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.index_dir = index_dir
        self.jaccard_threshold = jaccard_threshold
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.seed = seed

    def _bands_dir(self) -> str:
        return os.path.join(self.index_dir, "bands")

    def _sigs_dir(self) -> str:
        return os.path.join(self.index_dir, "sigs")

    def _read_side(self, path: str) -> DataFrame | None:
        if not os.path.isdir(path) or not any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            return None
        return self.spark.read.parquet(path)

    def _band_rows(self, sigs: DataFrame) -> DataFrame:
        rows_per_band = self.num_hashes // self.bands
        band_structs = ", ".join(
            "named_struct('band', {bi}, 'bh', xxhash64({cols}))".format(
                bi=bi,
                cols=", ".join(
                    f"element_at(sig, {bi * rows_per_band + ri + 1})"
                    for ri in range(rows_per_band)
                ),
            )
            for bi in range(self.bands)
        )
        return sigs.select(
            "doc_id", F.expr(f"explode(array({band_structs}))").alias("b")
        ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

    def process_batch(self, batch: DataFrame) -> DataFrame:
        from connemara_spark.operators.dedup import minhash_lsh_pairs, minhash_sig_expr, word_shingle_hashes

        keep = super().process_batch(batch)

        # in-batch near-dup: exact-verified LSH pairs, smallest id survives
        pairs = minhash_lsh_pairs(
            keep, "doc_id", "text",
            k=self.k, num_hashes=self.num_hashes, bands=self.bands,
            threshold=self.jaccard_threshold, seed=self.seed,
        )
        in_batch_drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        keep = keep.join(in_batch_drops, "doc_id", "left_anti")

        sigs = keep.select(
            "doc_id", word_shingle_hashes("text", self.k).alias("hs")
        ).select(
            "doc_id",
            minhash_sig_expr("hs", num_hashes=self.num_hashes, seed=self.seed).alias("sig"),
        )

        idx_bands = self._read_side(self._bands_dir())
        idx_sigs = self._read_side(self._sigs_dir())
        if idx_bands is not None and idx_sigs is not None:
            batch_bands = self._band_rows(sigs)
            cand = (
                batch_bands.alias("n")
                .join(
                    idx_bands.alias("o"),
                    (F.col("n.band") == F.col("o.band")) & (F.col("n.bh") == F.col("o.bh")),
                )
                .select(
                    F.col("n.doc_id").alias("new_id"),
                    F.col("o.doc_id").alias("old_id"),
                )
                .dropDuplicates(["new_id", "old_id"])
            )
            est = (
                cand.join(sigs.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("sa")), "new_id")
                .join(idx_sigs.select(F.col("doc_id").alias("old_id"), F.col("sig").alias("sb")), "old_id")
                .withColumn(
                    "est_jaccard",
                    F.size(F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda m: m))
                    / F.lit(float(self.num_hashes)),
                )
            )
            cross_drops = (
                est.filter(F.col("est_jaccard") >= self.jaccard_threshold)
                .select(F.col("new_id").alias("doc_id"))
                .distinct()
            )
            keep = keep.join(cross_drops, "doc_id", "left_anti")
            sigs = sigs.join(cross_drops, "doc_id", "left_anti")
        return keep, sigs

    def _foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        keep, sigs = self.process_batch(batch)
        # BOTH plans embed scans of the corpus/index dirs this method is
        # about to append to (the anti-join and band probe); materialize and
        # TRUNCATE LINEAGE before any write, or the later writes would
        # re-evaluate against the already-updated corpus and drop the
        # batch's own docs. localCheckpoint is the local-mode form; against
        # a real cluster use checkpoint() on a reliable dir (same shape).
        keep = keep.localCheckpoint(eager=True)
        sigs = sigs.localCheckpoint(eager=True)
        keep.write.mode("append").parquet(self.corpus_dir)
        sigs.write.mode("append").parquet(self._sigs_dir())
        self._band_rows(sigs).write.mode("append").parquet(self._bands_dir())


def streaming_dedup_within_watermark(
    stream: DataFrame,
    *,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """Bounded-state streaming dedup: drop re-arrivals of the same key within
    the watermark horizon (``dropDuplicatesWithinWatermark``).

    The corpus anti-join (above) dedups against ALL history by reading the
    silver table; this is the complementary primitive for keys that only
    repeat within a bounded window (at-least-once sources, crawler retries):
    state evicts once the watermark passes, so memory is O(keys per horizon)
    — at 100 TB/day that bound is what makes exact streaming dedup feasible
    at all. Arrivals after eviction pass through as new (by design — pair
    with the anti-join for all-time exactness).
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


class StreamingAnnIngest:
    """Keep the PERSISTED ANN index (operators/annindex.py) current under a
    continuous embedding stream: each micro-batch of (vec_id, embedding)
    rows is coded with the index's FROZEN codebooks and committed as one
    META-gated append batch — the streaming face of ``append_to_ann_index``.

    Exactly-once composition: the append's batch id is derived from the
    STREAM's batch id, so the two commit logs agree about identity. A crash
    after the append committed but before the stream checkpoint advanced
    replays the micro-batch — the wrapper sees its batch id already in
    META's ``appends`` list and skips it (idempotent replay), while a crash
    before the META rename leaves an invisible staging dir the retry
    overwrites. Either way no vector is ever indexed twice, which matters
    because duplicate entries occupy multiple top-k slots and displace true
    neighbors.

    ``bootstrap=True``: when no committed index exists, the FIRST batch
    trains and builds it (``build_ann_index``); every later batch appends
    with those frozen books — the deployment norm (retraining is a
    deliberate offline rebuild).
    """

    def __init__(
        self,
        spark: SparkSession,
        *,
        landing_dir: str,
        index_dir: str,
        checkpoint_dir: str,
        bootstrap: bool = True,
        max_files_per_trigger: int = 16,
        build_params: dict | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        dim: int = 64,
    ):
        self.spark = spark
        self.landing_dir = landing_dir
        self.index_dir = index_dir
        self.checkpoint_dir = checkpoint_dir
        self.bootstrap = bootstrap
        self.max_files_per_trigger = max_files_per_trigger
        self.build_params = build_params or {}
        self.id_col = id_col
        self.vec_col = vec_col
        self.dim = dim
        self.batches_appended = 0
        self.batches_skipped = 0

    def _schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(self.id_col, T.LongType()),
                T.StructField(self.vec_col, T.ArrayType(T.FloatType())),
            ]
        )

    def _foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        import json as _json

        from connemara_spark.operators.annindex import (
            append_to_ann_index, build_ann_index, _META,
        )

        meta_path = os.path.join(self.index_dir, _META)
        bid = f"stream-{batch_id}"
        if not os.path.exists(meta_path):
            if not self.bootstrap:
                raise FileNotFoundError(
                    f"no committed ANN index at {self.index_dir} and bootstrap=False"
                )
            # record WHICH stream batch bootstrapped the index: a crash
            # between the build's META commit and the stream checkpoint
            # advancing replays this batch against an existing META, and
            # without the marker the replay would re-APPEND every
            # bootstrap vector (duplicate index entries)
            build_ann_index(
                batch, self.index_dir,
                id_col=self.id_col, vec_col=self.vec_col, dim=self.dim,
                bootstrap_batch=bid,
                **self.build_params,
            )
            self.batches_appended += 1
            return
        with open(meta_path) as fh:
            meta = _json.load(fh)
        if bid in meta.get("appends", []) or bid == meta.get("bootstrap_batch"):
            # checkpoint-replayed micro-batch whose append (or whose
            # bootstrap build) already committed: idempotent skip, never
            # a duplicate index entry
            self.batches_skipped += 1
            return
        append_to_ann_index(batch, self.index_dir, batch_id=bid)
        self.batches_appended += 1

    def start(self, *, available_now: bool = False, processing_time: str = "15 seconds"):
        stream = (
            self.spark.readStream.schema(self._schema())
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.landing_dir)
        )
        writer = stream.writeStream.foreachBatch(self._foreach_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run_until_drained(self, timeout_sec: int = 300) -> None:
        q = self.start(available_now=True)
        # see StreamingCorpusIngest.run_until_drained: a timed-out drain
        # must not masquerade as a completed one
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError(
                f"streaming drain did not finish within {timeout_sec}s"
            )
        if q.exception() is not None:
            raise q.exception()


class StreamingAnnCdc(StreamingAnnIngest):
    """Keep the persisted ANN index current under a CHANGE stream — rows
    ``(vec_id, embedding, op)`` with op in {'upsert', 'delete'} — the
    vector-index face of the CDC apply fold (the reference replicates row
    state into consolidation tables; this replicates embedding state into
    the index with the same latest-wins-per-key semantics). Each
    micro-batch commits through ``apply_cdc_to_ann_index``: tombstones for
    every touched id ordered before the append of the re-coded upserts,
    all in ONE atomic META commit that also records the stream batch id.

    Exactly-once: a replayed micro-batch (crash between the index commit
    and the stream checkpoint advancing) is recognized via META's
    ``cdc_batches`` list — or the bootstrap marker — and skipped.

    ``bootstrap=True``: when no committed index exists, the FIRST batch's
    upsert rows train and build it (codebooks frozen there); deletes in
    the bootstrap batch are no-ops by construction (nothing to delete).
    """

    def _schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(self.id_col, T.LongType()),
                T.StructField(self.vec_col, T.ArrayType(T.FloatType())),
                T.StructField("op", T.StringType()),
            ]
        )

    def _foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        import json as _json

        from connemara_spark.operators.annindex import (
            _META, apply_cdc_to_ann_index, build_ann_index,
        )

        meta_path = os.path.join(self.index_dir, _META)
        bid = f"stream-{batch_id}"
        if not os.path.exists(meta_path):
            if not self.bootstrap:
                raise FileNotFoundError(
                    f"no committed ANN index at {self.index_dir} and bootstrap=False"
                )
            build_ann_index(
                batch.filter(F.col("op") == "upsert"), self.index_dir,
                id_col=self.id_col, vec_col=self.vec_col, dim=self.dim,
                bootstrap_batch=bid,
                **self.build_params,
            )
            self.batches_appended += 1
            return
        with open(meta_path) as fh:
            meta = _json.load(fh)
        if bid in meta.get("cdc_batches", []) or bid == meta.get("bootstrap_batch"):
            self.batches_skipped += 1
            return
        apply_cdc_to_ann_index(batch, self.index_dir, batch_id=bid)
        self.batches_appended += 1
