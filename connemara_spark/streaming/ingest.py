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
        q.awaitTermination(timeout_sec)
        if q.exception() is not None:
            raise q.exception()


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
