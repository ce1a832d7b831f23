"""Event-time windowed rollup with watermarked late-data handling (W7).

The CDC replication stream is WAL-ordered, so the reference never needs
event-time watermarks — but the analytics side of the engine (events /
document ingest) does: out-of-order arrivals are the norm for landed
telemetry. This is the Structured Streaming face of the batch
``events_daily_rollup`` query:

    readStream(landing) → withWatermark(ts) → groupBy(window(ts), type)
    → append-mode parquet of FINALIZED windows only

Semantics (and what the tests pin down):
- a window row is emitted exactly once, when the watermark passes its end —
  downstream readers never see partial counts (the batch-table analog is an
  idempotent append);
- events up to the watermark delay late are still aggregated (allowed
  lateness); once the watermark passes a window's end its state is evicted
  and later arrivals for it are DROPPED — state stays bounded at (open
  windows × event types), independent of stream length;
- the watermark survives restarts via the checkpoint, so a crashed/resumed
  query neither re-emits finalized windows nor resurrects dropped lates.

Scale: groupBy(window, type) shuffles once on (window, type); state store
size is bounded by the watermark horizon. ``maxFilesPerTrigger`` is the
backpressure bound, as in the ingest pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


class WindowedEventRollup:
    """Watermarked tumbling-window rollup over a parquet landing zone."""

    def __init__(
        self,
        spark: SparkSession,
        *,
        landing_dir: str,
        out_dir: str,
        checkpoint_dir: str,
        window: str = "1 hour",
        watermark: str = "30 minutes",
        max_files_per_trigger: int = 1,
    ):
        self.spark = spark
        self.landing_dir = landing_dir
        self.out_dir = out_dir
        self.checkpoint_dir = checkpoint_dir
        self.window = window
        self.watermark = watermark
        self.max_files_per_trigger = max_files_per_trigger

    def aggregated(self, stream: DataFrame) -> DataFrame:
        """The rollup plan — identical for the stream and any batch backfill
        (pass a batch DF: window() and the aggregation are the same; only
        the watermark clause is stream-specific)."""
        if stream.isStreaming:
            stream = stream.withWatermark("ts", self.watermark)
        return (
            stream.groupBy(F.window("ts", self.window).alias("w"), F.col("event_type"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )

    def start(self, *, available_now: bool = True):
        stream = (
            self.spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.landing_dir)
        )
        writer = (
            self.aggregated(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", self.out_dir)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_until_drained(self, timeout_s: int = 120) -> None:
        q = self.start(available_now=True)
        try:
            if not q.awaitTermination(timeout_s):
                raise TimeoutError(f"stream did not drain within {timeout_s}s")
            if q.exception() is not None:
                raise q.exception()
        finally:
            q.stop()


def session_window_rollup(
    stream: DataFrame,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Native event-time SESSION windows: per ``key``, a session extends
    while consecutive events arrive within ``gap`` of each other and closes
    at the first longer silence — ``F.session_window``, the idiomatic
    Spark form of the batch ``events_sessionize`` query and the stateful
    ``sessionize_stream`` (applyInPandasWithState) operator.

    State per key is the OPEN session only (merged on arrival, emitted and
    evicted once the watermark passes session_end + gap) — bounded by
    active keys, independent of stream length. Works identically on a
    batch DataFrame (no watermark clause) for backfills.
    """
    if stream.isStreaming:
        stream = stream.withWatermark(ts_col, watermark)
    return (
        stream.groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"), F.col(key)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col(key),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def interval_join_streams(
    left, right, *, key: str, left_ts: str = "ts", right_ts: str = "ts",
    watermark: str = "30 minutes", max_gap: str = "10 minutes",
):
    """Stream-stream inner join within a bounded event-time interval.

    The canonical "attribute conversions to impressions" shape: rows join
    when keys match AND ``right_ts`` lies within ``[left_ts, left_ts +
    max_gap]``. Both sides carry watermarks, so Spark bounds the join state
    to the watermark + gap horizon per side — without them a stream-stream
    join would buffer forever. Matches emit once both sides' watermarks pass
    the candidate window (appearance can lag the later input by the
    watermark delay, the price of exactly-once append output).
    """
    from pyspark.sql import functions as F

    return _interval_join(left, right, key=key, left_ts=left_ts, right_ts=right_ts,
                          watermark=watermark, max_gap=max_gap, how="inner")


def interval_left_join_streams(
    left, right, *, key: str, left_ts: str = "ts", right_ts: str = "ts",
    watermark: str = "30 minutes", max_gap: str = "10 minutes",
):
    """Stream-stream LEFT OUTER interval join: every left row emits, with
    nulls when no right row arrived in ``[left_ts, left_ts + max_gap]``.

    The "impressions WITHOUT conversions" shape — the rows an inner join
    silently drops are usually the interesting ones (funnel leakage).
    Outer semantics force Spark to hold each unmatched left row until BOTH
    watermarks clear its whole candidate interval (only then is
    "no match" final), so null rows emit with up to watermark + gap delay;
    state stays bounded by the same horizon as the inner join."""
    return _interval_join(left, right, key=key, left_ts=left_ts, right_ts=right_ts,
                          watermark=watermark, max_gap=max_gap, how="leftOuter")


def _interval_join(left, right, *, key, left_ts, right_ts, watermark, max_gap, how):
    from pyspark.sql import functions as F

    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_gap}"))
    )
    return l.join(r, cond, how)
