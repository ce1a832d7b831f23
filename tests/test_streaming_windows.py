"""W7 — watermarked event-time windows: exactly-once finalized emission,
late-data dropping, watermark persistence across query restarts."""

from __future__ import annotations

from datetime import datetime

from connemara_spark.streaming.windows import EVENT_SCHEMA, WindowedEventRollup


def _ts(h, m):
    return datetime(2024, 3, 1, h, m, 0)


def _land(spark, rows, landing_dir):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(
        landing_dir
    )


def _rollup(spark, tmp_path):
    return WindowedEventRollup(
        spark,
        landing_dir=str(tmp_path / "landing"),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        window="1 hour",
        watermark="30 minutes",
    )


def _read_out(spark, tmp_path):
    try:
        rows = spark.read.parquet(str(tmp_path / "out")).collect()
    except Exception:
        return []
    return sorted(
        ((r["window_start"], r["event_type"], r["n_events"], r["sum_value"]) for r in rows),
    )


def test_windows_finalize_once_and_drop_late(spark, tmp_path):
    ru = _rollup(spark, tmp_path)
    landing = str(tmp_path / "landing")

    # batch 1: two events in the 10:00 window + one at 11:10
    # -> watermark after batch = 11:10 - 30m = 10:40 < 11:00: nothing final
    _land(
        spark,
        [
            (1, _ts(10, 5), 1, "click", 1.0),
            (2, _ts(10, 20), 1, "click", 2.0),
            (3, _ts(11, 10), 2, "click", 4.0),
        ],
        landing,
    )
    ru.run_until_drained()
    assert _read_out(spark, tmp_path) == []

    # batch 2 (separate query run, same checkpoint — the watermark survived
    # via the checkpoint): an event at 12:00 advances the watermark to
    # 11:30, finalizing [10:00, 11:00). The 10:10 arrival is later than the
    # current watermark (10:40) but its window state is STILL OPEN, so it is
    # aggregated — that is the allowed-lateness contract of the 30m
    # watermark, not a bug.
    _land(
        spark,
        [
            (4, _ts(12, 0), 3, "click", 8.0),
            (5, _ts(10, 10), 9, "click", 100.0),  # late but window open
        ],
        landing,
    )
    ru.run_until_drained()
    out = _read_out(spark, tmp_path)
    assert out == [(_ts(10, 0), "click", 3, 103.0)]

    # batch 3: 13:30 pushes the watermark to 13:00, finalizing the 11:00
    # and 12:00 windows. The 10:25 arrival targets a window that was
    # ALREADY finalized and evicted — it is dropped: the [10:00) row is
    # neither re-emitted nor amended, and the event's value appears nowhere.
    _land(
        spark,
        [
            (6, _ts(13, 30), 3, "view", 16.0),
            (7, _ts(10, 25), 9, "click", 1000.0),  # beyond eviction -> drop
        ],
        landing,
    )
    ru.run_until_drained()
    out = _read_out(spark, tmp_path)
    assert out == [
        (_ts(10, 0), "click", 3, 103.0),
        (_ts(11, 0), "click", 1, 4.0),
        (_ts(12, 0), "click", 1, 8.0),
    ]


def test_batch_backfill_uses_same_plan(spark, tmp_path):
    # aggregated() over a batch DF is the backfill path: same columns,
    # same windows, no watermark clause needed
    ru = _rollup(spark, tmp_path)
    batch = spark.createDataFrame(
        [
            (1, _ts(10, 5), 1, "click", 1.0),
            (2, _ts(10, 20), 1, "click", 2.0),
            (3, _ts(11, 10), 2, "view", 4.0),
        ],
        EVENT_SCHEMA,
    )
    rows = sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in ru.aggregated(batch).collect()
    )
    assert rows == [(_ts(10, 0), "click", 2, 3.0), (_ts(11, 0), "view", 1, 4.0)]


def test_stream_stream_interval_join(spark, tmp_path):
    """Impression->conversion attribution: conversions join the matching
    impression when they land within the gap; outside-gap pairs never emit."""
    from pyspark.sql import types as T

    from connemara_spark.streaming.windows import interval_join_streams

    imp_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("imp_id", T.LongType()),
        ]
    )
    conv_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("conv_id", T.LongType()),
        ]
    )
    imp_dir, conv_dir = str(tmp_path / "imp"), str(tmp_path / "conv")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # impressions at 10:00; conversions at 10:05 (in gap), 10:30 (out of
    # gap), plus a far-future row on each side to advance both watermarks
    spark.createDataFrame(
        [(1, _ts(10, 0), 100), (2, _ts(10, 0), 200), (9, _ts(13, 0), 900)],
        imp_schema,
    ).coalesce(1).write.mode("append").parquet(imp_dir)
    spark.createDataFrame(
        [(1, _ts(10, 5), 1000), (2, _ts(10, 30), 2000), (9, _ts(13, 0), 9000)],
        conv_schema,
    ).coalesce(1).write.mode("append").parquet(conv_dir)

    left = spark.readStream.schema(imp_schema).parquet(imp_dir)
    right = spark.readStream.schema(conv_schema).parquet(conv_dir)
    joined = interval_join_streams(
        left, right, key="user_id", watermark="30 minutes", max_gap="10 minutes"
    ).select("l.user_id", "imp_id", "conv_id")

    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()

    rows = sorted(
        (r["user_id"], r["imp_id"], r["conv_id"])
        for r in spark.read.parquet(out).collect()
    )
    # only the in-gap pair (user 1) and the co-timestamped sentinel join;
    # user 2's conversion at +30m is outside the 10m gap
    assert rows == [(1, 100, 1000), (9, 900, 9000)]


def test_session_window_rollup_streaming_merges_and_splits(spark, tmp_path):
    """Native session windows over a streamed landing zone: events within
    the gap merge into one session; a longer silence opens a new one.
    Sessions emit exactly once (append mode), after the watermark passes."""
    from datetime import datetime

    from connemara_spark.streaming.windows import EVENT_SCHEMA, session_window_rollup

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def land(rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def drain():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            session_window_rollup(stream, gap="10 minutes", watermark="5 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()

    t = lambda m: datetime(2024, 3, 1, 10, m, 0)
    # user 1: two events 5 min apart (one session), then a 30-min silence
    # and one more (second session). user 2: one event.
    land([(1, t(0), 1, "view", 1.0), (2, t(5), 1, "view", 2.0),
          (3, t(0), 2, "view", 5.0)])
    land([(4, t(35), 1, "click", 3.0)])
    # advance the watermark far enough to finalize everything
    land([(9, datetime(2024, 3, 1, 12, 0, 0), 9, "view", 0.0)])
    drain()

    rows = spark.read.parquet(out).collect()
    sessions = {
        (r["user_id"], r["session_start"].minute, r["n_events"], r["sum_value"])
        for r in rows if r["user_id"] in (1, 2)
    }
    assert (1, 0, 2, 3.0) in sessions       # merged 10:00+10:05 session
    assert (1, 35, 1, 3.0) in sessions      # split after the silence
    assert (2, 0, 1, 5.0) in sessions


def test_session_window_rollup_batch_matches_gap_semantics(spark):
    """Same plan on a batch DataFrame: session boundaries equal the batch
    sessionize gap rule."""
    from datetime import datetime

    from connemara_spark.streaming.windows import session_window_rollup

    t = lambda m: datetime(2024, 3, 1, 10, m, 0)
    df = spark.createDataFrame(
        [(1, t(0), 7, "view", 1.0), (2, t(9), 7, "view", 1.0),
         (3, t(25), 7, "view", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = sorted(
        (r["session_start"].minute, r["session_end"].minute, r["n_events"])
        for r in session_window_rollup(df, gap="10 minutes").collect()
    )
    # session 1: 10:00-10:19 (end = last event + gap); session 2: 10:25-10:35
    assert got == [(0, 19, 2), (25, 35, 1)]


def test_stream_stream_interval_left_join_emits_unmatched(spark, tmp_path):
    """LEFT OUTER attribution: unmatched impressions emit with null
    conversion once both watermarks clear their candidate interval —
    the funnel-leakage rows an inner join silently drops."""
    from pyspark.sql import types as T

    from connemara_spark.streaming.windows import interval_left_join_streams

    imp_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("imp_id", T.LongType()),
        ]
    )
    conv_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("conv_id", T.LongType()),
        ]
    )
    imp_dir, conv_dir = str(tmp_path / "imp"), str(tmp_path / "conv")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # user 1 converts in-gap; user 2 converts OUT of gap (-> null match);
    # far-future sentinels advance both watermarks past every interval
    spark.createDataFrame(
        [(1, _ts(10, 0), 100), (2, _ts(10, 0), 200), (9, _ts(13, 0), 900)],
        imp_schema,
    ).coalesce(1).write.mode("append").parquet(imp_dir)
    spark.createDataFrame(
        [(1, _ts(10, 5), 1000), (2, _ts(10, 30), 2000), (9, _ts(13, 0), 9000)],
        conv_schema,
    ).coalesce(1).write.mode("append").parquet(conv_dir)

    left = spark.readStream.schema(imp_schema).parquet(imp_dir)
    right = spark.readStream.schema(conv_schema).parquet(conv_dir)
    joined = interval_left_join_streams(
        left, right, key="user_id", watermark="30 minutes", max_gap="10 minutes"
    ).select("l.user_id", "imp_id", "conv_id")

    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()

    rows = sorted(
        (r["user_id"], r["imp_id"], r["conv_id"])
        for r in spark.read.schema(
            "user_id long, imp_id long, conv_id long"
        ).parquet(out).collect()
    )
    # user 2's impression now EMITS, with a null conversion
    assert rows == [(1, 100, 1000), (2, 200, None), (9, 900, 9000)]
