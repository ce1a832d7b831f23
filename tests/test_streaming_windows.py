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
