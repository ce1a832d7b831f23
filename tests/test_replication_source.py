"""Custom Python DataSource (wal_spool): the Spark-4 replication-protocol
source analog — segment-count offsets, executor-side parse, exactly-once
resume from the streaming checkpoint."""

from __future__ import annotations

import pytest

from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
from connemara_spark.pipeline import ParquetStore
from connemara_spark.sources.replication import (
    register_wal_spool,
    write_segment,
)
from connemara_spark.streaming import StreamingReplayer
from connemara_spark.testing import make_event

SPEC = TableSpec(
    database="db1",
    schema="public",
    table="items",
    columns=[ColumnSpec("id", "bigint"), ColumnSpec("v", "text")],
    pk_cols=["id"],
)


def _seg_rows(events):
    # make_event emits BRONZE dicts with datetime values; write_segment
    # serializes them with default=str (ISO text), which the source parses
    return [dict(e) for e in events]


def test_wal_spool_batch_read_types(spark, tmp_path):
    spool = str(tmp_path / "spool")
    register_wal_spool(spark)
    write_segment(
        spool,
        [
            {
                "insert_timestamp": "2026-01-01T00:00:00",
                "database": "db1",
                "source_slotname": "s1",
                "lsn_start": "0/16B6C50",  # PG %X/%X text
                "xid": 100,
                "xid_timestamp": "2026-01-01T02:00:00+02:00",  # tz → UTC
                "payload": '{"kind":"insert"}',
            },
            {
                "insert_timestamp": 1767225600000000,  # epoch µs
                "database": "db2",
                "source_slotname": "s2",
                "lsn_start": 12345,
                "xid": 101,
                "xid_timestamp": None,
                "payload": None,
            },
        ],
        "0000000000000001",
    )
    df = spark.read.format("wal_spool").option("path", spool).load()
    rows = {r["database"]: r for r in df.collect()}
    assert rows["db1"]["lsn_start"] == (0 << 32 | 0x16B6C50)
    assert rows["db1"]["xid_timestamp"].hour == 0  # +02:00 folded to UTC
    assert rows["db2"]["insert_timestamp"].year == 2026
    assert rows["db2"]["payload"] is None
    # empty spool: zero rows, not an error
    empty = spark.read.format("wal_spool").option("path", str(tmp_path / "none")).load()
    assert empty.count() == 0


def test_wal_spool_malformed_line_fails(spark, tmp_path):
    import os

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    with open(f"{spool}/0000000000000001.jsonl", "w") as fh:
        fh.write('{"database": "db1"}\n{not json\n')
    register_wal_spool(spark)
    with pytest.raises(Exception, match="malformed spool line"):
        spark.read.format("wal_spool").option("path", spool).load().collect()


def test_wal_spool_stream_exactly_once_resume(spark, tmp_path):
    """Restarting from the same checkpoint after new segments arrive reads
    ONLY the new segments — the replication-origin resume contract (W3)."""
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    register_wal_spool(spark)

    def drain():
        q = (
            spark.readStream.format("wal_spool")
            .option("path", spool)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    def read_out():
        # fresh DataFrame each time — a reused one would pin the parquet
        # file listing snapshotted at creation
        return spark.read.schema(
            "insert_timestamp timestamp, database string, source_slotname string,"
            "lsn_start long, xid long, xid_timestamp timestamp, payload string"
        ).parquet(out)

    write_segment(spool, [{"database": "db1", "lsn_start": i, "payload": f"p{i}"} for i in (1, 2)], "seg-001")
    write_segment(spool, [{"database": "db1", "lsn_start": 3, "payload": "p3"}], "seg-002")
    drain()
    assert sorted(r["lsn_start"] for r in read_out().collect()) == [1, 2, 3]

    # second arrival + restart with the SAME checkpoint
    write_segment(spool, [{"database": "db1", "lsn_start": 4, "payload": "p4"}], "seg-003")
    drain()
    assert sorted(r["lsn_start"] for r in read_out().collect()) == [1, 2, 3, 4]  # no dupes


def test_streaming_replayer_over_wal_spool(spark, tmp_path):
    """Full CDC path through the custom source: segments → wal_spool stream
    → foreachBatch apply → silver store, incrementally."""
    spool = str(tmp_path / "spool")
    cat = EngineCatalog()
    cat.register(SPEC)
    spec = cat.get("db1", "public", "items")
    store = ParquetStore(spark, str(tmp_path / "silver"))
    sr = StreamingReplayer(
        spark,
        cat,
        store,
        landing_dir=spool,
        checkpoint_dir=str(tmp_path / "ckpt"),
        landing_format="wal_spool",
    )

    write_segment(
        spool,
        _seg_rows(
            [
                make_event(spec, "insert", lsn=1, row={"id": 1, "v": "a"}),
                make_event(spec, "insert", lsn=2, row={"id": 2, "v": "b"}),
            ]
        ),
        "seg-001",
    )
    sr.run_until_drained()
    assert {r["id"]: r["v"] for r in store.read(spec).collect()} == {1: "a", 2: "b"}

    write_segment(
        spool,
        _seg_rows(
            [
                make_event(spec, "update", lsn=3, row={"id": 1, "v": "a2"}, old_key={"id": 1}),
                make_event(spec, "delete", lsn=4, old_key={"id": 2}),
            ]
        ),
        "seg-002",
    )
    sr.run_until_drained()
    assert {r["id"]: r["v"] for r in store.read(spec).collect()} == {1: "a2"}
    assert sr.watermark.get("db1", "slot_db1") == 4


def test_wal_spool_ddl_barrier_mid_stream(spark, tmp_path):
    """Mid-stream DDL through the custom source: the batch splits at the
    DDL event, the catalog evolves, and post-DDL DML lands in the new
    shape — D11 semantics end-to-end over wal_spool."""
    from tests.test_pipeline import ddl_event

    spool = str(tmp_path / "spool")
    cat = EngineCatalog()
    cat.register(SPEC)
    spec = cat.get("db1", "public", "items")
    store = ParquetStore(spark, str(tmp_path / "silver"))
    sr = StreamingReplayer(
        spark, cat, store,
        landing_dir=spool, checkpoint_dir=str(tmp_path / "ckpt"),
        landing_format="wal_spool",
    )
    write_segment(
        spool,
        _seg_rows([
            make_event(spec, "insert", lsn=1, row={"id": 1, "v": "a"}),
            ddl_event(2, "ALTER TABLE public.items ADD COLUMN note text"),
        ]),
        "seg-001",
    )
    sr.run_until_drained()
    assert cat.get("db1", "public", "items").column_names == ["id", "v", "note"]

    evolved = cat.get("db1", "public", "items")
    write_segment(
        spool,
        _seg_rows([make_event(evolved, "insert", lsn=3, row={"id": 2, "v": "b", "note": "n"})]),
        "seg-002",
    )
    sr.run_until_drained()
    got = {r["id"]: (r["v"], r["note"]) for r in store.read(evolved).collect()}
    assert got == {1: ("a", None), 2: ("b", "n")}


def test_wal_spool_two_sources_slot_restriction(spark, tmp_path):
    """Two databases interleaved in one spool through the custom source;
    slot restriction (F2) drops the unallowed source."""
    spool = str(tmp_path / "spool")
    cat = EngineCatalog()
    cat.register(SPEC)
    spec1 = cat.get("db1", "public", "items")
    spec2 = TableSpec(
        database="db2", schema="public", table="items",
        columns=[ColumnSpec("id", "bigint"), ColumnSpec("v", "text")],
        pk_cols=["id"],
    )
    cat.register(spec2)
    store = ParquetStore(spark, str(tmp_path / "silver"))
    sr = StreamingReplayer(
        spark, cat, store,
        landing_dir=spool, checkpoint_dir=str(tmp_path / "ckpt"),
        landing_format="wal_spool",
        allowed_slots=[("db1", "slot_db1")],
        excluded_databases=["db2"],
    )
    write_segment(
        spool,
        _seg_rows([
            make_event(spec1, "insert", lsn=1, row={"id": 1, "v": "from-db1"}),
            make_event(spec2, "insert", lsn=2, row={"id": 1, "v": "from-db2"}),
        ]),
        "seg-001",
    )
    sr.run_until_drained()
    assert {r["v"] for r in store.read(spec1).collect()} == {"from-db1"}
    assert store.read(spec2).count() == 0  # excluded source never applied


def test_wal_spool_detects_ordering_violation(tmp_path):
    """A segment name sorting BEFORE already-listed ones would silently
    shift the positional offsets (replay + skip); latestOffset compares
    the current listing against the one it previously returned and fails
    fast (W9). Enforcement lives in latestOffset because Spark 4.1 never
    invokes commit() on Python stream readers (verified empirically)."""
    from connemara_spark.sources.replication import WalSpoolStreamReader

    spool = str(tmp_path / "spool")
    write_segment(spool, [{"database": "db1", "lsn_start": 9, "payload": "p9"}], "seg-9")
    r = WalSpoolStreamReader({"path": spool})
    assert r.latestOffset() == {"segments": 1}

    # "seg-10" sorts BEFORE the already-listed "seg-9" -> must fail fast
    write_segment(spool, [{"database": "db1", "lsn_start": 10, "payload": "p10"}], "seg-10")
    with pytest.raises(ValueError, match="ordering violated"):
        r.latestOffset()


def test_wal_spool_max_segments_per_trigger(spark, tmp_path):
    """The segment cap bounds each planned batch (W6 backpressure)."""
    from connemara_spark.sources.replication import WalSpoolStreamReader

    spool = str(tmp_path / "spool")
    for i in range(5):
        write_segment(spool, [{"database": "db1", "lsn_start": i, "payload": f"p{i}"}], f"seg-{i:03d}")
    r = WalSpoolStreamReader({"path": spool, "maxSegmentsPerTrigger": "2"})
    r.initialOffset()  # fresh query: arms the planning floor at 0
    # successive planning calls advance by at most the cap
    assert r.latestOffset() == {"segments": 2}
    assert r.latestOffset() == {"segments": 4}
    assert r.latestOffset() == {"segments": 5}
    # 3 more segments: growth stays capped
    for i in (5, 6, 7):
        write_segment(spool, [{"database": "db1", "lsn_start": i, "payload": f"p{i}"}], f"seg-{i:03d}")
    assert r.latestOffset() == {"segments": 7}

    # restart safety: a NEW reader instance (initialOffset NOT called —
    # Spark restores from the checkpoint instead) resumes from the
    # persisted planning floor (7) and never returns an offset below it,
    # which would make Spark replay consumed segments
    r2 = WalSpoolStreamReader({"path": spool, "maxSegmentsPerTrigger": "2"})
    assert r2.latestOffset() == {"segments": 8}  # min(total=8, floor 7 + 2)

    # and partitions() raises the floor from checkpoint-replayed offsets
    r3 = WalSpoolStreamReader({"path": str(tmp_path / "spool2")})
    write_segment(str(tmp_path / "spool2"), [{"lsn_start": 1}], "s-001")
    r3.partitions({"segments": 0}, {"segments": 1})
    assert r3._floor == 1

    # a zero/negative cap is a config error, not a silent stall
    with pytest.raises(ValueError, match="must be >= 1"):
        WalSpoolStreamReader({"path": spool, "maxSegmentsPerTrigger": "0"})

    # brand-new spool (no sidecar, initialOffset NEVER called — the runner
    # doesn't guarantee it): construction arms the floor eagerly, so even
    # the first backlog-drain batch is capped
    spool3 = str(tmp_path / "spool3")
    for i in range(5):
        write_segment(spool3, [{"database": "db1", "lsn_start": i, "payload": f"p{i}"}], f"seg-{i:03d}")
    r4 = WalSpoolStreamReader({"path": spool3, "maxSegmentsPerTrigger": "2"})
    assert r4.latestOffset() == {"segments": 2}

    # sidecar lost but checkpoint survived: a capped latestOffset can
    # undercut the committed offset — the resulting backwards batch must
    # FAIL FAST, never commit the regressed offset (silent redelivery)
    with pytest.raises(ValueError, match="backwards"):
        r4.partitions({"segments": 4}, {"segments": 2})

    # unwritable spool (eager floor write fails): fall back to the
    # uncapped-first-drain behavior — a cap without a durable floor could
    # undercut a surviving checkpoint (chmod can't simulate this as root;
    # patch the write to fail like a read-only mount would)
    spool4 = str(tmp_path / "spool4")
    for i in range(5):
        write_segment(spool4, [{"database": "db1", "lsn_start": i, "payload": f"p{i}"}], f"seg-{i:03d}")
    orig = WalSpoolStreamReader._write_floor
    WalSpoolStreamReader._write_floor = lambda self, n: False
    try:
        r5 = WalSpoolStreamReader({"path": spool4, "maxSegmentsPerTrigger": "2"})
        assert r5._floor is None
        assert r5.latestOffset() == {"segments": 5}  # uncapped first drain
    finally:
        WalSpoolStreamReader._write_floor = orig


def test_wal_spool_continuous_trigger_commits_and_caps(spark, tmp_path):
    """Under a real processing-time trigger, maxSegmentsPerTrigger caps
    EVERY batch — including the first backlog drain (the constructor arms
    the planning floor eagerly on a sidecar-less spool); all segments land
    exactly once."""
    import time

    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    register_wal_spool(spark)
    for i in range(4):
        write_segment(spool, [{"database": "db1", "lsn_start": i, "payload": f"p{i}"}], f"seg-{i:03d}")

    q = (
        spark.readStream.format("wal_spool")
        .option("path", spool)
        .option("maxSegmentsPerTrigger", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def read_rows():
            try:
                return sorted(
                    r["lsn_start"]
                    for r in spark.read.schema(
                        "insert_timestamp timestamp, database string, source_slotname string,"
                        "lsn_start long, xid long, xid_timestamp timestamp, payload string"
                    ).parquet(out).collect()
                )
            except Exception:
                return []

        deadline = time.time() + 120
        while time.time() < deadline and read_rows() != [0, 1, 2, 3]:
            time.sleep(0.5)
        assert read_rows() == [0, 1, 2, 3]

        # grow the backlog while the query runs: subsequent batches are capped
        for i in range(4, 9):
            write_segment(spool, [{"database": "db1", "lsn_start": i, "payload": f"p{i}"}], f"seg-{i:03d}")
        while time.time() < deadline and read_rows() != list(range(9)):
            time.sleep(0.5)
        assert read_rows() == list(range(9))
        batches = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
        assert batches and max(batches) <= 2  # every batch bounded, first included
    finally:
        q.stop()


def test_expand_segment_paths_matches_python_parse(spark, tmp_path):
    """JVM-side expansion (deliver=paths -> spark.read.text + from_json)
    produces EXACTLY the rows of the Python-worker parse across every value
    shape the source accepts: %X/%X vs integer LSNs, ISO (naive and
    tz-offset) vs epoch-us timestamps, null fields, blank lines."""
    from connemara_spark.sources.replication import expand_segment_paths

    spool = str(tmp_path / "spool")
    register_wal_spool(spark)
    rows = [
        {
            "insert_timestamp": "2026-01-01T00:00:00",
            "database": "db1",
            "source_slotname": "s1",
            "lsn_start": "A/16B6C50",
            "xid": 100,
            "xid_timestamp": "2026-01-01T02:00:00+02:00",
            "payload": '{"kind":"insert","columnnames":["a"],"columnvalues":["1"]}',
        },
        {
            "insert_timestamp": 1767225600000000,
            "database": "db2",
            "source_slotname": "s2",
            "lsn_start": 12345,
            "xid": None,
            "xid_timestamp": None,
            "payload": None,
        },
        {
            "insert_timestamp": "2026-01-01 12:30:45.123456",
            "database": "db3",
            "source_slotname": "s3",
            "lsn_start": "0/0",
            "xid": 9007199254740993,  # > 2^53: long fidelity through parse
            "xid_timestamp": "2026-01-01T12:30:45.123456",
            "payload": '{"kind":"delete"}',
        },
    ]
    write_segment(spool, rows, "0000000000000001")
    with open(f"{spool}/0000000000000001.jsonl", "a") as fh:
        fh.write("\n")  # trailing blank line is skipped, not malformed

    want = spark.read.format("wal_spool").option("path", spool).load().collect()
    paths = spark.read.format("wal_spool").option("path", spool).option(
        "deliver", "paths"
    ).load()
    assert paths.columns == ["segment_path"]
    got = expand_segment_paths(spark, paths).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    # empty path set: empty BRONZE frame, not an error
    from connemara_spark.events import BRONZE_SCHEMA

    empty = expand_segment_paths(spark, paths.limit(0))
    assert empty.count() == 0 and empty.schema == BRONZE_SCHEMA
