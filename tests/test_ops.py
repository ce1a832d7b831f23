"""Operational surface tests: archive sink (S9), spool GC (S10),
maintenance compaction (W10), fixer (D15)."""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F
import pytest

from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
from connemara_spark.events import BRONZE_SCHEMA
from connemara_spark.ops import ArchiveSink, Fixer, Maintenance, spool_gc
from connemara_spark.pipeline import MemoryStore, ParquetStore, Replayer
from connemara_spark.streaming.driver import LsnWatermark


def _spec():
    return TableSpec(
        database="db1",
        schema="public",
        table="t1",
        columns=[ColumnSpec("id", "integer"), ColumnSpec("v", "text")],
        pk_cols=["id"],
    )


def _bronze(spark, rows):
    return spark.createDataFrame(rows, BRONZE_SCHEMA)


def _row(lsn, payload, db="db1", slot="slot1", ts="2026-01-02 03:00:00"):
    t = dt.datetime.fromisoformat(ts)
    return (t, db, slot, lsn, 100 + lsn, t, payload)


INS = '{"kind":"insert","schema":"public","table":"t1","columnnames":["id","v"],"columnvalues":["%d","%s"]}'


def test_archive_sink_append_read_expire(spark, tmp_path):
    arch = ArchiveSink(spark, str(tmp_path / "archive"))
    old = _row(1, INS % (1, "a"), ts="2026-01-01 00:00:00")
    new = _row(2, INS % (2, "b"), ts="2026-01-03 00:00:00")
    arch.append(_bronze(spark, [old, new]))
    assert arch.read().count() == 2

    # toggle off (SIGUSR1 analog): appends become no-ops
    arch.enabled = False
    arch.append(_bronze(spark, [_row(3, INS % (3, "c"))]))
    assert arch.read().count() == 2

    dropped = arch.expire("2026-01-02")
    assert dropped == ["ingest_date=2026-01-01"]
    assert arch.read().count() == 1


def test_spool_gc_removes_only_fully_applied_files(spark, tmp_path):
    spool = str(tmp_path / "spool")
    # file A: lsns 1-2 (applied), file B: lsns 3-4 (3 applied, 4 not)
    _bronze(spark, [_row(1, INS % (1, "a")), _row(2, INS % (2, "b"))]).coalesce(1).write.mode(
        "append"
    ).parquet(spool)
    _bronze(spark, [_row(3, INS % (3, "c")), _row(4, INS % (4, "d"))]).coalesce(1).write.mode(
        "append"
    ).parquet(spool)

    removable = spool_gc(spark, spool, {("db1", "slot1"): 3}, dry_run=True)
    assert len(removable) == 1  # only file A fully covered

    removed = spool_gc(spark, spool, {("db1", "slot1"): 3})
    assert len(removed) == 1
    remaining = spark.read.schema(BRONZE_SCHEMA).parquet(spool)
    assert sorted(r.lsn_start for r in remaining.collect()) == [3, 4]

    # everything applied → all files go
    spool_gc(spark, spool, {("db1", "slot1"): 10})
    leftover = [f for f in os.listdir(spool) if f.endswith(".parquet")]
    assert leftover == []


def test_maintenance_compacts_when_idle(spark, tmp_path):
    spec = _spec()
    catalog = EngineCatalog()
    catalog.register(spec)
    store = ParquetStore(spark, str(tmp_path / "store"))
    frag = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], spec.spark_schema()
    ).repartition(16)
    store.write(spec, frag)

    maint = Maintenance(store, catalog, target_partitions=2)
    # busy stream → no-op
    assert maint.run(progress={"inputRowsPerSecond": 50.0}) == []
    # idle stream → compact + PK-sorted within partitions
    reports = maint.run(progress={"inputRowsPerSecond": 0.0})
    assert [r.table for r in reports] == [spec.target_name]
    out = store.read(spec)
    assert out.rdd.getNumPartitions() == 2
    assert out.count() == 100
    part_rows = out.select("id", F.spark_partition_id().alias("p")).collect()
    by_part: dict[int, list[int]] = {}
    for r in part_rows:
        by_part.setdefault(r.p, []).append(r.id)
    for ids in by_part.values():
        assert ids == sorted(ids)


DDL_EVENT = (
    '{"kind":"insert","schema":"public","table":"sql_ddl_statements",'
    '"columnnames":["current_query","search_path","command_tags"],'
    '"columnvalues":["%s","public","{ALTER TABLE}"]}'
)


def test_fixer_head_apply_skip(spark, tmp_path):
    spool = str(tmp_path / "spool")
    catalog = EngineCatalog()
    spec = _spec()
    catalog.register(spec)
    store = MemoryStore(spark)
    store.create_table(spec)
    replayer = Replayer(spark, catalog, store)
    wm = LsnWatermark(str(tmp_path / "wm.json"))

    good_ddl = "ALTER TABLE public.t1 ADD COLUMN extra text"
    _bronze(
        spark,
        [
            _row(5, DDL_EVENT % good_ddl),
            _row(7, DDL_EVENT % "ALTER TABLE public.t1 ADD COLUMN later int4"),
        ],
    ).write.mode("append").parquet(spool)

    fixer = Fixer(spark, replayer, wm, spool)
    head = fixer.head()
    assert head is not None and head.lsn_start == 5
    assert "ADD COLUMN extra" in head.query

    tag = fixer.apply_edited(head, good_ddl)
    assert tag == "column-added"
    assert "extra" in [c.name for c in catalog.get("db1", "public", "t1").columns]
    # watermark advanced past lsn 5 → head is now lsn 7
    head2 = fixer.head()
    assert head2 is not None and head2.lsn_start == 7

    fixer.skip(head2)
    assert fixer.head() is None


def test_forget_keys_erases_and_tombstones(spark, tmp_path):
    """Targeted erasure removes the keys from every table that has the
    column, commits new versions, skips tables without it, and appends an
    auditable tombstone; prior versions still hold the rows (retention GC's
    job, documented)."""
    from connemara_spark.catalog import ColumnSpec, TableSpec
    from connemara_spark.ops import forget_keys
    from connemara_spark.pipeline import ParquetStore

    users = TableSpec(database="db1", schema="public", table="users",
                      columns=[ColumnSpec("user_id", "bigint"), ColumnSpec("name", "text")],
                      pk_cols=["user_id"])
    orders = TableSpec(database="db1", schema="public", table="ords",
                       columns=[ColumnSpec("o_id", "bigint"), ColumnSpec("user_id", "bigint")],
                       pk_cols=["o_id"])
    other = TableSpec(database="db1", schema="public", table="other",
                      columns=[ColumnSpec("k", "bigint")], pk_cols=["k"])
    store = ParquetStore(spark, str(tmp_path / "silver"))
    store.write(users, spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "user_id long, name string"))
    store.write(orders, spark.createDataFrame([(10, 1), (11, 2), (12, 1)], "o_id long, user_id long"))
    store.write(other, spark.createDataFrame([(7,)], "k long"))

    ts = str(tmp_path / "tombstones.jsonl")
    reports = forget_keys(store, [users, orders, other], "user_id", [1], tombstone_path=ts)
    by_table = {r.table: r for r in reports}
    assert by_table[users.target_name].rows_removed == 1
    assert by_table[orders.target_name].rows_removed == 2
    assert by_table[other.target_name].rows_removed == 0
    assert sorted(r["user_id"] for r in store.read(users).collect()) == [2, 3]
    assert sorted(r["user_id"] for r in store.read(orders).collect()) == [2]
    # prior version retains the rows until GC (documented)
    assert sorted(r["user_id"] for r in store.read_version(users, 1).collect()) == [1, 2, 3]
    import json as _json

    rec = _json.loads(open(ts).read().strip())
    assert rec["key_col"] == "user_id" and rec["key_values"] == ["1"]


def test_forget_keys_preserves_null_keyed_rows(spark, tmp_path):
    """Three-valued logic: ~isin is NULL for NULL keys — the erasure filter
    must keep NULL-keyed rows, never destroy data beyond the request."""
    from connemara_spark.catalog import ColumnSpec, TableSpec
    from connemara_spark.ops import forget_keys
    from connemara_spark.pipeline import ParquetStore

    t = TableSpec(database="db1", schema="public", table="nul",
                  columns=[ColumnSpec("o_id", "bigint"), ColumnSpec("user_id", "bigint")],
                  pk_cols=["o_id"])
    store = ParquetStore(spark, str(tmp_path / "silver"))
    store.write(t, spark.createDataFrame([(1, 5), (2, None), (3, 6)], "o_id long, user_id long"))
    reports = forget_keys(store, [t], "user_id", [5])
    assert reports[0].rows_removed == 1
    assert sorted((r["o_id"], r["user_id"]) for r in store.read(t).collect()) == [
        (2, None), (3, 6)
    ]
