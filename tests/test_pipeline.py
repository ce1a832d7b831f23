"""Replayer end-to-end: DML apply + mid-batch DDL barrier + store evolution."""

from __future__ import annotations

import json

import pytest

from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
from connemara_spark.events import BRONZE_SCHEMA
from connemara_spark.pipeline import MemoryStore, ParquetStore, Replayer
from connemara_spark.testing import EPOCH, make_event

SPEC = TableSpec(
    database="db1",
    schema="public",
    table="items",
    columns=[ColumnSpec("id", "bigint"), ColumnSpec("v", "text")],
    pk_cols=["id"],
)


def ddl_event(lsn, query, database="db1"):
    """An F2 DDL event: insert on public.sql_ddl_statements."""
    import datetime
    import json as j

    payload = {
        "kind": "insert",
        "schema": "public",
        "table": "sql_ddl_statements",
        "columnnames": ["id", "current_query", "search_path", "command_tags"],
        "columnvalues": [str(lsn), query, '"$user", public', "{DDL}"],
    }
    ts = EPOCH + datetime.timedelta(seconds=lsn)
    return {
        "insert_timestamp": ts,
        "database": database,
        "source_slotname": f"slot_{database}",
        "lsn_start": lsn,
        "xid": 1000 + lsn,
        "xid_timestamp": ts,
        "payload": j.dumps(payload),
    }


def bronze_df(spark, rows):
    return spark.createDataFrame(
        [tuple(r[f.name] for f in BRONZE_SCHEMA.fields) for r in rows], schema=BRONZE_SCHEMA
    )


@pytest.fixture()
def engine(spark):
    cat = EngineCatalog()
    cat.register(
        TableSpec(
            database=SPEC.database, schema=SPEC.schema, table=SPEC.table,
            columns=[ColumnSpec(c.name, c.pg_type) for c in SPEC.columns],
            pk_cols=list(SPEC.pk_cols),
        )
    )
    store = MemoryStore(spark)
    rep = Replayer(spark, cat, store)
    return cat, store, rep


def test_dml_only_batch(spark, engine):
    cat, store, rep = engine
    spec = cat.get("db1", "public", "items")
    rows = [
        make_event(spec, "insert", lsn=1, row={"id": 1, "v": "a"}),
        make_event(spec, "insert", lsn=2, row={"id": 2, "v": "b"}),
        make_event(spec, "update", lsn=3, row={"id": 1, "v": "a2"}, old_key={"id": 1}),
        make_event(spec, "delete", lsn=4, old_key={"id": 2}),
    ]
    m = rep.apply_batch(bronze_df(spark, rows))
    assert m.tables_touched == 1 and m.segments == 1
    out = {r["id"]: r["v"] for r in store.read(spec).collect()}
    assert out == {1: "a2"}


def test_ddl_barrier_mid_batch(spark, engine):
    """Insert → ADD COLUMN → insert-with-new-column: the second insert must
    see the evolved schema; the first must not (replay.pl:867-876)."""
    cat, store, rep = engine
    spec = cat.get("db1", "public", "items")
    rows = [
        make_event(spec, "insert", lsn=1, row={"id": 1, "v": "a"}),
        ddl_event(2, "ALTER TABLE public.items ADD COLUMN note text"),
    ]
    m = rep.apply_batch(bronze_df(spark, rows))
    assert m.ddl_executed == 1 and m.segments == 2

    spec2 = cat.get("db1", "public", "items")
    assert spec2.column_names == ["id", "v", "note"]

    rows2 = [
        make_event(spec2, "insert", lsn=3, row={"id": 3, "v": "c", "note": "hi"}),
    ]
    rep.apply_batch(bronze_df(spark, rows2))
    out = {r["id"]: (r["v"], r["note"]) for r in store.read(spec2).collect()}
    assert out == {1: ("a", None), 3: ("c", "hi")}


def test_create_table_then_insert_same_batch(spark, engine):
    cat, store, rep = engine
    new_spec = TableSpec(
        database="db1", schema="public", table="t_new",
        columns=[ColumnSpec("id", "bigint"), ColumnSpec("x", "integer")],
        pk_cols=["id"],
    )
    rows = [
        ddl_event(1, "CREATE TABLE public.t_new (id bigint PRIMARY KEY, x integer)"),
        make_event(new_spec, "insert", lsn=2, row={"id": 10, "x": 5}),
    ]
    m = rep.apply_batch(bronze_df(spark, rows))
    assert m.ddl_executed == 1
    got = cat.get("db1", "public", "t_new")
    out = {r["id"]: r["x"] for r in store.read(got).collect()}
    assert out == {10: 5}


def test_skip_ddl_and_temp_table_filter(spark, engine):
    cat, store, rep = engine
    spec = cat.get("db1", "public", "items")
    temp_spec = TableSpec(
        database="db1", schema="public", table="pg_temp_3", columns=list(spec.columns), pk_cols=["id"]
    )
    rows = [
        ddl_event(1, "ALTER TABLE items OWNER TO bob"),
        make_event(temp_spec, "insert", lsn=2, row={"id": 99, "v": "temp"}),
        make_event(spec, "insert", lsn=3, row={"id": 5, "v": "e"}),
    ]
    m = rep.apply_batch(bronze_df(spark, rows))
    assert m.ddl_skipped == 1 and m.ddl_executed == 0
    out = {r["id"] for r in store.read(spec).collect()}
    assert out == {5}


def test_parquet_store_roundtrip(spark, tmp_path, engine):
    cat, _, _ = engine
    spec = cat.get("db1", "public", "items")
    store = ParquetStore(spark, str(tmp_path / "silver"))
    rep = Replayer(spark, cat, store)
    rows = [make_event(spec, "insert", lsn=1, row={"id": 1, "v": "a"})]
    rep.apply_batch(bronze_df(spark, rows))
    rows2 = [make_event(spec, "update", lsn=2, row={"id": 1, "v": "b"}, old_key={"id": 1})]
    rep.apply_batch(bronze_df(spark, rows2))
    out = {r["id"]: r["v"] for r in store.read(spec).collect()}
    assert out == {1: "b"}
    # versioned dirs: v1 + v2 present, CURRENT points at v2
    assert store.current_version(spec.target_name) == 2


def _spec_for(db):
    return TableSpec(
        database=db, schema="public", table="items",
        columns=[ColumnSpec("id", "bigint"), ColumnSpec("v", "text")],
        pk_cols=["id"],
    )


def _ins(spec, lsn, id_, v):
    return make_event(spec, "insert", lsn=lsn, row={"id": id_, "v": v})


def test_multi_source_consolidation(spark):
    """The reference's raison d'être (docs/index.rst:9-12): N source
    databases land in one store, same-named tables kept apart by the
    <db>_<schema> namespace map."""
    cat = EngineCatalog()
    s1, s2 = _spec_for("db1"), _spec_for("db2")
    cat.register(s1)
    cat.register(s2)
    store = MemoryStore(spark)
    rep = Replayer(spark, cat, store)

    rep.apply_batch(
        bronze_df(
            spark,
            [
                _ins(s1, 1, 1, "from-db1"),
                _ins(s2, 1, 1, "from-db2"),   # same lsn, same pk, other source
                _ins(s2, 2, 2, "db2-only"),
            ],
        )
    )

    t1 = {r.id: r.v for r in store.read(s1).collect()}
    t2 = {r.id: r.v for r in store.read(s2).collect()}
    assert t1 == {1: "from-db1"}
    assert t2 == {1: "from-db2", 2: "db2-only"}
    assert s1.target_name == "db1_public.items" and s2.target_name == "db2_public.items"


def test_slot_restriction_filters(spark):
    """F2 (replay.pl:726-736): excluded databases are dropped unless their
    (database, slot) pair is explicitly allowed."""
    cat = EngineCatalog()
    s1, s2 = _spec_for("db1"), _spec_for("db2")
    cat.register(s1)
    cat.register(s2)
    store = MemoryStore(spark)
    rep = Replayer(
        spark, cat, store,
        excluded_databases=["db2"],
        allowed_slots=[("db2", "slot_db2_extra")],
    )

    ev_allowed = _ins(s2, 3, 7, "via-allowed-slot")
    ev_allowed["source_slotname"] = "slot_db2_extra"
    rep.apply_batch(
        bronze_df(spark, [_ins(s1, 1, 1, "a"), _ins(s2, 2, 6, "blocked"), ev_allowed])
    )

    assert {r.id: r.v for r in store.read(s1).collect()} == {1: "a"}
    assert {r.id: r.v for r in store.read(s2).collect()} == {7: "via-allowed-slot"}


def test_dml_hook_drops_events(spark, engine):
    """D14 fix_object_dml analog: returning falsy drops the table's events."""
    cat, store, _ = engine
    rep = Replayer(spark, cat, store, dml_hook=lambda db, sch, tbl: tbl != "items")
    rep.apply_batch(bronze_df(spark, [_ins(SPEC, 1, 1, "x")]))
    assert store.read(SPEC).count() == 0


def test_ddl_search_path_resolves_unqualified_names(spark):
    """Unqualified DDL object names resolve in the event's search_path (the
    reference applies the rewritten path before replay,
    connemara_rewrite.pm:145-157), not blindly in 'public'."""
    import datetime

    cat = EngineCatalog()
    store = MemoryStore(spark)
    rep = Replayer(spark, cat, store)

    payload = {
        "kind": "insert",
        "schema": "public",
        "table": "sql_ddl_statements",
        "columnnames": ["id", "current_query", "search_path", "command_tags"],
        "columnvalues": ["1", "CREATE TABLE audit_log (id bigint PRIMARY KEY, msg text)",
                         '"$user", audit', "{DDL}"],
    }
    ts = EPOCH + datetime.timedelta(seconds=1)
    row = {
        "insert_timestamp": ts,
        "database": "db1",
        "source_slotname": "slot_db1",
        "lsn_start": 1,
        "xid": 1001,
        "xid_timestamp": ts,
        "payload": json.dumps(payload),
    }
    m = rep.apply_batch(bronze_df(spark, [row]))
    assert m.ddl_executed == 1
    assert cat.maybe_get("db1", "audit", "audit_log") is not None
    assert cat.maybe_get("db1", "public", "audit_log") is None


def test_schema_drift_report(spark):
    from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
    from connemara_spark.events import BRONZE_SCHEMA, parse_events, schema_drift_report
    from connemara_spark.testing import make_event

    cat = EngineCatalog()
    spec = TableSpec(
        database="db1", schema="public", table="items",
        columns=[ColumnSpec("id", "bigint"), ColumnSpec("v", "text")],
        pk_cols=["id"],
    )
    cat.register(spec)
    cat.register(TableSpec(
        database="db1", schema="public", table="silent",
        columns=[ColumnSpec("id", "bigint")], pk_cols=["id"],
    ))

    rows = [
        make_event(spec, "insert", lsn=10, row={"id": 1, "v": "a"}),
        make_event(spec, "insert", lsn=20, row={"id": 2, "v": "b"}),
    ]
    # inject an unknown column into the second event's payload
    import json as j
    p = j.loads(rows[1]["payload"])
    p["columnnames"].append("ghost")
    p["columnvalues"].append("boo")
    rows[1]["payload"] = j.dumps(p)

    bronze = spark.createDataFrame(
        [tuple(r[f.name] for f in BRONZE_SCHEMA.fields) for r in rows], schema=BRONZE_SCHEMA
    )
    report = {
        (r["table"], r["column"]): (r["status"], r["n_events"], r["first_lsn"], r["last_lsn"])
        for r in schema_drift_report(parse_events(bronze), cat).collect()
    }
    assert report == {
        ("items", "ghost"): ("unknown", 1, 20, 20),
        ("silent", "id"): ("unobserved", 0, None, None),
    }  # healthy columns (id, v) are omitted


def test_parquet_store_time_travel(spark, tmp_path):
    """Every write leaves a queryable recovery point: read_version returns
    each historical state bit-for-bit; unknown versions fail loudly."""
    import pytest as _pytest

    from connemara_spark.catalog import ColumnSpec, TableSpec
    from connemara_spark.pipeline import ParquetStore

    spec = TableSpec(
        database="db1", schema="public", table="tt",
        columns=[ColumnSpec("id", "bigint"), ColumnSpec("v", "text")],
        pk_cols=["id"],
    )
    store = ParquetStore(spark, str(tmp_path / "silver"))
    store.write(spec, spark.createDataFrame([(1, "a")], "id long, v string"))
    store.write(spec, spark.createDataFrame([(1, "a2"), (2, "b")], "id long, v string"))
    assert store.versions(spec) == [1, 2]
    assert sorted(map(tuple, store.read_version(spec, 1).collect())) == [(1, "a")]
    assert sorted(map(tuple, store.read_version(spec, 2).collect())) == [(1, "a2"), (2, "b")]
    assert sorted(map(tuple, store.read(spec).collect())) == [(1, "a2"), (2, "b")]
    with _pytest.raises(ValueError, match="no committed version 9"):
        store.read_version(spec, 9)
    # an orphaned directory from a crashed write (CURRENT never advanced)
    # is NOT a commit: invisible to versions(), unreadable via read_version
    import os, shutil
    v2 = os.path.join(str(tmp_path / "silver"), spec.target_name, "v000002")
    v3 = os.path.join(str(tmp_path / "silver"), spec.target_name, "v000003")
    shutil.copytree(v2, v3)
    assert store.versions(spec) == [1, 2]
    with _pytest.raises(ValueError, match="no committed version 3"):
        store.read_version(spec, 3)


def test_parquet_store_gc_versions(spark, tmp_path):
    """GC drops old recovery points (completing forget_keys erasure) but
    never CURRENT; orphan dirs below CURRENT are swept too."""
    from connemara_spark.catalog import ColumnSpec, TableSpec
    from connemara_spark.pipeline import ParquetStore

    spec = TableSpec(database="db1", schema="public", table="gc",
                     columns=[ColumnSpec("id", "bigint")], pk_cols=["id"])
    store = ParquetStore(spark, str(tmp_path / "silver"))
    for i in range(4):
        store.write(spec, spark.createDataFrame([(i,)], "id long"))
    assert store.versions(spec) == [1, 2, 3, 4]
    removed = store.gc_versions(spec, keep_last=2)
    assert removed == [1, 2]
    assert store.versions(spec) == [3, 4]
    assert [r["id"] for r in store.read(spec).collect()] == [3]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_last"):
        store.gc_versions(spec, keep_last=0)

    # min-age guard: directories younger than the window are not eligible
    # (bounds the race against in-flight consumers pinned to old versions)
    store.write(spec, spark.createDataFrame([(9,)], "id long"))
    assert store.gc_versions(spec, keep_last=1, min_age_seconds=3600) == []
    assert store.versions(spec) == [3, 4, 5]
    assert store.gc_versions(spec, keep_last=1) == [3, 4]


def test_pipeline_queries_leave_no_scratch_dirs(spark, sf_dir):
    """The two multi-batch pipeline registry queries allocate a scratch
    store per invocation; repeated invocation (parity suites, bench
    loops) must leave no disk growth and no lingering cached bronze —
    the result survives cleanup via its eager localCheckpoint."""
    import glob
    import tempfile

    from connemara_spark.queries import REGISTRY

    tmp = tempfile.gettempdir()

    def scratch():
        return set(glob.glob(f"{tmp}/connemara_bucketed_*")) | set(
            glob.glob(f"{tmp}/connemara_aggview_*")
        )

    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    before = scratch()
    cache_was_empty = cache_mgr.isEmpty()
    for name in ("cdc_apply_customer_bucketed", "cdc_maintained_agg_view"):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert scratch() == before  # cleaned up BEFORE the caller collects
        assert df.count() > 0  # result readable after the store is gone
    # and the bronze/parsed caches were released: these queries add no
    # lingering entry to the CacheManager (other suites' caches tolerated)
    if cache_was_empty:
        assert cache_mgr.isEmpty()


@pytest.mark.parametrize("store_kind", ["parquet", "bucket"])
def test_evolve_rename_column_preserves_values(spark, tmp_path, store_kind):
    """The DDL executor mutates the catalog spec IN PLACE before calling the
    store's evolve hook, and both stores read parquet with an explicit spec
    schema (matched by name). evolve_rename_column must therefore read the
    still-old-named files under the PRE-rename schema — a post-rename-schema
    read silently null-fills the renamed column (the r11 regression this
    pins)."""
    from connemara_spark.stores import BucketStore

    spec = TableSpec(
        database="db1",
        schema="public",
        table="items_rn",
        columns=[ColumnSpec("id", "bigint"), ColumnSpec("v", "text")],
        pk_cols=["id"],
    )
    store = (
        ParquetStore(spark, str(tmp_path))
        if store_kind == "parquet"
        else BucketStore(spark, str(tmp_path), n_buckets=4)
    )
    store.write(spec, spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))

    # the executor's order: catalog spec mutates first, then the store hook
    for c in spec.columns:
        if c.name == "v":
            c.name = "w"
    store.evolve_rename_column(spec, "v", "w")

    got = {r["id"]: r["w"] for r in store.read(spec).collect()}
    assert got == {1: "a", 2: "b"}


def test_batch_summaries_equal_per_batch(spark, tmp_path):
    """batch_summaries (all batches' summaries in one job) must agree with
    _batch_summary over each batch's slice — counts, touched-bucket sets
    (BucketStore pricing leg) and DDL barrier rows alike."""
    from pyspark.sql import functions as F

    from connemara_spark.stores import BucketStore
    from connemara_spark.testing import make_event

    spec = TableSpec(
        database=SPEC.database, schema=SPEC.schema, table=SPEC.table,
        columns=[ColumnSpec(c.name, c.pg_type) for c in SPEC.columns],
        pk_cols=list(SPEC.pk_cols),
    )
    cat = EngineCatalog()
    cat.register(spec)
    store = BucketStore(spark, str(tmp_path / "bstore"), n_buckets=4)
    store.write(spec, spark.createDataFrame([(1, "a")], "id long, v string"))
    rep = Replayer(spark, cat, store)
    rows = [
        make_event(spec, "insert", lsn=1, row={"id": 2, "v": "b"}),
        make_event(spec, "insert", lsn=2, row={"id": 3, "v": "c"}),
        make_event(spec, "update", lsn=3, row={"id": 1, "v": "a2"}, old_key={"id": 1}),
        ddl_event(5, "ALTER TABLE public.items ADD COLUMN note text"),
        make_event(spec, "delete", lsn=6, old_key={"id": 3}),
        make_event(spec, "insert", lsn=7, row={"id": 9, "v": "z"}),
    ]
    parsed = rep.parse_batch(bronze_df(spark, rows)).localCheckpoint()
    step = 4  # batch 0: lsn 1-4, batch 1: lsn 5-8
    bix = F.expr("int((lsn_start - 1) div 4)")
    batched = rep.batch_summaries(parsed, bix)
    assert set(batched) == {0, 1}
    for i in (0, 1):
        lo_b, hi_b = 1 + i * step, 1 + (i + 1) * step
        sl = parsed.filter(
            (F.col("lsn_start") >= lo_b) & (F.col("lsn_start") < hi_b)
        )
        ddl_rows, counts, buckets = rep._batch_summary(sl)
        b_ddl, b_counts, b_buckets = batched[i]
        assert b_counts == counts
        assert b_buckets == buckets
        assert [
            (r["lsn_start"], r["columnvalues"]) for r in b_ddl
        ] == [(r["lsn_start"], r["columnvalues"]) for r in ddl_rows]
    # an lsn range with no events is simply absent; the empty summary
    # matches _batch_summary over an empty slice
    assert rep.batch_summaries(parsed.filter(F.lit(False)), F.lit(0)) == {}
    assert rep.empty_summary() == rep._batch_summary(parsed.filter(F.lit(False)))
