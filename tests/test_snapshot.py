"""Snapshot bootstrap: parquet import + schema-script restore, then CDC on top."""

from __future__ import annotations

from connemara_spark.catalog import EngineCatalog
from connemara_spark.events import BRONZE_SCHEMA
from connemara_spark.pipeline import MemoryStore, Replayer
from connemara_spark.sources import restore_schema_script, snapshot_from_parquet
from connemara_spark.streaming.driver import LsnWatermark
from connemara_spark.testing import make_event


def test_snapshot_then_cdc_end_to_end(spark, sf_dir, tmp_path):
    """The full §3.1→§3.3 lifecycle: basebackup analog then replay on top."""
    cat = EngineCatalog()
    store = MemoryStore(spark)
    wm = LsnWatermark(str(tmp_path / "wm.json"))

    specs = snapshot_from_parquet(
        spark, cat, store,
        database="db1", schema="public",
        tables={"customer": f"{sf_dir}/customer.parquet", "nation": f"{sf_dir}/nation.parquet"},
        pk_cols={"customer": ["c_custkey"], "nation": ["n_nationkey"]},
        consistent_lsn=100,
        watermark=wm,
    )
    assert {s.target_name for s in specs} == {"db1_public.customer", "db1_public.nation"}
    assert wm.get("db1", "slot_db1") == 100
    spec = cat.get("db1", "public", "customer")
    assert spec.pk_cols == ["c_custkey"]
    n0 = store.read(spec).count()
    assert n0 > 0

    rep = Replayer(spark, cat, store)
    rows = [
        make_event(spec, "insert", lsn=101, row={
            "c_custkey": 999999, "c_name": "Post-snapshot", "c_nationkey": 1,
            "c_acctbal": 1.0, "c_mktsegment": "AUTO",
        }),
        make_event(spec, "delete", lsn=102, old_key={"c_custkey": 1}),
    ]
    bronze = spark.createDataFrame(
        [tuple(r[f.name] for f in BRONZE_SCHEMA.fields) for r in rows], schema=BRONZE_SCHEMA
    )
    rep.apply_batch(bronze)
    assert store.read(spec).count() == n0  # +1 insert −1 delete


def test_restore_schema_script(spark):
    script = """
    -- a dump header comment
    SET statement_timeout = 0;
    CREATE TABLE public.accounts (id bigint PRIMARY KEY, email text UNIQUE, bal numeric(10,2));
    CREATE SEQUENCE public.accounts_id_seq;
    CREATE INDEX idx_email ON public.accounts (email);
    ALTER TABLE public.accounts OWNER TO admin;
    GRANT SELECT ON public.accounts TO readonly;
    COMMENT ON TABLE public.accounts IS 'the accounts';
    CREATE FUNCTION public.f() RETURNS int AS $$ SELECT 1 $$ LANGUAGE sql;
    CREATE TABLE _timescaledb_internal.chunk_1 (x int);
    \\connect otherdb
    """
    cat = EngineCatalog()
    counts = restore_schema_script(script, "db1", cat)
    spec = cat.get("db1", "public", "accounts")
    assert spec.pk_cols == ["id"]
    assert spec.has_extra_unique  # UNIQUE(email) recorded for routing F8
    assert [c.pg_type for c in spec.columns] == ["bigint", "text", "numeric(10,2)"]
    assert counts["executed"] == 2  # table + sequence
    assert counts["ignored_schema"] == 1
    assert counts["skipped"] >= 5


def test_restore_remaps_regclass_sequence_defaults(spark):
    """The verdict's pg_dump case: a serial column's DEFAULT carries a
    regclass literal that the replay-path regex rewrite cannot reach; the
    restore path's token-grade remapper must rewrite it."""
    script = """
    CREATE SCHEMA app;
    CREATE SEQUENCE app.items_id_seq;
    CREATE TABLE app.items (
        id integer DEFAULT nextval('app.items_id_seq'::regclass) NOT NULL,
        label text
    );
    ALTER SEQUENCE app.items_id_seq OWNED BY app.items.id;
    """
    cat = EngineCatalog()
    counts = restore_schema_script(script, "db1", cat)
    spec = cat.get("db1", "app", "items")
    assert [c.name for c in spec.columns] == ["id", "label"]
    # CREATE SCHEMA is skip-classified; seq + table + alterseq execute
    assert counts["executed"] == 3
    assert counts["unknown"] == 0


def test_snapshot_from_jdbc_contract_derby(spark):
    """S5 exercised over a REAL JDBC connection: Derby (in Spark's own
    classpath, embedded in-memory) stands in for PostgreSQL. Verifies the
    partitioned parallel scan (bounds subquery + numPartitions pk-range
    sharding — the ctid%8 analog, restore.py:19,42-54), spec registration,
    and store load, end-to-end through spark.read.jdbc."""
    from connemara_spark.sources import snapshot_from_jdbc

    url = "jdbc:derby:memory:snapdb_t;create=true"
    con = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = con.createStatement()
    st.execute("CREATE TABLE accounts (id INT PRIMARY KEY, email VARCHAR(64), bal DOUBLE)")
    for i in range(1, 21):
        st.execute(f"INSERT INTO accounts VALUES ({i}, 'u{i}@x.com', {i * 1.5})")
    st.execute("CREATE TABLE tags (label VARCHAR(32))")  # no numeric pk → unsharded path
    st.execute("INSERT INTO tags VALUES ('a')")
    con.commit()

    cat = EngineCatalog()
    store = MemoryStore(spark)
    specs = snapshot_from_jdbc(
        spark, cat, store,
        url="jdbc:derby:memory:snapdb_t",
        database="db1", schema="APP",
        tables={"accounts": ["ID"], "tags": []},
        num_partitions=4,
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    by_name = {s.table: s for s in specs}
    acc = store.read(by_name["accounts"])
    assert acc.count() == 20
    assert acc.rdd.getNumPartitions() == 4  # pk-range sharding took effect
    assert {r["ID"] for r in acc.select("ID").collect()} == set(range(1, 21))
    assert store.read(by_name["tags"]).count() == 1
    assert cat.get("db1", "APP", "accounts").pk_cols == ["ID"]


def test_bootstrap_snapshot_skips_prewatermark_spool_overlap(spark, tmp_path):
    """The bootstrap hazard every real deployment hits: the spool already
    holds events from BEFORE the snapshot's consistent LSN (the receiver
    started first — the reference coordinates the basebackup LSN with the
    replication origin for exactly this). Seeding the watermark at the
    snapshot LSN must make the streaming drain skip the pre-snapshot
    overlap and apply only the tail — double-applying an insert that the
    snapshot already contains would corrupt the target."""
    from connemara_spark.catalog import ColumnSpec, TableSpec
    from connemara_spark.pipeline import ParquetStore
    from connemara_spark.sources.replication import write_segment
    from connemara_spark.streaming import StreamingReplayer

    cat = EngineCatalog()
    spec = TableSpec(
        database="db1", schema="public", table="items",
        columns=[ColumnSpec("id", "bigint"), ColumnSpec("v", "text")],
        pk_cols=["id"],
    )
    cat.register(spec)
    spec = cat.get("db1", "public", "items")
    store = ParquetStore(spark, str(tmp_path / "silver"))
    wm_path = str(tmp_path / "wm.json")

    # snapshot consistent at LSN 100: contains the effect of events <= 100
    # (id=1 updated at lsn 98 to 'new1', id=2 inserted at lsn 99)
    snap = spark.createDataFrame([(1, "new1"), (2, "b")], spec.spark_schema())
    store.write(spec, snap)
    wm = LsnWatermark(wm_path)
    wm.advance({("db1", "slot_db1"): 100})

    # the spool overlaps the snapshot: 95..100 are ALREADY in the snapshot
    spool = str(tmp_path / "spool")
    overlap = [
        make_event(spec, "insert", lsn=95, row={"id": 1, "v": "old1"}),
        make_event(spec, "update", lsn=98, row={"id": 1, "v": "new1"}, old_key={"id": 1}),
        make_event(spec, "insert", lsn=99, row={"id": 2, "v": "b"}),
    ]
    tail = [
        make_event(spec, "update", lsn=101, row={"id": 2, "v": "b2"}, old_key={"id": 2}),
        make_event(spec, "insert", lsn=102, row={"id": 3, "v": "c"}),
    ]
    write_segment(spool, [dict(e) for e in overlap + tail], "seg-001")

    sr = StreamingReplayer(
        spark, cat, store,
        landing_dir=spool, checkpoint_dir=str(tmp_path / "ckpt"),
        landing_format="wal_spool", watermark_path=wm_path,
    )
    sr.run_until_drained()
    got = {r["id"]: r["v"] for r in store.read(spec).collect()}
    assert got == {1: "new1", 2: "b2", 3: "c"}
    assert sr.watermark.get("db1", "slot_db1") == 102
