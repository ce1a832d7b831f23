"""Multi-source consolidation end-to-end — the reference's HEADLINE
capability exercised as one test: N source databases merge into one target
store, each source landing in its own ``<db>_<schema>`` namespace
(docs/index.rst:9-12, connemara_rewrite.pm:13-21), so BI tools join across
sources without Foreign Data Wrappers (docs/architecture.rst:4-24).

The test drives every stage of that story end-to-end and fails if any stage
breaks namespace isolation or per-source apply ordering:

1. TWO real JDBC sources (embedded Derby standing in for PostgreSQL, in
   Spark's own classpath) holding the SAME schema-qualified table name with
   conflicting rows — the exact collision consolidation exists to resolve.
2. ``snapshot_from_jdbc`` per source → schema-mapped namespaces in one
   shared store + engine catalog.
3. ONE interleaved CDC batch carrying both sources' events (LSNs
   interleaved across sources) plus a rogue-slot event, applied through the
   Replayer with a slot restriction (F2, replay.pl:726-736).
4. A cross-source join on the consolidated store — the reference's entire
   reason to exist.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from connemara_spark.catalog import EngineCatalog
from connemara_spark.events import BRONZE_SCHEMA
from connemara_spark.pipeline import MemoryStore, Replayer
from connemara_spark.testing import make_event


def _bronze(spark, rows):
    return spark.createDataFrame(
        [tuple(r[f.name] for f in BRONZE_SCHEMA.fields) for r in rows],
        schema=BRONZE_SCHEMA,
    )


def _make_source(spark, db: str, rows: list[tuple[int, str, float]]) -> str:
    url = f"jdbc:derby:memory:cons_{db};create=true"
    con = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = con.createStatement()
    st.execute(
        "CREATE TABLE customers (id INT PRIMARY KEY, name VARCHAR(64), bal DOUBLE)"
    )
    for i, name, bal in rows:
        st.execute(f"INSERT INTO customers VALUES ({i}, '{name}', {bal})")
    con.commit()
    return f"jdbc:derby:memory:cons_{db}"


def test_two_jdbc_sources_consolidate_and_join(spark):
    from connemara_spark.sources import snapshot_from_jdbc

    # --- stage 1+2: two sources, same table name, conflicting id=1 rows ---
    url_a = _make_source(spark, "dba", [(1, "alice", 10.0), (2, "bob", 20.0)])
    url_b = _make_source(spark, "dbb", [(1, "ana", 30.0), (3, "carol", 40.0)])

    cat = EngineCatalog()
    store = MemoryStore(spark)
    spec = {}
    for db, url in (("dba", url_a), ("dbb", url_b)):
        specs = snapshot_from_jdbc(
            spark, cat, store,
            url=url, database=db, schema="APP",
            tables={"customers": ["ID"]},
            num_partitions=2,
            properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
        )
        spec[db] = specs[0]

    # Schema-map namespaces: both sources landed in ONE store, isolated as
    # <db>_<schema>.<table> — never overwriting each other.
    assert set(store.tables) == {"dba_APP.customers", "dbb_APP.customers"}
    assert {r["NAME"] for r in store.read(spec["dba"]).collect()} == {"alice", "bob"}
    assert {r["NAME"] for r in store.read(spec["dbb"]).collect()} == {"ana", "carol"}

    # --- stage 3: ONE interleaved CDC batch from both sources -------------
    # dba's id=1 is updated twice (lsn 101 then 105): per-source per-key
    # ordering must keep the later value. dbb's events interleave between
    # them; dbb also deletes id=3. A rogue event claims database=dba but
    # arrives on an unapproved slot — the F2 restriction must drop it.
    ev = [
        make_event(spec["dba"], "update", lsn=101,
                   row={"ID": 1, "NAME": "alice", "BAL": 11.0}, old_key={"ID": 1}),
        make_event(spec["dbb"], "update", lsn=102,
                   row={"ID": 1, "NAME": "ana", "BAL": 31.0}, old_key={"ID": 1}),
        make_event(spec["dba"], "insert", lsn=103,
                   row={"ID": 3, "NAME": "carl", "BAL": 33.0}),
        make_event(spec["dbb"], "delete", lsn=104, old_key={"ID": 3}),
        make_event(spec["dba"], "update", lsn=105,
                   row={"ID": 1, "NAME": "alice", "BAL": 12.0}, old_key={"ID": 1}),
    ]
    rogue = make_event(
        spec["dba"], "update", lsn=106,
        row={"ID": 1, "NAME": "evil", "BAL": -1.0}, old_key={"ID": 1},
    )
    rogue["source_slotname"] = "slot_rogue"
    ev.append(rogue)

    rep = Replayer(
        spark, cat, store,
        allowed_slots=[("dba", "slot_dba"), ("dbb", "slot_dbb")],
    )
    metrics = rep.apply_batch(_bronze(spark, ev))
    assert metrics.segments == 1
    assert metrics.tables_touched == 2  # one target PER SOURCE namespace

    a = {r["ID"]: r for r in store.read(spec["dba"]).collect()}
    b = {r["ID"]: r for r in store.read(spec["dbb"]).collect()}

    # per-source apply ordering: dba id=1 saw lsn 101 THEN 105 → bal 12.0
    assert a[1]["BAL"] == 12.0 and a[1]["NAME"] == "alice"
    assert a[3]["NAME"] == "carl" and a[2]["NAME"] == "bob"
    # namespace isolation: dba's churn on id=1 never leaked into dbb's row,
    # and the rogue-slot update touched neither namespace
    assert b[1]["BAL"] == 31.0 and b[1]["NAME"] == "ana"
    assert 3 not in b  # dbb's delete applied
    assert all(r["NAME"] != "evil" for r in [*a.values(), *b.values()])

    # --- stage 4: the cross-source BI join (no FDW, one store) ------------
    joined = (
        store.read(spec["dba"]).alias("a")
        .join(store.read(spec["dbb"]).alias("b"), F.col("a.ID") == F.col("b.ID"))
        .select(
            F.col("a.ID").alias("id"),
            F.col("a.NAME").alias("name_dba"), F.col("a.BAL").alias("bal_dba"),
            F.col("b.NAME").alias("name_dbb"), F.col("b.BAL").alias("bal_dbb"),
        )
    )
    rows = joined.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id"], r["name_dba"], r["bal_dba"], r["name_dbb"], r["bal_dbb"]) == (
        1, "alice", 12.0, "ana", 31.0,
    )


def test_two_source_join_view_rogue_stream_is_potent(spark, sf_dir):
    """The cdc_two_source_join_view registry query rides a rogue-slot
    stream alongside the two legit sources; its value gate only proves the
    F2 restriction if an ADMITTED rogue would actually change the result.
    Pin that potency: the rogue duplicates every legit customer event at
    lsn+1 with a poisoned c_name, so (a) the stream is nonempty, (b) with
    the slot restriction every parsed c_name is clean, and (c) WITHOUT the
    restriction the per-key fold picks a poisoned name for every key whose
    last legit event was an upsert."""
    from connemara_spark import queries as q
    from connemara_spark.events import parse_events, slot_restriction
    from connemara_spark.operators.apply import apply_changes

    legit = q._customer_cdc_bronze(spark, sf_dir).filter(
        F.col("lsn_start") % 2 == 0
    )
    rogue = q._customer_cdc_bronze(
        spark, sf_dir, slot="slot_rogue", name_prefix="evil#", lsn_offset=1
    ).filter(F.col("lsn_start") % 2 == 1)
    n_rogue = rogue.count()
    assert n_rogue > 0
    both = legit.unionByName(rogue)

    restricted = slot_restriction(
        parse_events(both), None, [("db1", "slot_db1")]
    )
    assert restricted.count() == legit.count()

    snapshot = q.load(spark, sf_dir, "customer")
    leaked = apply_changes(snapshot, parse_events(both), q.CUSTOMER_SPEC)
    clean = apply_changes(snapshot, parse_events(legit), q.CUSTOMER_SPEC)
    n_evil = leaked.filter(F.col("c_name").startswith("evil#")).count()
    assert n_evil > 0
    assert clean.filter(F.col("c_name").startswith("evil#")).count() == 0
