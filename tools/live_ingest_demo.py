"""Live-ingest deployment wiring: JDBC snapshot bootstrap -> wal_spool CDC.

This script completes the SURVEY §3.1 -> §3.2 story for a real deployment:

1. **Snapshot bootstrap (§3.1, S4/S5)** — ``snapshot_from_jdbc`` shards each
   table by pk range (``numPartitions`` — the reference's ctid%8 analog,
   ``restore.py:19,42-54``), registers specs, and loads the silver store.
2. **Watermark seeding (W3, the bootstrap-overlap contract)** — the
   per-(database, slot) LSN watermark is seeded at the snapshot's
   **consistent LSN** so spool events from BEFORE the snapshot (a receiver
   started early) are skipped, never double-applied. On PostgreSQL obtain it
   atomically with the snapshot connection::

       SELECT pg_create_logical_replication_slot('conn_slot', 'wal2json');
       -- returns (slot_name, consistent_point)  <- pass as --consistent-lsn
       -- then run the snapshot in a REPEATABLE READ txn exported from the
       -- slot's snapshot (pg_export_snapshot / CREATE_REPLICATION_SLOT ...
       -- EXPORT_SNAPSHOT), the same coordination the reference's
       -- basebackup+slot bootstrap performs.

3. **Streaming CDC (§3.2, S1)** — ``StreamingReplayer`` drains the wal_spool
   landing zone continuously. The spool is fed OUTSIDE this process by any
   wal2json transport, e.g.::

       pg_recvlogical -d $DB --slot conn_slot --start -o format-version=1 \
           -f - | segment-roller >> $SPOOL/seg-$(printf %012d $n).jsonl

   Segment files must be immutable once fully written and sort in arrival
   order (the source's monotone-segment contract,
   ``connemara_spark/sources/replication.py``).

No PostgreSQL exists in this sandbox, so ``--demo`` runs the identical
wiring self-contained: an embedded Derby database plays the JDBC source and
two synthetic wal2json segments play the receiver. The demo exercises every
seam a real deployment uses — partitioned JDBC snapshot, watermark seed,
overlap skip, streaming drain, exactly-once restart.

Usage::

    python tools/live_ingest_demo.py --demo
    python tools/live_ingest_demo.py \
        --jdbc-url jdbc:postgresql://host/db --database db1 --schema public \
        --table 'customer:c_custkey' --consistent-lsn 123456789 \
        --spool-dir /data/spool --work-dir /data/engine
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--demo", action="store_true", help="self-contained Derby + synthetic-segment run")
    p.add_argument("--jdbc-url", help="JDBC URL of the source database")
    p.add_argument("--jdbc-driver", default="org.postgresql.Driver")
    p.add_argument("--database", default="db1")
    p.add_argument("--schema", default="public")
    p.add_argument(
        "--table", action="append", default=[],
        help="table:pk1[,pk2...] — repeat per table; empty pk list disables range sharding",
    )
    p.add_argument("--consistent-lsn", type=int, default=0,
                   help="snapshot-consistent LSN from slot creation (seeds the watermark)")
    p.add_argument("--spool-dir", help="wal2json JSONL landing zone (fed by the receiver)")
    p.add_argument("--work-dir", help="engine state root (silver store, checkpoints, watermark)")
    p.add_argument("--num-partitions", type=int, default=8)
    p.add_argument("--max-segments-per-trigger", type=int, default=64,
                   help="W6 backpressure bound per microbatch")
    p.add_argument("--trigger", default="15 seconds")
    p.add_argument("--drain-and-exit", action="store_true",
                   help="availableNow: drain the spool once and stop (catch-up mode)")
    return p.parse_args(argv)


def build_engine(spark, args):
    from connemara_spark.catalog import EngineCatalog
    from connemara_spark.pipeline import ParquetStore
    from connemara_spark.sources import snapshot_from_jdbc
    from connemara_spark.streaming import StreamingReplayer
    from connemara_spark.streaming.driver import LsnWatermark

    os.makedirs(args.work_dir, exist_ok=True)
    catalog = EngineCatalog()
    store = ParquetStore(spark, os.path.join(args.work_dir, "silver"))
    watermark_path = os.path.join(args.work_dir, "checkpoints", "lsn_watermark.json")

    marker = os.path.join(args.work_dir, "BOOTSTRAPPED.json")
    tables = {}
    for t in args.table:
        name, _, pks = t.partition(":")
        tables[name] = [c for c in pks.split(",") if c]
    if not os.path.exists(marker):
        # §3.1: partitioned parallel snapshot + watermark seed, committed
        # via write-then-rename so a crashed bootstrap restarts from scratch
        specs = snapshot_from_jdbc(
            spark, catalog, store,
            url=args.jdbc_url, database=args.database, schema=args.schema,
            tables=tables, num_partitions=args.num_partitions,
            properties={"driver": args.jdbc_driver},
        )
        LsnWatermark(watermark_path).advance(
            {(args.database, f"slot_{args.database}"): args.consistent_lsn}
        )
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "tables": {
                        s.table: {
                            "columns": [[c.name, c.pg_type] for c in s.columns],
                            "pk_cols": list(s.pk_cols),
                        }
                        for s in specs
                    },
                    "consistent_lsn": args.consistent_lsn,
                },
                fh,
            )
        os.replace(tmp, marker)
        print(f"bootstrapped {len(specs)} tables at consistent LSN {args.consistent_lsn}")
    else:
        # restart: re-register specs from the committed bootstrap marker
        # (the silver store layout is versioned — specs, not paths, are the
        # restart contract)
        from connemara_spark.catalog import ColumnSpec, TableSpec

        with open(marker) as fh:
            boot = json.load(fh)
        for name, meta in boot["tables"].items():
            catalog.register(TableSpec(
                database=args.database, schema=args.schema, table=name,
                columns=[ColumnSpec(n, t) for n, t in meta["columns"]],
                pk_cols=meta["pk_cols"],
            ))
        print(f"restart: re-registered {len(boot['tables'])} tables, watermark preserved")

    # §3.2: continuous CDC drain with exactly-once restart semantics
    return StreamingReplayer(
        spark, catalog, store,
        landing_dir=args.spool_dir,
        checkpoint_dir=os.path.join(args.work_dir, "checkpoints"),
        landing_format="wal_spool",
        max_files_per_trigger=args.max_segments_per_trigger,
    ), store, catalog


def run_demo(spark, tmp_root):
    """The same wiring against embedded Derby + synthetic segments."""
    from connemara_spark.sources.replication import write_segment

    # db name derived from tmp_root: re-running in one JVM (demo twice, or
    # the pytest gate after a manual run) must not collide in Derby's
    # in-memory namespace
    dbname = "livedemo_" + os.path.basename(tmp_root).replace("-", "_")
    url = f"jdbc:derby:memory:{dbname};create=true"
    con = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = con.createStatement()
    st.execute("CREATE TABLE accounts (id INT PRIMARY KEY, email VARCHAR(64), bal DOUBLE)")
    for i in range(1, 11):
        st.execute(f"INSERT INTO accounts VALUES ({i}, 'u{i}@x.com', {i * 1.5})")
    con.commit()

    spool = os.path.join(tmp_root, "spool")
    os.makedirs(spool, exist_ok=True)

    def ev(lsn, kind, row=None, old_id=None):
        payload = {
            "kind": kind, "schema": "APP", "table": "accounts",
            "columnnames": list(row) if row else None,
            "columnvalues": [str(v) for v in row.values()] if row else None,
            "oldkeys": {"keynames": ["ID"], "keyvalues": [str(old_id)]} if old_id else None,
        }
        return {
            "insert_timestamp": "2024-06-01 00:00:00", "database": "db1",
            "source_slotname": "slot_db1", "lsn_start": lsn, "xid": lsn + 100,
            "xid_timestamp": "2024-06-01 00:00:00", "payload": json.dumps(payload),
        }

    # segment 1 contains a PRE-SNAPSHOT event (lsn 3 <= consistent LSN 5):
    # the seeded watermark must skip it — the bootstrap-overlap contract
    write_segment(spool, [
        ev(3, "update", {"ID": 1, "EMAIL": "stale@x.com", "BAL": 0.0}, old_id=1),
        ev(7, "update", {"ID": 2, "EMAIL": "u2@new.com", "BAL": 9.9}, old_id=2),
    ], "seg-000001")
    write_segment(spool, [
        ev(8, "insert", {"ID": 99, "EMAIL": "new@x.com", "BAL": 1.0}),
        ev(9, "delete", old_id=3),
    ], "seg-000002")

    args = parse_args([
        "--jdbc-url", f"jdbc:derby:memory:{dbname}",
        "--jdbc-driver", "org.apache.derby.jdbc.EmbeddedDriver",
        "--database", "db1", "--schema", "APP",
        "--table", "accounts:ID",
        "--consistent-lsn", "5",
        "--spool-dir", spool,
        "--work-dir", os.path.join(tmp_root, "engine"),
        "--drain-and-exit",
    ])
    sr, store, catalog = build_engine(spark, args)
    sr.run_until_drained()
    spec = catalog.get("db1", "APP", "accounts")
    rows = {r["ID"]: (r["EMAIL"], r["BAL"]) for r in store.read(spec).collect()}
    assert rows[1] == ("u1@x.com", 1.5), "pre-snapshot event must be skipped"
    assert rows[2] == ("u2@new.com", 9.9)
    assert 99 in rows and 3 not in rows
    print(f"demo OK: {len(rows)} rows, overlap skipped, CDC applied "
          f"({sr.batches_applied} batch[es])")

    # restart with the same dirs: nothing replays (exactly-once)
    sr2, store2, catalog2 = build_engine(spark, args)
    sr2.run_until_drained()
    assert sr2.batches_applied == 0 or store2.read(
        catalog2.get("db1", "APP", "accounts")
    ).count() == len(rows)
    print("restart OK: no duplicate application")


def main():
    args = parse_args()
    from connemara_spark.session import get_spark

    spark = get_spark()
    if args.demo:
        import tempfile

        run_demo(spark, tempfile.mkdtemp(prefix="connemara_live_demo_"))
        return
    required = [args.jdbc_url, args.spool_dir, args.work_dir, args.table]
    if not all(required):
        raise SystemExit("need --jdbc-url, --spool-dir, --work-dir and --table (or --demo)")
    sr, _store, _catalog = build_engine(spark, args)
    if args.drain_and_exit:
        sr.run_until_drained()
    else:
        q = sr.start(processing_time=args.trigger)
        q.awaitTermination()


if __name__ == "__main__":
    main()
