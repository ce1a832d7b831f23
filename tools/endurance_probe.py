"""Endurance probe (SCALE.md 'Round-8 endurance run'): the full production
stack — wal_spool StreamingReplayer + BucketStore silver + MaintainedAggView
+ JdbcApplySink into embedded Derby — drained over ~30 microbatches at
sf1-equivalent event volume (default 990k events over a 50k-row table),
with idle maintenance (retention GC / chain compaction / auto-rebucket)
interleaved the way a deployment runs it.

Per batch it records wall seconds, version-chain length, bucket count, and
Derby ledger rows; maintenance events print as they fire. Output: one JSON
line per batch plus a summary line — paste-ready for SCALE.md.

Usage: python tools/endurance_probe.py [n_batches] [events_per_batch]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 33_000

    from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
    from connemara_spark.operators.ivm import MaintainedAggView
    from connemara_spark.ops import Maintenance
    from connemara_spark.session import get_spark
    from connemara_spark.sinks import JdbcApplySink
    from connemara_spark.sources.replication import write_segment
    from connemara_spark.stores import BucketStore
    from connemara_spark.streaming import StreamingReplayer
    from connemara_spark.testing import random_event_stream

    spark = get_spark("endurance-probe")
    spark.range(1).collect()

    spec = TableSpec(
        database="db1", schema="public", table="items",
        columns=[ColumnSpec("id", "bigint"), ColumnSpec("v", "text"),
                 ColumnSpec("n", "integer")],
        pk_cols=["id"],
    )
    cat = EngineCatalog()
    cat.register(spec)
    spec = cat.get("db1", "public", "items")

    base = [{"id": i, "v": f"v{i}", "n": i} for i in range(50_000)]
    work = tempfile.mkdtemp(prefix="endurance-")
    url = "jdbc:derby:memory:endurance"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    jvm = spark._jvm
    jvm.java.lang.Class.forName(props["driver"])
    con = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    con.createStatement().execute(
        "CREATE TABLE items (id BIGINT PRIMARY KEY, v VARCHAR(64), n INT)"
    )
    con.close()

    def ledger_rows() -> int:
        c = jvm.java.sql.DriverManager.getConnection(url)
        try:
            rs = c.createStatement().executeQuery(
                "SELECT COUNT(*) FROM items_apply_ledger"
            )
            rs.next()
            return rs.getInt(1)
        finally:
            c.close()

    try:
        store = BucketStore(spark, f"{work}/silver", n_buckets=16)
        store.write(spec, spark.createDataFrame(
            [(r["id"], r["v"], r["n"]) for r in base], spec.spark_schema()))
        view = MaintainedAggView(
            spark, store, spec, group_col="v", sum_col="n",
            sum_type="decimal(18,2)", view_dir=f"{work}/view",
        )
        sink = JdbcApplySink(
            spark, store, spec, url=url, target_table="items", properties=props,
        )
        sink.bootstrap_load(batch_id="bootstrap")
        sr = StreamingReplayer(
            spark, cat, store,
            landing_dir=f"{work}/spool",
            checkpoint_dir=f"{work}/ckpt",
            landing_format="wal_spool",
            deterministic_sink_ids=True,
            maintainers=[view, sink],
        )
        # auto-rebucket envelope sized so mid-run table growth trips it:
        # the base table starts comfortably inside, inserts push it out
        start_bytes = store.table_bytes(spec)
        maint = Maintenance(
            store, cat,
            target_bucket_bytes=max(start_bytes // 12, 1),
            max_auto_buckets=256, max_chain=8, keep_last=2,
        )

        events = random_event_stream(
            spec, base, n_events=n_batches * per_batch, seed=8,
            pk_change_prob=0.02, partial_update_prob=0.3,
        )
        lat = []
        maint_events = []
        for b in range(n_batches):
            seg = events[b * per_batch:(b + 1) * per_batch]
            write_segment(f"{work}/spool", seg, f"seg-{b:06d}")
            t0 = time.monotonic()
            sr.run_until_drained(timeout_sec=600)
            dt = round(time.monotonic() - t0, 2)
            lat.append(dt)
            rec = {
                "batch": b, "sec": dt,
                "chain": store.chain_length(spec),
                "buckets": store.bucket_count(spec.target_name),
                "ledger": ledger_rows(),
            }
            # idle maintenance every 5 batches, exactly as a deployment
            # idles between spool segments
            if (b + 1) % 5 == 0:
                reports = maint.run()
                for r in reports:
                    maint_events.append(
                        {"batch": b, "action": r.action,
                         "before": r.files_before, "after": r.files_after}
                    )
                rec["maintenance"] = [
                    f"{r.action}:{r.files_before}->{r.files_after}"
                    for r in reports
                ]
            print(json.dumps(rec), flush=True)

        rows = store.read(spec).count()
        view_rows = view.read_view().count()
        half = len(lat) // 2
        summary = {
            "events": n_batches * per_batch,
            "batches": n_batches,
            "total_sec": round(sum(lat), 1),
            "events_per_sec": round(n_batches * per_batch / sum(lat)),
            "first_half_mean": round(sum(lat[:half]) / half, 2),
            "second_half_mean": round(sum(lat[half:]) / (len(lat) - half), 2),
            "min": min(lat), "max": max(lat),
            "final_rows": rows, "view_groups": view_rows,
            "final_buckets": store.bucket_count(spec.target_name),
            "final_chain": store.chain_length(spec),
            "ledger_rows": ledger_rows(),
            "maintenance": maint_events,
        }
        print(json.dumps(summary), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        try:
            jvm.java.sql.DriverManager.getConnection(url + ";drop=true")
        except Exception:
            pass


if __name__ == "__main__":
    main()
