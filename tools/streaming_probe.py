"""Streaming CDC apply throughput probe (SCALE.md 'Streaming CDC apply
throughput'): 100k mixed wal2json events over a 5k-row table, 10
LSN-ordered spool segments of 10k, wal_spool source -> foreachBatch apply
on local[32]. Prints drain seconds for the full backlog.

Usage: python tools/streaming_probe.py [rows|paths|bucketed] [n_events]
``bucketed`` drains into a BucketStore (JVM parse): the Replayer
auto-detects the store and commits PARTIAL rewrites per batch.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "paths"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
    from connemara_spark.pipeline import ParquetStore
    from connemara_spark.session import get_spark
    from connemara_spark.stores import BucketStore
    from connemara_spark.sources.replication import write_segment
    from connemara_spark.streaming import StreamingReplayer
    from connemara_spark.testing import make_event, random_event_stream

    spark = get_spark("streaming-probe")
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

    base = [{"id": i, "v": f"v{i}", "n": i} for i in range(5000)]
    events = random_event_stream(spec, base, n_events=n, seed=7)

    work = tempfile.mkdtemp(prefix="probe-")
    try:
        store = (
            BucketStore(spark, f"{work}/silver", n_buckets=64)
            if mode == "bucketed"
            else ParquetStore(spark, f"{work}/silver")
        )
        store.write(spec, spark.createDataFrame(
            [(r["id"], r["v"], r["n"]) for r in base], spec.spark_schema()))
        seg_size = max(1, n // 10)
        for s in range(0, len(events), seg_size):
            write_segment(f"{work}/spool", events[s:s + seg_size], f"seg-{s:012d}")
        sr = StreamingReplayer(
            spark, cat, store,
            landing_dir=f"{work}/spool", checkpoint_dir=f"{work}/ckpt",
            landing_format="wal_spool", jvm_parse=(mode in ("paths", "bucketed")),
        )
        t0 = time.monotonic()
        sr.run_until_drained(timeout_sec=600)
        dt = time.monotonic() - t0
        rows = store.read(spec).count()
        print(f"mode={mode} events={n} drain={dt:.1f}s "
              f"({n / dt:,.0f} events/s) final_rows={rows}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
