"""DISTINCT-COUNT maintainer endurance at 5M events / 100 batches
(SCALE.md r11 — the r10 verdict's #6: after TOP-K's 5M run, the bucketed
support multiset is the next most state-fragile structure; drive it with
gc_support ACTIVE and record that the support store stays bounded while
per-batch cost stays flat).

Per batch: wall seconds, touched support buckets, support_dir and
view_dir bytes + live version-dir counts after GC. At the end: the view
EQUALS a full COUNT(DISTINCT) recompute of the final state, plus
first/second-half latency means.

Usage: PYTHONPATH=. python tools/distinct_endurance_probe.py [n_batches] [events_per_batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _vdirs(path: str) -> int:
    try:
        return sum(1 for e in os.listdir(path) if e.startswith("v"))
    except OSError:
        return 0


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
    from connemara_spark.operators.ivm import MaintainedDistinctCountView
    from connemara_spark.session import get_spark
    from connemara_spark.sources.replication import write_segment
    from connemara_spark.stores import BucketStore
    from connemara_spark.streaming import StreamingReplayer
    from connemara_spark.testing import random_event_stream

    spark = get_spark("distinct-endurance")
    spark.range(1).collect()

    spec = TableSpec(
        database="db1", schema="public", table="metrics",
        columns=[ColumnSpec("id", "bigint"), ColumnSpec("g", "text"),
                 ColumnSpec("x", "integer")],
        pk_cols=["id"],
    )
    cat = EngineCatalog()
    cat.register(spec)
    spec = cat.get("db1", "public", "metrics")

    base = [{"id": i, "g": f"g{i % 100}", "x": i % 500} for i in range(50_000)]
    work = tempfile.mkdtemp(prefix="distinct-endurance-")
    try:
        store = BucketStore(spark, f"{work}/silver", n_buckets=16)
        store.write(spec, spark.createDataFrame(
            [(r["id"], r["g"], r["x"]) for r in base], spec.spark_schema()))
        dv = MaintainedDistinctCountView(
            spark, store, spec, group_col="g", val_col="x",
            val_pg_type="integer", view_dir=f"{work}/dv",
            support_buckets=16,
        )
        sr = StreamingReplayer(
            spark, cat, store,
            landing_dir=f"{work}/spool",
            checkpoint_dir=f"{work}/ckpt",
            landing_format="wal_spool",
            maintainers=[dv],
        )

        events = random_event_stream(
            spec, base, n_events=n_batches * per_batch, seed=17,
            pk_change_prob=0.02, partial_update_prob=0.3,
            value_maker={
                "g": lambda rng: f"g{rng.randint(0, 99)}",
                "x": lambda rng: rng.randint(0, 499),
            },
        )
        lat = []
        for b in range(n_batches):
            seg = events[b * per_batch:(b + 1) * per_batch]
            write_segment(f"{work}/spool", seg, f"seg-{b:06d}")
            t0 = time.monotonic()
            sr.run_until_drained(timeout_sec=600)
            dt = round(time.monotonic() - t0, 2)
            lat.append(dt)
            dv.gc_view(keep_last=2)
            dv.gc_support(keep_last=2)
            store.gc_versions(spec, keep_last=2)
            if b % 10 == 0 or b == n_batches - 1:
                print(json.dumps({
                    "batch": b, "sec": dt,
                    "touched_buckets": dv.last_touched_buckets,
                    "support_dir_mb": round(
                        _dir_bytes(f"{work}/dv/support") / 1e6, 2),
                    "view_dir_mb": round(_dir_bytes(f"{work}/dv") / 1e6, 2),
                    "view_versions_on_disk": _vdirs(f"{work}/dv"),
                }), flush=True)

        state = store.read(spec).localCheckpoint()
        key = lambda r: tuple(map(str, r))
        got = sorted(map(tuple, dv.read_view().collect()), key=key)
        want = sorted(map(tuple, dv._full_agg(state).collect()), key=key)
        half = len(lat) // 2
        print(json.dumps({
            "events": n_batches * per_batch,
            "batches": n_batches,
            "total_sec": round(sum(lat), 1),
            "events_per_sec": round(n_batches * per_batch / sum(lat)),
            "first_half_mean": round(sum(lat[:half]) / half, 2),
            "second_half_mean": round(sum(lat[half:]) / (len(lat) - half), 2),
            "min": min(lat), "max": max(lat),
            "final_rows": state.count(),
            "support_dir_mb_final": round(
                _dir_bytes(f"{work}/dv/support") / 1e6, 2),
            "view_dir_mb_final": round(_dir_bytes(f"{work}/dv") / 1e6, 2),
            "view_equal_full_recompute": got == want,
        }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
