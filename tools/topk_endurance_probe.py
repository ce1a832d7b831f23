"""TOP-K maintainer endurance at 5M events / 100 batches (SCALE.md r10 —
the r9 verdict's #6: the most state-fragile maintainer, alone, at 10x the
family run's volume, with gc_view ACTIVE so view_dir growth is bounded).

Per batch: wall seconds, rescanned-group count (the buffer-burn leg),
view_dir size on disk and live version-dir count after GC. At the end:
the view EQUALS a full ROW_NUMBER recompute of the final state, plus
first/second-half latency means (flat == per-batch cost tracks the batch,
not the accumulated table).

Usage: PYTHONPATH=. python tools/topk_endurance_probe.py [n_batches] [events_per_batch]
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


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    from pyspark.sql import functions as F

    from connemara_spark.catalog import ColumnSpec, EngineCatalog, TableSpec
    from connemara_spark.operators.ivm import MaintainedTopKView
    from connemara_spark.session import get_spark
    from connemara_spark.sources.replication import write_segment
    from connemara_spark.stores import BucketStore
    from connemara_spark.streaming import StreamingReplayer
    from connemara_spark.testing import random_event_stream

    spark = get_spark("topk-endurance")
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
    work = tempfile.mkdtemp(prefix="topk-endurance-")
    try:
        store = BucketStore(spark, f"{work}/silver", n_buckets=16)
        store.write(spec, spark.createDataFrame(
            [(r["id"], r["g"], r["x"]) for r in base], spec.spark_schema()))
        tk = MaintainedTopKView(
            spark, store, spec, group_col="g", val_col="x",
            k=5, slack=5, val_type="int", view_dir=f"{work}/tk",
        )
        sr = StreamingReplayer(
            spark, cat, store,
            landing_dir=f"{work}/spool",
            checkpoint_dir=f"{work}/ckpt",
            landing_format="wal_spool",
            maintainers=[tk],
        )

        events = random_event_stream(
            spec, base, n_events=n_batches * per_batch, seed=11,
            pk_change_prob=0.02, partial_update_prob=0.3,
            value_maker={
                "g": lambda rng: f"g{rng.randint(0, 99)}",
                "x": lambda rng: rng.randint(0, 499),
            },
        )
        lat, rescans = [], 0
        for b in range(n_batches):
            seg = events[b * per_batch:(b + 1) * per_batch]
            write_segment(f"{work}/spool", seg, f"seg-{b:06d}")
            t0 = time.monotonic()
            sr.run_until_drained(timeout_sec=600)
            dt = round(time.monotonic() - t0, 2)
            lat.append(dt)
            rescans += tk.last_recompute_groups or 0
            tk.gc_view(keep_last=2)
            store.gc_versions(spec, keep_last=2)
            if b % 10 == 0 or b == n_batches - 1:
                vdirs = sum(
                    1 for e in os.listdir(f"{work}/tk") if e.startswith("v")
                )
                print(json.dumps({
                    "batch": b, "sec": dt,
                    "rescan_groups": tk.last_recompute_groups,
                    "view_dir_mb": round(_dir_bytes(f"{work}/tk") / 1e6, 2),
                    "view_versions_on_disk": vdirs,
                }), flush=True)

        state = store.read(spec).localCheckpoint()
        sel = lambda df: df.select(
            "g", "n_rows",
            F.expr("transform(slice(top, 1, 5), p -> concat(p.v, ':', p.id))").alias("t"),
        )
        key = lambda r: tuple(map(str, r))
        got = sorted(map(tuple, sel(tk.read_view()).collect()), key=key)
        want = sorted(
            map(tuple, sel(
                tk._full_agg(state).select("g", "n_rows", F.slice("top", 1, 5).alias("top"))
            ).collect()),
            key=key,
        )
        half = len(lat) // 2
        print(json.dumps({
            "events": n_batches * per_batch,
            "batches": n_batches,
            "total_sec": round(sum(lat), 1),
            "events_per_sec": round(n_batches * per_batch / sum(lat)),
            "first_half_mean": round(sum(lat[:half]) / half, 2),
            "second_half_mean": round(sum(lat[half:]) / (len(lat) - half), 2),
            "min": min(lat), "max": max(lat),
            "total_rescan_groups": rescans,
            "final_rows": state.count(),
            "view_dir_mb_final": round(_dir_bytes(f"{work}/tk") / 1e6, 2),
            "view_equal_full_recompute": got == want,
        }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
