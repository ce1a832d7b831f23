"""Streaming LSH near-dup candidate probe at crawl scale (SCALE.md): the
real quadratic risk for `lsh_candidates_stream` is DEGENERATE buckets —
boilerplate text collapsing tens of thousands of docs into one band
bucket, whose uncapped emission is C(n,2) pairs. This probe plants a
controlled bucket-size distribution and measures, per `max_members` cap:
emitted candidate pairs, drain wall time, and state rows.

Layout at N docs (deterministic, id-derived):
- 1% of docs spread across 10 "boilerplate" buckets (N=10M -> 10k
  members each; uncapped emission would be ~500M pairs — the case the
  cap exists for);
- 4% in 2-member "true near-dup" buckets (the pairs we must keep);
- 95% in wide-spread buckets (~2 members at N=10M) — background noise.

Expected emissions: capped junk = 10 * C(min(cap, n_junk), 2); true
pairs = N*0.02; background ~ its own pair count. A cap between 64 and
1024 keeps junk emission negligible next to true pairs while leaving
real clusters intact (real near-dup clusters are small).

Usage: python tools/stream_lsh_probe.py [n_docs] [cap1,cap2,...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    caps = (
        [int(c) for c in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [64, 256]
    )

    from pyspark.sql import functions as F

    from connemara_spark.session import get_spark
    from connemara_spark.streaming.stateful import lsh_candidates_stream

    spark = get_spark("stream-lsh-probe")
    spark.range(1).collect()

    n_junk_buckets = 10
    junk_frac_mod = 100  # id % 100 == 0 -> boilerplate (1%)
    # band rows: one per doc (band 0); bh encodes the planted bucket
    docs = spark.range(n).select(F.col("id"))
    bh = (
        F.when(
            F.col("id") % junk_frac_mod == 0,
            F.concat(F.lit("junk-"), (F.col("id") % n_junk_buckets).cast("string")),
        )
        .when(
            F.col("id") % junk_frac_mod < 5,
            # 4%: two consecutive qualifying ids share a pair bucket
            F.concat(F.lit("pair-"), (F.col("id") / 200).cast("long").cast("string")),
        )
        .otherwise(
            # background: hash-spread buckets, ~2 members each at 10M
            F.concat(
                F.lit("bg-"),
                F.pmod(F.xxhash64("id"), F.lit(max(n // 2, 1))).cast("string"),
            )
        )
    )
    band_rows = docs.select(
        F.col("id"), F.lit(0).alias("band"), bh.alias("bh")
    )

    for cap in caps:
        work = tempfile.mkdtemp(prefix="lshprobe-")
        try:
            land = os.path.join(work, "in")
            os.makedirs(land)
            seg = n // 10
            base = time.time()
            for i in range(10):
                st = os.path.join(work, f"st{i}")
                band_rows.filter(
                    (F.col("id") >= i * seg) & (F.col("id") < (i + 1) * seg)
                ).coalesce(1).write.parquet(st)
                import glob

                part = glob.glob(os.path.join(st, "part-*.parquet"))[0]
                dst = os.path.join(land, f"seg-{i:04d}.parquet")
                shutil.move(part, dst)
                os.utime(dst, (base + i, base + i))
            stream = (
                spark.readStream.schema(band_rows.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(land)
            )
            out_dir = os.path.join(work, "out")
            t0 = time.monotonic()
            q = (
                lsh_candidates_stream(stream, max_members=cap)
                .writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(3600):
                q.stop()
                raise RuntimeError("probe drain did not finish within 3600s")
            if q.exception() is not None:
                raise RuntimeError(str(q.exception()))
            dt = time.monotonic() - t0
            pairs = spark.read.parquet(out_dir)
            total_pairs = pairs.count()
            junk_pairs = 10 * (min(cap, n // junk_frac_mod // n_junk_buckets) * (min(cap, n // junk_frac_mod // n_junk_buckets) - 1)) // 2
            per_batch = []
            state_rows = None
            for p in q.recentProgress:
                so = (p.get("stateOperators") or [{}])[0]
                state_rows = so.get("numRowsTotal", state_rows)
                per_batch.append(
                    {
                        "batch": p.get("batchId"),
                        "rows": p.get("numInputRows"),
                        "batch_sec": round((p.get("batchDuration") or 0) / 1000.0, 2),
                        "state_rows": so.get("numRowsTotal"),
                    }
                )
            for pb in per_batch:
                print(json.dumps(pb))
            print(
                json.dumps(
                    {
                        "docs": n,
                        "max_members": cap,
                        "pairs_emitted": total_pairs,
                        "junk_pairs_expected": junk_pairs,
                        "drain_sec": round(dt, 1),
                        "rows_per_sec": round(n / dt),
                        "state_rows_final": state_rows,
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
