"""Streaming heavy-hitters volume probe (SCALE.md round-9): drive
``heavy_hitters_stream`` with millions of zipf-ish tokens over many
microbatches and measure (a) per-batch drain latency — flat if state
serde is O(shards * k) as designed, (b) candidate volume from the latest
summaries vs the true heavy-hitter count, and (c) end-to-end exactness
of the recount against a batch groupBy.

The token stream is seed-deterministic: token t_i for row r is
``t{floor(1/u - 1)}`` with u derived from md5(r) — a discrete power-ish
tail with a few very hot heads, the shape real token streams have.

Usage: python tools/stream_hh_probe.py [n_batches] [rows_per_batch] [den]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
    den = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    from pyspark.sql import functions as F

    from connemara_spark.session import get_spark
    from connemara_spark.streaming.stateful import (
        heavy_hitters_stream,
        hh_latest_candidates,
    )

    spark = get_spark("stream-hh-probe")
    spark.range(1).collect()

    work = tempfile.mkdtemp(prefix="stream-hh-")
    land = os.path.join(work, "in")
    os.makedirs(land)

    def token_frame(lo: int, hi: int):
        # u in (0, 1] from a 52-bit md5 slice; token id = floor(1/u) - 1
        # (zipf-ish: id 0 takes ~50%, id 1 ~17%, long tail beyond)
        u = (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 13), 16, 10)
            .cast("double") / float(1 << 52)
        )
        tok = F.floor(1.0 / (u + F.lit(1e-16))) - 1
        return spark.range(lo, hi).select(
            F.concat(F.lit("t"), tok.cast("string")).alias("w")
        )

    try:
        base = time.time()
        for b in range(n_batches):
            st = os.path.join(work, f"st{b}")
            token_frame(b * per_batch, (b + 1) * per_batch).coalesce(1).write.parquet(st)
            part = glob.glob(os.path.join(st, "part-*.parquet"))[0]
            dst = os.path.join(land, f"seg-{b:04d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (base + b, base + b))

        stream = (
            spark.readStream.schema("w string")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        out = heavy_hitters_stream(stream, "w", num=1, den=den, shards=16)
        q = (
            out.writeStream.format("memory")
            .queryName("hh_probe")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        # per-batch progress from the streaming query's own metrics
        t0 = time.monotonic()
        if not q.awaitTermination(1800):
            q.stop()
            raise TimeoutError("probe drain exceeded 1800s")
        if q.exception() is not None:
            raise RuntimeError(str(q.exception()))
        total = round(time.monotonic() - t0, 1)
        lat = [
            {
                "batch": p.batchId,
                "rows": p.numInputRows,
                "sec": round(p.batchDuration / 1000.0, 2),
            }
            for p in q.recentProgress
            if p.numInputRows > 0
        ]
        for rec in lat:
            print(json.dumps(rec), flush=True)

        drained = spark.table("hh_probe")
        cands = hh_latest_candidates(drained).localCheckpoint()
        n_cands = cands.count()

        batch = token_frame(0, n_batches * per_batch)
        n = batch.count()
        exact = (
            batch.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") * den > n)
            .localCheckpoint()
        )
        n_true = exact.count()
        recount = (
            batch.join(F.broadcast(cands.withColumnRenamed("k", "w")), "w")
            .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") * den > n)
        )
        got = {(r["w"], r["cnt"]) for r in recount.collect()}
        want = {(r["w"], r["cnt"]) for r in exact.collect()}

        half = len(lat) // 2 or 1
        secs = [r["sec"] for r in lat]
        print(json.dumps({
            "rows": n,
            "batches": len(lat),
            "total_sec": total,
            "rows_per_sec": round(n / total),
            "first_half_mean": round(sum(secs[:half]) / half, 2),
            "second_half_mean": round(sum(secs[half:]) / max(len(secs) - half, 1), 2),
            "den": den,
            "candidates": n_cands,
            "true_heavy": n_true,
            "exact_match": got == want,
        }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
