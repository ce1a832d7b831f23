"""Streaming dedup-on-ingest scale probe (SCALE.md): N synthetic docs with
a planted duplicate rate land as 10 parquet segments and drain through
``exact_dedup_stream`` one file per microbatch. Reports per-batch wall
seconds and the STATE STORE row count per batch (from the streaming
progress), demonstrating the operator's core claim: state grows with
UNIQUE content only, never with stream length or duplicate count.

Usage: python tools/stream_dedup_probe.py [n_docs] [dup_rate] [provider]
``provider``: 'rocksdb' pins RocksDBStateStoreProvider (the crawl-scale
state backend — off-heap, incremental checkpoints); anything else (or
absent) keeps the session default (HDFS-backed heap store).
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dup_rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    provider_arg = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import functions as F

    from connemara_spark.session import get_spark
    from connemara_spark.streaming.stateful import (
        ROCKSDB_STATE_PROVIDER,
        exact_dedup_stream,
        state_store_provider,
    )

    provider = ROCKSDB_STATE_PROVIDER if provider_arg == "rocksdb" else None

    spark = get_spark("stream-dedup-probe")
    spark.range(1).collect()

    # deterministic corpus: ceil(n * (1-dup_rate)) unique bodies, the rest
    # re-crawls of earlier ids (uniform over the unique prefix)
    uniq = max(1, int(n * (1.0 - dup_rate)))
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("body-"),
            F.when(F.col("id") < uniq, F.col("id")).otherwise(
                F.pmod(F.xxhash64("id"), F.lit(uniq))
            ).cast("string"),
        ).alias("text"),
    )
    work = tempfile.mkdtemp(prefix="sdprobe-")
    try:
        land = os.path.join(work, "in")
        os.makedirs(land)
        seg = n // 10
        base = time.time()
        for i in range(10):
            st = os.path.join(work, f"st{i}")
            docs.filter(
                (F.col("doc_id") >= i * seg) & (F.col("doc_id") < (i + 1) * seg)
            ).coalesce(1).write.parquet(st)
            import glob

            part = glob.glob(os.path.join(st, "part-*.parquet"))[0]
            dst = os.path.join(land, f"seg-{i:04d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (base + i, base + i))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        t0 = time.monotonic()
        with state_store_provider(spark, provider):
            q = (
                exact_dedup_stream(stream)
                .writeStream.format("noop")
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
        for p in q.recentProgress:
            so = (p.get("stateOperators") or [{}])[0]
            print(
                json.dumps(
                    {
                        "batch": p.get("batchId"),
                        "rows": p.get("numInputRows"),
                        "batch_sec": round(
                            (p.get("batchDuration") or 0) / 1000.0, 2
                        ),
                        "state_rows": so.get("numRowsTotal"),
                    }
                )
            )
        print(
            json.dumps(
                {
                    "docs": n,
                    "dup_rate": dup_rate,
                    "unique": uniq,
                    "provider": "rocksdb" if provider else "default",
                    "drain_sec": round(dt, 1),
                    "docs_per_sec": round(n / dt),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
