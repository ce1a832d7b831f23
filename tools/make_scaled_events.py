"""Build a synthetic CDC-scale fixture: sf0.1 with the events table
exploded KX (default 10x) — the CDC bronzes derive their event stream
(and therefore every batch's delta volume) from `events`, so this scales
the DATA LEGS of the maintained-view / JDBC protocols by K while the
protocol (batch count, job ladder) stays fixed. For the scale story only
(verdict item: prove data legs scale with cores while job counts stay
fixed); the oracle is NOT valid over this dir — event_id collisions are
avoided by striding each copy past the real id span, but the payload
distribution is a straight repetition, not a new workload.

Usage: python tools/make_scaled_events.py <out_dir> [k]
Copies every sf0.1 table, replacing events with the KX explosion.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    from connemara_spark.queries import load
    from connemara_spark.session import get_spark

    spark = get_spark("make-scaled-events")
    for f in os.listdir(src):
        if not f.endswith(".parquet") or f == "events.parquet":
            continue
        dst = os.path.join(out, f)
        if os.path.isdir(os.path.join(src, f)):
            shutil.copytree(os.path.join(src, f), dst, dirs_exist_ok=True)
        else:
            shutil.copy2(os.path.join(src, f), dst)

    ev = load(spark, src, "events")
    row = ev.agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi")).collect()[0]
    span = int(row["hi"]) - int(row["lo"]) + 1
    copies = ev.crossJoin(spark.range(k).select(F.col("id").alias("__k")))
    scaled = copies.select(
        (F.col("event_id") + F.col("__k") * span).alias("event_id"),
        *[c for c in ev.columns if c != "event_id"],
    )
    # 64 files so the scan's parallelism is never capped by the landing
    # layout (5M rows is ~50 MB — 8 files would pin every downstream scan
    # to 8 tasks and mask the core-count scaling this fixture exists to show)
    scaled.repartition(64).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    n = spark.read.parquet(os.path.join(out, "events.parquet")).count()
    print(f"wrote {out}/events.parquet rows={n} (k={k}, span={span})")


if __name__ == "__main__":
    main()
