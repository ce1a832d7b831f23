"""Targeted warm A/B timing for a few registry queries — the bench's own
protocol (untimed sf0.001 warmup, then N warm reps at the target SF) on
just the named queries, with per-rep loadavg so a co-tenant burst is
visible in the output.

Usage: python tools/ab_query.py <query> [query ...]   (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_AB_REPS default 3)
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))

    from connemara_spark.queries import REGISTRY
    from connemara_spark.session import get_spark

    spark = get_spark("ab-query")
    spark.range(1).collect()
    for name in names:
        q = REGISTRY[name]
        try:
            q.fn(spark, warm_dir).collect()
            spark.catalog.clearCache()
        except Exception as exc:
            print(f"# {name}: warmup failed: {exc}", file=sys.stderr)
        times = []
        loads = []
        for _ in range(reps):
            loads.append(round(os.getloadavg()[0], 2))
            t0 = time.monotonic()
            n = len(q.fn(spark, sf_dir).collect())
            times.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
        print(
            f"{name}: min={min(times)} reps={times} loads={loads} rows={n}",
            flush=True,
        )


if __name__ == "__main__":
    main()
