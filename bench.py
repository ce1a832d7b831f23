"""Benchmark runner: all registry queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from connemara_spark.queries import REGISTRY
    from connemara_spark.session import get_spark

    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")

    spark = get_spark("connemara-bench")
    # Warm the JVM once so the first query doesn't pay session startup.
    spark.range(1).collect()

    times: dict[str, float] = {}
    for name, q in REGISTRY.items():
        # Untimed warmup at the smallest SF: compiles this query's codegen /
        # JIT paths so the timed run below measures steady-state execution
        # (the regime that matters at scale), not one-time Janino compiles.
        if os.path.isdir(warm_dir) and warm_dir != sf_dir:
            try:
                q.fn(spark, warm_dir).collect()
                spark.catalog.clearCache()
            except Exception as exc:  # warmup must never sink the bench
                print(f"# {name}: warmup failed: {exc}", file=sys.stderr)

        t0 = time.monotonic()
        df = q.fn(spark, sf_dir)
        n = len(df.collect())
        times[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)
        # Operators persist() intra-query intermediates (LSH postings,
        # signatures); free them so the queries don't accumulate cached
        # blocks. Then collect Python garbage NOW: releasing accumulated
        # py4j proxies is a synchronous per-object gateway call, and letting
        # the GC fire mid-query shows up as multi-second stalls inside a
        # timed section.
        spark.catalog.clearCache()
        gc.collect()

    total = round(sum(times.values()), 3)

    # Round-over-round honesty: flag queries absent from the latest BENCH_r*
    # snapshot so a total inflated by NEW queries isn't read as a regression,
    # and publish the comparable subtotal over the shared set.
    prev_queries: set[str] = set()
    try:
        import glob

        prior = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")))
        if prior:
            with open(prior[-1]) as fh:
                doc = json.load(fh)
            if "queries" not in doc and "tail" in doc:
                # driver wrapper: the bench JSON line is embedded in "tail"
                import re as _re

                m = _re.search(r'\{"metric".*\}', doc["tail"])
                if m:
                    doc = json.loads(m.group(0))
            prev_queries = set(doc.get("queries", {}))
    except Exception:
        pass
    payload = {
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if prev_queries:
        new = sorted(set(times) - prev_queries)
        payload["new_queries"] = new
        payload["comparable_total"] = round(
            sum(t for n, t in times.items() if n in prev_queries), 3
        )
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
