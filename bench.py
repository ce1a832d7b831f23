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

    # The driver snapshots only the LAST ~2000 chars of stdout and parses the
    # JSON line out of that tail; the full 86-query map is ~2.7KB compact, so
    # a single full line gets beheaded and parses as null (this lost the r2
    # per-query map). Emit three artifacts instead:
    #   1. the full payload as the FIRST stdout line (humans, logs),
    #   2. the full payload to ./BENCH_FULL.json (committed per round),
    #   3. a final line guaranteed to fit the tail: same metric/value/sf,
    #      per-query entries greedily packed slowest-first until the size
    #      budget, with queries_omitted counting the fast remainder.
    print(json.dumps(payload))
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH_FULL.json"), "w") as fh:
            json.dump(payload, fh)
            fh.write("\n")
    except OSError as exc:
        print(f"# BENCH_FULL.json write failed: {exc}", file=sys.stderr)

    budget = 1850
    compact = {k: v for k, v in payload.items() if k not in ("queries", "new_queries")}
    compact["full_map"] = "BENCH_FULL.json"
    if "new_queries" in payload:
        compact["n_new_queries"] = len(payload["new_queries"])
    compact["queries"] = {}
    compact["queries_omitted"] = 0
    base_len = len(json.dumps(compact, separators=(",", ":")))
    used = base_len
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        entry_len = len(name) + len(json.dumps(t)) + 4  # "name":t,
        if used + entry_len > budget:
            compact["queries_omitted"] += 1
            continue
        compact["queries"][name] = t
        used += entry_len
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
