"""Phase attribution for the maintained-view / JDBC bench block (r10
verdict #3/#4): wrap the fixture-facing methods with timers and run the
registry query UNCHANGED, so the per-query bench seconds decompose into
  seed       store.write of the snapshot (fixture)
  parse      Replayer.parse_batch + _batch_summary (shared parse jobs)
  apply      Replayer.apply_batch (silver store advance)
  patch      maintainer after_apply (view patch / JDBC ship+reconcile)
  other      bronze derive, lsn bounds, read_view, checkpoint, teardown

Usage: PYTHONPATH=. python tools/view_bench_profile.py [query ...]
Defaults to the five heaviest CDC pipelines. SPARK_GRAFT_SF_DIR picks the
scale (default sf0.1, the bench SF).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

DEFAULT = [
    "cdc_maintained_minmax_view",
    "cdc_maintained_topk_view",
    "cdc_maintained_distinct_view",
    "cdc_maintained_agg_view",
    "cdc_jdbc_multi_table_apply",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from connemara_spark import pipeline as pl
    from connemara_spark import sinks as sk
    from connemara_spark.operators import ivm
    from connemara_spark.queries import REGISTRY
    from connemara_spark.session import get_spark

    spark = get_spark("view-bench-profile")
    spark.range(1).collect()

    acc: dict[str, float] = {}

    def timed(cls, meth, phase):
        orig = getattr(cls, meth)

        def wrap(*a, **kw):
            t0 = time.monotonic()
            try:
                return orig(*a, **kw)
            finally:
                acc[phase] = acc.get(phase, 0.0) + (time.monotonic() - t0)

        setattr(cls, meth, wrap)
        return (cls, meth, orig)

    patches = [
        timed(pl.ParquetStore, "write", "seed"),
        timed(pl.Replayer, "parse_batch", "parse"),
        timed(pl.Replayer, "_batch_summary", "parse"),
        timed(pl.Replayer, "apply_batch", "apply"),
    ]
    for cls in (
        ivm.MaintainedAggView,
        ivm.MaintainedMinMaxView,
        ivm.MaintainedTopKView,
        ivm.MaintainedDistinctCountView,
    ):
        patches.append(timed(cls, "after_apply", "patch"))
    for cls in (sk.JdbcApplySink, sk.JdbcMultiApplySink):
        patches.append(timed(cls, "after_apply", "patch"))
        if hasattr(cls, "bootstrap_load"):
            patches.append(timed(cls, "bootstrap_load", "seed"))
        if hasattr(cls, "bootstrap_load_all"):
            patches.append(timed(cls, "bootstrap_load_all", "seed"))

    try:
        for name in names:
            q = REGISTRY[name]
            # warm (sf0.001) so codegen/JIT doesn't pollute the attribution
            q.fn(spark, "/root/testdata/sf0.001").collect()
            spark.catalog.clearCache()
            acc.clear()
            t0 = time.monotonic()
            n = len(q.fn(spark, sf_dir).collect())
            total = time.monotonic() - t0
            spark.catalog.clearCache()
            phases = {k: round(v, 2) for k, v in acc.items()}
            phases["other"] = round(total - sum(acc.values()), 2)
            print(json.dumps({
                "query": name, "rows": n, "total_sec": round(total, 2),
                "phases": phases,
                "load_1m": round(os.getloadavg()[0], 2),
            }), flush=True)
    finally:
        for cls, meth, orig in patches:
            setattr(cls, meth, orig)


if __name__ == "__main__":
    main()
