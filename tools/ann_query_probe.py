"""ANN indexed-read cost probe: isolate where ivfpq_topk_indexed's time
goes as the index grows (the ann_cdc_probe showed the 1k-query batch
growing 23s -> ~300s from 30k to 400k entries — superlinear in
appearance, so find the real driver: join strategy, window shuffle, or
candidate volume).

Builds a synthetic index of N vectors (deterministic id/version hash
vectors, same generator as ann_cdc_probe), then times the 1k-query top-k
under plan variants and prints the executed join strategy for each.

Usage: python tools/ann_query_probe.py [n_vectors] [n_queries]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

DIM = 64


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from pyspark.sql import functions as F

    from connemara_spark.operators.annindex import build_ann_index, ivfpq_topk_indexed
    from connemara_spark.session import get_spark

    spark = get_spark("ann-query-probe")
    spark.range(1).collect()

    def vecs(ids):
        emb = F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id") * DIM + j, F.lit(0)), F.lit(997))
                / F.lit(997.0)
            ).cast("float"),
        )
        return ids.select(F.col("id").alias("vec_id"), emb.alias("embedding"))

    root = tempfile.mkdtemp(prefix="annq-")
    try:
        queries = vecs(spark.range(nq)).localCheckpoint()
        for mode in ("lit", "trained"):
            d = os.path.join(root, f"idx-{mode}")
            t0 = time.monotonic()
            build_ann_index(
                vecs(spark.range(n)), d, n_cells=64, m=8, k_cb=16,
                centroid_mode=mode,
            )
            print(f"[{mode}] build {n} vectors: {time.monotonic() - t0:.1f}s", flush=True)
            from connemara_spark.operators.annindex import load_ann_index

            _, _, entries = load_ann_index(spark, d)
            h = sorted(
                (r["n"] for r in entries.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()),
                reverse=True,
            )
            print(f"[{mode}] cell sizes top5={h[:5]} cells={len(h)}", flush=True)
            for label, np_ in (("n_probe=4", 4),):
                for rep in range(2):
                    t0 = time.monotonic()
                    out = ivfpq_topk_indexed(queries, d, k=5, n_probe=np_)
                    cnt = out.count()
                    dt = time.monotonic() - t0
                    print(f"[{mode}] {label} rep{rep}: {dt:.1f}s rows={cnt}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
