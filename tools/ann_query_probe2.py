"""Staged decomposition of the indexed ANN read path (companion to
ann_query_probe.py): time each plan prefix separately to locate the cost
— entries scan, candidate join row generation, +ADC evaluation, +top-k
window — at a fixed index size.

Usage: python tools/ann_query_probe2.py [n_vectors] [n_queries] [n_probe]
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
    n_probe = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from connemara_spark.operators.annindex import build_ann_index, load_ann_index
    from connemara_spark.operators.similarity import _ivfpq_prep_map, ivf_centroids_lit
    from connemara_spark.session import get_spark

    spark = get_spark("ann-query-probe2")
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

    root = tempfile.mkdtemp(prefix="annq2-")
    try:
        d = os.path.join(root, "idx")
        build_ann_index(vecs(spark.range(n)), d, n_cells=64, m=8, k_cb=16)
        emb = vecs(spark.range(nq)).localCheckpoint()

        meta, books, entries = load_ann_index(spark, d)
        centroids = ivf_centroids_lit(meta["dim"], meta["n_cells"], meta["seed"])
        prep = _ivfpq_prep_map(centroids, books, n_probe, "vec_id", "embedding")
        qraw = emb.mapInPandas(
            prep,
            "id long, probes array<int>, codes array<int>, tables array<array<double>>",
        )
        queries = qraw.select(
            F.col("id").alias("query_id"),
            F.explode("probes").alias("cell"),
            F.col("tables").alias("qt"),
        )
        index = entries.select(F.col("vec_id").alias("neighbor_id"), "cell", "codes")

        def t(label, df):
            for rep in range(2):
                t0 = time.monotonic()
                r = df.count()
                print(
                    f"{label} rep{rep}: {time.monotonic() - t0:.1f}s rows={r}",
                    flush=True,
                )

        t("A prep-only", qraw)
        t("B entries scan", index)
        cand = queries.join(index, "cell").filter(
            F.col("query_id") != F.col("neighbor_id")
        )
        t("C cand join (qt pruned by count)", cand.select("query_id", "neighbor_id"))
        adc = F.round(
            F.expr(" + ".join(f"qt[{j}][codes[{j}]]" for j in range(meta["m"]))), 6
        )
        scored = cand.select("query_id", "neighbor_id", adc.alias("adc_dist"))
        t("D scored (join+ADC)", scored)
        w = Window.partitionBy("query_id").orderBy(
            F.col("adc_dist").asc(), F.col("neighbor_id")
        )
        full = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
        )
        t("E full top-k", full)
        # F: ADC via a flat lookup on a pre-flattened qt (one array access
        # per subspace instead of nested array-of-array extraction)
        queries_flat = qraw.select(
            F.col("id").alias("query_id"),
            F.explode("probes").alias("cell"),
            F.flatten("tables").alias("qf"),
        )
        cand2 = queries_flat.join(index, "cell").filter(
            F.col("query_id") != F.col("neighbor_id")
        )
        adc2 = F.round(
            F.expr(
                " + ".join(f"qf[{j * 16} + codes[{j}]]" for j in range(meta["m"]))
            ),
            6,
        )
        t("F scored flat-qt", cand2.select("query_id", "neighbor_id", adc2.alias("adc_dist")))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
