"""Scale probe for the r11 curation operators (mixture_interleave,
chunk_text): synthetic 10M-row corpus, wall-clock + exactness checks.

    python tools/interleave_probe.py [n_rows] [n_docs]

Validates at volume what the pytest pins at 1k rows:
- mixture_interleave positions are a permutation of 1..N (count, min, max,
  distinct — exact), and every source's occupancy in a sampled prefix is
  within 1 of n * w_s (the stride bound);
- chunk_text chunk counts reconcile exactly with ceil-arithmetic over the
  token counts (no row lost, no window duplicated).

Prints one JSON line per operator.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from connemara_spark.operators.curation import mixture_interleave  # noqa: E402
from connemara_spark.operators.text import chunk_text  # noqa: E402
from connemara_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark()

    # -- mixture_interleave at n rows, skewed 5-source mixture -------------
    weights = {"s0": 17, "s1": 7, "s2": 3, "s3": 2, "s4": 1}
    # deterministic uniform source assignment (NOT aligned with the
    # weights — the operator must hit the n_s caps where heavily-weighted
    # sources run dry early and the tail is all light sources)
    df = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("s"), F.pmod(F.xxhash64("id"), F.lit(5)).cast("string")).alias("src"),
    )
    t0 = time.perf_counter()
    out = mixture_interleave(df, "id", "src", weights=weights)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("mn"),
        F.max("pos").alias("mx"),
        F.count_distinct("pos").alias("nd"),
    ).collect()[0]
    t_inter = time.perf_counter() - t0
    perm_ok = (
        stats["n"] == n and stats["mn"] == 1 and stats["mx"] == n and stats["nd"] == n
    )
    # stride-bound check on a prefix: occupancy of each source in the first
    # P positions within 1 of P * w_s / W (exact rational compare)
    P = n // 100
    W = sum(weights.values())
    occ = {
        r["src"]: r["c"]
        for r in out.filter(F.col("pos") <= P)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    stride_ok = all(
        abs(occ.get(s, 0) * W - P * w) <= W  # |occ - P*w/W| <= 1, integerized
        for s, w in weights.items()
    )
    print(json.dumps({
        "op": "mixture_interleave", "rows": n, "sec": round(t_inter, 2),
        "permutation_ok": perm_ok, "stride_bound_ok": stride_ok,
        "prefix": P, "occupancy": occ,
    }))

    # -- chunk_text at n_docs synthetic docs -------------------------------
    # doc i has (i % 400) + 1 tokens -> windows of 128 step 96
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 400) + 1),
                lambda i: i.cast("string"),
            ),
            " ",
        ).alias("text"),
    )
    t0 = time.perf_counter()
    chunks = chunk_text(docs, size=128, overlap=32)
    got = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    mismatch = (
        got.join(
            docs.select(
                "doc_id",
                (
                    F.floor(
                        (F.greatest((F.col("doc_id") % 400) + 1, F.lit(1)) - 1) / 96
                    )
                    + 1
                ).alias("want"),
            ),
            "doc_id",
        )
        .filter(F.col("c") != F.col("want"))
        .count()
    )
    n_chunks = chunks.count()
    t_chunk = time.perf_counter() - t0
    print(json.dumps({
        "op": "chunk_text", "docs": n_docs, "chunks": n_chunks,
        "sec": round(t_chunk, 2), "count_mismatches": mismatch,
    }))


if __name__ == "__main__":
    main()
