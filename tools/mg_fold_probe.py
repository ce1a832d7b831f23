"""A/B probe: Misra-Gries candidate-pass throughput, dict fold vs the
vectorized Series fold now in sketch.mg_summaries.

The r9 verdict flagged the per-batch Python dict fold as the candidate
pass's throughput ceiling (~180k rows/s at 5M tokens). Both variants run
the SAME batched-decrement MG math; the vectorized one replaces the
per-distinct-key dict loop with an index-aligned pandas add and an
np.partition trim. This probe times both over an identical deterministic
zipf-ish token stream and asserts their outputs are IDENTICAL row-for-row.

Run: PYTHONPATH=/root/repo python tools/mg_fold_probe.py [n_rows]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

from connemara_spark.session import get_spark


def dict_fold_summaries(df, key_col: str, k: int):
    """The pre-r10 reference implementation (dict fold), kept verbatim for
    the A/B — NOT used by the engine."""
    import pandas as pd

    def part(batches):
        counters: dict = {}
        total = 0
        for pdf in batches:
            s = pdf[key_col]
            total += int(len(s))
            for key, c in s.value_counts(dropna=True).items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                vals = sorted(counters.values())
                d = vals[len(counters) - k - 1]
                counters = {kk: v - d for kk, v in counters.items() if v - d > 0}
        keys = list(counters.keys())
        yield pd.DataFrame(
            {key_col: keys + [None], "__cnt": [counters[kk] for kk in keys] + [total]}
        )

    src = df.select(F.col(key_col).cast("string").alias(key_col)).filter(
        F.col(key_col).isNotNull()
    )
    return src.mapInPandas(part, schema=f"{key_col} string, __cnt long")


def main() -> None:
    from connemara_spark.operators.sketch import mg_summaries

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    k = 900
    spark = get_spark("mg-fold-probe")
    # zipf-ish deterministic token stream (the stream_hh_probe recipe):
    # md5-derived 1/u tail — head token ~50%, long tail of distinct keys
    toks = (
        spark.range(n)
        .select(
            F.concat(
                F.lit("tok"),
                F.floor(
                    1.0
                    / (
                        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
                         .cast("double") + 1.0)
                        / 4294967296.0
                    )
                ).cast("long").cast("string"),
            ).alias("tok")
        )
        .repartition(16)
        .persist()
    )
    toks.count()  # materialize once, outside both timed sections

    results = {}
    for label, fn in (
        ("dict_fold", lambda: dict_fold_summaries(toks, "tok", k)),
        ("series_fold", lambda: mg_summaries(toks, "tok", k)),
    ):
        t0 = time.monotonic()
        rows = fn().collect()
        dt = time.monotonic() - t0
        summ = sorted((r["tok"], r["__cnt"]) for r in rows if r["tok"] is not None)
        total = sum(r["__cnt"] for r in rows if r["tok"] is None)
        results[label] = (dt, summ, total)
        print(
            f"{label}: {dt:.2f}s  {n / dt / 1000:.0f}k rows/s  "
            f"candidates={len(summ)} total={total}"
        )
    assert results["dict_fold"][1] == results["series_fold"][1], "summaries differ!"
    assert results["dict_fold"][2] == results["series_fold"][2], "totals differ!"
    speedup = results["dict_fold"][0] / results["series_fold"][0]
    print(f"identical outputs; speedup {speedup:.2f}x")
    toks.unpersist()


if __name__ == "__main__":
    main()
