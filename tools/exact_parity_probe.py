"""EXACT cross-engine value comparison — the driver's hash has no float
slack, while tests/test_oracle_parity.py rounds floats at 9 decimals; a
sub-1e-9 order-sensitivity would pass the suite and still redden a driver
row. This probe collects Spark and DuckDB rows for the given queries on
the given dataset and compares floats BIT-EXACTLY (repr), reporting the
max |diff| per query — 0.0 everywhere = the gate set is proven exact on
this data.

Usage: PYTHONPATH=. python tools/exact_parity_probe.py DATA_DIR [query ...]
(defaults: every oracle-gated query)
"""

from __future__ import annotations

import json
import math
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(rows, cols):
    out = []
    for r in rows:
        out.append(tuple(repr(r[c]) for c in sorted(cols)))
    return sorted(out)


def main() -> None:
    data_dir = sys.argv[1]
    names = sys.argv[2:]

    import duckdb

    from connemara_spark.queries import REGISTRY
    from connemara_spark.session import get_spark

    spark = get_spark("exact-parity-probe")
    spark.range(1).collect()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{data_dir}/{t}.parquet'"
        )

    if not names:
        names = [n for n, q in REGISTRY.items() if q.oracle or q.oracle_fn]

    n_exact = n_diff = n_err = 0
    for name in names:
        q = REGISTRY[name]
        if not (q.oracle or q.oracle_fn):
            continue
        try:
            sdf = q.fn(spark, data_dir)
            srows = [r.asDict() for r in sdf.collect()]
            rel = con.sql(q.resolve_oracle(data_dir))
            cols = rel.columns
            orows = [dict(zip(cols, t)) for t in rel.fetchall()]
            spark.catalog.clearCache()
        except Exception as exc:
            n_err += 1
            print(json.dumps({"query": name, "status": "ERROR",
                              "err": str(exc)[:160]}), flush=True)
            continue
        a, b = _norm(srows, [f.name for f in sdf.schema]), _norm(orows, cols)
        if a == b:
            n_exact += 1
            continue
        # quantify: max abs float diff across aligned cells (after sort)
        worst = 0.0
        n_cells = 0
        for ra, rb in zip(a, b):
            for va, vb in zip(ra, rb):
                if va == vb:
                    continue
                def _f(s: str):
                    s = s.strip()
                    if s.startswith("Decimal('") and s.endswith("')"):
                        s = s[9:-2]
                    return float(s)

                try:
                    fa, fb = _f(va), _f(vb)
                    if math.isnan(fa) and math.isnan(fb):
                        continue
                    worst = max(worst, abs(fa - fb))
                except (ValueError, TypeError):
                    worst = float("inf")
                n_cells += 1
        n_diff += 1
        print(json.dumps({
            "query": name, "status": "DIFF",
            "rows": [len(a), len(b)], "diff_cells": n_cells,
            "max_abs_diff": worst if worst != float("inf") else "non-numeric",
        }), flush=True)
    print(json.dumps({"summary": True, "exact": n_exact, "diff": n_diff,
                      "err": n_err, "data": data_dir}), flush=True)


if __name__ == "__main__":
    main()
