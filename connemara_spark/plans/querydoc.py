"""Registry index generator: ``python -m connemara_spark.plans.querydoc >
QUERIES.md`` — one row per registered query with its gate status, so the
operator inventory is browsable without reading queries.py.
"""

from __future__ import annotations


def main() -> None:
    from connemara_spark.queries import REGISTRY

    print("# QUERIES — the registry index (auto-generated)")
    print()
    print("Regenerate with `python -m connemara_spark.plans.querydoc > QUERIES.md`.")
    print('"value gate" = a DuckDB oracle exists and the driver compares rows +')
    print("columns + values; \"derived oracle\" = the oracle SQL is rendered from")
    print("data-dependent literals (trained books, learned merges) produced by an")
    print("independent Spark-free implementation; \"rows-only\" = approximate by")
    print("construction (engine-specific hashes), covered instead by recall and")
    print("property tests plus a portable-hash twin under the full gate.")
    print()
    print("| query | gate | description |")
    print("|---|---|---|")
    n_gate = n_fn = n_rows = 0
    for name, q in REGISTRY.items():
        if q.oracle_fn is not None:
            kind = "derived oracle"
            n_fn += 1
        elif q.oracle:
            kind = "value gate"
            n_gate += 1
        else:
            kind = "rows-only"
            n_rows += 1
        desc = " ".join((q.description or "").split())
        print(f"| `{name}` | {kind} | {desc} |")
    print()
    print(
        f"**{len(REGISTRY)} queries: {n_gate} value-gated, {n_fn} derived-oracle, "
        f"{n_rows} rows-only.**"
    )


if __name__ == "__main__":
    main()
