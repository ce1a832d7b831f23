"""Plan audit generator: ``python -m connemara_spark.plans.audit > EXPLAIN.md``.

Captures the physical-plan evidence for the flagship queries — scan pruning
(ReadSchema / PushedFilters), join strategies, exchange counts, codegen vs
Arrow stages — so the "would this survive 100x" review reads from one file
instead of re-running .explain() per query.
"""

from __future__ import annotations

import os
import re
import sys

HEADLINES = [
    (
        "q6_forecast_revenue",
        "Full-scan agg with every predicate pushed to the parquet footer and a 4-column ReadSchema.",
    ),
    (
        "q3_shipping_priority",
        "3-way join: customer filter pushed to scan, customer/orders broadcast, single agg shuffle.",
    ),
    (
        "cdc_apply_customer",
        "The CDC apply fold: ONE hash shuffle (per-PK groupBy), one full-outer sort-merge join with "
        "the snapshot, fold entirely inside a codegen'd Project.",
    ),
    (
        "cdc_scd2_customer",
        "SCD2 history: same single-shuffle shape as apply; versions explode from the fold state.",
    ),
    (
        "minhash_lsh_dedup",
        "MinHash: per-row signatures map-side, the only shuffle is the band-bucket join key.",
    ),
    (
        "doc_duplicate_spans",
        "Duplicate spans: gram count shuffle + join-back + one per-doc window; no cartesian anywhere.",
    ),
    (
        "embedding_ann_ivfpq",
        "IVF-PQ: one Arrow prep stage (documented UDF exception), hash join on int cell key, "
        "top-k window over 3-column rows.",
    ),
    (
        "doc_tfidf_top_terms",
        "TF-IDF: corpus N inlined as a literal scalar (its own count job) — no 1-row join in the plan.",
    ),
    (
        "embedding_semdedup",
        "SemDeDup: per-row literal-centroid cell assignment (zero shuffle), ONE hash join on the "
        "int cell key bounds the quadratic to within-cluster pairs.",
    ),
    (
        "doc_bloom_decontam",
        "Bloom decontamination: benchmark slot set + confirm grams broadcast; the corpus side is "
        "probed map-side and never shuffled on gram text.",
    ),
    (
        "doc_dsir_weights",
        "DSIR: bounded bucket-stat table (broadcast back); per-bucket log-ratios DECIMAL-rounded "
        "before the order-independent per-doc sum.",
    ),
    (
        "doc_chunk_dedup",
        "Chunk dedup: one shuffle on the chunk md5 (first-occurrence window), one back on the doc "
        "id for reassembly.",
    ),
    (
        "graph_pagerank_orders",
        "Fixed-point PageRank: per iteration the 16-byte/node contribution table broadcasts into "
        "the persisted edge set, one agg shuffle on dst; localCheckpoint truncates lineage so the "
        "final plan is one iteration deep, not three.",
    ),
    (
        "doc_winnow_fingerprints",
        "Winnowing: zero-shuffle per-row selection; every array level _bind-ed so the plan holds "
        "each subtree ONCE (the unbound form re-evaluated gram hashes per window: 27.5s -> 0.7s).",
    ),
    (
        "doc_mojibake_repair",
        "Mojibake repair: a constant replace-chain inside one codegen'd Project; no shuffle, no "
        "Python.",
    ),
    (
        "doc_mixture_interleave",
        "Mixture interleave: NO global window — within-source ranks from 256-shard banded "
        "windows + a broadcast offsets join; the global position is closed-form integer "
        "arithmetic over |sources| literal strides, so the order assignment is embarrassingly "
        "parallel.",
    ),
    (
        "doc_chunk_sliding",
        "Sliding chunking: posexploded start sequence + slice/array_join, all inside codegen; "
        "no HOF lambda references the word array (the producer-tree substitution trap), no "
        "shuffle at all.",
    ),
    (
        "cdc_join_view_delta",
        "Incremental join-view delta (r5 staged shape): the materialized touched-key set "
        "broadcasts into LEFT-SEMI prunes of the fold INPUTS (events + snapshot, apply_changes "
        "keys=), each stream folds ONCE into both states (apply_changes_cut), and the delta "
        "emits DIRECTLY from the two per-key (s0, s1) frames — one |delta|-sized join + "
        "null-safe struct compare, no view materialization, no exceptAll. 8.66s -> 3.0-3.5s "
        "warm across two rounds.",
    ),
    (
        "q21_exclusive_return_suppliers",
        "EXISTS + NOT-EXISTS decorrelated: one per-order double-distinct aggregate replaces two "
        "correlated subqueries; single fact scan feeds both the aggregate and the blamed join.",
    ),
    (
        "q8_market_share",
        "Market share: five broadcast dim joins around one fact scan; numerator/denominator are "
        "exact DECIMAL conditional sums in ONE aggregation (no ratio, no second pass).",
    ),
    (
        "embedding_ann_ivfpq_trained",
        "Persisted-index ANN: the index side is a cell-partitioned parquet READ (no index-side "
        "compute in the plan); query probes/tables from one Arrow prep stage; candidates join on "
        "the int cell key, ADC + rerank as in the in-session path.",
    ),
    (
        "doc_epoch_shuffle",
        "Epoch shuffle: per-row hash + shard assignment map-side; the ONLY shuffle is the "
        "per-shard row_number window — no global sort anywhere.",
    ),
    (
        "doc_weighted_sample",
        "Exact-k weighted sample: per-shard cumsum windows (256 hash shards, never one global "
        "window), shard offsets BROADCAST from a 256-row driver round-trip, grid membership as "
        "codegen'd bigint div — no global sort, no float stride.",
    ),
    (
        "cdc_apply_customer_bounded",
        "Hot-key-safe apply: TWO keyed shuffles — (pk, lsn-bucket) then pk — with collect_list "
        "cells bounded at bucket occupancy; summaries fold in a codegen'd Project.",
    ),
    (
        "embedding_kmeans_clusters",
        "Fixed-point k-means (final assignment + counts): zero-shuffle argmin projection over k "
        "separately-compiled BIGINT distance folds; one count shuffle; centroid sums enter as a "
        "broadcast 8-row table.",
    ),
    (
        "doc_bm25_topk",
        "BM25: tf filtered to the 4 query terms BEFORE aggregation, df broadcast, per-term pivot "
        "columns added in fixed order; one top-k window.",
    ),
    (
        "graph_triangle_count",
        "Triangles: weight-floored edges, degree-oriented; wedge join + closure join both on the "
        "8-byte node key (oriented edge set localCheckpointed once for its 3 plan references) — "
        "never a cartesian.",
    ),
    (
        "corpus_hll_distinct",
        "HLL: per-row hash/register/rho map-side, ONE MAX-per-register shuffle of 512 rows; the "
        "estimate is a single projection over the 1-row state.",
    ),
    (
        "table_profile_orders",
        "Column profiler: ONE scan, one aggregation (the multi-distinct Expand lives inside a "
        "single shuffle); typed min/max aggregate first and render after, so no per-column pass.",
    ),
    (
        "corpus_heavy_bigrams",
        "Exact heavy hitters: MG candidate pass is one Arrow stage with O(k) state per partition "
        "(no shuffle); the exact recount joins the BROADCAST candidate set, so the only shuffle "
        "is capped at |candidates| rows per task — never the full distinct-key domain.",
    ),
]

INTERESTING = re.compile(
    r"PushedFilters|ReadSchema|BroadcastHashJoin|SortMergeJoin|BroadcastNestedLoop|"
    r"CartesianProduct|Exchange|HashAggregate|ObjectHashAggregate|Window|MapInPandas|"
    r"ArrowEvalPython|BatchEvalPython|Generate|WholeStageCodegen"
)


def main() -> None:
    from connemara_spark.operators import similarity
    from connemara_spark.plans.inspect import exchange_count, formatted_plan
    from connemara_spark.queries import REGISTRY
    from connemara_spark.session import get_spark

    # Plan-only run: don't execute the IVF-PQ Arrow prep just to EXPLAIN it.
    similarity.EAGER_INDEX_CACHE = False

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-audit")
    out = sys.stdout

    print("# EXPLAIN — physical-plan audit of the flagship queries", file=out)
    print(file=out)
    print(
        f"Generated by `python -m connemara_spark.plans.audit` at `{sf_dir}`.\n"
        "Filtered to the load-bearing operators (scans with pushdown/pruning, joins,\n"
        "exchanges, windows, Python stages); full plans available via\n"
        "`REGISTRY[name].fn(spark, sf).explain('formatted')`.",
        file=out,
    )
    for name, verdict in HEADLINES:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = formatted_plan(df)
        lines = [
            ln.strip()[:160]
            for ln in plan.splitlines()
            if INTERESTING.search(ln) and "== " not in ln
        ]
        # de-noise: collapse only EXACT adjacent duplicates (distinct
        # PushedFilters lines from different scans must all survive)
        seen: list[str] = []
        for ln in lines:
            if not seen or seen[-1] != ln:
                seen.append(ln)
        n_exchanges = exchange_count(df)
        print(f"\n## {name}\n", file=out)
        print(f"**Why this plan is right:** {verdict}", file=out)
        print(f"\nShuffle exchanges: **{n_exchanges}**\n", file=out)
        print("```", file=out)
        for ln in seen[:28]:
            print(ln, file=out)
        print("```", file=out)

    # -- the multi-batch pipeline queries' PER-BATCH plans -----------------
    # The registry entries return only the final read; the plans that
    # dominate their cost are the per-batch fold and view-patch writes.
    from connemara_spark.plans.pipeline_plans import pipeline_batch_frames

    PIPELINE_VERDICTS = {
        "cdc_apply_customer_bucketed/steady_fold": (
            "Steady-state partial-rewrite fold: the snapshot side is a "
            "path-pruned read of ONLY the touched buckets' files, one keyed "
            "fold shuffle, full-outer merge — IO O(touched buckets)."
        ),
        "cdc_maintained_agg_view/steady_fold": (
            "Flat-store steady-state fold: same single-shuffle apply shape "
            "as cdc_apply_customer against the committed v2 snapshot."
        ),
        "cdc_maintained_agg_view/view_patch": (
            "Incremental view patch: both version reads semi-joined to the "
            "BROADCAST touched keys (|delta|-sized), then a JOIN-FREE net — "
            "old rows contribute (-1,-val), new rows (+1,+val), one map-side-"
            "combined groupBy (the per-key full-outer diff was algebraically "
            "redundant for a distributive aggregate and cost 2 extra "
            "exchanges, removed r8) — merged into the 9-row materialized "
            "base. Never a base rescan."
        ),
        "cdc_maintained_minmax_view/view_patch": (
            "Non-self-maintainable MIN/MAX kept |delta|-bounded: the signed "
            "value multiset at the touched keys (checkpointed once — every "
            "write leg reads the checkpoint) joins the BROADCAST touched-"
            "group slice of the base view for the multiplicity bookkeeping "
            "INSIDE the checkpoint job; the WRITE plan is join-free below "
            "the group-literal cap — keep side pruned by a literal NOT-IN "
            "over the gate-collected touched groups, and only groups whose "
            "extremum multiplicity hits zero with no insert taking over "
            "reach the rescan leg (literal IN pushdown below the cap, "
            "broadcast semi join above it — r11)."
        ),
        "cdc_maintained_topk_view/view_patch": (
            "Top-k leaderboard patch: stored k+slack pair lists evict and "
            "merge as BOUNDED array ops (array_sort with a comparator "
            "lambda — no per-group window, no whole-group collect) over "
            "the checkpointed touched-key delta; the WRITE plan is join- "
            "and exchange-free below the group-literal cap (literal NOT-IN "
            "keep side — r11), and the rescan leg's re-aggregation is "
            "itself bounded — per-group row_number ≤ k+slack BEFORE "
            "collect_list, pruned to only the burned-through groups."
        ),
        "cdc_maintained_distinct_view/view_patch": (
            "COUNT DISTINCT kept exact and |delta|-bounded: the signed "
            "value multiset at the touched keys nets to per-(group, value) "
            "pair deltas, which full-outer merge with ONLY the touched "
            "support buckets (the nested BucketStore prunes at path "
            "selection); the O(groups) summary is patched from the counts' "
            "zero crossings — no rescan leg exists, the support multiset "
            "is self-maintainable."
        ),
        "cdc_two_source_join_view/view_patch": (
            "Cross-source replacement patch (the consolidation headline's "
            "steady state): the union of both sides' touched join keys "
            "BROADCASTS into three legs — both new-state reads (bucket-"
            "pruned at path selection on the BucketStore) semi-join to it, "
            "their re-join replaces exactly those view rows, and the base "
            "view anti-joins the same broadcast to keep everything else. "
            "Work is O(touched keys) on every leg; neither source table is "
            "rescanned."
        ),
    }
    print("\n# Multi-batch pipeline queries — per-batch plans\n", file=out)
    print(
        "Steady-state (second) batch of each pipeline, captured pre-write by\n"
        "`plans.pipeline_plans.pipeline_batch_frames` and linted by\n"
        "`tests/test_plans.py` (single from_json parse, no partition-less\n"
        "window, no Python stages).",
        file=out,
    )
    frames, cleanup = pipeline_batch_frames(spark, sf_dir)
    try:
        for name, df in frames.items():
            plan = formatted_plan(df)
            lines = [
                ln.strip()[:160]
                for ln in plan.splitlines()
                if INTERESTING.search(ln) and "== " not in ln
            ]
            seen = []
            for ln in lines:
                if not seen or seen[-1] != ln:
                    seen.append(ln)
            print(f"\n## {name}\n", file=out)
            print(f"**Why this plan is right:** {PIPELINE_VERDICTS[name]}", file=out)
            print(f"\nShuffle exchanges: **{exchange_count(df)}**\n", file=out)
            print("```", file=out)
            for ln in seen[:28]:
                print(ln, file=out)
            print("```", file=out)
    finally:
        cleanup()


if __name__ == "__main__":
    main()
