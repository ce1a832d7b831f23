"""End-to-end training-corpus construction: the single call that chains
the individually-gated curation operators into the pipeline a user
actually runs before a training job.

    raw documents
      → quality gate          (text.quality_features)
      → repetition gate       (text.repetition_features)
      → PII redaction         (text.redact_pii)
      → exact dedup           (first occurrence per content hash)
      → near-dup dedup        (MinHash-LSH pairs → clusters → canonical)
      → decontamination       (Bloom probe + exact confirm vs benchmark)
      → mixture resampling    (temperature weights as hash acceptance)
      → sequence packing      (token budget bins)
      → partitioned write     (textfiles.write_corpus)

Every stage is a pure DataFrame transform (the same functions the
value-hash gate checks one by one); this module adds only composition and
a per-stage retention REPORT — counts after each gate, the first thing an
operator looks at when a training mix shifts.

Scale: no stage here introduces machinery beyond its own operator's
analysis (see SCALE.md). The report aggregates are one count per stage,
computed on the lazily-shared lineage — callers wanting a single pass can
drop the report.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CurationConfig:
    min_quality: float = 0.0
    reject_repetitive: bool = True
    redact_pii: bool = True
    neardup_threshold: float = 0.5
    bench_frac: float = 0.02          # deterministic benchmark holdout
    decontam_max_hits: int = 0        # drop docs with > this many confirmed 13-gram hits
    mixture_alpha: float | None = 0.7  # None disables resampling
    pack_budget: int = 2048
    seed: int = 42


@dataclass
class CurationResult:
    corpus: DataFrame
    report: list[tuple[str, int]] = field(default_factory=list)


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    *,
    config: CurationConfig | None = None,
    report: bool = True,
) -> CurationResult:
    """Run the full curation chain over (doc_id, text, lang, source) rows.
    Returns the final corpus (with content hash, quality features, token
    count and pack ``bin_id``) and the per-stage retention report."""
    from pyspark.sql.window import Window

    from connemara_spark.operators.curation import (
        bloom_bits, bloom_decontaminate, dataset_split, hash_sample,
        keep_canonical, neardup_clusters, pack_sequences,
    )
    from connemara_spark.operators.dedup import minhash_lsh_pairs, word_shingles
    from connemara_spark.operators.text import (
        quality_features, redact_pii, repetition_features, token_count,
    )

    cfg = config or CurationConfig()
    stages: list[tuple[str, DataFrame]] = []

    def stage(name: str, df: DataFrame) -> DataFrame:
        stages.append((name, df))
        return df

    cur = stage("raw", docs)

    # -- quality + repetition gates ------------------------------------
    cur = quality_features(cur, "text")
    cur = repetition_features(cur, "doc_id", "text")
    cur = stage("quality", cur.filter(F.col("quality_score") >= cfg.min_quality))
    if cfg.reject_repetitive:
        cur = stage("repetition", cur.filter(~F.col("repetition_flag")))

    # -- PII redaction (transforms text; no rows dropped) ---------------
    if cfg.redact_pii:
        cur = redact_pii(cur, "text")
        cur = cur.drop("text").withColumnRenamed("clean_text", "text")

    # -- exact dedup: first occurrence per content hash -----------------
    cur = cur.withColumn("content_md5", F.md5("text"))
    w = Window.partitionBy("content_md5").orderBy("doc_id")
    cur = stage(
        "exact_dedup",
        cur.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk"),
    )

    # -- near-dup dedup: LSH pairs → components → canonical -------------
    pairs = minhash_lsh_pairs(
        cur, "doc_id", "text", threshold=cfg.neardup_threshold, seed=cfg.seed
    )
    clusters = neardup_clusters(pairs)
    cur = stage("near_dedup", keep_canonical(cur, clusters, "doc_id"))

    # -- decontamination vs the deterministic benchmark holdout ---------
    bench = hash_sample(cur, "doc_id", cfg.bench_frac, seed=cfg.seed, family="md5")
    bits = bloom_bits(bench, text_col="text", k_gram=13)
    bench_grams = bench.select(
        F.explode(F.array_distinct(word_shingles("text", 13))).alias("gram")
    ).distinct()
    hits = bloom_decontaminate(
        cur, bits, bench_grams, id_col="doc_id", text_col="text", k_gram=13
    )
    dirty = hits.filter(F.col("n_exact_hits") > cfg.decontam_max_hits).select("doc_id")
    bench_ids = bench.select("doc_id")
    cur = stage(
        "decontaminated",
        cur.join(dirty.union(bench_ids).distinct(), "doc_id", "left_anti"),
    )

    # -- mixture resampling ---------------------------------------------
    if cfg.mixture_alpha is not None:
        g = cur.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
        wall = Window.partitionBy()
        nat = F.col("n_docs").cast("double") / F.sum(F.col("n_docs").cast("double")).over(wall)
        pw = F.exp(F.lit(cfg.mixture_alpha) * F.log(F.col("n_docs").cast("double")))
        adj = pw / F.sum(pw).over(wall)
        acc = g.select(
            "lang", (adj / nat).alias("wt")
        ).select("lang", (F.col("wt") / F.max("wt").over(wall)).alias("p_accept"))
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{cfg.seed}m|"), F.col("doc_id").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("bigint").cast("double") / F.lit(4294967296.0)
        )
        cur = stage(
            "mixture",
            cur.join(F.broadcast(acc), "lang").withColumn("__u", u)
            .filter(F.col("__u") < F.col("p_accept"))
            .drop("__u", "p_accept"),
        )

    # -- splits + packing ------------------------------------------------
    cur = dataset_split(cur, "doc_id", seed=cfg.seed, family="md5")
    cur = cur.withColumn("n_tokens", token_count("text"))
    bins = pack_sequences(cur, "doc_id", "n_tokens", budget=cfg.pack_budget, seed=cfg.seed)
    cur = cur.join(bins.select("doc_id", "bin_id"), "doc_id")

    rep = [(name, df.count()) for name, df in stages] if report else []
    return CurationResult(corpus=cur, report=rep)


def write_training_shards(
    result: CurationResult,
    out_dir: str,
    *,
    n_shards: int = 16,
) -> DataFrame:
    """Emit the curated corpus as WebDataset-style tar shards, routed by
    the packing bin so each shard holds whole token-budget bins (a loader
    streams one shard = a contiguous run of packed sequences). Members per
    sample: ``{doc_id}.txt`` (text) + ``{doc_id}.json`` (metadata: lang,
    split, bin). Returns the shard manifest (the action — collect it)."""
    from connemara_spark.sources.shards import write_tar_shards

    cur = result.corpus.withColumn(
        "meta",
        F.to_json(F.struct("lang", "split", "bin_id", "n_tokens")),
    ).withColumn("__shard", F.pmod(F.col("bin_id"), F.lit(n_shards)))
    return write_tar_shards(
        cur,
        out_dir,
        key_col="doc_id",
        member_cols={"txt": "text", "json": "meta"},
        n_shards=n_shards,
        shard_col="__shard",
    )
