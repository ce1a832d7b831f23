"""End-to-end corpus curation over real testdata: monotone retention,
stage effectiveness, deterministic output."""

from __future__ import annotations

from pyspark.sql import functions as F


def _run(spark, sf_dir, **overrides):
    from connemara_spark.corpus_pipeline import CurationConfig, curate_corpus

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
    )
    cfg = CurationConfig(**overrides)
    return curate_corpus(spark, docs, config=cfg)


def test_curate_corpus_stages_monotone_and_effective(spark, sf_dir):
    res = _run(spark, sf_dir, min_quality=0.7)
    names = [n for n, _ in res.report]
    counts = [c for _, c in res.report]
    assert names[0] == "raw" and counts[0] > 0
    # every gate can only shrink the corpus
    assert all(a >= b for a, b in zip(counts, counts[1:])), res.report
    # the chain as a whole must actually do something on real data
    assert counts[-1] < counts[0]
    # final corpus matches the last reported stage modulo the mixture gate
    final = res.corpus.count()
    assert final == counts[-1]


def test_curate_corpus_output_contract(spark, sf_dir):
    res = _run(spark, sf_dir)
    cols = set(res.corpus.columns)
    for c in ("doc_id", "text", "lang", "content_md5", "split", "n_tokens", "bin_id"):
        assert c in cols, f"missing {c}"
    rows = res.corpus.select("split").distinct().collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # deterministic: a second run yields the identical doc set
    res2 = _run(spark, sf_dir)
    ids1 = sorted(r["doc_id"] for r in res.corpus.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in res2.corpus.select("doc_id").collect())
    assert ids1 == ids2


def test_curate_corpus_decontamination_removes_benchmark(spark, sf_dir):
    """The benchmark holdout itself must never appear in the training
    corpus, and neither may any doc with a confirmed 13-gram overlap."""
    from connemara_spark.operators.curation import hash_sample

    res = _run(spark, sf_dir)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
    )
    bench_ids = {
        r["doc_id"] for r in hash_sample(docs, "doc_id", 0.02, family="md5").collect()
    }
    corpus_ids = {r["doc_id"] for r in res.corpus.select("doc_id").collect()}
    assert not (bench_ids & corpus_ids)


def test_write_training_shards_roundtrip(spark, tmp_path):
    """Pipeline → tar shards: whole bins per shard, metadata members intact."""
    import json

    from connemara_spark.corpus_pipeline import CurationConfig, curate_corpus, write_training_shards
    from connemara_spark.sources.shards import read_tar_shards

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang", "source")
    )
    res = curate_corpus(spark, docs, config=CurationConfig(mixture_alpha=None), report=False)
    out = str(tmp_path / "shards")
    manifest = write_training_shards(res, out, n_shards=4).collect()
    n_kept = res.corpus.count()
    assert sum(m["n_samples"] for m in manifest) == n_kept

    back = read_tar_shards(spark, out)
    assert back.count() == n_kept
    sample = back.limit(1).collect()[0]
    meta = json.loads(sample["members"]["json"].decode())
    assert set(meta) == {"lang", "split", "bin_id", "n_tokens"}
    assert sample["members"]["txt"]  # text member present and non-empty
