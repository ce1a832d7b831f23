"""JSONL/CSV document ingestion: schema enforcement, corrupt-line quarantine,
partitioned corpus writes."""

from __future__ import annotations

import json

from connemara_spark.sources.textfiles import (
    load_summary,
    read_csv_docs,
    read_jsonl_docs,
    write_corpus,
)


def test_jsonl_good_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1"}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1"}),
        '["wrong", "shape"]',
    ]
    p.write_text("\n".join(lines))
    good, bad = read_jsonl_docs(spark, str(p))
    g = sorted((r["doc_id"], r["lang"]) for r in good.collect())
    assert g == [(1, "en"), (2, "fr")]
    quarantined = {r["raw_line"] for r in bad.collect()}
    assert "{this is not json" in quarantined
    assert len(quarantined) == 2  # the array-shaped line is quarantined too

    s = load_summary(good, bad).collect()[0]
    assert (s["n_rows"], s["n_quarantined"], s["n_null_text"]) == (2, 2, 0)


def test_csv_docs_with_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "doc_id,text,lang,source\n"
        "1,hello,en,s1\n"
        "not_a_number,broken,en,s1\n"
        "2,salut,fr,s2\n"
    )
    good, bad = read_csv_docs(spark, str(p))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 1


def test_write_corpus_partitioned_and_zordered(spark, tmp_path):
    rows = [
        (i, f"text {i}", ["en", "fr"][i % 2], "s", i % 16, (i * 7) % 16)
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, x long, y long")
    out = str(tmp_path / "corpus")
    write_corpus(df, out, partition_by="lang", zorder=("x", "y"))
    back = spark.read.parquet(out)
    assert back.count() == 64
    # hive partitioning materialized: per-language directory pruning
    assert (tmp_path / "corpus" / "lang=en").is_dir()
    assert (tmp_path / "corpus" / "lang=fr").is_dir()
    pruned = back.filter(back.lang == "en")
    assert pruned.count() == 32


def test_orc_corpus_roundtrip_partitioned(spark, tmp_path):
    from connemara_spark.sources.textfiles import read_orc_docs, write_corpus_orc

    rows = [
        (1, "hello world text", "en", "s1"),
        (2, "bonjour le monde", "fr", "s1"),
        (3, "more english words here", "en", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = str(tmp_path / "corpus_orc")
    write_corpus_orc(df, out, partition_by="lang")

    import os

    assert sorted(d for d in os.listdir(out) if d.startswith("lang=")) == [
        "lang=en", "lang=fr",
    ]
    got = read_orc_docs(spark, out)
    assert sorted((r["doc_id"], r["lang"]) for r in got.collect()) == [
        (1, "en"), (2, "fr"), (3, "en"),
    ]
    # partition pruning: a lang filter reads only that directory
    pruned = got.filter(got.lang == "fr")
    assert [r["doc_id"] for r in pruned.collect()] == [2]


def test_partition_pruning_static_and_dynamic(spark, tmp_path):
    """The hive-partitioned corpus prunes at plan time for literal
    predicates AND at runtime via dynamic partition pruning when the
    predicate arrives through a dimension join — the two mechanisms a
    lang-filtered 100 TB read depends on."""
    from connemara_spark.queries import load, spread
    from connemara_spark.sources.textfiles import write_corpus

    docs = spread(load(spark, "/root/testdata/sf0.001", "documents"))
    path = str(tmp_path / "corpus")
    write_corpus(docs, path, partition_by="lang")

    corpus = spark.read.parquet(path)
    # static pruning: the literal filter lands in PartitionFilters
    plan = corpus.filter("lang = 'en'")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan

    # dynamic pruning: the partition filter is only known at runtime,
    # through the dimension join — the plan carries a dynamicpruning
    # subquery on the partition column
    dim = spark.createDataFrame([("en", 1)], "lang string, keep int").filter("keep = 1")
    joined = corpus.join(dim, "lang")
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in jplan.lower(), jplan[:2000]

    # and the join result is correct (only en rows)
    n_en = docs.filter("lang = 'en'").count()
    assert joined.count() == n_en
