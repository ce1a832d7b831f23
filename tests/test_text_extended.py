"""Crafted-row tests for the extended text/curation operators: PII
redaction, repetition filters, sequence packing, stratified sampling,
contamination detection. The oracle-parity suite checks engine agreement on
the synthetic corpus; these check the BEHAVIOR on inputs that actually
trigger each rule."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from connemara_spark.operators.curation import (
    contamination_pairs,
    hash_sample,
    pack_sequences,
    stratified_sample,
)
from connemara_spark.operators.text import redact_pii, repetition_features


def test_redact_pii_each_category(spark):
    rows = [
        (1, "contact bob.smith+x@example.co.uk for details"),
        (2, "see https://example.com/a?b=1 now"),
        (3, "server at 192.168.100.200 port"),
        (4, "card 12345678901234 stolen"),
        (5, "clean text only"),
        (6, "a@b.io and 10.0.0.1 and 9999999 and http://x.y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in redact_pii(df, "text").collect()}
    assert got[1]["clean_text"] == "contact <EMAIL> for details"
    assert got[1]["n_email"] == 1
    assert got[2]["clean_text"] == "see <URL> now"
    assert got[3]["clean_text"] == "server at <IP> port"
    assert got[4]["clean_text"] == "card <NUM> stolen"
    assert got[5]["clean_text"] == "clean text only"
    assert all(got[5][f"n_{c}"] == 0 for c in ("email", "url", "ip", "digit_run"))
    # all four categories in one doc, replacement order holds
    assert got[6]["clean_text"] == "<EMAIL> and <IP> and <NUM> and <URL>"
    assert (got[6]["n_email"], got[6]["n_url"], got[6]["n_ip"], got[6]["n_digit_run"]) == (
        1, 1, 1, 1,
    )


def test_repetition_features_flags_loops(spark):
    rows = [
        (1, "spam spam spam spam spam"),              # one word dominates
        (2, "a b a b a b a b"),                        # repeated 2-grams
        (3, "every word here is fully distinct text"),  # clean
        (4, "solo"),                                    # 1 word: no n-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_features(df).collect()}
    assert got[1]["top_word_frac"] == 1.0 and got[1]["repetition_flag"]
    # "a b": 7 2-grams, 2 distinct -> 5/7; flags on dup_2gram
    assert got[2]["dup_2gram_frac"] == round(5 / 7, 6) and got[2]["repetition_flag"]
    assert got[3]["dup_2gram_frac"] == 0.0 and not got[3]["repetition_flag"]
    assert got[4]["dup_2gram_frac"] == 0.0 and got[4]["dup_3gram_frac"] == 0.0
    assert got[4]["top_word_frac"] == 1.0  # degenerate but defined


def test_pack_sequences_bins_are_contiguous_and_bounded(spark):
    df = spark.createDataFrame([(i, 100) for i in range(100)], "doc_id long, n_tok long")
    out = pack_sequences(df, "doc_id", "n_tok", budget=1000).collect()
    assert len(out) == 100
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r["n_tokens"])
    # 100 docs x 100 tokens / 1000 budget -> exactly 10 bins of 10 docs
    assert sorted(by_bin) == list(range(10))
    assert all(sum(v) == 1000 for v in by_bin.values())
    # bin assignment must follow global hash order: recompute on the driver
    order = sorted(range(100), key=lambda i: hashlib.md5(f"42|{i}".encode()).hexdigest())
    expected = {doc: pos // 10 for pos, doc in enumerate(order)}
    got = {r["doc_id"]: r["bin_id"] for r in out}
    assert got == expected


def test_stratified_sample_caps_each_stratum(spark):
    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "doc_id", "lang", n_per_stratum=5).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r["sample_rank"])
    assert sorted(by["big"]) == [1, 2, 3, 4, 5]
    assert sorted(by["small"]) == [1, 2, 3, 4, 5]
    # determinism: same rows again
    again = stratified_sample(df, "doc_id", "lang", n_per_stratum=5).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}


def test_contamination_pairs_finds_verbatim_overlap(spark):
    words = " ".join(f"w{i}" for i in range(20))
    train = spark.createDataFrame(
        [(1, words), (2, "totally different words " * 5)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(10, words)], "doc_id long, text string")
    got = {
        (r["train_doc_id"], r["bench_doc_id"]): r["n_shared_grams"]
        for r in contamination_pairs(train, bench, k=13).collect()
    }
    # 20-word doc has 8 distinct 13-grams, all shared with its verbatim copy
    assert got == {(1, 10): 8}


def test_contamination_excludes_self_pairs(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(15))) for i in range(10)],
        "doc_id long, text string",
    )
    bench = hash_sample(docs, "doc_id", 0.5, family="md5")
    out = contamination_pairs(docs, bench, k=13).collect()
    assert all(r["train_doc_id"] != r["bench_doc_id"] for r in out)
    assert out == []  # all-distinct vocab: no cross-doc overlap


# ---------------------------------------------------------------------------
# Mojibake repair
# ---------------------------------------------------------------------------


def test_mojibake_pairs_generated_and_safe():
    from connemara_spark.operators.text import mojibake_pairs

    pairs = mojibake_pairs()
    assert len(pairs) >= 20
    for bad, good in pairs:
        assert bad == good.encode("utf-8").decode("cp1252")
        # longest-first ordering so 3-byte sequences repair before 2-byte
    lens = [len(b) for b, _ in pairs]
    assert lens == sorted(lens, reverse=True)


def test_mojibake_repair_and_detection(spark):
    from connemara_spark.operators.text import (
        mojibake_marker_count,
        repair_mojibake,
    )
    from pyspark.sql import functions as F

    good = "déjà — ‘café’… naïve «über» 10€"
    bad = good.encode("utf-8").decode("cp1252")
    df = spark.createDataFrame([(1, bad), (2, "plain ascii"), (3, good)], "id long, t string")
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            repair_mojibake("t").alias("fixed"),
            mojibake_marker_count("t").alias("n"),
        ).collect()
    }
    assert rows[1]["fixed"] == good          # corrupted text repaired
    assert rows[1]["n"] > 0                  # detected
    assert rows[2]["fixed"] == "plain ascii"  # clean ascii untouched
    assert rows[2]["n"] == 0
    assert rows[3]["fixed"] == good          # already-good text is a fixpoint


# ---------------------------------------------------------------------------
# chunk_text (sliding-window chunking)


def test_chunk_text_windows_overlap_and_final_short_window(spark):
    from connemara_spark.operators.text import chunk_text

    text = " ".join(str(i) for i in range(10))  # tokens 0..9
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {
        r["chunk_id"]: r["chunk"]
        for r in chunk_text(df, size=4, overlap=2).collect()
    }
    # starts 1,3,5,7,9 (step 2), window 4, final windows short
    assert out == {
        1: "0 1 2 3",
        2: "2 3 4 5",
        3: "4 5 6 7",
        4: "6 7 8 9",
        5: "8 9",
    }


def test_chunk_text_empty_and_single_token_keep_one_chunk(spark):
    from connemara_spark.operators.text import chunk_text

    df = spark.createDataFrame(
        [(1, ""), (2, "solo")], "doc_id long, text string"
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk"])
        for r in chunk_text(df, size=8, overlap=2).collect()
    )
    assert rows == [(1, 1, ""), (2, 1, "solo")]


def test_chunk_text_rejects_bad_params(spark):
    import pytest as _pytest

    from connemara_spark.operators.text import chunk_text

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for size, overlap in ((0, 0), (4, 4), (4, 5), (4, -1)):
        with _pytest.raises(ValueError):
            chunk_text(df, size=size, overlap=overlap)
