"""Dedup operators: exactness of blocking, sketch recall vs exact ground truth."""

from __future__ import annotations

import pytest

from connemara_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    word_shingles,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup of 1
        (4, "completely different content about spark engines and distributed query processing"),
        (5, "another unrelated document mentioning databases and storage layers briefly"),
        (6, base + " extra tail words appended here"),  # near dup, longer
        (7, "short doc"),  # shorter than shingle size
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    out = df.select(word_shingles("text", 5).alias("s")).first()["s"]
    assert out == ["a b c"]


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, "doc_id", "text").collect()
    groups = {r["canonical_id"]: r["n_copies"] for r in out}
    assert groups[1] == 2  # docs 1+2
    assert sum(r["n_copies"] for r in out) == 7


def test_ngram_jaccard_finds_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0
    assert (1, 6) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_recall(spark, docs):
    """LSH candidates must recover every exact pair at this tiny scale, and
    verified jaccards must equal the exact computation."""
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["jaccard"] for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert set(exact) == set(lsh)
    for k in exact:
        assert abs(exact[k] - lsh[k]) < 1e-12


def test_simhash_identical_docs_same_hash(spark, docs):
    out = {r["id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    assert out[1] == out[2]


def test_simhash_pairs_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, "doc_id", "text", max_hamming=8, bands=16).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs  # single word change → small hamming distance
    assert not any((4, 5) == p for p in pairs)


def test_frequent_shingle_cap(spark):
    # a shingle shared by every doc would create a quadratic bucket; the cap
    # drops it from blocking
    rows = [(i, "common phrase shared by every document here " + f"unique{i} a b c d") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0, max_shingle_freq=5).collect()
    uncapped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()
    assert len(uncapped) == 45  # all pairs share the common prefix
    assert len(capped) < 45


def test_duplicate_spans_merges_overlaps(spark):
    from connemara_spark.operators.dedup import duplicate_spans

    # doc 1 and 2 share a 6-word passage -> with n=3 the four shared 3-gram
    # positions overlap and must merge into ONE span per doc
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"{shared} unique tail one two"),
        (2, f"prefix words here {shared} ending"),
        (3, "completely different text with no repeats at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicate_spans(df, n=3, min_copies=2).collect()}
    assert set(out) == {1, 2}
    # doc 1: shared passage at tokens [0, 6) -> grams at 0..3 merge
    assert (out[1]["span_start"], out[1]["span_end"], out[1]["n_dup_grams"]) == (0, 6, 4)
    # doc 2: shared passage at tokens [3, 9)
    assert (out[2]["span_start"], out[2]["span_end"], out[2]["n_dup_grams"]) == (3, 9, 4)


def test_duplicate_spans_within_doc_and_separate_spans(spark):
    from connemara_spark.operators.dedup import duplicate_spans

    # the same trigram repeated twice INSIDE one doc, far apart -> two spans
    df = spark.createDataFrame(
        [(7, "x y z a b c d e f x y z")], "doc_id long, text string"
    )
    out = sorted(
        duplicate_spans(df, n=3, min_copies=2).collect(),
        key=lambda r: r["span_start"],
    )
    assert [(r["span_start"], r["span_end"]) for r in out] == [(0, 3), (9, 12)]


def test_duplicate_spans_hashed_variant_agrees(spark):
    from connemara_spark.operators.dedup import duplicate_spans

    rows = [
        (1, "one two three four five six seven"),
        (2, "zero one two three four five ten"),
        (3, "nothing in common whatsoever here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    raw = sorted(map(tuple, duplicate_spans(df, n=3, min_copies=2).collect()))
    hashed = sorted(map(tuple, duplicate_spans(df, n=3, min_copies=2, hashed=True).collect()))
    assert raw == hashed and raw


def test_duplicate_spans_short_docs_emit_no_grams(spark):
    from connemara_spark.operators.dedup import duplicate_spans

    # identical docs SHORTER than n: no n-gram exists, so no span — and
    # certainly not one indexing past the document end
    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short"), (3, "")], "doc_id long, text string"
    )
    assert duplicate_spans(df, n=13, min_copies=2).collect() == []


def test_containment_catches_subset_jaccard_misses(spark):
    from connemara_spark.operators.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"filler{i}" for i in range(60))
    rows = [
        (1, quote),                      # the excerpt
        (2, f"{filler} {quote}"),        # a long doc containing it verbatim
        (3, "totally unrelated content with none of those words at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in ngram_containment_pairs(df, "doc_id", "text", k=3, threshold=0.8).collect()
    }
    # doc 1's shingles are fully inside doc 2 -> containment 1.0 (directed)
    assert cont[(1, 2)] == 1.0
    assert (2, 1) not in cont  # the container is NOT contained in the excerpt
    # Jaccard at the same bar misses the pair entirely (dilution)
    jac = ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.8).collect()
    assert not [r for r in jac if {r["id_a"], r["id_b"]} == {1, 2}]


def test_duplicate_spans_randomized_matches_python_reference(spark):
    """Randomized corpus vs a direct python replay of the span semantics."""
    import random

    from connemara_spark.operators.dedup import duplicate_spans

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 8))) for _ in range(5)
    ]
    docs = []
    for did in range(1, 26):
        parts = [rng.choice(vocab) for _ in range(rng.randint(0, 6))]
        if rng.random() < 0.7:
            parts.append(rng.choice(passages))
        parts += [rng.choice(vocab) for _ in range(rng.randint(0, 6))]
        docs.append((did, " ".join(parts)))

    n = 4
    # python reference: count gram occurrences corpus-wide, mark positions,
    # merge fixed-length intervals per doc
    from collections import Counter, defaultdict

    gram_count: Counter = Counter()
    positions: dict = defaultdict(list)
    for did, text in docs:
        toks = text.split(" ")
        if len(toks) < n:
            continue
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            gram_count[g] += 1
            positions[did].append((i, g))
    expected = set()
    for did, pos_grams in positions.items():
        hits = sorted(i for i, g in pos_grams if gram_count[g] >= 2)
        if not hits:
            continue
        start = prev = hits[0]
        cnt = 1
        for p in hits[1:]:
            if p - prev >= n:
                expected.add((did, start, prev + n, cnt))
                start, cnt = p, 0
            prev = p
            cnt += 1
        expected.add((did, start, prev + n, cnt))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in duplicate_spans(df, n=n, min_copies=2).collect()
    }
    assert got == expected


def test_chunk_dedup_drops_repeated_chunk_keeps_first(spark):
    from connemara_spark.operators.dedup import chunk_dedup

    boiler = " ".join(f"b{i}" for i in range(16))      # one full 16-word chunk
    uniq_a = " ".join(f"a{i}" for i in range(16))
    uniq_c = " ".join(f"c{i}" for i in range(16))
    df = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq_a}"),    # first occurrence of boiler: kept
            (2, f"{boiler} {uniq_c}"),    # later doc: boiler chunk dropped
            (3, uniq_c),                  # whole doc already seen in doc 2
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup(df, "doc_id", "text").collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_dropped"] == 0
    assert out[2]["n_chunks"] == 2 and out[2]["n_dropped"] == 1
    assert out[3]["n_chunks"] == 1 and out[3]["n_dropped"] == 1
    # all-dropped doc digests the empty string
    import hashlib

    assert out[3]["kept_digest"] == hashlib.md5(b"").hexdigest()
    # doc 2's kept text is exactly its unique chunk
    assert out[2]["kept_digest"] == hashlib.md5(uniq_c.encode()).hexdigest()


def test_chunk_dedup_within_doc_repeat(spark):
    from connemara_spark.operators.dedup import chunk_dedup

    chunk = " ".join(f"w{i}" for i in range(16))
    df = spark.createDataFrame(
        [(7, f"{chunk} {chunk}")], "doc_id long, text string"
    )
    out = chunk_dedup(df, "doc_id", "text").collect()[0]
    assert out["n_chunks"] == 2 and out["n_dropped"] == 1


def test_chunk_dedup_randomized_matches_python_reference(spark):
    """Randomized corpus (with seeded repeated chunks) vs a direct python
    replay of the first-occurrence-wins semantics."""
    import hashlib
    import random

    from connemara_spark.operators.dedup import chunk_dedup

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(40)]
    # a few exact 16-word boilerplate blocks injected across docs
    blocks = [
        " ".join(rng.choice(vocab) for _ in range(16)) for _ in range(3)
    ]
    docs = []
    for did in range(1, 31):
        words = []
        for _ in range(rng.randint(0, 3)):
            if rng.random() < 0.4:
                words += rng.choice(blocks).split(" ")
            else:
                words += [rng.choice(vocab) for _ in range(rng.randint(5, 20))]
        if not words:
            words = [rng.choice(vocab)]
        docs.append((did, " ".join(words)))

    cw = 16
    seen: set = set()
    expected = {}
    for did, text in docs:                      # doc order == id order
        toks = text.split(" ")
        n_chunks = max((len(toks) + cw - 1) // cw, 1)
        kept, dropped = [], 0
        for i in range(n_chunks):
            chunk = " ".join(toks[i * cw : i * cw + cw])
            if chunk in seen:
                dropped += 1
            else:
                seen.add(chunk)
                kept.append(chunk)
        expected[did] = (
            n_chunks,
            dropped,
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dropped"], r["kept_digest"])
        for r in chunk_dedup(df, "doc_id", "text", chunk_words=cw).collect()
    }
    assert got == expected


def test_winnow_fingerprints_matches_python_reference(spark):
    """Randomized docs vs a direct python replay of value-collapse
    winnowing, plus the shared-run guarantee from the paper."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from connemara_spark.operators.dedup import winnow_fingerprints

    K, W = 3, 4
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> repeated grams
    shared = " ".join(rng.choice(vocab) for _ in range(K + W - 1 + 3))
    docs = []
    for did in range(1, 21):
        parts = [rng.choice(vocab) for _ in range(rng.randint(3, 15))]
        if did % 3 == 0:
            parts += shared.split(" ")
            parts += [rng.choice(vocab) for _ in range(rng.randint(0, 5))]
        docs.append((did, " ".join(parts)))

    def py_winnow(text):
        toks = text.split(" ")
        n_grams = max(len(toks) - K, 0) + 1
        hs = [
            hashlib.md5(" ".join(toks[i : i + K]).encode()).hexdigest()[:16]
            for i in range(n_grams)
        ]
        n_win = max(len(hs) - W, 0) + 1
        mins = [min(hs[s : s + W]) for s in range(n_win)]
        out = []
        for i, v in enumerate(mins):
            if i == 0 or v != mins[i - 1]:
                out.append(v)
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", winnow_fingerprints("text", k=K, window=W).alias("fp")
        ).collect()
    }
    for did, text in docs:
        assert got[did] == py_winnow(text), (did, text)

    # guarantee: docs containing the shared window+k-1 run overlap in >= 1 fp
    sharers = [did for did, _ in docs if did % 3 == 0]
    fps = {did: set(got[did]) for did in sharers}
    base = fps[sharers[0]]
    for did in sharers[1:]:
        assert base & fps[did], f"doc {did} shares no fingerprint"
