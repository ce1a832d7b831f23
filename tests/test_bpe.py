"""BPE training: Spark trainer vs a pure-python textbook reference."""

from __future__ import annotations

from collections import Counter


def _py_bpe(texts, n_merges):
    """Textbook reference: vocabulary of words with counts; per round count
    weighted adjacent pairs, merge the argmax (ties: lexicographically
    smallest pair) greedily left-to-right in every word."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    symtab = {w: list(w) + ["</w>"] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, n in vocab.items():
            s = symtab[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        best = max(pc.items(), key=lambda kv: (kv[1], [-ord(c) for c in "\x1f".join(kv[0])]))
        # deterministic tie-break: freq DESC then pair ASC
        top_freq = max(pc.values())
        best_pair = min(p for p, c in pc.items() if c == top_freq)
        merges.append((best_pair[0], best_pair[1], top_freq))
        a, b = best_pair
        for w in symtab:
            s = symtab[w]
            out, just = [s[0]], False
            for x in s[1:]:
                if out[-1] == a and x == b and not just:
                    out[-1] = a + b
                    just = True
                else:
                    out.append(x)
                    just = False
            symtab[w] = out
    return merges, symtab


def test_bpe_train_matches_python_reference(spark):
    from connemara_spark.operators.bpe import bpe_train

    texts = [
        "low lower lowest low low",
        "newer new newest wider wide wide",
        "low lower newer newer wide",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, "text", n_merges=8)
    expected, _ = _py_bpe(texts, 8)
    assert got == expected


def test_bpe_segment_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from connemara_spark.operators.bpe import bpe_segment_expr, bpe_train

    texts = ["low lower lowest low low", "newer new newest wider wide wide"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges3 = [(l, r) for l, r, _ in bpe_train(df, "text", n_merges=6)]
    _, symtab = _py_bpe(texts, 6)

    words = spark.createDataFrame([(w,) for w in symtab], "word string")
    got = {
        r["word"]: r["segs"]
        for r in words.select(
            "word", bpe_segment_expr(F.col("word"), merges3).alias("segs")
        ).collect()
    }
    for w, segs in symtab.items():
        assert got[w] == segs, f"word {w}: {got[w]} != {segs}"


def test_bpe_merge_no_immediate_remerge(spark):
    """'aaa' with merge (a,a): greedy left-to-right yields [aa, a], never
    [a, aa] or a chain re-merge into [aaa]."""
    from pyspark.sql import functions as F

    from connemara_spark.operators.bpe import merge_expr

    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = df.select(merge_expr(F.col("syms"), "a", "a").alias("m")).collect()[0]["m"]
    assert out == ["aa", "a"]


def test_merge_expr_property_random_sequences(spark):
    """Property: merge_expr equals the greedy left-to-right python merge on
    random symbol sequences (including runs like aaaa where the no-remerge
    flag matters)."""
    import random

    from pyspark.sql import functions as F

    from connemara_spark.operators.bpe import merge_expr

    rng = random.Random(99)
    alphabet = ["a", "b", "ab", "</w>"]
    cases = []
    for _ in range(60):
        n = rng.randint(1, 12)
        cases.append([rng.choice(alphabet) for _ in range(n)])

    def py_merge(s, a, b):
        out, just = [s[0]], False
        for x in s[1:]:
            if out[-1] == a and x == b and not just:
                out[-1] = a + b
                just = True
            else:
                out.append(x)
                just = False
        return out

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, syms array<string>")
    for a, b in (("a", "a"), ("a", "b"), ("ab", "a"), ("b", "</w>")):
        got = {
            r["i"]: r["m"]
            for r in df.select("i", merge_expr(F.col("syms"), a, b).alias("m")).collect()
        }
        for i, c in enumerate(cases):
            assert got[i] == py_merge(c, a, b), (a, b, c, got[i])
