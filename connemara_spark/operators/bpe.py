"""BPE tokenizer training over a distributed corpus.

The first real step of building a tokenizer for a 100 TB corpus: count
adjacent symbol pairs across every word occurrence, pick the most frequent
pair, merge it corpus-wide, repeat. The iteration structure is the
textbook algorithm (Sennrich et al.'s subword-nmt formulation); what Spark
changes is WHERE the counting happens:

- Words aggregate first: merges apply to the (word, count) VOCABULARY, not
  raw text — one ``groupBy(word)`` shuffle up front, after which every
  iteration works on a table bounded by vocabulary size (tiny next to the
  corpus), weighted by corpus counts.
- Each iteration is: explode symbol bigrams -> weighted count -> take the
  argmax (deterministic tie-break: count DESC, pair ASC) -> apply the
  merge with a native ``aggregate`` fold over each word's symbol array.
  The learned merge is a LITERAL in the next round's plan — the driver
  holds only the merge list (k tuples), never data.
- Each round's symbol table is checkpointed (same constant-plan-depth
  discipline as neardup_clusters: one materialization per round, one
  derived transform per materialized frame).

``PAIR_SEP`` (unit separator, U+001F) delimits the two symbols of a pair
key; it cannot occur in corpus text tokens split on whitespace.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PAIR_SEP = "\x1f"
END_OF_WORD = "</w>"


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) corpus vocabulary — the one corpus-sized shuffle."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def chars_expr(word: Column) -> Column:
    """Initial symbol sequence: the word's characters + a terminal
    ``</w>`` marker (the standard end-of-word symbol)."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over (syms array<string>, n) rows.
    Pairs come from ``zip_with(syms, tail(syms))`` — per-row, map-side;
    the only shuffle is the pair-count aggregation."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.greatest(F.size("syms") - 1, F.lit(0))),
        F.slice(F.col("syms"), 2, F.greatest(F.size("syms") - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(PAIR_SEP), b),
    )
    return (
        vocab_syms.select(F.explode(pairs).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("freq"))
    )


def merge_expr(syms: Column, left: str, right: str) -> Column:
    """Apply one merge (left, right) -> left+right over a symbol array
    with a single left-to-right ``aggregate`` fold — native, no UDF.
    Greedy sequential semantics: a symbol just produced by a merge does
    not immediately re-merge with the following symbol (the ``just`` flag),
    matching the reference implementation's pass behavior."""
    l, r = F.lit(left), F.lit(right)
    merged = F.lit(left + right)

    def step(acc, x):
        do_merge = (F.element_at(acc["out"], -1) == l) & (x == r) & ~acc["just"]
        return F.when(
            do_merge,
            F.struct(
                F.concat(
                    F.slice(acc["out"], 1, F.size(acc["out"]) - 1), F.array(merged)
                ).alias("out"),
                F.lit(True).alias("just"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["out"], F.array(x)).alias("out"),
                F.lit(False).alias("just"),
            )
        )

    init = F.struct(
        F.array(F.element_at(syms, 1)).alias("out"), F.lit(False).alias("just")
    )
    return F.aggregate(
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        init,
        step,
        lambda acc: acc["out"],
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 10,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges. Returns [(left, right, freq), ...]
    in merge order. Driver state is the merge list only; each round's
    argmax is a 1-row collect of the vocabulary-bounded pair table."""
    vocab = word_vocab(df, text_col)
    syms = vocab.select(chars_expr(F.col("word")).alias("syms"), "n").localCheckpoint(
        eager=True
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(syms)
            .orderBy(F.col("freq").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["pair"].split(PAIR_SEP, 1)
        merges.append((left, right, int(top[0]["freq"])))
        syms = syms.select(
            merge_expr(F.col("syms"), left, right).alias("syms"), "n"
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Segment a word with a learned merge list: the chars fold followed
    by each merge fold in order — all literals, all native. At inference
    scale this column is a pure per-row map (zero shuffle).

    Each level is ``bind_array``-let-bound: ``merge_expr`` references its
    input array several times inside its aggregate lambda, and Catalyst
    lambdas substitute the producer's expression TREE, not its value — an
    unbound chain of k merges builds a 2^k-node tree (12 merges OOM'd the
    driver at ANALYSIS time before any row was read)."""
    from connemara_spark.functions.arrays import bind_array

    def one_merge(left: str, right: str):
        # single-parameter lambda: pyspark derives the HOF arity from the
        # Python signature, so defaulted extra args would break it
        return lambda s: merge_expr(s, left, right)

    syms = chars_expr(word)
    for left, right in merges:
        syms = bind_array(syms, one_merge(left, right))
    return syms
