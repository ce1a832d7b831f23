"""Dataset-curation operators: deterministic sampling/splits + near-dup
connected components."""

from __future__ import annotations

import hashlib

import pytest

from connemara_spark.operators.curation import (
    dataset_split,
    fraction_threshold_hex,
    hash_sample,
    keep_canonical,
    neardup_clusters,
)


def test_fraction_threshold_hex():
    assert fraction_threshold_hex(0.0) == "00000000"
    assert fraction_threshold_hex(1.0) == "gggggggg"
    # the >= 0.5 regime must still be 8 chars (string-comparison contract)
    assert len(fraction_threshold_hex(0.9)) == 8
    assert fraction_threshold_hex(0.5) == "80000000"
    with pytest.raises(ValueError):
        fraction_threshold_hex(1.5)


def _md5_hex8(i: int, seed: int = 42) -> str:
    return hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8]


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame([(i,) for i in range(1000)], "doc_id long").persist()


def test_hash_sample_matches_reference_hash(ids):
    got = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.1, family="md5").collect()}
    t = fraction_threshold_hex(0.1)
    expected = {i for i in range(1000) if _md5_hex8(i) < t}
    assert got == expected
    assert 50 <= len(got) <= 150  # ~10% of 1000


def test_hash_sample_deterministic_and_family_variants(ids):
    a = set(r["doc_id"] for r in hash_sample(ids, "doc_id", 0.2, family="xxhash64").collect())
    b = set(r["doc_id"] for r in hash_sample(ids, "doc_id", 0.2, family="xxhash64").collect())
    assert a == b  # pure function of id, not rand()
    assert 120 <= len(a) <= 280
    with pytest.raises(ValueError):
        hash_sample(ids, "doc_id", 0.1, family="sha9000").collect()


def test_dataset_split_partitions_everything(ids):
    out = dataset_split(ids, "doc_id", family="md5").collect()
    by = {}
    for r in out:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    assert sum(len(v) for v in by.values()) == 1000
    # disjoint
    assert not (by["train"] & by["val"]) and not (by["val"] & by["test"])
    # roughly 80/10/10
    assert 700 <= len(by["train"]) <= 900
    assert 50 <= len(by["val"]) <= 160
    assert 50 <= len(by["test"]) <= 160
    with pytest.raises(ValueError):
        dataset_split(ids, "doc_id", weights={"a": 0.5, "b": 0.4})


def test_split_nests_within_sample(ids):
    """The cumulative-threshold property: a 10% sample is exactly the head
    of the 80% train range under the same seed/family."""
    sample = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.1, family="md5").collect()}
    split = {r["doc_id"]: r["split"] for r in dataset_split(ids, "doc_id", family="md5").collect()}
    assert all(split[i] == "train" for i in sample)


def test_neardup_clusters_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_neardup_clusters_long_chain_converges(spark):
    # a 13-node path: min label must walk the full diameter
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 13)], "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(pairs).collect()}
    assert got == {i: 1 for i in range(1, 14)}


def test_keep_canonical(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(1, 7)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    clusters = neardup_clusters(pairs)
    kept = sorted(r["doc_id"] for r in keep_canonical(docs, clusters, "doc_id").collect())
    # 2,3 fold into 1; 6 folds into 5; 4 untouched (no cluster)
    assert kept == [1, 4, 5]


def test_bloom_no_false_negatives_and_exact_subset(spark):
    """Bloom-filter contract: every gram actually present in the benchmark
    MUST bloom-hit (no false negatives), and exact hits are a subset of
    bloom hits per doc."""
    from pyspark.sql import functions as F

    from connemara_spark.operators.curation import bloom_bits, bloom_decontaminate
    from connemara_spark.operators.dedup import word_shingles

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # doc 1 contains a benchmark 3-gram verbatim -> must be flagged
            (1, "alpha beta gamma unrelated words here"),
            # doc 2 shares no 3-gram with the benchmark
            (2, "totally different content with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    bits = bloom_bits(bench, text_col="text", k_gram=3)
    bench_grams = bench.select(
        F.explode(F.array_distinct(word_shingles("text", 3))).alias("gram")
    )
    out = {
        r["doc_id"]: r
        for r in bloom_decontaminate(
            train, bits, bench_grams, id_col="doc_id", text_col="text", k_gram=3
        ).collect()
    }
    assert out[1]["n_exact_hits"] >= 1          # no false negative
    assert out[1]["n_bloom_hits"] >= out[1]["n_exact_hits"]
    assert out[2]["n_exact_hits"] == 0
    for r in out.values():
        assert r["n_bloom_hits"] <= r["n_grams"]


def test_dsir_weights_prefer_target_like_docs(spark):
    """A document drawn from the target distribution must outscore one from
    a disjoint vocabulary."""
    from connemara_spark.operators.curation import dsir_log_weights

    target = spark.createDataFrame(
        [(i, "science method data theory result evidence") for i in range(10, 20)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "science method data theory result evidence"),
            (2, "buy cheap pills casino winner click now"),
        ],
        "doc_id long, text string",
    ).union(target)
    w = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_log_weights(raw, target, id_col="doc_id", text_col="text").collect()
    }
    assert w[1] > w[2]


def test_bloom_decontaminate_randomized_matches_python_reference(spark):
    """Randomized corpus vs a direct python replay of the md5-slot Bloom
    semantics (including deterministic false positives, if any)."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from connemara_spark.operators.curation import bloom_bits, bloom_decontaminate
    from connemara_spark.operators.dedup import word_shingles

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(25)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
    bench_rows = [(100 + i, mk(rng.randint(6, 12))) for i in range(4)]
    train_rows = []
    for did in range(1, 16):
        txt = mk(rng.randint(6, 15))
        if rng.random() < 0.3:       # splice a benchmark 3-gram in
            btoks = rng.choice(bench_rows)[1].split(" ")
            j = rng.randrange(0, len(btoks) - 2)
            txt += " " + " ".join(btoks[j : j + 3])
        train_rows.append((did, txt))

    K, NH, PL = 3, 3, 5

    def grams(text):
        toks = text.split(" ")
        n = max(len(toks) - K + 1, 1)
        return {" ".join(toks[i : i + K]) for i in range(n)}

    def slots(gram):
        return [
            hashlib.md5(f"{s}#{gram}".encode()).hexdigest()[:PL] for s in range(NH)
        ]

    bench_grams_py = set().union(*(grams(t) for _, t in bench_rows))
    bits_py = {p for g in bench_grams_py for p in slots(g)}
    expected = {}
    for did, txt in train_rows:
        gs = grams(txt)
        bloom = {g for g in gs if all(p in bits_py for p in slots(g))}
        exact = bloom & bench_grams_py
        expected[did] = (len(gs), len(bloom), len(exact))

    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    bits = bloom_bits(bench, text_col="text", k_gram=K, n_hashes=NH, prefix_len=PL)
    bg = bench.select(F.explode(F.array_distinct(word_shingles("text", K))).alias("gram"))
    got = {
        r["doc_id"]: (r["n_grams"], r["n_bloom_hits"], r["n_exact_hits"])
        for r in bloom_decontaminate(
            train, bits, bg, id_col="doc_id", text_col="text",
            k_gram=K, n_hashes=NH, prefix_len=PL,
        ).collect()
    }
    assert got == expected


def test_resample_ffill_gap_semantics(spark):
    """Crafted series: gaps get is_gap=1, carry the last value forward, and
    the grid covers exactly each key's own span."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from connemara_spark.operators.timeseries import resample_ffill

    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 10.0),
        (1, datetime(2024, 1, 1, 3, 15), 7.0),    # hours 1,2 are gaps
        (2, datetime(2024, 1, 1, 5, 0), 1.0),     # single point: 1-row grid
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r["user_id"], r["bucket"].hour): (r["n_events"], r["sum_value"], r["is_gap"])
        for r in resample_ffill(
            df, "user_id", "ts",
            aggs={"n_events": F.count(F.lit(1)), "sum_value": F.sum("value")},
            fill_cols=["sum_value"],
        ).collect()
    }
    assert out[(1, 0)] == (1, 10.0, 0)
    assert out[(1, 1)] == (None, 10.0, 1)
    assert out[(1, 2)] == (None, 10.0, 1)
    assert out[(1, 3)] == (1, 7.0, 0)
    assert out[(2, 5)] == (1, 1.0, 0)
    assert len(out) == 5


def test_distributed_ntile_matches_global_window(spark):
    """Banded-prefix-sum NTILE == the naive single-partition NTILE, across
    remainder cases, ties, and partitionings."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from connemara_spark.operators.curation import distributed_ntile

    rng = random.Random(3)
    for n_rows, n_buckets in [(97, 10), (100, 10), (5, 10), (64, 7)]:
        rows = [(i, round(rng.random(), 2)) for i in range(n_rows)]  # 2dp -> ties
        df = spark.createDataFrame(rows, "doc_id long, score double").repartition(13)
        got = {
            r["doc_id"]: r["bucket"]
            for r in distributed_ntile(df, "score", "doc_id", n=n_buckets).collect()
        }
        want = {
            r["doc_id"]: r["b"]
            for r in df.withColumn(
                "b", F.ntile(n_buckets).over(Window.orderBy("score", "doc_id"))
            ).collect()
        }
        assert got == want, (n_rows, n_buckets)


def test_epoch_shuffle_properties(spark):
    """Epoch shuffle: a true permutation (every row addressed exactly once),
    bit-stable across re-runs and partitionings, different across epochs."""
    from connemara_spark.operators.curation import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")

    a = epoch_shuffle(df, "doc_id", n_shards=8, epoch=0).collect()
    addr = {(r["shard"], r["shard_pos"]) for r in a}
    assert len(addr) == 500  # unique addresses
    assert {r["doc_id"] for r in a} == set(range(500))
    per_shard = {}
    for r in a:
        per_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for shard, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))  # dense 1..n per shard

    # determinism under repartitioning
    b = epoch_shuffle(df.repartition(13), "doc_id", n_shards=8, epoch=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # a different epoch is a different permutation
    c = epoch_shuffle(df, "doc_id", n_shards=8, epoch=1).collect()
    order0 = [r["doc_id"] for r in sorted(a, key=lambda r: (r["shard"], r["shard_pos"]))]
    order1 = [r["doc_id"] for r in sorted(c, key=lambda r: (r["shard"], r["shard_pos"]))]
    assert order0 != order1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        epoch_shuffle(df, "doc_id", n_shards=0)


def test_neardup_clusters_driver_and_distributed_paths_agree(spark):
    """The scale-adaptive cutover must be invisible: on a randomized pair
    set, the driver union-find (small-edge fast path) and the distributed
    min-label fixed point (driver_cc_cap=0 forces it) produce identical
    components, including across chains, merges, and isolated pairs."""
    import random

    rng = random.Random(8)
    pairs = []
    # several chains + random cross-links + isolated pairs
    base = 0
    for chain_len in (7, 1, 13, 2, 5):
        pairs += [(base + i, base + i + 1) for i in range(chain_len)]
        base += chain_len + 10
    nodes = sorted({x for p in pairs for x in p})
    pairs += [tuple(sorted(rng.sample(nodes, 2))) for _ in range(10)]
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "id_a long, id_b long"
    )
    fast = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(df).collect()}
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(df, driver_cc_cap=0).collect()
    }
    assert fast == dist and len(fast) == len(nodes)
    # every label is the component minimum: labels are fixed points
    assert all(fast[v] == fast[fast[v]] and fast[v] <= v for v in fast)


def test_weighted_systematic_sample_invariants(spark, sf_dir):
    """Systematic weighted sampling: exactly k picks in total (every grid
    point lands in exactly one weight interval), multiplicity for
    heavier-than-stride rows, zero-weight rows unselectable, and the
    selection is a pure function of (ids, weights) — repartitioning
    cannot change it."""
    from pyspark.sql import functions as F

    from connemara_spark.operators.curation import weighted_systematic_sample
    from connemara_spark.queries import load, spread

    docs = spread(load(spark, sf_dir, "documents")).select("doc_id", "n_chars")
    k = 137
    got = weighted_systematic_sample(docs, "doc_id", "n_chars", k=k)
    rows = got.collect()
    assert sum(r["n_picks"] for r in rows) == k
    assert all(r["n_picks"] >= 1 for r in rows)

    again = weighted_systematic_sample(
        docs.repartition(7, "doc_id"), "doc_id", "n_chars", k=k
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    # one dominant row: weight beyond several strides -> multiplicity > 1,
    # and total picks still exactly k
    heavy = docs.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == 7, F.lit(10_000_000)).otherwise(F.col("n_chars")),
    )
    hs = weighted_systematic_sample(heavy, "doc_id", "n_chars", k=50).collect()
    assert sum(r["n_picks"] for r in hs) == 50
    by_id = {r["doc_id"]: r["n_picks"] for r in hs}
    assert by_id.get(7, 0) > 1

    # zero/negative weights can never be picked
    zw = docs.withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 3 == 0, F.lit(0)).otherwise(F.col("n_chars")),
    )
    zs = weighted_systematic_sample(zw, "doc_id", "n_chars", k=60).collect()
    assert sum(r["n_picks"] for r in zs) == 60
    assert all(r["doc_id"] % 3 != 0 for r in zs)


# ---------------------------------------------------------------------------
# mixture_interleave


def _naive_interleave(rows, weights, seed=42):
    """Window-free python reference: stride keys + (key, source) sort."""
    from math import gcd

    lcm = 1
    for w in weights.values():
        lcm = lcm * w // gcd(lcm, w)
    per_src = {}
    for i, s in rows:
        per_src.setdefault(s, []).append(i)
    keyed = []
    for s, ids_ in per_src.items():
        ids_.sort(key=lambda i: hashlib.md5(f"{seed}|{i}".encode()).hexdigest())
        m = lcm // weights[s]
        for j, i in enumerate(ids_, start=1):
            keyed.append(((2 * j - 1) * m, s, i))
    keyed.sort(key=lambda t: (t[0], t[1]))
    return {i: pos for pos, (_, _, i) in enumerate(keyed, start=1)}


def test_mixture_interleave_matches_naive_reference(spark):
    from connemara_spark.operators.curation import mixture_interleave

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    weights = {"a": 3, "b": 2, "c": 5}
    got = {
        r["doc_id"]: r["pos"]
        for r in mixture_interleave(df, "doc_id", "src", weights=weights).collect()
    }
    assert got == _naive_interleave(rows, weights)


def test_mixture_interleave_positions_are_a_permutation_and_proportional(spark):
    from connemara_spark.operators.curation import mixture_interleave

    rows = [(i, "heavy" if i % 10 else "light") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = mixture_interleave(
        df, "doc_id", "src", weights={"heavy": 9, "light": 1}
    ).collect()
    poss = sorted(r["pos"] for r in out)
    assert poss == list(range(1, 1001))
    # every prefix window carries ~the configured 9:1 mixture: in any
    # prefix of length n, heavy count is within 1 of 0.9n by the stride
    # guarantee (|occupancy - n*w| < 1 for stride scheduling)
    by_pos = {r["pos"]: r["src"] for r in out}
    heavy = 0
    for n in range(1, 1001):
        heavy += by_pos[n] == "heavy"
        assert abs(heavy - 0.9 * n) <= 1.0 + 1e-9
    assert heavy == 900


def test_mixture_interleave_partition_invariant(spark):
    from connemara_spark.operators.curation import mixture_interleave

    rows = [(i, ["x", "y"][i % 2]) for i in range(400)]
    base = spark.createDataFrame(rows, "doc_id long, src string")
    a = mixture_interleave(base.repartition(1), "doc_id", "src", weights={"x": 1, "y": 3})
    b = mixture_interleave(base.repartition(17), "doc_id", "src", weights={"x": 1, "y": 3})
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_mixture_interleave_rejects_bad_weights(spark):
    from connemara_spark.operators.curation import mixture_interleave

    df = spark.createDataFrame([(1, "a")], "doc_id long, src string")
    with pytest.raises(ValueError):
        mixture_interleave(df, "doc_id", "src", weights={"a": 0})
    with pytest.raises(ValueError):
        mixture_interleave(df, "doc_id", "src", weights={})
