"""Dataset-curation operators for training-data pipelines.

- hash_bucket / hash_sample / dataset_split — DETERMINISTIC selection keyed
  on content ids, not ``rand()``: reproducible across runs, engines, and
  cluster sizes, and stable under re-partitioning — the property a 100 TB
  corpus snapshot needs (re-running the pipeline must pick the same rows).
  Two hash families: ``xxhash64`` (8-byte JVM hash, the scale path) and
  ``md5`` (hex-string comparisons, portable SQL → DuckDB value-hash gate).
- neardup_clusters — connected components over a near-duplicate pair graph
  via Pregel-style min-label propagation: per iteration one hash-join on
  the edge list + a groupBy-min, converging in O(cluster diameter)
  iterations (near-dup clusters are shallow — boilerplate families rarely
  chain far). The driver-side loop checks a changed-count per iteration
  (an aggregate, not a data collect). At extreme skew the large-star /
  small-star variant halves rounds; the edge-join shape is identical.
- keep_canonical — one representative per cluster (smallest id wins, the
  reference dedup convention), everything else flagged as a duplicate.

Selection thresholds compare the FIRST 8 HEX CHARS of the hash as strings:
lowercase-hex ordering is numeric ordering, so ``substr(md5(x),1,8) <
'1999999a'`` keeps ~10% — identically in Spark and any SQL engine, with no
integer-conversion dialect traps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_hex8(id_col: Column, seed: int, family: str) -> Column:
    """First 8 hex chars of the keyed hash, lowercase — the comparison key
    for all selection operators."""
    if family == "md5":
        return F.substring(F.md5(F.concat(F.lit(f"{seed}|"), id_col.cast("string"))), 1, 8)
    if family == "xxhash64":
        # bucket on the hash's top 32 bits, rendered as zero-padded hex so
        # the same string-comparison contract holds
        h = F.shiftrightunsigned(F.xxhash64(id_col, F.lit(seed)), 32)
        return F.lpad(F.lower(F.hex(h)), 8, "0")
    raise ValueError(f"unknown hash family {family!r}")


def _prefix_offsets(
    per_group: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str,
    *,
    domain_max: int,
) -> DataFrame:
    """EXCLUSIVE prefix sum over a tiny per-group totals frame (bands /
    shards — bounded at a few thousand rows by construction) WITHOUT the
    single-partition window a bare ``ORDER BY`` would plan: WindowExec
    funnels even a 256-row frame through one task and logs a degradation
    warning. ``group_col`` must be an integer id in ``[0, domain_max]``
    (the group domains here are fixed by construction): each group's total
    explodes to every HIGHER group id, then one equi-keyed aggregation
    yields the offsets — O(groups²) rows, trivial at this cardinality,
    fully parallel, and (unlike an inequality self-join) never a
    nested-loop join in the plan."""
    contrib = (
        per_group.filter(F.col(group_col) < domain_max)
        .select(
            F.explode(
                F.sequence(F.col(group_col) + 1, F.lit(domain_max))
            ).alias(group_col),
            F.col(value_col).alias("__v"),
        )
    )
    # Only groups with a NONZERO offset appear — callers left-join and
    # coalesce to 0, which keeps this a single reference of ``per_group``
    # (joining back here would re-execute the totals subtree per plan
    # reference).
    return contrib.groupBy(group_col).agg(F.sum("__v").alias(out_col))


def fraction_threshold_hex(fraction: float) -> str:
    """Hex threshold t such that P[hex8 < t] == fraction for a uniform
    32-bit hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    v = int(round(fraction * 0x100000000))
    if v >= 0x100000000:
        return "g" * 8  # 'g' > 'f' in ASCII: keeps everything
    return format(v, "08x")


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    *,
    seed: int = 42,
    family: str = "xxhash64",
) -> DataFrame:
    """Deterministic ``fraction`` sample keyed on ``id_col``. Unlike
    ``df.sample()``, membership is a pure function of the id — stable
    across runs, partitionings, and engines."""
    t = fraction_threshold_hex(fraction)
    return df.filter(_hash_hex8(F.col(id_col), seed, family) < F.lit(t))


def dataset_split(
    df: DataFrame,
    id_col: str,
    *,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    family: str = "xxhash64",
) -> DataFrame:
    """Assign each row a deterministic ``split`` label (train/val/test by
    default) by cumulative hash-threshold ranges. Weights must sum to 1."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    hx = _hash_hex8(F.col(id_col), seed, family)
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        t = fraction_threshold_hex(acc)
        cond = hx < F.lit(t)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    split = (expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)).alias("split")
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    *,
    n_per_stratum: int,
    seed: int = 42,
    family: str = "md5",
) -> DataFrame:
    """Balanced per-stratum sample: the first ``n_per_stratum`` rows of each
    stratum in deterministic hash order (same reproducible-selection
    contract as ``hash_sample`` — re-runs pick identical rows). One
    partitioned window per stratum; no global sort, no single-task funnel.
    Emits ``sample_rank`` (1-based within the stratum)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        _hash_hex8(F.col(id_col), seed, family), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    *,
    n_shards: int,
    epoch: int = 0,
    seed: int = 42,
    family: str = "md5",
) -> DataFrame:
    """Deterministic global training order for one epoch: every row gets a
    ``(shard, shard_pos)`` address such that reading shards in order, each
    sorted by ``shard_pos``, visits the corpus in a pseudo-random
    permutation that changes per ``epoch`` but is bit-stable across runs,
    engines, partitionings, and retries (the hash plays the RNG — no
    ``rand()``, the reproducibility contract every training run wants for
    resumable data loaders).

    Scale shape: shard assignment is a pure per-row hash; the position is
    a row_number over a window PARTITIONED BY shard — with ``n_shards``
    sized to the writer parallelism (hundreds+) no single task ever sees
    more than ~corpus/n_shards rows, and there is no global sort or
    single-partition window anywhere. The downstream writer is
    ``partitionBy(shard)`` — one file per shard, the WebDataset layout
    (``sources/shards.py``) these addresses feed."""
    from pyspark.sql.window import Window

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    h = _hash_hex8(F.col(id_col), seed + epoch, family)
    # shard = top hex nibbles mod n_shards via exact integer conv on the
    # 8-hex prefix (32-bit value — conv is exact), portable to any engine
    shard = (F.conv(h, 16, 10).cast("long") % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("shard_pos", F.row_number().over(w))
        .drop("__h")
    )


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 13,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark-contamination detection: (train_doc, bench_doc) pairs
    sharing ≥ ``min_shared`` distinct word ``k``-grams — the standard
    13-gram overlap test run before training on a scraped corpus.

    Shape: explode each side's DISTINCT shingles, hash-join on the gram,
    count per pair. The benchmark side is the small one by construction
    (evaluation suites are tiny next to a 100 TB corpus), so the gram join
    broadcasts or AQE-coalesces; counts aggregate with map-side partials.
    Same-document pairs are excluded (a benchmark doc trivially overlaps
    itself if it also appears in train)."""
    from connemara_spark.operators.dedup import word_shingles

    t = train.select(
        F.col(id_col).alias("train_doc_id"),
        F.explode(word_shingles(text_col, k)).alias("gram"),
    )
    b = bench.select(
        F.col(id_col).alias("bench_doc_id"),
        F.explode(word_shingles(text_col, k)).alias("gram"),
    )
    return (
        t.join(b, "gram")
        .filter(F.col("train_doc_id") != F.col("bench_doc_id"))
        .groupBy("train_doc_id", "bench_doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    budget: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins: documents are
    laid out in a deterministic shuffled order (md5 of the id — the same
    reproducible-selection contract as ``hash_sample``) and ``bin_id`` is
    the bin in which each document STARTS (cumulative tokens // budget).

    The global running sum is computed as a DISTRIBUTED prefix-sum, not one
    giant unpartitioned window (which would funnel 100 TB through a single
    task): the hash's first two hex chars shard the order into 256 ranges;
    each shard does a partitioned window cumsum, and a 256-row shard-total
    table (broadcast) supplies each shard's global offset. Because the
    shard key is a PREFIX of the order key, shard-then-offset order equals
    global hash order exactly — an oracle can verify with a naive global
    window and match bit-for-bit.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    t = df.select(
        F.col(id_col),
        F.col(tokens_col).alias("n_tokens"),
        h.alias("__h"),
        F.substring(h, 1, 2).alias("__shard"),
    )
    w_in = (
        Window.partitionBy("__shard")
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn("__cum_in", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))
    totals = t.groupBy("__shard").agg(F.sum("n_tokens").alias("__tot"))
    # shard ids are 2-hex-char prefixes: a fixed [0, 255] integer domain
    tot_i = totals.select(
        F.conv("__shard", 16, 10).cast("int").alias("__gi"), "__shard", "__tot"
    )
    offsets = _prefix_offsets(
        tot_i.select("__gi", "__tot"), "__gi", "__tot", "__off", domain_max=255
    ).select(
        F.lower(F.lpad(F.hex("__gi"), 2, "0")).alias("__shard"), "__off"
    )
    return (
        t.join(F.broadcast(offsets), "__shard", "left")  # absent = offset 0
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.floor(
                (F.coalesce(F.col("__off"), F.lit(0)) + F.col("__cum_in"))
                / F.lit(float(budget))
            )
            .cast("long")
            .alias("bin_id"),
        )
    )


def bloom_positions(gram: Column, *, n_hashes: int = 3, prefix_len: int = 5) -> Column:
    """The ``n_hashes`` Bloom-slot keys of one shingle: hex-string prefixes
    of seeded md5, so slot identity is portable SQL (no integer-conversion
    dialect traps — same contract as ``_hash_hex8``). ``prefix_len`` hex
    chars give a 16^prefix_len-slot filter (5 → ~1M slots)."""
    return F.array(
        *[
            F.substring(F.md5(F.concat(F.lit(f"{s}#"), gram)), 1, prefix_len)
            for s in range(n_hashes)
        ]
    )


def bloom_bits(
    bench: DataFrame,
    *,
    text_col: str = "text",
    k_gram: int = 13,
    n_hashes: int = 3,
    prefix_len: int = 5,
) -> DataFrame:
    """Build the benchmark side of a Bloom-filter decontamination pass: the
    DISTINCT set of occupied slots over every benchmark ``k_gram``. The
    result is bounded by min(#grams·n_hashes, 16^prefix_len) rows — small
    enough to broadcast however large the training corpus is, which is the
    entire point: the 100 TB side is probed with a map-side broadcast join,
    never shuffled on gram text."""
    from connemara_spark.operators.dedup import word_shingles

    grams = bench.select(
        F.explode(F.array_distinct(word_shingles(text_col, k_gram))).alias("gram")
    )
    return grams.select(
        F.explode(bloom_positions(F.col("gram"), n_hashes=n_hashes, prefix_len=prefix_len)).alias("pos")
    ).distinct()


def bloom_decontaminate(
    train: DataFrame,
    bits: DataFrame,
    bench_grams: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_gram: int = 13,
    n_hashes: int = 3,
    prefix_len: int = 5,
) -> DataFrame:
    """Probe every training document's distinct ``k_gram``s against a Bloom
    slot set built by ``bloom_bits``: a gram is a BLOOM HIT when all
    ``n_hashes`` of its slots are occupied (one-sided error — no false
    negatives, deterministic false positives since the hashes are md5).

    When ``bench_grams`` (one ``gram`` column) is given, each bloom hit is
    also confirmed exactly, surfacing the filter's realized false-positive
    rate — the confirm join only sees the bloom-surviving sliver, which is
    the standard two-stage shape at scale.

    Output per train doc: (id, n_grams, n_bloom_hits, n_exact_hits).
    """
    from connemara_spark.operators.dedup import word_shingles

    g = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, k_gram))).alias("gram"),
    )
    probes = g.select(
        id_col,
        "gram",
        F.explode(bloom_positions(F.col("gram"), n_hashes=n_hashes, prefix_len=prefix_len)).alias("pos"),
    )
    hits = (
        probes.join(F.broadcast(bits), "pos")
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("n_slot_hits"))
        .filter(F.col("n_slot_hits") == n_hashes)
        .select(id_col, "gram")
    )
    per_doc_bloom = hits.groupBy(id_col).agg(F.count("*").alias("n_bloom_hits"))
    totals = g.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    out = totals.join(per_doc_bloom, id_col, "left")
    if bench_grams is not None:
        exact = (
            hits.join(F.broadcast(bench_grams.select("gram").distinct()), "gram")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_exact_hits"))
        )
        out = out.join(exact, id_col, "left")
    else:
        out = out.withColumn("n_exact_hits", F.lit(None).cast("long"))
    return out.select(
        id_col,
        "n_grams",
        F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
        F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
    )


def dsir_features(df: DataFrame, id_col: str, text_col: str, *, prefix_len: int = 4) -> DataFrame:
    """Hashed n-gram features (unigrams + bigrams → 16^prefix_len buckets),
    one row per feature OCCURRENCE — the DSIR (Data Selection via
    Importance Resampling) feature map. Bucket keys are md5 hex prefixes:
    portable across engines, no integer conversions."""
    toks = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__t"))
    uni = toks.select(
        id_col, F.explode(F.transform(F.col("__t"), lambda w: F.concat(F.lit("u#"), w))).alias("feat")
    )
    big = toks.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                F.slice(F.col("__t"), 2, F.greatest(F.size("__t") - 1, F.lit(0))),
                lambda a, b: F.concat(F.lit("b#"), a, F.lit(" "), b),
            )
        ).alias("feat"),
    )
    return uni.union(big).select(
        id_col, F.substring(F.md5(F.col("feat")), 1, prefix_len).alias("bucket")
    )


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 4,
    smoothing: float = 0.5,
) -> DataFrame:
    """DSIR importance log-weights: per-document Σ over hashed-n-gram
    feature occurrences of ln(p_target(bucket) / p_raw(bucket)), with
    add-``smoothing`` estimates over ``16^prefix_len`` buckets. Documents
    that look like the target corpus score high; used to importance-sample
    a raw crawl toward a quality/domain target.

    Scale shape: the bucket-stat table is bounded (≤ 16^prefix_len rows) —
    it aggregates with map-side partials and broadcasts back; the corpus is
    never shuffled except by bucket id for the counts. The per-bucket log
    ratio is rounded to DECIMAL(16,6) BEFORE the per-doc sum, so the sum is
    exact decimal addition — order-independent, hence reproducible across
    partitionings and engines (a raw double Σ would depend on reduce
    order)."""
    n_buckets = 16 ** prefix_len
    raw_feats = dsir_features(df, id_col, text_col, prefix_len=prefix_len)
    tgt_feats = dsir_features(target, id_col, text_col, prefix_len=prefix_len)
    raw_counts = raw_feats.groupBy("bucket").agg(F.count("*").alias("c_r"))
    tgt_counts = tgt_feats.groupBy("bucket").agg(F.count("*").alias("c_t"))
    stats = raw_counts.join(tgt_counts, "bucket", "left").select(
        "bucket", "c_r", F.coalesce("c_t", F.lit(0)).alias("c_t")
    )
    # Feature totals inlined as literal scalars (one bounded agg job over
    # the ≤ n_buckets-row table — the doc_tfidf pattern): an unpartitioned
    # window would plan a single-partition WindowExec, and a 1-row
    # cross-join a nested-loop join; both are plan smells the literals
    # avoid.
    # persist the bounded bucket table: the totals collect below and the
    # ratios projection both read it — without the cache the feature-count
    # aggregation subtree would execute twice. The cache is RELEASED before
    # returning (a persist with no unpersist accumulates cached frames
    # across a long-lived session); the returned plan reads the
    # localCheckpoint-ed ratios (≤ n_buckets rows), whose storage the
    # ContextCleaner frees once the frame is unreferenced.
    stats = stats.persist()
    try:
        trow = stats.agg(
            F.sum("c_r").alias("__tot_r"), F.sum("c_t").alias("__tot_t")
        ).collect()[0]
        tot_r = F.lit(float(trow["__tot_r"] or 0))
        tot_t = F.lit(float(trow["__tot_t"] or 0))
        lr = (
            F.log((F.col("c_t") + F.lit(smoothing)) / (tot_t + F.lit(smoothing * n_buckets)))
            - F.log((F.col("c_r") + F.lit(smoothing)) / (tot_r + F.lit(smoothing * n_buckets)))
        )
        ratios = stats.select(
            "bucket", F.round(lr, 6).cast("decimal(16,6)").alias("log_ratio")
        ).localCheckpoint()
    finally:
        stats.unpersist()
    return (
        raw_feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_features"),
            F.sum("log_ratio").cast("double").alias("dsir_logweight"),
        )
    )


def _driver_union_find(edge_rows) -> dict:
    """Union-find with path compression + union-by-min over collected
    (src, dst) rows; returns {node: min id of its component}. O(E α(E))
    with a tiny constant — the right tool once the edge list fits the
    driver."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in edge_rows:
        a, b = r[0], r[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root: the component's label IS its smallest id
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {n: find(n) for n in parent}


def neardup_clusters(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 15,
    driver_cc_cap: int | None = 2_000_000,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id),
    cluster_id = smallest doc id in the component. Covers only nodes that
    appear in at least one pair (singletons are trivially their own
    cluster and are left to the caller).

    Pregel-style min-label propagation WITH path halving: each iteration
    (a) takes the min over neighbors' labels (one hash-join + groupBy-min)
    and (b) pointer-jumps ``label ← label(label)`` (one more hash-join), so
    convergence is O(log diameter) iterations, not O(diameter). The
    driver-side loop checks a changed-count per iteration (an aggregate,
    never a data collect).

    Each iteration's result is ``localCheckpoint``-ed (eager): without
    lineage truncation the logical plan doubles per iteration and Catalyst
    re-analysis goes exponential (measured: 2s → 76s by iteration 3 on a
    40-node chain). Checkpointed labels are one small (node, label) table
    per iteration — cheap to materialize, and the plan each iteration stays
    two joins deep. On a real cluster with lineage-loss concerns, swap for
    reliable ``checkpoint()`` against a checkpoint dir — same call shape.

    SCALE-ADAPTIVE: the distributed fixed point pays several Spark jobs of
    scheduling/shuffle overhead PER ITERATION (~1 s each locally) — pure
    waste when the deduped edge list is small. The edge count is free off
    the already-checkpointed edges, so when it is at most
    ``driver_cc_cap`` (default 2M edges ≈ 32 MB of longs, trivially
    driver-safe) the components come from a driver-side union-find in
    milliseconds instead. Near-dup graphs are SPARSE by construction
    (a near-dup pair rate high enough to produce billions of edges means
    the threshold is wrong), but when they aren't, the distributed loop
    engages automatically — pass ``driver_cc_cap=None/0`` to force it.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = pairs.sparkSession
    if driver_cc_cap and edges.count() <= driver_cc_cap:
        from pyspark.sql.types import StructField, StructType

        comp = _driver_union_find(edges.collect())
        idt = edges.schema["src"].dataType  # label type == node id type
        return spark.createDataFrame(
            list(comp.items()),
            StructType(
                [StructField("doc_id", idt), StructField("cluster_id", idt)]
            ),
        )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # (a) min over neighbors
        nbr_min = (
            edges.join(
                labels.select(F.col("node").alias("dst"), F.col("label").alias("dlabel")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dlabel").alias("nbr"))
            .withColumnRenamed("src", "node")
        )
        step1 = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr", "label")).alias("label"),
            F.col("label").alias("__old"),
        )
        # (b) pointer jump: label ← label(label) (labels always hold node
        # ids present in the graph, so the self-join hits). Exactly ONE
        # jump per round: chaining a second jump on the un-checkpointed
        # step1 re-executes its neighbor-join subtree once per self-join
        # reference (measured 6.7s → 411s at sf0.1) — more jumps only pay
        # off with a checkpoint per jump, which costs more than the rounds
        # they save.
        parents = step1.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            step1.join(parents, step1.label == parents.pnode, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("plabel", "label")).alias("label"),
                "__old",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") != F.col("__old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def keep_canonical(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    *,
    cluster_node: str = "doc_id",
    cluster_id: str = "cluster_id",
) -> DataFrame:
    """Join cluster assignments back and keep one representative per
    cluster: the smallest id (== the cluster id, by construction of
    ``neardup_clusters``). Rows outside any cluster are kept."""
    cl = clusters.select(
        F.col(cluster_node).alias("__node"), F.col(cluster_id).alias("__cid")
    )
    joined = df.join(cl, df[id_col] == cl["__node"], "left")
    return (
        joined.filter(F.col("__cid").isNull() | (F.col(id_col) == F.col("__cid")))
        .drop("__node", "__cid")
    )


def distributed_ntile(
    df: DataFrame,
    order_col: str,
    id_col: str,
    *,
    n: int = 10,
    bands: int = 256,
    total: int | None = None,
) -> DataFrame:
    """EXACT global NTILE without a single-partition window.

    A bare ``NTILE(n) OVER (ORDER BY ...)`` funnels the whole table
    through ONE task — the classic accidental scale-killer. This is the
    banded-prefix-sum formulation (same family as ``pack_sequences``):
    shard rows by a value band that is a PREFIX of the order key
    (``floor(order_col·bands)`` for scores in [0,1]), rank within bands
    by a partitioned window, add broadcast band offsets (one tiny
    ``bands``-row window), and map exact global ranks to NTILE buckets
    with the standard remainder rule (first ``N % n`` buckets take the
    extra row). Band-then-offset order equals global order because the
    band is a monotone function of the order key; ``id_col`` breaks ties
    deterministically.

    ``order_col`` must lie in [0, 1] (clamped at the edges). ``total``
    skips the count job when the caller already knows N. Output: input
    columns + ``bucket`` (1-based).
    """
    from pyspark.sql.window import Window

    if total is None:
        total = df.count()
    band = F.least(
        F.greatest(F.floor(F.col(order_col) * bands).cast("int"), F.lit(0)),
        F.lit(bands - 1),
    )
    s = df.withColumn("__band", band)
    w_in = Window.partitionBy("__band").orderBy(order_col, id_col)
    counts = s.groupBy("__band").agg(F.count(F.lit(1)).alias("__c"))
    offsets = _prefix_offsets(counts, "__band", "__c", "__off", domain_max=bands - 1)
    ranked = (
        s.join(F.broadcast(offsets), "__band", "left")  # absent = offset 0
        .withColumn(
            "__rank",
            F.row_number().over(w_in) + F.coalesce(F.col("__off"), F.lit(0)),
        )
    )
    q, r = total // n, total % n
    if q == 0:
        bucket = F.col("__rank")  # fewer rows than buckets: one row each
    else:
        head = r * (q + 1)
        bucket = F.when(
            F.col("__rank") <= head,
            F.expr(f"(__rank - 1) div {q + 1}") + 1,
        ).otherwise(F.lit(r) + F.expr(f"(__rank - 1 - {head}) div {q}") + 1)
    return ranked.withColumn("bucket", bucket.cast("int")).drop(
        "__band", "__off", "__rank"
    )


def weighted_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    *,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic WEIGHTED sample of exactly ``k`` picks: systematic
    (grid) sampling over the cumulative-weight line — the training-mix
    primitive "sample documents proportional to weight" (length, quality,
    DSIR importance) with the repo's reproducible-selection contract
    (pure function of the id set + weights; retries, partitionings, and
    engines cannot change it — no libm in sight).

    Documents are laid out in hash order (md5 of the id, the
    ``pack_sequences`` idiom) on the cumulative-weight line [0, W); the k
    grid points j·W/k (j = 0..k-1) each land in exactly one document's
    weight interval [C_i, C_i + w_i). ``n_picks`` is how many points hit
    the interval (a document heavier than the stride W/k is picked with
    multiplicity — keep it or cap it downstream), and Σ n_picks == k by
    construction (test-pinned). All comparisons are INTEGER-exact: the
    grid test multiplies through by k — j·W ∈ [k·C, k·(C+w)) — so both
    engines evaluate identical bigint floor-divisions; weights must be a
    positive integer column (scale decimals to cents first).

    Scale shape: the same 256-shard distributed prefix sum as
    ``pack_sequences`` (no global single-partition window); the per-shard
    totals (256 rows) are collected ONCE to the driver, which inlines the
    global total W and broadcasts the shard offsets — one tiny driver
    round-trip instead of re-executing the totals subtree per reference.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    t = df.filter(F.col(weight_col) > 0).select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("__w"),
        h.alias("__h"),
        F.substring(h, 1, 2).alias("__shard"),
    )
    w_in = (
        Window.partitionBy("__shard")
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn("__cum_in", F.coalesce(F.sum("__w").over(w_in), F.lit(0)))
    rows = (
        t.groupBy("__shard").agg(F.sum("__w").alias("__tot")).collect()
    )  # ≤ 256 rows: the bounded-scalar pattern (inline literals, not a
    # second totals subtree in the plan)
    total = sum(r["__tot"] for r in rows)
    if total <= 0 or k <= 0:
        return t.select(id_col, F.col("__w").alias("weight")).limit(0).withColumn(
            "n_picks", F.lit(0).cast("long")
        )
    by_shard = {r["__shard"]: r["__tot"] for r in rows}
    acc = 0
    off_rows = []
    for s in sorted(by_shard):  # hex-prefix order == global hash order
        off_rows.append((s, acc))
        acc += by_shard[s]
    offsets = t.sparkSession.createDataFrame(off_rows, "__shard string, __off long")
    # multiples of W in [a, b): floor((b-1)/W) - floor((a-1)/W); the c==0
    # head owns the j=0 point (a-1 would be negative, where `div`
    # truncates instead of flooring) — every other operand is
    # non-negative, so `div` is exact floor division in both engines
    return (
        t.join(F.broadcast(offsets), "__shard", "left")
        .withColumn("__c", F.coalesce(F.col("__off"), F.lit(0)) + F.col("__cum_in"))
        .withColumn("__a", F.lit(k) * F.col("__c"))
        .withColumn("__b", F.lit(k) * (F.col("__c") + F.col("__w")))
        .withColumn(
            "n_picks",
            F.when(
                F.col("__c") == 0,
                F.expr(f"div(__b - 1, {total}L)") + F.lit(1),
            ).otherwise(
                F.expr(f"div(__b - 1, {total}L)") - F.expr(f"div(__a - 1, {total}L)")
            ).cast("long"),
        )
        .filter(F.col("n_picks") >= 1)
        .select(id_col, F.col("__w").alias("weight"), "n_picks")
    )


def mixture_interleave(
    df: DataFrame,
    id_col: str,
    source_col: str,
    *,
    weights: dict[str, int],
    seed: int = 42,
) -> DataFrame:
    """Deterministic mixture interleaving: lay the corpus out in ONE global
    training order where every prefix holds each source in proportion to
    its integer weight (stride scheduling — the document j of source s sits
    at rational time (2j-1)/(2*w_s), realized as the exact integer key
    (2j-1) * (lcm(w)/w_s) with ties broken by source name).

    Returns (id_col, source_col, pos) with ``pos`` the 1-based global
    position. The training-order contract data loaders need: reproducible
    across runs/partitionings/engines (within-source order is md5 of the
    id — the same pure-function-of-the-id contract as ``hash_sample``),
    and every window of the stream carries the configured source mixture
    (no "all of source A first" pathology, no RNG drift between epochs).

    Scale shape: NO global window anywhere. Within-source ranks come from
    the 256-shard banded prefix-sum (``pack_sequences``), and the global
    position is CLOSED-FORM per row: rank(K) = 1 + sum over sources s' of
    |{j' : key_{s'}(j') < K}| — each term a pure integer formula
    min(n_s', ((K-1) // M_s' + 1) // 2) over |sources| literals, plus a
    divisibility test for cross-source ties. Per-source totals are a
    |sources|-row driver collect (bounded, documented). Every operand is
    positive, so truncating and floor integer division agree — the formula
    is portable verbatim to the SQL oracle.
    """
    from math import gcd

    from pyspark.sql.window import Window

    sources = sorted(weights)
    if not sources:
        raise ValueError("weights must name at least one source")
    ws = {s: int(weights[s]) for s in sources}
    if any(w <= 0 for w in ws.values()):
        raise ValueError("weights must be positive integers")
    lcm = 1
    for w in ws.values():
        lcm = lcm * w // gcd(lcm, w)
    mult = {s: lcm // ws[s] for s in sources}  # key stride per source

    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    t = df.select(
        F.col(id_col),
        F.col(source_col),
        h.alias("__h"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("__shard"),
    ).filter(F.col(source_col).isin(sources))

    w_in = Window.partitionBy(source_col, "__shard").orderBy("__h")
    t = t.withColumn("__j_in", F.row_number().over(w_in))

    counts = t.groupBy(source_col, "__shard").agg(F.count(F.lit(1)).alias("__c"))
    # exclusive per-source prefix over the fixed [0,255] shard domain —
    # the _prefix_offsets shape, kept WITHIN each source
    contrib = counts.filter(F.col("__shard") < 255).select(
        source_col,
        F.explode(F.sequence(F.col("__shard") + 1, F.lit(255))).alias("__shard"),
        F.col("__c").alias("__v"),
    )
    offsets = contrib.groupBy(source_col, "__shard").agg(F.sum("__v").alias("__off"))
    t = t.join(F.broadcast(offsets), [source_col, "__shard"], "left").withColumn(
        "__j", (F.coalesce(F.col("__off"), F.lit(0)) + F.col("__j_in")).cast("long")
    )

    # per-source totals: |sources| rows, the same bounded-collect class as
    # the store's bucket pricing — the values render into the closed form
    n_rows = {
        r[source_col]: r["n"]
        for r in df.filter(F.col(source_col).isin(sources))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    key = F.lit(None).cast("long")
    for s in sources:
        key = F.when(
            F.col(source_col) == s, (2 * F.col("__j") - 1) * F.lit(mult[s])
        ).otherwise(key)
    t = t.withColumn("__key", key.cast("long"))

    # closed-form global rank: 1 + my own earlier rows + per-other-source
    # counts of strictly-smaller keys (+1 on an exact cross-source tie when
    # that source orders first). All operands are positive integers, so
    # `div` (truncating) equals floor division in BOTH engines.
    pos = F.lit(1).cast("long") + (F.col("__j") - 1)
    for s in sources:
        m, n_s = mult[s], int(n_rows.get(s, 0))
        other = F.col(source_col) != s
        # largest j' with (2j'-1)*M' <= K-1  ->  (((K-1) div M') + 1) div 2
        c_lt = F.least(
            F.lit(n_s).cast("long"),
            F.expr(f"((__key - 1) div {m}L + 1L) div 2L"),
        )
        # exact tie: M' | K, odd quotient, j' in range; ties order by
        # source name — count it only when s sorts before my source
        tie = (
            (F.col("__key") % F.lit(m) == 0)
            & (F.expr(f"(__key div {m}L) % 2L") == 1)
            & (F.expr(f"(__key div {m}L + 1L) div 2L") <= F.lit(n_s))
            & (F.lit(s) < F.col(source_col))
        )
        pos = pos + F.when(
            other, c_lt + F.when(tie, F.lit(1)).otherwise(F.lit(0))
        ).otherwise(F.lit(0))

    return t.select(
        F.col(id_col), F.col(source_col), pos.cast("long").alias("pos")
    )
