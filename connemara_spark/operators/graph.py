"""Graph centrality for corpus/entity curation: fixed-point PageRank.

Link-graph authority is a standard corpus-quality signal (CommonCrawl-
style page ranking feeding crawl frontier and quality weighting). The
engine's variant is **fixed-point**: ranks are BIGINT multiples of
``1/scale`` and every step is integer arithmetic (``div`` floor
division), so results are bit-identical across engines, partitionings,
and retries — double-precision PageRank is not (float sums reorder under
shuffle, and Spark/DuckDB disagree on decimal-division scale rules; an
integer formulation sidesteps the whole class, same reasoning as the
DECIMAL-exact aggregation queries).

Update rule per iteration (damping d = damping_num/100):

    contrib(u) = rank(u) div outdeg(u)
    rank'(v)   = (15 · base) div 100  +  (85 · Σ_{u→v} contrib(u)) div 100

with ``base = scale div n_nodes`` the uniform start. Truncation loses at
most outdeg ulps per node per iteration — at scale=10¹² that is 1e-12-
class error, far below any ranking-relevant difference.

Shape at 100 TB: per iteration, one hash join ranks⋈edges on src + one
aggregation shuffle on dst + one left join back to nodes — all keyed on
the 8-byte node id, rank state is 16 bytes/node. Each iteration is
``localCheckpoint``-ed (the iterative-loop lineage rule, see
neardup_clusters). Edges are persisted once and reused by every
iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10**12,
    undirected: bool = True,
) -> DataFrame:
    """PageRank over (src, dst) edges → (node, rank_fp) with rank_fp a
    BIGINT fixed-point rank (true rank = rank_fp / scale). ``undirected``
    symmetrizes the edge set first (every node then has outdeg >= 1, so
    there are no dangling nodes)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().persist()

    # one aggregation yields BOTH the degree table and the node set (deg is
    # distinct-by-src by construction — no separate distinct shuffle). In
    # the undirected case every node is a src; in the DIRECTED case pure
    # sinks appear only as dst, so the node set must union both sides or
    # sink nodes (often the highest-ranked!) silently vanish from the
    # output. Their outgoing mass is dropped (no dangling-node
    # redistribution — the standard simplification; ranks of non-dangling
    # nodes are unaffected in relative order).
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=True)
    )
    if undirected:
        nodes = deg.select("node")
        n_nodes = deg.count()  # one driver scalar; deterministic
    else:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_nodes = nodes.count()
    base = scale // n_nodes
    teleport = (15 * base) // 100

    ranks = nodes.withColumn("rank_fp", F.lit(base).cast("long"))
    for _ in range(iterations):
        contrib = ranks.join(deg, "node").select(
            F.col("node").alias("src"), F.expr("rank_fp div outdeg").alias("c")
        )
        # contrib is one row per node (8+8 bytes) — broadcast it so the
        # big edge table is never shuffled after its initial distinct;
        # at web scale (nodes too big to broadcast) drop the hint and the
        # join falls back to shuffle-on-src, still keyed 8-byte
        inflow = (
            e.join(F.broadcast(contrib), "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr("(85 * coalesce(inflow, 0L)) div 100")
                ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint(eager=True)  # truncate lineage per iteration
        )
    e.unpersist()
    return ranks
