"""Fixed-point PageRank: hand-checked tiny graph, partition invariance."""

from __future__ import annotations

from connemara_spark.operators.graph import pagerank_fixed_point


def test_pagerank_tiny_graph_hand_checked(spark):
    # path graph 1-2-3 (undirected): symmetric edges, center node 2 has
    # degree 2, leaves degree 1
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    r = {
        row["node"]: row["rank_fp"]
        for row in pagerank_fixed_point(edges, iterations=1, scale=300).collect()
    }
    # base = 300 // 3 = 100; teleport = 15*100//100 = 15
    # contrib: node1 = 100//1 = 100, node2 = 100//2 = 50, node3 = 100
    # inflow: node1 <- n2 = 50; node2 <- n1+n3 = 200; node3 <- n2 = 50
    # rank: n1 = 15 + 85*50//100 = 15+42 = 57; n2 = 15 + 170 = 185; n3 = 57
    assert r == {1: 57, 2: 185, 3: 57}


def test_pagerank_center_outranks_leaves_and_mass_conserved(spark):
    # star graph: hub 0 connected to 6 leaves
    edges = spark.createDataFrame([(0, i) for i in range(1, 7)], "src long, dst long")
    rows = pagerank_fixed_point(edges, iterations=3).collect()
    ranks = {r["node"]: r["rank_fp"] for r in rows}
    assert all(ranks[0] > ranks[i] for i in range(1, 7))
    # all leaves symmetric -> identical ranks (determinism across keys)
    assert len({ranks[i] for i in range(1, 7)}) == 1
    # truncated mass stays within n_nodes ulps of scale per iteration class
    assert abs(sum(ranks.values()) - 10**12) < 100 * 3 * 7


def test_pagerank_partition_invariant(spark):
    import random

    rng = random.Random(7)
    e = [(rng.randrange(30), 30 + rng.randrange(30)) for _ in range(200)]
    df1 = spark.createDataFrame(e, "src long, dst long").repartition(1)
    df2 = spark.createDataFrame(e, "src long, dst long").repartition(17)
    r1 = sorted(map(tuple, pagerank_fixed_point(df1, iterations=2).collect()))
    r2 = sorted(map(tuple, pagerank_fixed_point(df2, iterations=2).collect()))
    assert r1 == r2  # integer arithmetic: no float-sum order sensitivity


def test_pagerank_directed_keeps_sink_nodes(spark):
    """Directed mode: a pure sink (only ever a dst) must appear in the
    output and accumulate inflow — review finding: deriving the node set
    from out-degrees alone silently dropped it."""
    edges = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    r = {
        row["node"]: row["rank_fp"]
        for row in pagerank_fixed_point(
            edges, iterations=1, scale=300, undirected=False
        ).collect()
    }
    # base = 300 // 3 = 100, teleport = 15
    # contrib: 1 -> 100, 3 -> 100 (outdeg 1 each); node 2 has no out-edges
    # inflow: node 2 <- 200; nodes 1,3 <- 0
    assert r == {1: 15, 2: 15 + 85 * 200 // 100, 3: 15}
