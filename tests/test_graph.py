"""Unit tests for operators/graph.py (iterative PageRank, triangles)."""

from __future__ import annotations

import pytest

from pucminas_data_pipelines_spark.operators.graph import pagerank, triangle_count


def test_pagerank_two_node_cycle(spark):
    """A ⇄ B symmetric cycle: ranks stay uniform at 0.5 every iteration."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    assert out["a"] == pytest.approx(0.5, abs=1e-12)
    assert out["b"] == pytest.approx(0.5, abs=1e-12)


def test_pagerank_star_favors_hub(spark):
    """Spokes → hub with hub → one spoke: hub accumulates the most rank,
    and the pointed-at spoke beats the unpointed ones. The hub↔s1 2-cycle
    oscillates on alternating iterations (damping^k envelope), so this
    asserts at 30 iterations, inside the converged regime."""
    edges = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
        "src string, dst string",
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=30).collect()}
    assert out["hub"] > out["s1"] > out["s2"]
    assert out["s2"] == pytest.approx(out["s3"], abs=1e-12)


def test_pagerank_weighted_split(spark):
    """One iteration from uniform: a splits 3:1 between b and c, so after
    iteration 1 rank(b) - rank(c) == d * (1/3) * (0.75 - 0.25)."""
    edges = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    out = {
        r["node"]: r["rank"]
        for r in pagerank(edges, weight="w", iterations=1).collect()
    }
    assert out["b"] - out["c"] == pytest.approx(0.85 * (1 / 3) * 0.5, abs=1e-12)


def test_pagerank_mass_conserved_without_dangling(spark):
    """With every node having an out-edge, total rank mass stays 1.0."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string",
    )
    total = sum(r["rank"] for r in pagerank(edges, iterations=5).collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_triangle_count_bowtie(spark):
    """Two triangles sharing node c; direction/duplicates/self-loops must
    not affect the count."""
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"),          # triangle 1
            ("c", "d"), ("d", "e"), ("e", "c"),          # triangle 2
            ("b", "a"),                                   # reverse dup
            ("a", "a"),                                   # self-loop
            ("c", "a"),                                   # exact dup
        ],
        "src string, dst string",
    )
    assert triangle_count(edges).collect()[0]["n_triangles"] == 2


def test_triangle_count_square_has_none(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    assert triangle_count(edges).collect()[0]["n_triangles"] == 0


def test_triangle_count_k4(spark):
    """Complete graph on 4 nodes has exactly C(4,3)=4 triangles."""
    nodes = ["a", "b", "c", "d"]
    edges = spark.createDataFrame(
        [(x, y) for x in nodes for y in nodes if x < y],
        "src string, dst string",
    )
    assert triangle_count(edges).collect()[0]["n_triangles"] == 4


def test_label_propagation_keeps_directed_sinks(spark):
    """Directed input with a pure sink (node with no out-edges): the sink
    must stay in the output with a carried-forward label, not vanish —
    the docstring's '(node, community)' contract covers every node in
    ``edges``. Regression for the r5 advisory: before the carry-forward
    left-join, sinks were dropped after round 1 (and drops cascaded)."""
    from pucminas_data_pipelines_spark.operators.graph import label_propagation

    # a -> b -> c ; c has no out-edges (pure sink)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=2).collect()
    }
    assert set(got) == {"a", "b", "c"}
    # c never receives neighbor labels (directed), so it keeps its own
    assert got["c"] == "c"
    # round 1: a adopts lbl(b)='b', b adopts lbl(c)='c';
    # round 2: a adopts round-1 lbl(b)='c', b adopts 'c' again
    assert got["b"] == "c" and got["a"] == "c"


def test_hop_distances_multi_source_min_and_cap(spark):
    """Delta-BFS must agree with the naive all-nodes relaxation: multi-
    source mins, hop cap exclusion, and early exit on an exhausted
    frontier (the path graph settles in 2 rounds < max_hops)."""
    from pucminas_data_pipelines_spark.operators.graph import hop_distances

    # path 1-2-3-4-5 (undirected) with sources {1, 4}
    canon = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        canon + [(b, a) for a, b in canon], "src bigint, dst bigint"
    )
    sources = spark.createDataFrame([(1,), (4,)], "node bigint")
    got = {
        r["node"]: r["dist"]
        for r in hop_distances(edges, sources, max_hops=4).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 0, 5: 1}

    # cap at 1 hop from a single end: node 3+ unreached -> absent
    got1 = {
        r["node"]: r["dist"]
        for r in hop_distances(
            edges, spark.createDataFrame([(1,)], "node bigint"), max_hops=1
        ).collect()
    }
    assert got1 == {1: 0, 2: 1}


def test_iterative_loops_release_consumed_checkpoints(spark):
    """pagerank / hop_distances / label_propagation / kcore_peel truncate
    lineage with one eager localCheckpoint per round; the CONSUMED
    round's blocks must be released as soon as the new round
    materializes (operators/checkpoint.free_local_checkpoint), not
    pinned until the ContextCleaner runs. Bound: after collecting, at
    most the final round's state (plus the loop's seed frame) remains
    persisted per operator — independent of iteration count."""
    from pucminas_data_pipelines_spark.operators.graph import (
        hop_distances,
        kcore_peel,
        label_propagation,
        pagerank,
    )

    sc = spark.sparkContext._jsc.sc()
    ring = [(i, (i + 1) % 12) for i in range(12)]
    edges = spark.createDataFrame(
        ring + [(b, a) for a, b in ring], "src bigint, dst bigint"
    )

    for tag, run in {
        "pagerank": lambda: pagerank(edges, iterations=8),
        "hop": lambda: hop_distances(
            edges, spark.createDataFrame([(0,)], "node bigint"), max_hops=6
        ),
        "lpa": lambda: label_propagation(edges, iterations=6),
        "kcore": lambda: kcore_peel(edges, k=2, rounds=6, src="src", dst="dst"),
    }.items():
        before = sc.getPersistentRDDs().size()
        run().collect()
        leaked = sc.getPersistentRDDs().size() - before
        assert leaked <= 2, (
            f"{tag}: {leaked} checkpoint RDDs persisted after the run "
            "(expected <=2: final state + seed)"
        )


def test_all_pairs_hop_distances_on_directed_path(spark):
    """On the directed path 0->1->2->3, per-root distances are exactly
    the forward offsets within the hop cap, and harmonic centrality
    falls monotonically along the path (1 + 1/2 + 1/3 for root 0)."""
    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.operators.graph import (
        all_pairs_hop_distances,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src int, dst int"
    )
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node int")
    dist = all_pairs_hop_distances(edges, nodes, max_hops=4)
    got = {(r.root, r.node): r.dist for r in dist.collect()}
    want = {
        (r, n): n - r for r in range(4) for n in range(r, 4)
    }
    assert got == want
    harm = (
        dist.where(F.col("dist") > 0)
        .groupBy("root")
        .agg(F.sum(1.0 / F.col("dist")).alias("h"))
        .collect()
    )
    h = {r.root: r.h for r in harm}
    assert abs(h[0] - (1 + 0.5 + 1 / 3)) < 1e-9
    assert h[0] > h[1] > h[2] and 3 not in h  # sink reaches nobody
