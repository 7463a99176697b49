"""Iterative graph algorithms over edge DataFrames.

PageRank here is the canonical "iterative join + aggregate" workload —
the shape GraphX/Pregel run, re-expressed as plain DataFrame rounds so
Catalyst/AQE handle the physical plan. The reference repo has no graph
surface (its whole data plane is sparkcode/titanic_example_delta.py);
this belongs to the large-scale-pipeline extension the brief requires
(link-graph quality signals for web-corpus curation).

Scale design (100 TB edge list, 1000 executors):
- state per round is one (node, rank) row per node — orders of magnitude
  smaller than the edge list;
- each round is edges ⋈ ranks on src (shuffle keyed by node id, AQE
  handles zipfian hub skew) then groupBy dst (map-side partial sums);
- lineage is truncated every round with an eager localCheckpoint —
  without it the plan doubles per iteration and the driver OOMs planning
  round ~30 (same pattern as operators/dedup.py min-label propagation);
- a fixed iteration count (default 5) keeps the oracle expressible as
  unrolled SQL; production runs iterate to convergence with the same body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over a directed edge DataFrame.

    rank_0(n) = 1/N; rank_{i+1}(d) = (1-d)/N + d * Σ_{s→d} rank_i(s) *
    w(s,d)/out_w(s). Dangling mass is NOT redistributed (nodes with no
    out-edges leak rank) — callers wanting the classical formulation add
    self-loops; the fixed-iteration oracle mirrors the same choice.

    Returns (node, rank) with rank as double.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.alias("_w")
    )
    # Out-weight per source, attached once — reused by every round.
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    e = e.join(out_w, "_src").select(
        "_src", "_dst", (F.col("_w") / F.col("_out_w")).alias("_share")
    )
    e = e.persist()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # one tiny job; also materializes the persist
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["_src"] == ranks["node"])
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_share")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(teleport) + damping * F.coalesce("_in", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return ranks
