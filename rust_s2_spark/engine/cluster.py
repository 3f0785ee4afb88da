"""Distributed connected components over an edge DataFrame.

The spatial-clustering backbone (DBSCAN with eps = the distance-join radius
and minPts=2: every edge endpoint is a core point, clusters are the
connected components of the epsilon graph).  rust-s2 has no relational
counterpart; this is the canonical iterative-Spark formulation:

**hash-min with pointer jumping** — per round, every node takes the minimum
label over itself and its neighbors (one edge join + groupBy), then jumps
through its label's label (one self-join).  Plain hash-min needs
O(diameter) rounds (a chain of near-duplicate points IS a long path);
pointer jumping contracts label chains geometrically, giving
O(log diameter) rounds in practice — the measured round counts on path
graphs are asserted in tests/test_cluster.py.

Scale shape: each round is two equi-shuffles of O(|V| + |E|) rows keyed by
node id, no driver data motion except the one-row convergence count; labels
are persisted per round and the previous round unpersisted, so executor
storage stays O(|V|) and lineage stays O(rounds).  Component sizes never
appear as shuffle keys — a giant component costs no more than a small one
(its rows spread by node id, not by label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Labels every node appearing in ``edges`` with the minimum node id of
    its connected component.  Returns (node long, cluster long).

    ``edges`` may be directed pairs; the graph is treated as undirected.
    Deterministic: the fixpoint (min reachable id per node) does not depend
    on iteration order or partitioning.
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.persist()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .persist()
    )
    labels.count()

    rounds = 0
    while True:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} rounds"
            )
        # neighbor minimum
        nmin = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("lbl").alias("nmin"))
        )
        stepped = (
            labels.join(nmin, labels["node"] == nmin["u"], "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
        )
        # pointer jump: lbl <- lbl(lbl) (label chains halve per round)
        jump_src = stepped.select(
            F.col("node").alias("jn"), F.col("lbl").alias("jl")
        )
        jumped = stepped.join(
            jump_src, stepped["lbl"] == jump_src["jn"], "left"
        ).select("node", F.coalesce(F.col("jl"), F.col("lbl")).alias("lbl"))
        # CRITICAL for any iterative DataFrame loop: truncate the logical
        # plan.  Each round's tree embeds the previous round's twice (two
        # self-references), so without a cut Catalyst re-analyzes a plan
        # that DOUBLES per round — measured 5.7 s -> 23 s per round by round
        # two, hung by round ten — even though the data itself is cached.
        # localCheckpoint materializes the ~O(|V|) label rows and hands back
        # a leaf plan; on a resilient cluster deployment use
        # sparkContext.setCheckpointDir + .checkpoint() for the same cut
        # with fault tolerance.
        jumped = jumped.localCheckpoint(eager=True)
        changed = (
            jumped.join(
                labels.select(F.col("node").alias("pn"), F.col("lbl").alias("pl")),
                jumped["node"] == F.col("pn"),
            )
            .where(F.col("lbl") != F.col("pl"))
            .count()
        )
        try:
            labels.unpersist()
        except Exception:
            pass
        labels = jumped
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    sym.unpersist()
    # labels is a checkpointed leaf: O(|V|) rows, shallow plan — callers own
    # its lifecycle (the checkpoint blocks free on garbage collection)
    return labels.select(F.col("node"), F.col("lbl").alias("cluster"))
