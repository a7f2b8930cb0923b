"""Pregel-style iterative graph analytics (the BASELINE.json north star:
"GraphX/Pregel for analytics queries", re-expressed as DataFrame join
loops — no Scala bridge needed).

The reference's only whole-graph analytic is the BFS inside getStats
(Graph.hs:82-118); these operators generalize that frontier-join pattern:

- ``bfs_levels``            — single-source (or multi-source) BFS with
                              hop distance.
- ``connected_components``  — iterative min-label propagation over the
                              undirected view (converges in O(diameter)
                              rounds; each round = one join + one agg).

Scale notes: every round truncates lineage with localCheckpoint (else the
plan grows unboundedly — Catalyst has no recursion); frontiers/labels are
narrow (id, value) frames hash-partitioned on id; convergence checks are
single count() actions on already-materialized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def undirected(edges: DataFrame) -> DataFrame:
    """Both directions of an edge list (src,dst) — the union is cheaper at
    scale than maintaining a second sorted structure, and Catalyst pushes
    the per-direction filters into both branches."""
    return edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def bfs_levels(
    edges: DataFrame, sources: DataFrame, max_iters: int = 1000, directed: bool = True
) -> DataFrame:
    """(id, level) for every vertex reachable from *sources* (level 0).

    The reference's visited-set BFS queue (Graph.hs:87-117) set-oriented:
    each round expands the whole frontier in one join, anti-joins the
    visited set, and checkpoints.
    """
    from functools import reduce

    e = (edges.select("src", "dst") if directed else undirected(edges)).persist()
    try:
        frontier = (
            sources.select(F.col("id"), F.lit(0).alias("level"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        levels = [frontier]
        for level in range(1, max_iters + 1):
            visited_ids = reduce(lambda a, b: a.unionByName(b), (f.select("id") for f in levels))
            nxt = (
                e.join(frontier.select(F.col("id").alias("src")), "src")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited_ids, "id", "left_anti")
                .select("id", F.lit(level).alias("level"))
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            levels.append(nxt)
            frontier = nxt
        return reduce(lambda a, b: a.unionByName(b), levels)
    finally:
        e.unpersist()


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iters: int = 100
) -> DataFrame:
    """(id, component) where component = min vertex id in the component.

    Min-label propagation: labels start as own id; each round every vertex
    takes the min of its own and its neighbors' labels. Rounds are one
    shuffle each (join on src + groupBy dst); terminates when no label
    changes. For high-diameter graphs the large-star/small-star variant
    halves round count — not needed for the layered graphs here.
    """
    e = undirected(edges).persist()
    labels = vertices.select(
        F.col("id"), F.col("id").alias("component")
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        neighbor_min = (
            e.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    e.unpersist()
    return labels
