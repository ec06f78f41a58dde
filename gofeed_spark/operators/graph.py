"""Weighted PageRank over an edge DataFrame — crawl-graph centrality.

The operator a crawl-curation pipeline uses to prioritize hosts/pages
(Common Crawl publishes exactly this kind of host-level rank): given a
directed, optionally weighted edge list, iterate

    r'(v) = (1-d)/N + d * ( Σ_{u→v} w_uv / W_u · r(u)  +  dangling/N )

with the dangling nodes' mass redistributed uniformly (the standard
formulation, Page et al. 1999; teleport d = 0.85).

Spark shape: each iteration is one edges⋈ranks equi-join shuffled on the
source key followed by a map-side-combinable sum on the destination —
the canonical distributed PR data flow.  Ranks are localCheckpoint-ed
per iteration so the plan stays FLAT (the connected-components
precedent: an iterative lineage otherwise doubles per round and the
optimizer re-plans the whole chain each action).  The node set, the
out-weight relation, and the edge relation are computed once and reused
across iterations.

Reference scope note: the reference engine has no graph surface; this
module belongs to the added LLM-pipeline surface (SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """(node, pagerank) after ``n_iters`` synchronous iterations from the
    uniform start, pagerank rounded to 6.  ``weight=None`` treats every
    edge as weight 1.  Edges with non-positive weight carry no mass:
    they are dropped from propagation (their endpoints still count as
    nodes), so a source whose edges are ALL non-positive is treated as
    DANGLING — without the filter its out-weight would be 0, the 0/0
    contribution would go null, and F.sum would silently drop its rank
    mass (total rank no longer summing to 1).  Eager per-iteration
    (localCheckpoint)."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    all_edges = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"), w.alias("__w")
    ).localCheckpoint()
    nodes = (
        all_edges.select(F.col("__s").alias("__n"))
        .unionAll(all_edges.select(F.col("__d").alias("__n")))
        .distinct()
        .localCheckpoint()
    )
    e = all_edges.filter(F.col("__w") > 0)
    n_nodes = float(nodes.count())
    if n_nodes == 0:
        raise ValueError("pagerank over an empty edge set")
    outw = e.groupBy("__s").agg(F.sum("__w").alias("__ow")).localCheckpoint()

    ranks = nodes.select("__n", F.lit(1.0 / n_nodes).alias("__r"))
    for _ in range(n_iters):
        contrib = (
            e.join(ranks, e["__s"] == ranks["__n"])
            .join(outw, "__s")
            .groupBy("__d")
            .agg(F.sum(F.col("__r") * F.col("__w") / F.col("__ow")).alias("__c"))
        )
        # dangling mass: rank sitting on nodes with no out-edges
        dangling = (
            ranks.join(outw, ranks["__n"] == outw["__s"], "left_anti")
            .agg(F.coalesce(F.sum("__r"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            nodes.join(contrib, nodes["__n"] == contrib["__d"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "__n",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.col("__dm") / F.lit(n_nodes)
                    )
                ).alias("__r"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        F.col("__n").alias("node"), F.round("__r", 6).alias("pagerank")
    ).orderBy("node")
