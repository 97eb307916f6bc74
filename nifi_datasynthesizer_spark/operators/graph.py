"""Graph operators over near-duplicate pair graphs.

dup_groups (dedup.py) answers "which documents are the same thing";
pagerank answers "which document is the most CENTRAL in its duplicate
neighborhood" — the canonical-representative picker when near-dup
clusters should keep their hub (the page everyone copied) rather than
the min-id member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _pin

PPM = 1_000_000


def pagerank(pairs: DataFrame, iters: int = 2,
             damping_ppm: int = 850_000) -> DataFrame:
    """PageRank over the undirected pair graph, quantized to integer
    parts-per-million so every iteration is exact on any engine or
    partitioning (float PageRank drifts with summation order).

    r₀ = 1e6 per node; each iteration every node splits ``r div deg``
    to each neighbor and ``r' = (1e6 − d) + (d·Σ contribs) div 1e6``
    — all LONG integer division (never a double: ``/`` promotes to
    double in both engines and loses exactness past 2⁵³ on hub sums).

    Scale shape: edges and degrees are computed once and pinned
    (release with dedup.release_caches); each iteration is one join on
    the node id + one aggregation — the same key both times, so at
    1000 executors the rank frame stays co-partitioned with edges and
    only the contribution sums move.  Lineage depth is ``iters``
    (small, fixed); for deep iteration counts persist per-round like
    dup_groups.  Symmetric pairs mean no dangling nodes by
    construction.
    """
    a, b = F.col("a"), F.col("b")
    sym = (pairs.select(a.alias("src"), b.alias("dst"))
           .union(pairs.select(b.alias("src"), a.alias("dst"))).distinct())
    edges = _pin(sym)
    deg = _pin(edges.groupBy("src").agg(F.count("*").alias("deg")))
    ranks = deg.select(F.col("src").alias("node"),
                       F.lit(PPM).cast("long").alias("r"))
    base = PPM - damping_ppm
    for _ in range(iters):
        contrib = (edges
                   .join(ranks, edges.src == ranks.node)
                   .join(deg, "src")
                   .select(F.col("dst"), F.expr("r div deg").alias("c")))
        ranks = (contrib.groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("c").alias("s"))
                 .select("node",
                         F.expr(f"{base} + (s * {damping_ppm}) "
                                f"div {PPM}").alias("r")))
    return ranks.select(F.col("node").alias("doc_id"),
                        F.col("r").alias("pr_ppm"))
