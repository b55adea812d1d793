"""Graph analytics over the co-purchase edge table: weighted PageRank.

The reference's CF ranker scores a candidate by its direct edge weight
from the query node (``Hybrid_Recom_vecdb.py:189-198``) — a 1-hop
popularity signal.  PageRank is the standard multi-hop generalization
(node importance over the whole graph), and the classic iterative-
DataFrame workload: each iteration is one join + one aggregation, both
key-partitioned shuffles, with ``localCheckpoint`` cutting the growing
lineage (the connected-components lifecycle of ``operators/dedup.py``).

Scale design (100 TB edge table): per iteration the rank table (|V| rows,
two columns) joins the edge table on ``src`` — co-partitioning the edge
table by ``src`` (bucketing, see ``pipeline.write_bucketed_edges``) makes
that join shuffle-free on the big side; the contribution aggregate is
partial-combined on ``dst``.  Hot nodes (celebrity products) are
AQE-skew-join territory; the rank and dangling aggregates are bounded
(|V| and 1 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import ROUND_SCORE
from ..functions.portable import fround


def pagerank(edges: DataFrame, n_iters: int = 3, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             weight_col: str = "weight") -> DataFrame:
    """Weighted PageRank, ``n_iters`` fixed power-method iterations.

    rank_{t+1}(v) = (1-d)/N + d·( Σ_{u→v} rank_t(u)·w(u,v)/out_w(u)
                                  + dangling_t/N )

    with dangling_t = Σ over nodes without out-edges of rank_t — the
    standard redistribution that keeps Σrank = 1.  Ranks are rounded
    (``fround``, repo-wide 1e-6) at every iteration boundary so the
    cross-engine oracle stays bit-equal despite unordered float sums.
    Returns (node, rank).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
                     F.col(weight_col).cast("double").alias("weight"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    out_w = e.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # edge+out_w materialized once: every iteration reuses it (the shared-
    # table lifecycle of dedup's shingle checkpoint)
    ew = e.join(out_w, "src").localCheckpoint(eager=True)
    d = damping
    omd = 1.0 - damping
    ranks = (nodes.crossJoin(F.broadcast(nn))
             .select("node", (F.lit(1.0) / F.col("n")).alias("rank"))
             .localCheckpoint(eager=True))
    for _ in range(n_iters):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("weight") / F.col("out_w"))
                 .alias("c"))
        )
        dangling = (
            ranks.join(out_w.withColumnRenamed("src", "node"), "node",
                       "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                fround(
                    F.lit(omd) / F.col("n")
                    + F.lit(d) * (F.coalesce(F.col("c"), F.lit(0.0))
                                  + F.col("dang") / F.col("n")),
                    ROUND_SCORE).alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks
