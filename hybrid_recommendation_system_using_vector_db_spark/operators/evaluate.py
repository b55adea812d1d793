"""Precision@K evaluation harness (EP3) — fully relational.

Reference: ``evaluate_hybrid_vs_content`` (``Hybrid_Recom_vecdb.py:237-292``):
eligible queries = items with ≥1 CF neighbor (``:240``), ground truth = the
co-purchase neighbor set (``:254``), Precision@K = |top-k ∩ gt| / k
(``:232-236``, D4) averaged per (model, k) (``:286-288``, D3).

The reference loops per query in Python; here the whole grid
(model × k × query) is one plan: rank tables → ground-truth join →
k-threshold explode → mean aggregation. Queries with zero hits still count
(left join + coalesce 0), matching the reference's per-query precision list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.portable import fround

from .. import EVAL_KS, ROUND_SCORE


def precision_at_k(ranked: dict[str, DataFrame], gt_edges: DataFrame,
                   queries: DataFrame, ks: list[int] | None = None,
                   broadcast_gt: bool = False) -> DataFrame:
    """Mean Precision@K per (model, k).

    ranked:   model name → (qid, cand, rank) table, rank ≤ max(ks)
    gt_edges: (src, dst) ground-truth pairs (co-purchase graph)
    queries:  (qid) — the eligible evaluation query set
    broadcast_gt: set True when the caller KNOWS gt_edges is bounded
              (e.g. restricted to a sampled eval query set) — the
              semi-join and hit counts then stay on the ranked tables'
              partitioning with zero extra shuffles. Left off by default
              so an unbounded ground-truth graph degrades to a shuffle
              join instead of a driver-OOM broadcast.
    returns:  (model, k, precision)
    """
    ks = ks or EVAL_KS
    spark = gt_edges.sparkSession
    ks_df = spark.createDataFrame([(k,) for k in ks], "k int")
    gt = gt_edges.select(F.col("src").alias("qid"), F.col("dst").alias("cand"))

    gt_side = F.broadcast(gt) if broadcast_gt else gt
    per_model = []
    for model, topk in ranked.items():
        hits = (
            topk.join(gt_side, ["qid", "cand"], "left_semi")  # D4
            .crossJoin(F.broadcast(ks_df))
            .filter(F.col("rank") <= F.col("k"))
            .groupBy("qid", "k")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        grid = queries.select("qid").crossJoin(F.broadcast(ks_df))
        hits_side = F.broadcast(hits) if broadcast_gt else hits
        per_q = (
            # with a bounded gt, hits ≤ |eval queries| × |ks| rows —
            # broadcast it so the tiny grid side never shuffles
            grid.join(hits_side, ["qid", "k"], "left")
            .select(
                "qid", "k",
                (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("k")).alias("p"),
            )
        )
        per_model.append(
            per_q.groupBy("k").agg(fround(F.avg("p"), ROUND_SCORE).alias("precision"))
            .select(F.lit(model).alias("model"), "k", "precision")
        )
    out = per_model[0]
    for m in per_model[1:]:
        out = out.unionByName(m)
    return out
