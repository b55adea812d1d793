"""Implicit-feedback matrix factorization over the co-purchase graph.

The reference's CF signal is pure co-occurrence counting
(``Hybrid_Recom_vecdb.py:135-141`` → the ``copurchase`` operators); a
production recommender's next step up is factorizing that interaction
matrix. This module wraps Spark MLlib's ALS — the idiomatic engine path
(ALS *is* Spark's flagship distributed recommender; re-implementing
alternating least squares by hand would be the anti-pattern the
Spark-first design brief warns about) — with the repo's conventions:
implicit-preference mode (Hu, Koren & Volinsky 2008) on edge weights,
fixed seed, and pinned output ordering.

Scale notes: ALS is block-partitioned (userBlocks × itemBlocks); each
iteration solves per-block normal equations with only the factor blocks
shuffled — MLlib's implementation is the battle-tested 100 TB shape.
Outputs are plain DataFrames, so the serve path composes with the rest
of the engine (e.g. feed ``item_factors`` into ``cosine_topk`` or an
LSH/IVF index for factor-space ANN).

Oracle note: ALS is iterative least squares with platform-dependent
float reductions — no engine-portable closed form exists, so these are
rows-only entries at the oracle layer; correctness is pinned by ranking
-quality invariants instead (observed pairs must score above unobserved
ones — ``tests/test_extensions.py::test_als_ranks_observed_above_random``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import fround
from .. import ROUND_SCORE


def _als(edges: DataFrame, rank: int, iters: int, reg: float, alpha: float,
         seed: int, src_col: str, dst_col: str, weight_col: str):
    from pyspark.ml.recommendation import ALS

    # MLlib ALS requires int32 ids; a silent (non-ANSI) long→int cast
    # WRAPS for ids ≥ 2^31 and collides users/items into corrupted
    # factors with no error. Fail loudly instead — callers with wide ids
    # must remap through a dense index first. One bounded action
    # (single-row max) before a many-job training loop.
    mx = edges.agg(F.max(F.greatest(
        F.abs(F.col(src_col).cast("long")),
        F.abs(F.col(dst_col).cast("long")))).alias("m")).head()["m"]
    if mx is not None and mx > 2**31 - 1:
        raise ValueError(
            f"ALS ids must fit int32 (MLlib requirement); max |id| = {mx} "
            f">= 2^31. Remap ids through a dense integer index before "
            f"training.")
    ratings = edges.select(
        F.col(src_col).cast("int").alias("user"),
        F.col(dst_col).cast("int").alias("item"),
        F.col(weight_col).cast("float").alias("rating"),
    )
    als = ALS(rank=rank, maxIter=iters, regParam=reg, alpha=alpha,
              seed=seed, implicitPrefs=True, nonnegative=False,
              userCol="user", itemCol="item", ratingCol="rating",
              coldStartStrategy="drop")
    return als.fit(ratings)


def als_item_factors(edges: DataFrame, rank: int = 16, iters: int = 5,
                     reg: float = 0.1, alpha: float = 10.0, seed: int = 42,
                     src_col: str = "src", dst_col: str = "dst",
                     weight_col: str = "weight") -> DataFrame:
    """Train implicit ALS and return the item-factor table
    (item_id, features array<double>) — the learned embedding that can
    feed any of the engine's ANN tiers."""
    model = _als(edges, rank, iters, reg, alpha, seed,
                 src_col, dst_col, weight_col)
    return model.itemFactors.select(
        F.col("id").cast("bigint").alias("item_id"),
        F.transform("features", lambda x: x.cast("double")).alias("features"))


def als_recommend(edges: DataFrame, k: int = 10, rank: int = 16,
                  iters: int = 5, reg: float = 0.1, alpha: float = 10.0,
                  seed: int = 42, user_mod: int | None = None,
                  src_col: str = "src", dst_col: str = "dst",
                  weight_col: str = "weight") -> DataFrame:
    """Train implicit ALS and serve top-k per user (src, cand, score,
    rank) with the repo-wide pinned total order (rounded score desc,
    cand asc). ``user_mod`` bounds the served user set (src % mod == 0)
    the way every eval query does."""
    model = _als(edges, rank, iters, reg, alpha, seed,
                 src_col, dst_col, weight_col)
    users = edges.select(F.col(src_col).cast("int").alias("user")).distinct()
    if user_mod is not None:
        users = users.filter(F.col("user") % user_mod == 0)
    recs = model.recommendForUserSubset(users, k)
    flat = recs.select(
        F.col("user").cast("bigint").alias("src"),
        F.explode("recommendations").alias("r"),
    ).select(
        "src",
        F.col("r.item").cast("bigint").alias("cand"),
        fround(F.col("r.rating").cast("double"), ROUND_SCORE).alias("score"),
    )
    w = Window.partitionBy("src").orderBy(F.col("score").desc(),
                                          F.col("cand").asc())
    return (flat.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
