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

# largest fold-in interaction list shipped driver-side for in-kernel GEMM
# exclusion masking; above this als_fold_in_recommend switches to the
# distributed anti-join shape (same result, no driver collect — ADVICE r8)
EXCLUDE_CLOSURE_MAX_PAIRS = 2_000_000


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


def mips_augment(items: DataFrame, id_col: str = "item_id",
                 vec_col: str = "features",
                 out_id: str = "vec_id",
                 out_vec: str = "embedding") -> DataFrame:
    """Corpus-side MIPS→cosine reduction (Bachrach et al., RecSys 2014):
    append sqrt(M² − ‖x‖²) to every item vector, where M is the max item
    norm. For a fixed query padded with 0, cosine over the augmented
    space is dot(q, x) / (‖q‖·M) — a per-query constant times the inner
    product — so ANY of the engine's cosine ANN tiers (IVF, PQ, LSH, …)
    serves maximum-inner-product rankings, which is how trained ALS
    factors reach the ANN serving path without a dedicated MIPS index.

    One single-row max-norm aggregate (broadcast crossJoin), then a
    map-only array append — no shuffle. Output columns renamed to the
    ANN tiers' (vec_id, embedding) convention."""
    sq = F.aggregate(vec_col, F.lit(0.0),
                     lambda a, x: a + x * x)
    m2 = items.agg(F.max(sq).alias("__m2"))
    return (items.crossJoin(F.broadcast(m2))
            .select(
                F.col(id_col).alias(out_id),
                F.concat(
                    F.col(vec_col),
                    F.array(F.sqrt(F.greatest(F.lit(0.0),
                                              F.col("__m2") - sq))),
                ).alias(out_vec)))


def mips_augment_queries(queries: DataFrame, id_col: str = "user_id",
                         vec_col: str = "features",
                         out_id: str = "vec_id",
                         out_vec: str = "embedding") -> DataFrame:
    """Query-side of the MIPS reduction: zero-pad (the augmented item
    coordinate contributes nothing to the dot product). Map-only."""
    return queries.select(
        F.col(id_col).alias(out_id),
        F.concat(F.col(vec_col), F.array(F.lit(0.0))).alias(out_vec))


def als_ann_topk(edges: DataFrame, k: int = 10, rank: int = 16,
                 iters: int = 5, reg: float = 0.1, alpha: float = 10.0,
                 seed: int = 42, user_mod: int | None = None,
                 tier: str = "ivf", src_col: str = "src",
                 dst_col: str = "dst", weight_col: str = "weight",
                 **ann_kwargs) -> DataFrame:
    """Serve trained ALS factors THROUGH the ANN tier: train implicit
    ALS, MIPS-augment the item factors, and answer top-k per user with
    the chosen cosine ANN index (``tier`` ∈ {"ivf", "pq", "exact"}) —
    the composition PARITY advertises ("item factors feed any ANN
    tier"). ``exact`` is the brute-force cosine over augmented factors,
    i.e. the exact inner-product ranking the approximate tiers are
    measured against (recall floor pinned by
    ``test_als_factors_served_through_ann_tier``).

    Scale shape: factors are |items|×rank (tiny vs the corpus); the
    augmented index persists/appends exactly like any embedding index
    (``pipeline.write_ivf_index`` / ``write_pq_index`` take the
    augmented table as-is)."""
    from . import similarity as sim

    model = _als(edges, rank, iters, reg, alpha, seed,
                 src_col, dst_col, weight_col)
    items = model.itemFactors.select(
        F.col("id").cast("bigint").alias("item_id"),
        F.transform("features", lambda x: x.cast("double")).alias("features"))
    users = model.userFactors.select(
        F.col("id").cast("bigint").alias("user_id"),
        F.transform("features", lambda x: x.cast("double")).alias("features"))
    if user_mod is not None:
        users = users.filter(F.col("user_id") % user_mod == 0)
    corpus = mips_augment(items).localCheckpoint(eager=True)
    qs = mips_augment_queries(users)
    dim = rank + 1
    # every tier keeps the engine's pinned self-exclusion (B4: cand ==
    # qid dropped) — in the co-purchase graph src and dst share the part
    # id space, so "don't recommend the item itself" is the semantics
    # als_recommend's consumers want, and exact-vs-ANN recall stays
    # apples-to-apples
    if tier == "exact":
        out = sim.cosine_topk(qs, corpus, k, dim=dim)
    elif tier == "ivf":
        out = sim.ivf_topk(qs, corpus, k, dim=dim, **ann_kwargs)
    elif tier == "pq":
        out = sim.pq_topk(qs, corpus, k, dim=dim, **ann_kwargs)
    else:
        raise ValueError(f"unknown tier {tier!r}")
    return out.withColumnRenamed("qid", "src")


def als_fold_in(new_edges: DataFrame, item_factors: DataFrame,
                reg: float = 0.1, alpha: float = 10.0,
                src_col: str = "src", dst_col: str = "dst",
                weight_col: str = "weight") -> DataFrame:
    """Serve-time user FOLD-IN: solve factors for unseen users against
    FIXED trained item factors (Hu, Koren & Volinsky 2008 eq. 4) — the
    cold-start path a production recommender runs between retrains,
    which ``recommendForUserSubset`` cannot do (MLlib only answers for
    users seen at fit time).

        x_u = (YᵀY + Σ_i c1_i·y_i·y_iᵀ + λI)⁻¹ · Σ_i (1 + c1_i)·y_i,
        c1_i = α·r_ui over the user's observed items

    — exactly MLlib's implicit-ALS per-user normal equation (ALS.scala
    builds AtA = YᵀY + c1·y·yᵀ and Atb = (1+c1)·y, then solves with an
    unscaled λ ridge), so folding in a user the model ALREADY trained on
    reproduces one half-sweep of ALS from the converged item side.

    Scale shape: Y is |items|×rank — the same driver-boundable table the
    ANN serve tiers broadcast (the GEMM query-matrix precedent); YᵀY is
    rank² once. Each user's solve is a rank×rank Cholesky over ONLY that
    user's interactions — a JVM-side per-user gather then one Arrow
    batch-vectorized solve udf, state bounded by rank², embarrassingly
    parallel across users. Returns (src, features array<double>);
    users with no in-index interactions are dropped.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    rows = item_factors.collect()
    ids = np.array([r["item_id"] for r in rows], dtype="int64")
    Y = np.array([r["features"] for r in rows], dtype="float64")
    order = np.argsort(ids, kind="stable")
    ids, Y = ids[order], Y[order]          # sorted → searchsorted lookup
    rank = Y.shape[1]
    # Shape chosen for Python-boundary cost, not just parallelism: the
    # JVM does the per-user gather (groupBy + collect_list — partial agg,
    # one exchange), so Python sees ONE row per user and the solve udf is
    # invoked once per Arrow BATCH, not once per user (the
    # groupBy.applyInPandas form calls Python per group — measured 3.5 s
    # for a 1000-user batch vs ~0.4 s here). The factor matrix rides a
    # TorrentBroadcast, shipped per executor, not per task closure;
    # id→row resolution is a vectorized searchsorted on the sorted ids.
    sc = item_factors.sparkSession.sparkContext
    b_model = sc.broadcast((ids, Y, Y.T @ Y))
    lam_eye = reg * np.eye(rank)

    @pandas_udf("array<double>")
    def solve_user(dsts, ws):  # scalar pandas_udf: Series -> Series
        ids_, Y_, YtY_ = b_model.value
        out = []
        for dst_l, w_l in zip(dsts, ws):
            dst = np.asarray(dst_l, dtype="int64")
            pos = np.searchsorted(ids_, dst)
            pos_c = np.minimum(pos, len(ids_) - 1)
            ok = ids_[pos_c] == dst
            if not ok.any():
                out.append(None)
                continue
            w = np.asarray(w_l, dtype="float64")[ok]
            Yu = Y_[pos_c[ok]]
            c1 = alpha * np.abs(w)
            ata = YtY_ + (Yu * c1[:, None]).T @ Yu + lam_eye
            atb = Yu.T @ (1.0 + c1)
            out.append(np.linalg.solve(ata, atb).tolist())
        return pd.Series(out)

    e = new_edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        F.col(weight_col).cast("double").alias("weight"))
    per_user = e.groupBy("src").agg(
        F.collect_list("dst").alias("dsts"),
        F.collect_list("weight").alias("ws"))
    return (per_user
            .select("src", solve_user("dsts", "ws").alias("features"))
            .filter(F.col("features").isNotNull()))


def als_fold_in_recommend(new_edges: DataFrame, item_factors: DataFrame,
                          k: int = 10, reg: float = 0.1,
                          alpha: float = 10.0,
                          exclude_seen: bool = True,
                          src_col: str = "src", dst_col: str = "dst",
                          weight_col: str = "weight") -> DataFrame:
    """Fold-in + serve: solve cold-start user factors, then answer top-k
    through the MIPS→cosine reduction over the SAME augmented item index
    the trained users are served from (``als_ann_topk``'s exact tier) —
    (src, cand, score, rank), observed items excluded by default (the
    B5-style "don't recommend what the user already has")."""
    from . import similarity as sim

    # the folded factors feed TWO actions (the GEMM query-matrix collect
    # + the scoring pass); checkpoint the bounded |users|×rank table so
    # the applyInPandas solve runs once per call, not per branch
    users = als_fold_in(new_edges, item_factors, reg, alpha,
                        src_col, dst_col, weight_col) \
        .withColumnRenamed("src", "user_id") \
        .localCheckpoint(eager=True)
    corpus = mips_augment(item_factors)
    qs = mips_augment_queries(users)
    if exclude_seen:
        # exclusion masked INSIDE the GEMM kernel: the seen set for a
        # fold-in batch is the batch's own interaction list — the same
        # bounded, query-side-sized state the GEMM query matrix already
        # collects — so ship it in the closure and mask scores before the
        # local top-k. The masked top-k IS the final ranking: no
        # k+max(seen) over-fetch, no anti-join, no re-rank window.
        # (Previous shape — fetch k+max_s, broadcast-anti-join the seen
        # pairs, re-rank — paid |Q|·(k+max_s) intermediate rows and two
        # extra operators when one user with a long history inflated
        # max_s for everyone; measured 6.1 s → ~2.5 s warm at sf0.1.)
        #
        # Driver-memory bound (ADVICE r8), at zero cost to the common
        # case: collect plainly (a pre-count re-runs the batch's
        # upstream lineage — measured +4.8 s on the fold-in bench entry;
        # a limit-collect pays CollectLimit's sequential scale-up scan
        # rounds), relying on Spark's own ``spark.driver.maxResultSize``
        # fence to abort a truly unbounded collect, then check the
        # explicit row bound post-hoc. Either trip (abort or over-cap)
        # falls back to the distributed shape: over-fetch k +
        # max(per-user seen), anti-join the seen pairs, re-rank — same
        # result by construction (the masked GEMM and the anti-join
        # remove exactly the batch's (src, dst) pairs before the same
        # (score desc, cand asc) ranking).
        cap = EXCLUDE_CLOSURE_MAX_PAIRS
        try:
            pairs = new_edges.select(F.col(src_col).cast("long"),
                                     F.col(dst_col).cast("long")).collect()
        except Exception:   # maxResultSize fence tripped
            pairs = None
        if pairs is not None and len(pairs) <= cap:
            excl: dict[int, list] = {}
            for r in pairs:
                excl.setdefault(r[0], []).append(r[1])
            out = sim.cosine_topk_gemm(qs, corpus, k, exclude=excl)
        else:
            max_s = (new_edges.groupBy(src_col).count()
                     .agg(F.max("count")).head()[0] or 0)
            seen = new_edges.select(F.col(src_col).cast("long").alias("qid"),
                                    F.col(dst_col).cast("long").alias("cand"))
            out = (sim.cosine_topk_gemm(qs, corpus, k + int(max_s))
                   .join(seen, ["qid", "cand"], "left_anti")
                   .withColumn("rank", F.row_number().over(
                       Window.partitionBy("qid")
                       .orderBy(F.desc("score"), F.asc("cand"))))
                   .filter(F.col("rank") <= k))
    else:
        out = sim.cosine_topk_gemm(qs, corpus, k)
    return out.withColumnRenamed("qid", "src") \
        .select("src", "cand", "score", "rank")
