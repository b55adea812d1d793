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

from pyspark.sql import DataFrame, Window
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


def dcg_discounts(max_k: int) -> tuple[list[int], list[int]]:
    """Driver-side DCG discount table in exact 1e-9 integer units:
    ``disc[i-1] = round(1e9 / log2(i+1))`` and its prefix sums (the
    ideal-DCG numerators for 1..max_k relevant items).

    Two deterministic-parity properties motivate the integer scaling:
    log2 comes from the platform libm (NOT ulp-identical across
    engines), so the discounts are computed ONCE in Python and injected
    as identical integer literals into both the Spark plan and the
    DuckDB oracle; and integer sums are EXACT and order-independent, so
    the per-query DCG aggregate can never drift by summation order the
    way a float sum can (a 1-ulp drift on a score that lands on the
    1e-6 rounding boundary flips the hash). Everything downstream of
    the integer sums is IEEE-deterministic given identical operands.
    The 1e-9 grain keeps max DCG (≈12.9e9) far under 2^53. max_k is
    tiny (≤ the eval grid's 50), so the literals constant-fold.
    """
    import math

    disc, cum, c = [], [], 0
    for i in range(1, max_k + 1):
        d = round(1e9 / math.log2(i + 1))
        disc.append(d)
        c += d
        cum.append(c)
    return disc, cum


def ranking_metrics(ranked: dict[str, DataFrame], gt_edges: DataFrame,
                    queries: DataFrame, ks: list[int] | None = None,
                    broadcast_gt: bool = False) -> DataFrame:
    """Mean NDCG@K (binary relevance) and MRR@K per (model, k).

    NDCG@k(q) = Σ_{hits at rank r ≤ k} disc[r] / IDCG(min(|gt(q)|, k)),
    MRR@k(q) = 1/first-hit-rank (0 if no hit in the top k).  Queries
    with no ground truth score 0 (they still count in the mean,
    matching ``precision_at_k``'s left-join semantics).

    Determinism: DCG is an EXACT integer sum of 1e-9-scaled literal
    discounts (``dcg_discounts``), per-query scores snap to 1e-6
    integers, and the final mean divides one exact integer sum — no
    step depends on float summation order, so the result is
    bit-reproducible across engines and partitionings.

    Same scale shape as ``precision_at_k``: hits are a semi-join of the
    already-top-k-pruned rank tables against the ground-truth edges
    (|Q|·max_k rows max), the k-grid rides a broadcast cross join, and
    the only aggregations are partial-agg hash aggregates keyed by
    (qid, k) then (k).  The discount/IDCG tables are constant-folded
    literal arrays — no joins, no libm at execution time.
    """
    ks = ks or EVAL_KS
    max_k = max(ks)
    disc, cum = dcg_discounts(max_k)
    disc_arr = F.array(*[F.lit(x).cast("long") for x in disc])
    cum_arr = F.array(*[F.lit(x).cast("long") for x in cum])
    spark = gt_edges.sparkSession
    ks_df = spark.createDataFrame([(k,) for k in ks], "k int")
    gt = gt_edges.select(F.col("src").alias("qid"), F.col("dst").alias("cand"))
    gt_side = F.broadcast(gt) if broadcast_gt else gt
    n_gt = gt.groupBy("qid").agg(F.count(F.lit(1)).alias("n_gt"))
    n_gt_side = F.broadcast(n_gt) if broadcast_gt else n_gt
    scale = float(10 ** ROUND_SCORE)

    per_model = []
    for model, topk in ranked.items():
        hits = (
            topk.join(gt_side, ["qid", "cand"], "left_semi")
            .crossJoin(F.broadcast(ks_df))
            .filter(F.col("rank") <= F.col("k"))
            .groupBy("qid", "k")
            .agg(F.sum(F.element_at(disc_arr, F.col("rank"))).alias("dcg_i"),
                 F.min("rank").alias("fr"))
        )
        grid = queries.select("qid").crossJoin(F.broadcast(ks_df))
        hits_side = F.broadcast(hits) if broadcast_gt else hits
        # per-query scores as exact 1e-6 integers (floor(q·1e6 + 0.5) on
        # IEEE-deterministic divisions of exact integers)
        per_q = (
            grid.join(hits_side, ["qid", "k"], "left")
            .join(n_gt_side, "qid", "left")
            .select(
                "qid", "k",
                F.floor(
                    F.when(
                        F.col("dcg_i").isNotNull() & (F.coalesce("n_gt", F.lit(0)) > 0),
                        F.col("dcg_i").cast("double") / F.element_at(
                            cum_arr,
                            F.least(F.col("n_gt"), F.col("k")).cast("int")
                        ).cast("double")
                    ).otherwise(F.lit(0.0)) * scale + 0.5).alias("ndcg_i"),
                F.floor(
                    F.when(F.col("fr").isNotNull(),
                           F.lit(1.0) / F.col("fr")).otherwise(F.lit(0.0))
                    * scale + 0.5).alias("rr_i"),
            )
        )
        per_model.append(
            per_q.groupBy("k").agg(
                fround(F.sum("ndcg_i").cast("double")
                       / F.count(F.lit(1)) / scale, ROUND_SCORE).alias("ndcg"),
                fround(F.sum("rr_i").cast("double")
                       / F.count(F.lit(1)) / scale, ROUND_SCORE).alias("mrr"))
            .select(F.lit(model).alias("model"), "k", "ndcg", "mrr")
        )
    out = per_model[0]
    for m in per_model[1:]:
        out = out.unionByName(m)
    return out


def diversity_eval(topk: DataFrame, corpus: DataFrame,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   dim: int | None = None) -> DataFrame:
    """Beyond-accuracy serving metrics: intra-list diversity + catalog
    coverage of a served top-k table (Ziegler et al. 2005's ILD; the
    standard complement to Precision/NDCG — a recommender that serves
    the same popular items to everyone scores high accuracy and terrible
    coverage).

    - ``mean_ild``: mean over all within-list pairs of (1 − cosine) —
      per-pair values are floored to integers at 1e6 scale and summed
      exactly (the ``ranking_metrics`` trick), so the cross-engine mean
      has no float-summation-order hazard.
    - ``coverage``: distinct recommended items / catalog size.

    Output: ONE row (n_queries, n_pairs, mean_ild, coverage).

    Scale shape: the pair table is |Q|·k(k−1)/2 rows — linear in the
    query batch, never corpus-sized; two joins keyed by item id pull the
    vectors onto the pairs (corpus-vs-small, AQE picks the strategy);
    the catalog size rides a broadcast single-row aggregate.
    """
    from ..functions import vector as V

    emb_a = corpus.select(F.col(id_col).alias("cand1"),
                          V.as_double(F.col(vec_col)).alias("__va"))
    emb_b = corpus.select(F.col(id_col).alias("cand2"),
                          V.as_double(F.col(vec_col)).alias("__vb"))
    t = topk.select("qid", "cand")
    pairs = (t.select("qid", F.col("cand").alias("cand1"))
             .join(t.select("qid", F.col("cand").alias("cand2")), "qid")
             .filter(F.col("cand1") < F.col("cand2"))
             .join(emb_a, "cand1").join(emb_b, "cand2"))
    scale = 1_000_000
    ild_i = (F.lit(scale)
             - F.floor(V.cosine(F.col("__va"), F.col("__vb"), dim)
                       * scale + F.lit(0.5)).cast("bigint"))
    per = pairs.select("qid", ild_i.alias("ild_i"))
    catalog_n = corpus.agg(F.count(F.lit(1)).alias("__n"))
    return (
        per.agg(F.count(F.lit(1)).alias("n_pairs"),
                F.sum("ild_i").alias("ild_sum"))
        .crossJoin(F.broadcast(
            t.agg(F.countDistinct("qid").alias("n_queries"),
                  F.countDistinct("cand").alias("n_items"))))
        .crossJoin(F.broadcast(catalog_n))
        .select(
            F.col("n_queries").cast("bigint").alias("n_queries"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            # k=1 (or empty) top-k tables have zero within-list pairs;
            # NULL is the well-defined mean there, not a div-by-zero
            F.when(F.col("n_pairs") > 0,
                   fround(F.col("ild_sum").cast("double") / F.col("n_pairs")
                          / F.lit(float(scale)), ROUND_SCORE))
            .otherwise(F.lit(None).cast("double")).alias("mean_ild"),
            fround(F.col("n_items").cast("double") / F.col("__n"),
                   ROUND_SCORE).alias("coverage"))
    )


def roc_auc(scored: DataFrame, label_col: str, score_col: str,
            group_col: str | None = None) -> DataFrame:
    """Exact tie-corrected ROC-AUC via the Mann–Whitney rank-sum
    identity: AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) with R⁺ the sum of the
    positives' AVERAGE ranks under the score order — the threshold-free
    classifier metric the quality-classifier family reports alongside
    held-out separability, exact on tied scores (a tie contributes ½,
    which is precisely what average ranks encode).

    Engine-exact by the ``spearman_corr`` discipline: average ranks are
    half-integers, so each rank is DOUBLED into an exact integer
    (2·rank + tie_count − 1) and R⁺ accumulates as an exact BIGINT —
    no float summation order anywhere; the final AUC is one fixed
    scalar IEEE sequence on exact operands, fround'ed, so the SQL
    oracle is bit-equal. Labels must be 0/1 (validated in-plan via the
    conditional counts: rows with other labels raise the n⁺+n⁻ ≠ n
    check loudly). Degenerate groups (no positives or no negatives)
    emit NULL auc — the metric is undefined there, stated.

    Scale shape: ONE rank window keyed on the group + one partial-agg
    moment aggregate — the same two-exchange profile as spearman; at
    100 TB the rank sort keys on the group and parallelizes across
    groups. Returns (group?, auc, n_pos, n_neg).
    """
    gcol = [group_col] if group_col else []
    base = (scored.select(*gcol, F.col(label_col).cast("int").alias("y"),
                          F.col(score_col).alias("s"))
            .filter(F.col("s").isNotNull() & F.col("y").isNotNull()))
    w = Window.partitionBy(*gcol).orderBy("s")
    ties = Window.partitionBy(*gcol, "s")
    # doubled average rank: exact integer (the spearman_corr trick)
    ranked = base.select(
        *gcol, "y",
        (2 * F.rank().over(w) + F.count(F.lit(1)).over(ties) - 1)
        .cast("long").alias("u2"))
    mom = ranked.groupBy(*gcol).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("n_neg"),
        F.sum(F.when(F.col("y") == 1, F.col("u2")).otherwise(0))
        .alias("r2_pos"))
    checked = mom.withColumn(
        "__ok", F.coalesce(F.assert_true(
            F.col("n_pos") + F.col("n_neg") == F.col("n"),
            F.lit("roc_auc: labels must be 0/1")), F.lit(None)))
    # AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻); R⁺ = r2_pos / 2 (exact: r2_pos
    # has the same parity as n⁺ by construction, but the halving happens
    # in doubles AFTER the exact integer numerator is assembled)
    num = (F.col("r2_pos").cast("double")
           - F.col("n_pos").cast("double") * (F.col("n_pos") + 1)) / 2.0
    auc = F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                 fround(num / (F.col("n_pos").cast("double")
                               * F.col("n_neg")), ROUND_SCORE))
    return (checked
            .select(*gcol, F.when(F.col("__ok").isNull(), auc).alias("auc"),
                    "n_pos", "n_neg"))


def calibration_table(scored: DataFrame, label_col: str, score_col: str,
                      n_bins: int = 10) -> DataFrame:
    """Reliability diagram as a table + per-bin Brier decomposition
    input: scores binned into ``n_bins`` equal-width [0,1) buckets
    (scores clamped into the edge bins; bin = the caller-fixed-literal
    convention of ``psi_drift``, so runs are comparable), each bin
    reporting its count, mean predicted score, and empirical positive
    rate — the "is 0.8 really 80 %?" check every deployed
    quality-classifier gate needs next to its AUC.

    Determinism: counts and label sums are exact integers; the mean
    score is the one float aggregate, made engine-portable by summing
    1e-6-pre-rounded scores scaled to exact integer micros (the
    ``ranking_metrics`` integer-sum discipline) before ONE final
    division. One partial-agg pass over ≤ n_bins groups — flat at any
    size. Returns (bin, n, mean_score, pos_rate, gap = pos_rate −
    mean_score), ordered by bin; empty bins absent.
    """
    b = F.floor(F.col(score_col).cast("double") * n_bins).cast("int")
    bin_ = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), b))
    micros = F.floor(F.col(score_col).cast("double") * 1000000 + 0.5) \
        .cast("long")
    agg = (scored
           .filter(F.col(score_col).isNotNull()
                   & F.col(label_col).isNotNull())
           .select(bin_.alias("bin"), micros.alias("sm"),
                   F.col(label_col).cast("long").alias("y"))
           .groupBy("bin")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("sm").alias("ssm"), F.sum("y").alias("sy")))
    mean_score = fround(F.col("ssm").cast("double") / F.col("n") / 1e6,
                        ROUND_SCORE)
    pos_rate = fround(F.col("sy").cast("double") / F.col("n"), ROUND_SCORE)
    return agg.select(
        "bin", "n", mean_score.alias("mean_score"),
        pos_rate.alias("pos_rate"),
        fround(pos_rate - mean_score, ROUND_SCORE).alias("gap"))


def average_precision(scored: DataFrame, label_col: str, score_col: str,
                      id_col: str, group_col: str | None = None) -> DataFrame:
    """Average precision (the area under the precision-recall curve by
    the step convention): AP = (1/n⁺) Σ over positive ranks k of P(k),
    P(k) = positives-in-top-k / k — the metric that stays informative
    under the class imbalance that flattens ROC-AUC (a quality gate
    passing 1 % of documents lives exactly there).

    Determinism discipline: AP needs a TOTAL ranking order, so ties on
    the score break by ``id_col`` (caller's key — the equidepth
    convention; an un-pinned tie order would change AP run to run).
    Each precision contribution is discretized to exact integer micros
    (⌊10⁶·cum⁺/k⌋ — integer division of exact integers, identical in
    both engines), so the cross-row SUM is an exact BIGINT with no
    float-summation-order hazard (the ``ranking_metrics``
    integer-literal discipline, applied to data-dependent terms); the
    single final division is fround'ed. The 1e-6 discretization is the
    metric's stated resolution. Groups with no positives emit NULL.

    Scale shape: one group-keyed rank window (cum⁺ and k share the
    sort) + one partial-agg sum — the roc_auc profile.
    Returns (group?, ap, n_pos, n).
    """
    gcol = [group_col] if group_col else []
    base = (scored.select(*gcol, F.col(label_col).cast("int").alias("y"),
                          F.col(score_col).alias("s"),
                          F.col(id_col).alias("tie"))
            .filter(F.col("s").isNotNull() & F.col("y").isNotNull()))
    w = (Window.partitionBy(*gcol)
         .orderBy(F.col("s").desc(), F.col("tie").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = base.select(
        *gcol, "y",
        F.sum("y").over(w).alias("cum_pos"),
        F.count(F.lit(1)).over(w).alias("k"))
    # exact integer micros: cum⁺·10⁶ div k — SQL integer division of
    # exact BIGINTs (never a double divide + floor, whose rounding can
    # cross an integer boundary at large operands) — summed only where
    # the rank is a positive (the AP step definition)
    mom = ranked.select(*gcol, "y",
                        F.expr("cum_pos * 1000000L div k").alias("pm")) \
        .groupBy(*gcol).agg(
            F.sum(F.when(F.col("y") == 1, F.col("pm"))).alias("sm"),
            F.sum("y").alias("n_pos"),
            F.count(F.lit(1)).alias("n"))
    ap = F.when(F.col("n_pos") > 0,
                fround(F.col("sm").cast("double")
                       / (F.lit(1000000.0) * F.col("n_pos")), ROUND_SCORE))
    return mom.select(*gcol, ap.alias("ap"), "n_pos", "n")


def calibration_ece(scored: DataFrame, label_col: str, score_col: str,
                    n_bins: int = 10) -> DataFrame:
    """Expected + maximum calibration error — the one-row summary of
    :func:`calibration_table` a model gate thresholds on (the full
    reliability table is for humans; ECE = Σ_b (n_b/N)·|pos_rate_b −
    mean_score_b| and MCE = max_b |gap_b| are what a CI check compares
    to a budget).

    Engine-exact fold: each bin's ``gap`` leaves ``calibration_table``
    already half-up rounded to 1e-6, so |gap| is an exact multiple of
    a micro — rescaled to integer micros and weighted by the exact
    integer bin count, the Σ accumulates as BIGINT (no float-summation
    order, the ``average_precision`` discipline); one final division +
    fround. MCE is a plain max over ≤ n_bins rounded doubles (order-
    free). One pass + a ≤ n_bins-row fold on top of the table's
    single aggregate. Returns ONE row (n, ece, mce).
    """
    ct = calibration_table(scored, label_col, score_col, n_bins)
    gap_m = F.floor(F.abs(F.col("gap")) * 1000000 + F.lit(0.5)).cast("long")
    agg = ct.agg(F.sum("n").alias("n"),
                 F.sum(F.col("n") * gap_m).alias("wsum_m"),
                 F.max(gap_m).alias("mce_m"))
    return agg.select(
        "n",
        fround(F.col("wsum_m").cast("double")
               / (F.col("n").cast("double") * 1e6), ROUND_SCORE).alias("ece"),
        fround(F.col("mce_m").cast("double") / 1e6, ROUND_SCORE).alias("mce"))
