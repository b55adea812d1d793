"""Deterministic seeded sampling (F2/F3).

The reference uses Algorithm-R reservoir sampling with Python's
Mersenne-Twister (``Hybrid_Recom_vecdb.py:102-123``) and
``random.Random(seed).sample`` for the eval query set (``:239-245``).
Bitwise RNG parity is impossible across engines (SURVEY §7.2), so the
engine defines *semantic* parity: an exact-size uniform sample that is a
pure function of (seed, key) — rank rows by ``md5(seed || ':' || key)``
and take the first n. Identical in Spark and any SQL oracle, stable under
repartitioning, and single-pass distributed (TakeOrderedAndProject: each
partition keeps its local top-n, the driver merges — the same property
that makes reservoir sampling single-pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hex8_u32, seeded_key, uniform01
from ..functions.portable import epoch_seconds, fround


def seeded_sample(df: DataFrame, n: int, key_col: str, seed: int = 42) -> DataFrame:
    """Exact-size uniform deterministic sample keyed by ``key_col``."""
    return (
        df.withColumn("__sk", seeded_key(F.col(key_col), seed))
        .orderBy("__sk")
        .limit(n)
        .drop("__sk")
    )


def stratified_sample(df: DataFrame, n_per_stratum: int, stratum_col: str,
                      key_col: str, seed: int = 42) -> DataFrame:
    """Deterministic stratified sample: n rows per stratum, seeded.

    Ranking window per stratum over the seeded md5 key — one shuffle on the
    stratum column; within-stratum order is uniform and reproducible. The
    scale path for "balance the training mix by language/source".
    """
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(seeded_key(F.col(key_col), seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def weighted_sample(df: DataFrame, n: int, weight_col: str, key_col: str,
                    seed: int = 42) -> DataFrame:
    """Deterministic weighted sampling without replacement (importance
    sampling — e.g. weight training documents by length or quality).

    Efraimidis–Spirakis A-ES: rank by ``u^(1/w)`` where ``u`` is a seeded
    uniform derived from the md5 ordering key (first 8 hex chars as a
    u32) — the classic one-pass distributed weighted reservoir. Top-n by
    key runs as TakeOrderedAndProject (per-partition local top-n, driver
    merge — no global sort). Non-positive weights are excluded. The key
    is rounded at 1e-12 so the float ``pow`` agrees bit-for-bit with the
    SQL oracle's; ties resolve by ``key_col`` ascending.
    """
    u = uniform01(F.col(key_col), seed)
    w = F.col(weight_col).cast("double")
    es_key = fround(F.pow(u, F.lit(1.0) / w), 12)
    return (
        df.filter(w > 0)
        .withColumn("__wk", es_key)
        .orderBy(F.col("__wk").desc(), F.col(key_col).asc())
        .limit(n)
        .drop("__wk")
    )


def seeded_fraction_sample(df: DataFrame, fraction: float, key_col: str,
                           seed: int = 42) -> DataFrame:
    """Fraction-style deterministic sample: keep rows whose seeded md5 key
    falls below the fraction threshold (first 8 hex chars as uniform u32).
    Unlike ``seeded_sample`` this needs no global sort — fully map-side,
    the 100 TB path."""
    u32 = hex8_u32(seeded_key(F.col(key_col), seed))
    return df.filter(u32 < F.lit(int(fraction * 0xFFFFFFFF)))


def domain_mix_sample(df: DataFrame, targets: dict, domain_col: str = "source",
                      key_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Resample to a target domain mixture (DoReMi-style static mixing).

    ``targets`` maps domain value → target weight (need not sum to 1; they
    are normalized by construction). Output is the LARGEST sample whose
    domain proportions hit the targets without upsampling any domain:
    T = min_d(n_d / w_d) rows total, k_d = floor(w_d · T) per domain,
    members chosen by the seeded-md5 ranking (same uniform key as
    ``stratified_sample``, ties by ``key_col``), so the result is a pure
    function of (data, targets, seed).

    Scale shape: one bounded driver agg (|domains| rows — the codebook
    pattern) to size k_d, then ONE ranking-window shuffle keyed by the
    domain column. Degenerate targets (a domain with weight > 0 but no
    rows) yield an empty result, loudly correct: T = 0.
    """
    import math

    from pyspark.sql import Window

    doms = [d for d, w in targets.items() if w > 0]
    if not doms:
        raise ValueError(
            "domain_mix_sample: no domain has a positive target weight "
            f"(targets={targets!r})")
    counts = {r[0]: r[1] for r in (
        df.filter(F.col(domain_col).isin(doms))
        .groupBy(domain_col).count().collect())}
    # absent domains count 0 → T = 0 → empty result, loudly correct (the
    # oracle mirrors this with a LEFT JOIN from targets; ADVICE r5)
    t_scale = min(counts.get(d, 0) / targets[d] for d in doms)
    ks = {d: int(math.floor(targets[d] * t_scale)) for d in doms}
    k_col = F.lit(None).cast("long")
    for d in doms:
        k_col = F.when(F.col(domain_col) == d, F.lit(ks[d])).otherwise(k_col)
    w = Window.partitionBy(domain_col).orderBy(
        seeded_key(F.col(key_col), seed), F.col(key_col).asc())
    return (
        df.filter(F.col(domain_col).isin(doms))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_col)
        .drop("__rn")
    )


def mixing_order(df: DataFrame, weights: dict, domain_col: str = "source",
                 key_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Deterministic examples-proportional interleave — the CONSUMPTION-
    ORDER twin of :func:`domain_mix_sample` (which picks WHAT to keep;
    this orders an already-selected corpus so a sequential reader sees
    domains interleaved at their target rates — the T5/PaLM mixing
    schedule, made a pure function of (data, weights, seed)).

    Mechanics: within each domain, docs get the seeded-md5 rank r
    (1-based, ties by ``key_col`` — the ``domain_mix_sample`` ranking);
    the schedule key is the STRIDE position ``mix_key = (r − 0.5) / w_d``
    (the r-th example of a weight-w domain sits at its r-th multiple of
    the 1/w stride; the −0.5 centers strides so two domains with equal
    weight alternate instead of clumping at shared multiples). Reading
    the corpus ORDER BY (mix_key, domain, id) consumes domain d at rate
    proportional to w_d for as long as d has examples — weights need
    not sum to 1 (only ratios matter; they are scale-free in the key's
    ORDER). Rows of domains absent from ``weights`` (or with weight
    ≤ 0) are EXCLUDED, matching domain_mix_sample's contract.

    mix_key is fround'ed (repo 1e-6) so the oracle is bit-equal; ties
    across domains are pinned by the (domain, id) suffix.

    Scale shape: ONE ranking-window shuffle keyed by the domain column,
    map-only after — the global interleave is encoded in the KEY, not
    materialized by a global sort; the writer that wants physically
    interleaved files does its usual ``repartitionByRange(mix_key)``
    write, which is the sort it would pay anyway.

    Returns (``key_col``, domain, dom_rank, mix_key).
    """
    from pyspark.sql import Window

    doms = {d: float(w) for d, w in weights.items() if w > 0}
    if not doms:
        raise ValueError(
            "mixing_order: no domain has a positive weight "
            f"(weights={weights!r})")
    w_col = F.lit(None).cast("double")
    for d, wd in doms.items():
        w_col = F.when(F.col(domain_col) == d, F.lit(wd)).otherwise(w_col)
    win = Window.partitionBy(domain_col).orderBy(
        seeded_key(F.col(key_col), seed), F.col(key_col).asc())
    return (df.filter(F.col(domain_col).isin(list(doms)))
            .withColumn("__r", F.row_number().over(win))
            .select(F.col(key_col),
                    F.col(domain_col).alias("domain"),
                    F.col("__r").alias("dom_rank"),
                    fround((F.col("__r") - 0.5) / w_col, 6)
                    .alias("mix_key")))


def _nib_sql(expr: str) -> str:
    """Value 0-15 of one lowercase hex char, as engine-portable SQL text
    (ascii math — identical in Spark SQL and DuckDB, so the oracle embeds
    the same expression)."""
    return (f"(CASE WHEN ascii({expr}) <= 57 THEN ascii({expr}) - 48 "
            f"ELSE ascii({expr}) - 87 END)")


def token_bucket_sql(tok_expr: str, n_buckets: int = 256) -> str:
    """Hashing-trick bucket of a token: two md5 hex nibbles → [0, 256),
    then mod ``n_buckets``. The same nibble positions (7, 8) as the
    ``hashing_embedder`` feature map, so the whole feature family shares
    one portable hash definition."""
    h = f"md5({tok_expr})"
    raw = (f"(16 * {_nib_sql(f'substr({h}, 7, 1)')} "
           f"+ {_nib_sql(f'substr({h}, 8, 1)')})")
    return raw if n_buckets == 256 else f"({raw} % {n_buckets})"


def dsir_weights(corpus: DataFrame, target: DataFrame,
                 n_buckets: int = 256, alpha: float = 0.5,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169).

    Data Selection via Importance Resampling: score every corpus document
    by the log-likelihood ratio of its hashed-unigram features under the
    target-domain distribution vs the raw-corpus distribution,

        w(doc) = Σ_tok  ln( p_target(bucket(tok)) / p_raw(bucket(tok)) )

    with add-``alpha`` smoothing over ``n_buckets`` hashed buckets.
    Output: (``id_col``, dsir_weight) for every corpus row (docs with no
    tokens get weight 0.0). Feed ``exp(dsir_weight)`` to
    :func:`weighted_sample` (A-ES) to complete the paper's resampling
    step — top-n by ``u^(1/w)`` with w = the likelihood ratio is
    Gumbel-top-k sampling without replacement on the log weights.

    Scale shape (100 TB): the two feature distributions are ``n_buckets``-
    row aggregates (map-side combine collapses each partition to ≤
    ``n_buckets`` partial rows before the shuffle), collected bounded
    (256 rows — the driver-resident codebook pattern of
    ``kmeans_centroids_local``) and re-embedded as ONE constant-folded
    literal array each. Scoring is then a map-only pass — a per-row HOF
    fold over the token array against the two literals, ZERO shuffles and
    no join; at 100 TB the only distributed cost is the two counting
    passes (train the target distribution on a sample once and persist
    it, and it drops to one).
    """
    b_sql = token_bucket_sql("t", n_buckets)

    def bucket_counts(df: DataFrame) -> dict[int, int]:
        from ..functions import texttools as TT

        rows = (df.select(F.explode(TT.tokens(F.col(text_col))).alias("tok"))
                .select(F.expr(token_bucket_sql("tok", n_buckets)).alias("b"))
                .groupBy("b").count().collect())  # bounded: n_buckets rows
        return {r["b"]: r["count"] for r in rows}

    cnt_t = bucket_counts(target)
    cnt_r = bucket_counts(corpus)
    # exact-integer totals; Z as repr'd double literals so both engines
    # parse the identical correctly-rounded constant
    z_t = float(sum(cnt_t.values())) + alpha * n_buckets
    z_r = float(sum(cnt_r.values())) + alpha * n_buckets
    arr_t = "array(" + ", ".join(
        str(cnt_t.get(b, 0)) + "L" for b in range(n_buckets)) + ")"
    arr_r = "array(" + ", ".join(
        str(cnt_r.get(b, 0)) + "L" for b in range(n_buckets)) + ")"
    # per-token contribution: the SAME expression text the oracle runs —
    # ln(((ct+a)*Zr) / ((cr+a)*Zt)); alpha and Z embedded via repr
    contrib = (
        f"ln(((CAST(element_at({arr_t}, {b_sql} + 1) AS DOUBLE) + {alpha!r}D)"
        f" * {z_r!r}D) / "
        f"((CAST(element_at({arr_r}, {b_sql} + 1) AS DOUBLE) + {alpha!r}D)"
        f" * {z_t!r}D))"
    )
    toks = f"filter(split(lower({text_col}), ' '), x -> x != '')"
    w_expr = (f"coalesce(aggregate(transform({toks}, t -> {contrib}), "
              f"CAST(0.0 AS DOUBLE), (acc, y) -> acc + y), CAST(0.0 AS DOUBLE))")
    return corpus.select(
        F.col(id_col),
        fround(F.expr(w_expr), 6).alias("dsir_weight"),
    )


def negative_samples(edges: DataFrame, items: DataFrame, n_neg: int = 4,
                     pool_size: int = 64, seed: int = 42,
                     src_col: str = "src", dst_col: str = "dst",
                     item_col: str = "item_id",
                     require_full: bool = False) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training:
    (src, pos_dst, neg_dst) triplets — the batch that trains a BPR /
    two-tower ranker from the co-purchase graph (Rendle et al. 2009's
    sampling step, made seeded and engine-portable).

    Semantics: a GLOBAL candidate pool of ``pool_size`` items (lowest
    seeded-md5 ordering keys — the ``seeded_sample`` mechanic) is shared
    by every source; each source takes its ``n_neg`` pool items with the
    lowest PAIR hash md5(seed:src:item), excluding itself and everything
    it has a positive edge to; each positive edge then fans out to those
    negatives. The shared pool is the scale trick: personalized
    candidate generation is |src|×|catalog|, while pool-based is
    |src|×pool_size with the pool broadcast — in-batch-negatives
    semantics, standard for two-tower training.

    Determinism: pure function of (seed, edges, items) — no RNG state,
    so the DuckDB oracle replicates it exactly. A popularity-weighted
    pool is one `weighted_sample` swap away; uniform is the honest
    default (popularity weighting is a tuning choice, not a semantics
    change).

    Scale shape: pool = global TakeOrdered over items (pool_size rows,
    broadcast); src×pool candidate table is linear in |sources|; one
    anti-join against the edge set (shuffle keyed by (src, item)); one
    per-src ranking window; final fan-out join edges⋈negatives keyed by
    src. Output volume = |edges|·n_neg.

    STARVATION CAVEAT (explicit, by design): a source whose positive
    edges cover most/all of the shared pool gets fewer than ``n_neg``
    negatives — possibly zero, in which case the final inner join DROPS
    that source's positive edges from the training output (an edge with
    no negative cannot form a BPR triplet). With the default
    pool_size=64 ≫ typical out-degree this is vanishingly rare; raise
    ``pool_size`` if your degree distribution says otherwise. Pass
    ``require_full=True`` to fail loudly instead of silently under-
    sampling: it raises if ANY source received fewer than ``n_neg``
    negatives (one bounded single-row action).
    """
    from pyspark.sql import Window

    from ..functions.hashing import seeded_key

    pool = (items.select(F.col(item_col).alias("neg_dst"))
            .orderBy(seeded_key(F.col("neg_dst"), seed).asc(),
                     F.col("neg_dst").asc())
            .limit(pool_size))
    srcs = edges.select(F.col(src_col).alias("src")).distinct()
    cand = (srcs.join(F.broadcast(pool))
            .filter(F.col("src") != F.col("neg_dst")))
    pos = edges.select(F.col(src_col).alias("src"),
                       F.col(dst_col).alias("neg_dst"))
    pair_key = F.md5(F.concat(F.lit(f"{seed}:"),
                              F.col("src").cast("string"), F.lit(":"),
                              F.col("neg_dst").cast("string")))
    w = Window.partitionBy("src").orderBy(pair_key.asc(),
                                          F.col("neg_dst").asc())
    negs = (cand.join(pos, ["src", "neg_dst"], "left_anti")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_neg)
            .drop("__rn"))
    if require_full:
        starved = (srcs.join(negs.groupBy("src")
                             .agg(F.count(F.lit(1)).alias("__k")),
                             "src", "left")
                   .filter(F.coalesce(F.col("__k"), F.lit(0)) < n_neg)
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.min("src").alias("example")).head())
        if starved["n"] > 0:
            raise ValueError(
                f"negative_samples: {starved['n']} source(s) received "
                f"fewer than n_neg={n_neg} negatives (e.g. src="
                f"{starved['example']}); their positive edges would be "
                f"silently dropped. Raise pool_size (={pool_size}) or "
                f"sample without require_full.")
    return (edges.select(F.col(src_col).alias("src"),
                         F.col(dst_col).alias("pos_dst"))
            .join(negs, "src")
            .select("src", "pos_dst", "neg_dst"))


def temporal_split(df: DataFrame, ts_col: str, train_frac: float = 0.8,
                   purge_seconds: int = 86400,
                   id_col: str = "event_id") -> DataFrame:
    """Walk-forward temporal split with a purge gap: rows are labeled
    ``train`` / ``purge`` / ``test`` by EVENT TIME, never by hash — the
    split a forecasting/attribution model needs, where hash splits leak
    the future into training. The purge window between train and test
    drops rows whose targets could straddle the boundary (the standard
    purged walk-forward protocol from financial CV, e.g. de Prado 2018).

    Boundary = the exact nearest-rank ``train_frac`` quantile of the
    event time at WHOLE-SECOND granularity (floor of epoch seconds — an
    exact integer in both engines): the smallest second s with
    |rows at ≤ s| ≥ ceil(train_frac·N). Computed from the per-second
    count table (one exchange keyed on the second; the ordered cumulative
    sum runs over |distinct seconds| rows, not |rows|), then collected as
    ONE bounded driver scalar so the labeling pass is map-only with
    literal thresholds. At 100 TB the boundary does not need to be
    exact — swap in the sketch tier (``percentile_approx``) and keep the
    identical labeling pass; the exact form here is what the
    cross-engine oracle can replicate.

    Returns (id_col, split) for every input row.
    """
    from pyspark.sql import Window

    sec = F.floor(epoch_seconds(F.col(ts_col))).cast("long")
    counts = (df.select(sec.alias("__s"))
              .groupBy("__s").agg(F.count(F.lit(1)).alias("__c")))
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("__cum", F.sum("__c").over(w))
    import math

    n = df.count()  # one scalar — bounded driver state
    # 1e-9 rank-product epsilon, mirrored in the oracle: n·frac in
    # doubles can land just above an exact integer (ADVICE r8)
    rank = math.ceil(n * train_frac - 1e-9)
    boundary = (cum.filter(F.col("__cum") >= F.lit(rank))
                .agg(F.min("__s").alias("b")).head())["b"]
    if boundary is None:
        # empty input (rank ≤ n guarantees a boundary otherwise): emit
        # the labeled schema with zero rows instead of None-arithmetic
        # TypeError (ADVICE r8)
        return df.select(F.col(id_col), F.lit("test").alias("split"))
    purge_end = boundary + purge_seconds
    return df.select(
        F.col(id_col),
        F.when(sec <= F.lit(boundary), F.lit("train"))
        .when(sec <= F.lit(purge_end), F.lit("purge"))
        .otherwise(F.lit("test")).alias("split"))


def budgeted_select(df: DataFrame, group_col: str, weight_col: str,
                    budget: float, order_cols: list) -> DataFrame:
    """Greedy prefix selection under a per-group additive budget: within
    each group, rank rows by ``order_cols`` and keep the longest prefix
    whose cumulative ``weight_col`` stays ≤ ``budget`` — the "fill each
    domain's token budget with its best documents" primitive of a
    pretraining data mixture (the group is a domain/source, the weight a
    token count, the order a quality ranking). Prefix semantics (the
    cumulative sum is monotone for non-negative weights, so the filter
    selects a contiguous prefix) make the output a pure function of the
    ordering — engine-portable, no knapsack search.

    Returns every selected row with ``cum_w`` (the running total at that
    row) appended.

    Scale shape: ONE exchange — the per-group sort that the cumulative
    window needs — then a map-only filter; no second pass, no collect.
    At 100 TB the group count (domains) is large and the exchange hashes
    on the group key, so skew mirrors domain skew: salt or pre-cap giant
    domains upstream (e.g. ``domain_mix_sample``) if one domain
    dominates a partition.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(F.col(group_col))
         .orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, 0))
    return (df.withColumn("cum_w", F.sum(F.col(weight_col)).over(w))
            .filter(F.col("cum_w") <= budget))
