"""Lexical retrieval + rank fusion: BM25 top-k and reciprocal-rank fusion.

The reference blends a dense vector ranker with a co-purchase ranker
(``Hybrid_Recom_vecdb.py:221-228``); production hybrid search systems pair
the dense side with a *lexical* ranker (BM25) and fuse by rank rather than
score (RRF, Cormack et al. 2009).  Both operators here are pure Spark SQL
expressions — no UDFs, whole-stage codegen throughout — and both carry a
DuckDB oracle in ``__spark_entry__``.

Scale design (100 TB corpus):

- ``bm25_topk`` builds the posting table ``(doc_id, term, tf, dl)`` with
  ONE hash aggregate over the exploded tokens (doc length rides along
  map-side — no second corpus pass), immediately prunes it to the query
  vocabulary with a broadcast semi-join, and only then computes per-term
  document frequency — a partial-agg hash aggregate over the pruned
  postings, never a count-over-window by term (which would funnel a
  stopword term's full posting list through one partition).  The only
  data-sized shuffles are the posting aggregation and the (qid, doc)
  score aggregation, both composite-keyed and partial-agg friendly.
- ``rrf_fuse`` consumes two *already top-k-pruned* rankings (|Q|·k rows
  each), so the fusion is a full-outer join + window over tiny inputs —
  the same "prune before fuse" shape as the reference's top-60 pools
  (``Hybrid_Recom_vecdb.py:23-24``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import ROUND_SCORE
from ..functions import texttools as TT
from ..functions.portable import fround
from .similarity import topk_per_query


def bm25_build_index(documents: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text"
                     ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the BM25 lexical index: (postings, df, stats).

    The offline half of the build/serve split every lexical engine makes
    (Lucene's segment build vs query): one corpus pass produces

    - ``postings`` (cand, term, tf, dl) — one hash aggregate over the
      exploded tokens, dl riding along map-side (no second corpus pass),
    - ``df``       (term, df) — a partial-agg hash aggregate over the
      postings (map-side combine, so a stopword term never funnels its
      full posting list through one partition),
    - ``stats``    single row (n_docs, avgdl).

    Persist via :func:`...pipeline.write_bm25_index`; serve via
    ``bm25_topk(..., index=(postings, df, stats))``, which then never
    re-tokenizes the corpus — the 100 TB pattern where the posting build
    is amortized over every query batch.
    """
    toks_arr = TT.tokens(F.col(text_col))
    base = documents.select(
        F.col(id_col).alias("cand"),
        F.explode(toks_arr).alias("term"),
        F.size(toks_arr).alias("dl"),
    )
    postings = base.groupBy("cand", "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("dl").alias("dl"),   # constant within (cand, term)
    )
    df_ = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = documents.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("n_docs"),
        F.avg(F.size(toks_arr)).alias("avgdl"),
    )
    return postings, df_, stats


def bm25_topk(queries: DataFrame, documents: DataFrame, k: int,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              qid_col: str = "qid", qterms_col: str = "qterms",
              exclude_self: bool = False,
              index: tuple[DataFrame, DataFrame, DataFrame] | None = None
              ) -> DataFrame:
    """BM25 top-k per query (Robertson idf, Lucene-style formulation).

    ``queries``: (qid, qterms array<string>) — duplicate query terms are
    collapsed (standard bag-of-words query semantics: each distinct term
    contributes once).  Output: (qid, cand, score, rank) with the repo-wide
    pinned total order (rounded score desc, cand asc).

    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))

    ``index``: a prebuilt (postings, df, stats) triple from
    :func:`bm25_build_index` / ``pipeline.load_bm25_index``.  When given,
    the corpus is never tokenized here — the serve path reads the posting
    table pruned to the query vocabulary.  df per term is identical
    whether counted before or after vocabulary pruning (every doc holding
    a surviving term survives), so both paths are hash-identical.
    """
    qvocab = queries.select(
        F.explode(F.array_distinct(F.col(qterms_col))).alias("term")).distinct()
    if index is None:
        tf, full_df, stats = bm25_build_index(documents, id_col, text_col)
        # prune postings to the query vocabulary FIRST (broadcast
        # semi-join): df per term is unchanged by term-pruning, and
        # everything downstream — df counting, the qid fan-out, the score
        # aggregation — now runs over |postings of query terms| instead of
        # the whole corpus posting table.  Then materialize the pruned
        # postings ONCE: df counting and score fan-out both consume this
        # table, and without the checkpoint their differing column pruning
        # makes the two subtrees non-identical — no ReusedExchange,
        # posting build executed twice (the simhash_neardup double-compute
        # class, VERDICT r5 #1; same lifecycle as
        # dedup.minhash_jaccard_neardup's shared shingle table)
        pruned = (tf.join(F.broadcast(qvocab), "term", "left_semi")
                  .localCheckpoint(eager=True))
        df_ = pruned.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    else:
        postings, full_df, stats = index
        # the posting/df tables are already materialized (parquet or a
        # persisted plan) — no checkpoint needed, and df comes from the
        # stored table pruned to the query vocabulary (broadcasting the
        # FULL df table would ship the whole corpus vocabulary)
        pruned = postings.join(F.broadcast(qvocab), "term", "left_semi")
        df_ = full_df.join(F.broadcast(qvocab), "term", "left_semi")
    # corpus-level constants stay IN the plan (single-row broadcast cross
    # join — the lazy "nd CTE" shape used by tfidf_top_terms)
    qterms = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(F.array_distinct(F.col(qterms_col))).alias("term"),
    )
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    scored = (
        pruned.join(F.broadcast(df_), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "cand")
        .agg(fround(F.sum(idf * tf_part), ROUND_SCORE).alias("score"))
    )
    if exclude_self:
        scored = scored.filter(F.col("cand") != F.col("qid"))
    return topk_per_query(scored, k).select("qid", "cand", "score", "rank")


def rrf_fuse(rank_a: DataFrame, rank_b: DataFrame, k: int,
             rrf_k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of two (qid, cand, rank) rankings.

    fused(q, d) = Σ_r 1/(rrf_k + rank_r(q, d)) over the rankings that
    contain (q, d); candidates absent from one ranking simply lack that
    term (full-outer-join semantics, the C2 coalesce-to-zero shape of
    ``Hybrid_Recom_vecdb.py:226-227`` applied to ranks instead of scores).
    """
    a = rank_a.select("qid", "cand", F.col("rank").alias("rank_a"))
    b_ = rank_b.select("qid", "cand", F.col("rank").alias("rank_b"))
    contrib_a = F.when(F.col("rank_a").isNotNull(),
                       F.lit(1.0) / (rrf_k + F.col("rank_a"))).otherwise(F.lit(0.0))
    contrib_b = F.when(F.col("rank_b").isNotNull(),
                       F.lit(1.0) / (rrf_k + F.col("rank_b"))).otherwise(F.lit(0.0))
    fused = (
        a.join(b_, ["qid", "cand"], "full_outer")
        .select("qid", "cand",
                fround(contrib_a + contrib_b, ROUND_SCORE).alias("score"))
    )
    return topk_per_query(fused, k).select("qid", "cand", "score", "rank")


def maxsim_component_index(chunk_vectors: DataFrame) -> DataFrame:
    """Per-(doc, pos) component extrema — the precomputable half of
    hashing-encoder MaxSim.

    Under the one-hot signed query encoding, ``max over chunks of
    s·v[pos]`` depends on the document only through ``max(v[pos])`` (for
    s=+1) and ``min(v[pos])`` (for s=-1), NEVER on which query term
    probed it.  So the whole per-term/per-chunk max aggregation —
    |chunks|·dim rows fanned out by the query-term count — collapses into
    this query-independent summary: (doc_id, pos, vmax, vmin), exactly
    |docs|·dim rows regardless of chunk count.  Build it once at ingest
    (one posexplode + one hash aggregate, the same pass that would write
    the chunk index) and MaxSim serve never touches chunk granularity.
    """
    return (chunk_vectors
            .select(F.col("doc_id").alias("cand"),
                    F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cand", "pos")
            .agg(F.max("val").alias("vmax"), F.min("val").alias("vmin")))


def maxsim_topk(queries: DataFrame, chunk_vectors: DataFrame, k: int,
                dim: int = 64, exclude_self: bool = True,
                qid_col: str = "qid", qterms_col: str = "qterms",
                components: DataFrame | None = None) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) retrieval over a
    multi-vector chunk index (Khattab & Zaharia 2020).

    score(q, d) = Σ_{t ∈ distinct terms of q} max_{c ∈ chunks(d)}
    ⟨E(t), v_{d,c}⟩ — each query term independently finds its best
    chunk, so a long document matches if *some* chunk covers each term
    (the property mean-pooling destroys; the reference embeds whole docs
    at ``Hybrid_Recom_vecdb.py:374-379``).

    ``chunk_vectors``: (doc_id, chunk_id, embedding array<float>) — the
    un-pooled chunk index from ``chunk_documents`` → ``hashing_embedder``
    (the multi-vector analogue of the pooled RAG chain in
    ``chunk_pooled_embeddings``). Under the hashing encoder a single
    query term embeds to a one-hot signed basis vector (bucket b, sign
    s), so ⟨E(t), v⟩ collapses to ``s · v[b]`` — and the per-term max
    over chunks collapses further to ``s>0 ? vmax[b] : -vmin[b]`` over
    the per-(doc, pos) extrema (``maxsim_component_index``).  Terms of
    one query hashing to the same (bucket, sign) contribute identical
    maxima, so they fold into an integer weight; ``weight · ms`` is
    exact in double (≤28-bit mantissa product) and the summands are the
    same float32-valued quantities the unfolded sum adds, so the rewrite
    is bit-identical to per-term summation after the 1e-6 round —
    pinned against the unfolded DuckDB oracle.

    Plan shape (100 TB): the weighted query-bucket table (≤ |Q|·terms
    rows) broadcasts against the |docs|·dim component summary — serve
    cost no longer scales with chunk count, and the only data-sized
    aggregation left is the final (qid, cand) score sum.  Pass
    ``components=`` (persisted at ingest, partitioned by pos so the
    bucket probe becomes partition pruning) to skip the in-plan summary
    build entirely.
    """
    from ..functions.hashing import hex8_u32, hex_nibble_value

    qt = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(F.array_distinct(F.col(qterms_col))).alias("term"))
    h = F.md5(F.col("term"))
    qh = qt.select(
        "qid",
        (hex8_u32(h) % dim).cast("int").alias("bucket"),
        F.when(hex_nibble_value(F.substring(h, 9, 1)) >= 8, F.lit(1.0))
         .otherwise(F.lit(-1.0)).alias("sign"))
    # terms are distinct per query (array_distinct above), so count(*) is
    # the number of distinct terms folding into this (bucket, sign) cell
    qw = qh.groupBy("qid", "bucket", "sign").agg(
        F.count(F.lit(1)).cast("double").alias("w"))
    comp = (maxsim_component_index(chunk_vectors)
            if components is None else components)
    contrib = (
        comp.join(F.broadcast(qw), comp["pos"] == qw["bucket"])
        .select("qid", "cand",
                (F.col("w") * F.when(F.col("sign") > 0,
                                     F.col("vmax").cast("double"))
                               .otherwise(-F.col("vmin").cast("double")))
                .alias("c"))
    )
    scored = contrib.groupBy("qid", "cand").agg(
        fround(F.sum("c"), ROUND_SCORE).alias("score"))
    if exclude_self:
        scored = scored.filter(F.col("cand") != F.col("qid"))
    return topk_per_query(scored, k).select("qid", "cand", "score", "rank")
