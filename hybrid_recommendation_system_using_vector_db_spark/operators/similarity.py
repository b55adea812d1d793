"""Similarity search over embedding columns (C5 in SURVEY §2.3).

The reference's ANN search is a ChromaDB HNSW query
(``Hybrid_Recom_vecdb.py:172-187``). Distributed equivalents, fastest-path
first at each scale:

- ``cosine_topk``      exact brute force as one declarative plan: broadcast
                       the (small) query side, score JVM-side, window top-k.
                       This is the correctness oracle for every ANN variant.
- ``cosine_topk_gemm`` exact brute force through Arrow + NumPy GEMM
                       (``mapInPandas``): each executor multiplies its
                       partition's matrix against the broadcast query matrix
                       and emits only its local top-k → tiny shuffle. The
                       100 TB fast path when Python is acceptable.
- ``lsh_topk``         approximate: random-hyperplane bucket blocking; only
                       same-bucket pairs are scored. Bucket column doubles as
                       a partitioning/bucketing key at scale (co-located,
                       shuffle-free candidate generation).
- ``ivf_topk``         approximate: IVF coarse quantizer with deterministic
                       centroids; queries probe ``nprobe`` nearest inverted
                       lists.

Determinism discipline (SURVEY §7.1): scores are rounded before ranking and
ties are broken by candidate id ascending, so results are reproducible
across partitionings and against the DuckDB oracle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import fround

from .. import ROUND_SCORE
from ..functions import vector as V
from ..functions.hashing import as_double_sql, hyperplane_bits


_DIM_CACHE: dict[tuple, int | None] = {}


def _vec_dim(df: DataFrame, vec_col: str) -> int | None:
    """Probe the (fixed) embedding dimensionality — one-row scan, memoized.

    Knowing dim lets every dot product unroll into a codegen-able flat
    expression instead of an interpreted HOF fold (see functions.vector.dot).
    The probe is a real Spark job (~0.5 s of fixed latency), so it caches
    on (semantic plan hash, analyzed schema): the semantic hash — the
    PUBLIC ``DataFrame.semanticHash()`` (3.1+, Connect-supported; VERDICT
    r5 wrong #3 retired the ``_jdf`` py4j form) — is a 32-bit digest of
    the analyzed plan. A collision between two lineages is astronomically
    unlikely but not impossible (ADVICE r2), so the schema string rides in
    the key as a cheap cross-check, and serve paths should pass ``dim``
    explicitly from index metadata instead of probing at all.
    """
    try:
        proj = df.select(F.col(vec_col))
        key = (df.sparkSession.sparkContext.applicationId,
               proj.semanticHash(), proj.schema.json(), vec_col)
    except Exception:
        key = None
    if key is None or key not in _DIM_CACHE:
        try:
            row = df.select(F.size(F.col(vec_col)).alias("d")).first()
            dim = int(row.d) if row and row.d and row.d > 0 else None
        except Exception:
            return None
        if key is None:
            return dim
        _DIM_CACHE[key] = dim
    return _DIM_CACHE[key]


_SPREAD_CACHE: dict[tuple, bool] = {}


def _spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for per-row scoring parallelism.

    Broadcast joins preserve the stream side's partitioning; a corpus read
    from one parquet file would otherwise score every candidate pair on one
    core. Only widens — a 100 TB corpus that already has thousands of scan
    partitions passes through untouched (no extra shuffle).

    The widen decision never builds the DataFrame→RDD CONVERSION plan
    (``.rdd`` adds a Python-deserializer plan per call and is
    unsupported under Spark Connect — VERDICT r8 wrong #2). Two tiers:

    1. Map-only scans (the common corpus input): ``inputFiles()`` +
       Hadoop file sizes estimate the scan's partition count with
       Spark's OWN FilePartition sizing — maxSplitBytes =
       min(maxPartitionBytes, max(openCostInBytes, bytesPerCore)) with
       bytesPerCore = (totalBytes + openCost·nFiles) / parallelism —
       pure driver metadata, memoized, no planning at all. Reproducing
       the bytesPerCore shrink matters: a plain ceil(size/128MB) over a
       1 GB file estimates 8 partitions where Spark actually plans ~32,
       and the underestimate would inject a spurious full-corpus
       shuffle into every per-call operator. ≥128 files short-circuits
       to pass-through (already parallel enough for scoring).
    2. Everything else (checkpoints, broadcast-join outputs — which
       PRESERVE the possibly-1-partition stream side, the case this
       helper exists for): probe the physical partitioning via
       ``queryExecution().toRdd()`` — triggers planning but no job and
       no conversion plan. Probe failure (e.g. Connect) → pass-through.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    files = None
    try:
        # Walk the analyzed logical plan's NODES and whitelist the
        # map-only shapes (scan + project/filter/alias): substring-
        # matching the rendered plan string misclassified any relation/
        # column/literal whose name contained a node token ('Join',
        # 'Sort', ...) and silently missed future node types (ADVICE
        # r9). Anything outside the whitelist falls through to the
        # physical-partitioning probe below, which is correct for every
        # plan shape — the whitelist only gates the cheap metadata path.
        node, stack, maponly = None, [df._jdf.queryExecution().analyzed()], True
        while stack:
            node = stack.pop()
            if node.nodeName() not in (
                    "Project", "Filter", "SubqueryAlias", "View",
                    "LogicalRelation", "Relation",
                    "DataSourceV2Relation", "DataSourceV2ScanRelation"):
                maponly = False
                break
            cs = node.children()
            for i in range(cs.size()):
                stack.append(cs.apply(i))
        if maponly:
            files = sorted(df.inputFiles())
    except Exception:
        return df
    if files is not None:
        if not files or len(files) >= min(target, 128):
            return df
        key = (spark.sparkContext.applicationId, tuple(files), target)
        if key not in _SPREAD_CACHE:
            try:
                jvm = spark._jvm
                conf = spark._jsc.hadoopConfiguration()
                as_bytes = jvm.org.apache.spark.network.util.JavaUtils \
                    .byteStringAsBytes
                max_part = int(as_bytes(spark.conf.get(
                    "spark.sql.files.maxPartitionBytes", "128MB")))
                open_cost = int(as_bytes(spark.conf.get(
                    "spark.sql.files.openCostInBytes", "4MB")))
                sizes = []
                for f in files:
                    p = jvm.org.apache.hadoop.fs.Path(f)
                    sizes.append(p.getFileSystem(conf)
                                 .getFileStatus(p).getLen())
                total = sum(sizes) + open_cost * len(sizes)
                parallelism = spark.sparkContext.defaultParallelism
                bytes_per_core = total // max(1, parallelism)
                max_split = min(max_part, max(open_cost, bytes_per_core))
                est = sum(max(1, -(-sz // max(1, max_split)))   # ceil div
                          for sz in sizes)
                _SPREAD_CACHE[key] = est < target
            except Exception:
                _SPREAD_CACHE[key] = False
        return df.repartition(target) if _SPREAD_CACHE[key] else df
    try:
        n = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if n < target else df


def _scored_pairs(queries: DataFrame, corpus: DataFrame,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  dim: int | None = None) -> DataFrame:
    """Broadcast-join queries × corpus with rounded cosine, self excluded (B4).

    L2 norms are hoisted per-row (HOF fold, cheap to build) so the
    per-pair expression is one ``dim``-unrolled dot + divide: a full
    inline cosine is 3 unrolled dots, which both costs ~5s of py4j
    Column construction on the driver and overflows the 64KB codegen
    method limit inside the join (silent interpreted fallback). The
    hoisted form is the same ops in the same order → bitwise-identical.
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    q = queries.select(
        F.col(id_col).alias("qid"),
        V.as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("q_nrm", V.l2_norm(F.col("q_vec")))
    c = _spread(corpus.select(
        F.col(id_col).alias("cand"),
        V.as_double(F.col(vec_col)).alias("c_vec"),
    )).withColumn("c_nrm", V.l2_norm(F.col("c_vec")))
    pair_dot = V.dot_expr("q_vec", "c_vec", dim) if dim else \
        V.dot(F.col("q_vec"), F.col("c_vec"))
    denom = F.col("q_nrm") * F.col("c_nrm")
    cos = F.when(denom > 0, pair_dot / denom).otherwise(F.lit(0.0))
    return (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("cand") != F.col("qid"))
        .withColumn("score", fround(cos, ROUND_SCORE))
    )


def topk_per_query(scored: DataFrame, k: int, score_col: str = "score",
                   cand_col: str = "cand") -> DataFrame:
    """Ranking window (E1): row_number over (score desc, cand asc) ≤ k."""
    w = Window.partitionBy("qid").orderBy(F.col(score_col).desc(), F.col(cand_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dim: int | None = None) -> DataFrame:
    """Exact brute-force cosine top-k (the C5 oracle path).

    Plan shape: broadcast(queries) × corpus scan (pruned to id+vec) →
    codegen'd cosine → per-query window top-k. No shuffle on the corpus
    side except the final window (hash on qid, |Q|·k rows).
    ``dim``: pass the known embedding dimensionality to skip the probe job.
    """
    return (
        topk_per_query(_scored_pairs(queries, corpus, id_col, vec_col, dim), k)
        .select("qid", "cand", "score", "rank")
    )


def cosine_topk_gemm(queries: DataFrame, corpus: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_local=None, exclude: dict | None = None) -> DataFrame:
    """Exact cosine top-k via NumPy GEMM in ``mapInPandas`` (fast path).

    The query matrix is captured in the closure (broadcast by Spark's task
    serializer — fine up to ~10⁵ queries), each partition computes a
    (batch × queries) GEMM and keeps only its local top-k per query; the
    final exact top-k is a small window over ≤ partitions·|Q|·k rows.

    ``q_local``: optional pre-collected ``(ids, matrix)`` for the query
    side — serving chains that answer the same query set repeatedly
    collect it once and skip this call's driver job (the reference holds
    its query vectors in process for the same reason).

    ``exclude``: optional {qid: array-of-cand-ids} masked out BEFORE the
    local top-k, so per-query exclusion costs nothing downstream (no
    k+headroom over-fetch, no anti-join, no re-rank — the masked top-k IS
    the final ranking). Sized like the query side (one entry per query),
    so the same ≤ ~10⁵-queries closure bound applies.
    """
    import numpy as np

    if exclude:
        exclude = {int(q): np.asarray(sorted(c), dtype=np.int64)
                   for q, c in exclude.items()}
    if q_local is None:
        q_rows = queries.select(id_col, vec_col).collect()
        if not q_rows:
            return cosine_topk(queries, corpus, k, id_col, vec_col)
        q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
        q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    else:
        q_ids = np.asarray(q_local[0], dtype=np.int64)
        q_mat = np.asarray(q_local[1], dtype=np.float64)
        if q_ids.size == 0:
            return cosine_topk(queries, corpus, k, id_col, vec_col)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = 1.0
    qn = q_mat / q_norm[:, None]

    # flattened (qid, cand) exclusion pairs for the vectorized scatter
    # below (dict-of-arrays → two parallel arrays, built once per call)
    if exclude:
        ex_q = np.concatenate([np.full(c.size, q, dtype=np.int64)
                               for q, c in exclude.items()])
        ex_c = np.concatenate([c for c in exclude.values()])
    else:
        ex_q = ex_c = None

    def local_topk(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            c_norm[c_norm == 0] = 1.0
            # same portable rounding as fround(): floor(x·10^d + 0.5)/10^d
            scale = 10.0 ** ROUND_SCORE
            sims = np.floor((c_mat / c_norm[:, None]) @ qn.T * scale + 0.5) / scale  # (B, Q)
            # Vectorized masking (r12 kernel rewrite — the previous shape
            # lexsorted the FULL masked column once PER QUERY, |Q|·O(B log B)
            # python-loop work that dominated the fold-in serve): excluded
            # cells drop to -inf so one argpartition over the whole (B, Q)
            # matrix replaces the per-query full sorts. Output identical —
            # the exact (-score, cand) order is restored per query on the
            # tiny boundary-exact candidate set below.
            sims[c_ids[:, None] == q_ids[None, :]] = -np.inf  # B4 self
            if ex_q is not None and ex_q.size:
                # scatter (qid, cand) pairs into (row, col) cells via two
                # searchsorted id→position maps — no per-query isin scans.
                # Each pair scatters over ALL occurrences of both ids
                # (left/right range search + vectorized expansion): a
                # duplicate query id or duplicate candidate id within a
                # batch masks every occurrence, matching the old np.isin
                # semantics (r12 ADVICE — a single-position scatter left
                # the other occurrences unmasked). Unique ids (the normal
                # case) expand 1×1, so this costs the same as before.
                c_ord = np.argsort(c_ids)
                c_srt = c_ids[c_ord]
                clo = np.searchsorted(c_srt, ex_c, side="left")
                chi = np.searchsorted(c_srt, ex_c, side="right")
                q_ord = np.argsort(q_ids)
                q_srt = q_ids[q_ord]
                qlo = np.searchsorted(q_srt, ex_q, side="left")
                qhi = np.searchsorted(q_srt, ex_q, side="right")
                hit = (chi > clo) & (qhi > qlo)
                ccnt = (chi - clo)[hit]
                qcnt = (qhi - qlo)[hit]
                reps = ccnt * qcnt
                if reps.size:
                    within = (np.arange(reps.sum())
                              - np.repeat(np.cumsum(reps) - reps, reps))
                    qrep = np.repeat(qcnt, reps)
                    rows = c_ord[np.repeat(clo[hit], reps) + within // qrep]
                    cols = q_ord[np.repeat(qlo[hit], reps) + within % qrep]
                    sims[rows, cols] = -np.inf
            B = sims.shape[0]
            take = min(k, B)
            # one C-side partition for ALL queries; per query only the
            # boundary-exact candidate set (rows with score ≥ the take-th
            # best — includes every tie at the boundary, so the final
            # (-score, cand) lexsort over it is EXACTLY the old order)
            part = np.argpartition(-sims, take - 1, axis=0)[:take]
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                boundary = col[part[:, j]].min()
                if boundary == -np.inf:      # < take finite candidates
                    cset = np.nonzero(col > -np.inf)[0]
                    if cset.size == 0:
                        continue
                else:
                    cset = np.nonzero(col >= boundary)[0]
                order = np.lexsort((c_ids[cset], -col[cset]))[:take]
                sel = cset[order]
                out_q.extend([qid] * sel.size)
                out_c.extend(c_ids[sel].tolist())
                out_s.extend(col[sel].tolist())
            yield pd.DataFrame({"qid": out_q, "cand": out_c, "score": out_s})

    local = corpus.select(id_col, vec_col).mapInPandas(
        local_topk, schema="qid long, cand long, score double"
    )
    return topk_per_query(local, k).select("qid", "cand", "score", "rank")


def with_lsh_bucket(corpus: DataFrame, vec_col: str = "embedding",
                    n_bits: int = 8, out_col: str = "bucket",
                    offset: int = 0) -> DataFrame:
    """Attach a random-hyperplane LSH bucket id (one hash table).

    At scale, write the corpus partitioned/bucketed by this column so
    candidate generation is a co-located join (SURVEY §4 physical notes).
    """
    return corpus.withColumn(
        out_col, hyperplane_bits(as_double_sql(vec_col), n_bits, offset))


def lsh_build_index(corpus: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_bits: int = 8,
                    n_tables: int = 4) -> DataFrame:
    """Corpus-side multi-table LSH index: (cand, c_vec, c_nrm, t, bucket).

    Index construction, separated from search exactly as the reference
    separates ChromaDB ingest (`Hybrid_Recom_vecdb.py:150-165`) from its
    timed queries: build once, persist (at 100 TB: write partitioned/
    bucketed by (t, bucket)), serve many queries against it via
    ``lsh_topk(..., index=...)``. The L2 norm is part of the index so the
    serve path's per-pair work is one dot + divide.
    """
    c = _spread(corpus.select(F.col(id_col).alias("cand"), F.col(vec_col).alias("c_raw"))
                .withColumn("c_vec", V.as_double(F.col("c_raw")))
                .withColumn("c_nrm", F.expr(_vnorm_sql("c_vec"))))
    tables = F.array(*[hyperplane_bits(as_double_sql("c_raw"), n_bits, offset=t * n_bits)
                       for t in range(n_tables)])
    # the index parameters ride as column metadata so a serve call with
    # mismatched n_bits/n_tables fails loudly instead of silently joining
    # near-empty candidate sets (ADVICE r2)
    return (c.select("cand", "c_vec", "c_nrm", F.posexplode(tables).alias("t", "bucket"))
            .withMetadata("bucket", {"lsh.n_bits": n_bits, "lsh.n_tables": n_tables}))


def _check_index_params(index: DataFrame, n_bits: int, n_tables: int) -> None:
    """Fail loudly when a prebuilt LSH index disagrees with the query-side
    bucket parameters (a mismatch yields silently near-empty candidates)."""
    meta = index.schema["bucket"].metadata or {}
    if "lsh.n_bits" not in meta:
        return  # hand-built index without metadata: caller's responsibility
    if int(meta["lsh.n_bits"]) != n_bits or int(meta["lsh.n_tables"]) != n_tables:
        raise ValueError(
            f"LSH index built with n_bits={meta['lsh.n_bits']}, "
            f"n_tables={meta['lsh.n_tables']} but queried with "
            f"n_bits={n_bits}, n_tables={n_tables}")


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_bits: int = 8, n_tables: int = 4,
             index: DataFrame | None = None,
             multiprobe: int = 0, dim: int | None = None) -> DataFrame:
    """Approximate cosine top-k: multi-table random-hyperplane LSH.

    A pair is a candidate if ANY of the ``n_tables`` independent b-bit
    tables buckets query and corpus row together (OR-amplification:
    recall = 1 − (1 − p^b)^L for per-plane agreement p). Candidates are
    deduped on (qid, cand) BEFORE scoring so each pair pays one cosine.

    Scale shape: ONE pass computes all L buckets per row, ``posexplode``
    emits (table, bucket) keys, and a single equi-join on that composite
    key generates candidates — candidate volume scales with bucket sizes
    × L, never |Q|·|corpus|, and the corpus is scanned/hashed once (not
    L times as a per-table join-branch design would).

    ``index``: a prebuilt ``lsh_build_index`` table (same n_bits/n_tables,
    verified against the column metadata it carries) — the serve path;
    when omitted the index is built inline.

    ``multiprobe=1`` additionally probes, per table, every bucket at
    Hamming distance 1 from the query's bucket (the classic multi-probe
    LSH recall amplifier, Lv et al. VLDB'07): the QUERY side fans out to
    n_tables·(1+n_bits) keys — the index, the join shape, and the corpus
    cost are unchanged, so recall rises steeply (measured 0.53 → ≳0.95 at
    sf0.1) for ~(1+n_bits)× more candidate pairs, still bucket-bounded and
    sublinear. The scale alternative — more tables — costs index size;
    multi-probe costs only query fan-out, the right trade when the index
    is the 100 TB artifact.

    ``dim``: embedding dimensionality when the caller knows it (e.g. from
    index metadata) — skips the ``_vec_dim`` probe job.
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    q = (queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("q_raw"))
         .withColumn("q_vec", V.as_double(F.col("q_raw")))
         .withColumn("q_nrm", F.expr(_vnorm_sql("q_vec"))))
    if index is not None:
        _check_index_params(index, n_bits, n_tables)
        c_keyed = index
    else:
        c_keyed = lsh_build_index(corpus, id_col, vec_col, n_bits, n_tables)

    q_tables = F.array(*[hyperplane_bits(as_double_sql("q_raw"), n_bits, offset=t * n_bits)
                         for t in range(n_tables)])
    q_keyed = q.select("qid", "q_vec", "q_nrm",
                       F.posexplode(q_tables).alias("t", "bucket"))
    if multiprobe:
        if multiprobe != 1:
            raise NotImplementedError("only Hamming-1 multi-probe is implemented")
        # bucket ids are '0'/'1' strings: the probe set is the bucket plus
        # each single-character flip — a pure string expression, identical
        # in the DuckDB oracle
        flips = F.array(F.col("bucket"), *[
            F.concat(
                F.substring("bucket", 1, j),
                F.when(F.substring("bucket", j + 1, 1) == "1",
                       F.lit("0")).otherwise(F.lit("1")),
                F.substring("bucket", j + 2, n_bits - j - 1),
            ) for j in range(n_bits)])
        q_keyed = q_keyed.withColumn("bucket", F.explode(flips))

    # Score BEFORE the dedup shuffle: the bucket join's output is map-side
    # partitioned (broadcast preserves the spread index side), so each
    # candidate pair pays its dot product where the vectors already are,
    # and only (qid, cand, score) — a few dozen bytes — ever shuffles.
    # The old shape deduped first, which shuffled two dim-length double
    # arrays per pair (~1 KB/row, the measured bottleneck). A pair that
    # collides in several tables is scored that many times (≤ n_tables,
    # map-side, embarrassingly parallel) — the classic shuffle-vs-
    # recompute trade at 100 TB where the shuffle is the scarce resource.
    # Score is a pure function of the pair, so dropDuplicates stays
    # value-deterministic. Hoisted norms + dim-unrolled dot = one
    # codegen'd multiply-add chain per pair, bit-identical to V.cosine
    # (same fold order; oracle-pinned).
    pair_dot = V.dot_expr("q_vec", "c_vec", dim) if dim else \
        V.dot(F.col("q_vec"), F.col("c_vec"))
    denom = F.col("q_nrm") * F.col("c_nrm")
    # ONE shuffle end-to-end: the explicit qid repartition feeds BOTH the
    # dedup aggregate (clustering (qid, cand) ⊇ qid → EnsureRequirements
    # elides its exchange; partial agg still combines map-side) and the
    # top-k window (clustering qid) — the old dedup-then-window shape paid
    # two back-to-back exchanges on ~the same rows. Explicit-N also opts
    # out of AQE bytes-based coalescing: post-score rows are tiny in bytes
    # but the window sort behind them should stay wide.
    parallelism = queries.sparkSession.sparkContext.defaultParallelism
    scored = (
        F.broadcast(q_keyed)
        .join(c_keyed, ["t", "bucket"])
        .filter(F.col("cand") != F.col("qid"))
        .withColumn("score",
                    fround(F.when(denom > 0, pair_dot / denom).otherwise(F.lit(0.0)),
                           ROUND_SCORE))
        .select("qid", "cand", "score")
        .repartition(parallelism, "qid")
        .dropDuplicates(["qid", "cand"])
    )
    return topk_per_query(scored, k).select("qid", "cand", "score", "rank")


def _assign_to_centroids(corpus: DataFrame, cent: DataFrame,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid (argmax cosine).

    ``cent``: (centroid_id, cent_vec: array<double>) — small, broadcast.
    Deterministic tiebreak: higher similarity first, then lower centroid id.
    """
    v = _spread(corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("raw_vec"),
        V.as_double(F.col(vec_col)).alias("vec"),
    ))
    scored = v.crossJoin(F.broadcast(cent)).withColumn(
        "csim", fround(V.cosine(F.col("vec"), F.col("cent_vec")), ROUND_SCORE)
    )
    # argmax via max_by, not a rank-1 window: the aggregate gets map-side
    # partial aggregation, so the shuffle carries one row per vector
    # instead of n_centroids rows per vector. The ordering struct
    # (csim, -centroid_id) reproduces the window's tiebreak exactly:
    # highest similarity first, then lowest centroid id.
    return (
        scored.groupBy("vid")
        .agg(F.max_by(
            F.struct("raw_vec", "centroid_id"),
            F.struct(F.col("csim"), (-F.col("centroid_id")).alias("neg_cid")),
        ).alias("best"))
        .select("vid",
                F.col("best.raw_vec").alias("raw_vec"),
                F.col("best.centroid_id").alias("centroid_id"))
    )


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid (argmax cosine)."""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"),
        V.as_double(F.col(vec_col)).alias("cent_vec"),
    )
    return _assign_to_centroids(corpus, c, id_col, vec_col)


def _dlit(x: float) -> str:
    """Exact double literal for a SQL fragment (repr round-trips IEEE-754)."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _cents_literal_sql(cents: list[tuple[int, list[float]]]) -> str:
    """The codebook as ONE literal array<struct<cid,cv,nrm>> SQL fragment.

    Catalyst constant-folds the whole array (including each center's
    ``sqrt(v·v)`` norm, summed in the same left-to-right order as the
    oracle's ``list_inner_product``) into a single Literal at plan time —
    the generated code references one constant instead of inlining
    n_centroids·dim CASTs, which Janino refuses to compile (measured:
    60 InternalCompilerExceptions → interpreted fallback with the
    fully-unrolled form at 16×64).
    """
    elems = []
    for cid, cv in cents:
        arr = ", ".join(_dlit(x) for x in cv)
        sq = " + ".join(f"{_dlit(x)} * {_dlit(x)}" for x in cv)
        elems.append(f"named_struct('cid', CAST({cid} AS BIGINT), "
                     f"'cv', array({arr}), 'nrm', sqrt({sq}))")
    return f"array({', '.join(elems)})"


def _cos_vs_c_sql(vec_col: str = "vec", norm_col: str = "vnorm",
                  digits: int = ROUND_SCORE) -> str:
    """Rounded cosine of ``vec_col`` vs lambda-var ``c`` (a codebook entry).

    The same zip_with/aggregate left fold with 0.0 seed as ``vector.dot``
    — bit-identical to the oracle-green HOF scoring path. ``norm_col``
    must hold sqrt(v·v) of ``vec_col``.
    """
    s = float(10 ** digits)
    dot = (f"aggregate(zip_with({vec_col}, c.cv, (a, b) -> a * b), "
           f"CAST(0.0 AS DOUBLE), (acc, y) -> acc + y)")
    cos = (f"(CASE WHEN ({norm_col} * c.nrm) > CAST(0.0 AS DOUBLE) "
           f"THEN ({dot}) / ({norm_col} * c.nrm) ELSE CAST(0.0 AS DOUBLE) END)")
    # divide as DOUBLE/DOUBLE: a bare `1000000000.0` literal parses as
    # DECIMAL(11,1) in Spark SQL, and BIGINT(floor)/DECIMAL yields
    # DECIMAL(30,9) — which surfaced as a decimal `csim` output column
    # (an engine dtype the driver's strict hash would reject vs the
    # oracle's DOUBLE). Same values, IEEE division like fround().
    return (f"CAST(floor(({cos}) * {s!r} + 0.5) AS DOUBLE) "
            f"/ CAST({s!r} AS DOUBLE)")


def _vnorm_sql(vec_col: str = "vec") -> str:
    """sqrt(v·v) with the same HOF fold as ``vector.l2_norm``."""
    return (f"sqrt(aggregate(zip_with({vec_col}, {vec_col}, (a, b) -> a * b), "
            f"CAST(0.0 AS DOUBLE), (acc, y) -> acc + y))")


def _argmax_centroid_sql(cents: list[tuple[int, list[float]]],
                         vec_col: str = "vec", norm_col: str = "vnorm") -> str:
    """Map-side nearest-centroid id: max csim, ties → lower centroid id.

    ``array_max`` over (csim, -cid) structs is lexicographic, reproducing
    the (csim DESC, cid ASC) window tiebreak with zero shuffle. fround
    never emits -0.0, so struct double ordering has no ±0 pitfall.
    """
    lit = _cents_literal_sql(cents)
    cf = _cos_vs_c_sql(vec_col, norm_col)
    return (f"CAST(-(array_max(transform({lit}, "
            f"c -> named_struct('s', {cf}, 'n', -c.cid))).n) AS BIGINT)")


def _probe_centroids_sql(cents: list[tuple[int, list[float]]], nprobe: int,
                         vec_col: str = "vec", norm_col: str = "vnorm") -> str:
    """Map-side top-``nprobe`` centroid ids as an array (csim DESC, cid ASC)."""
    lit = _cents_literal_sql(cents)
    cf = _cos_vs_c_sql(vec_col, norm_col)
    return (f"transform(slice(array_sort(transform({lit}, "
            f"c -> named_struct('k', -({cf}), 'cid', c.cid))), 1, {nprobe}), "
            f"x -> x.cid)")


def kmeans_centroids_local(corpus: DataFrame, n_centroids: int = 16,
                           n_iters: int = 2, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Deterministic spherical k-means codebook, driver-resident.

    Init = the vectors of the ``n_centroids`` smallest ids (seeded,
    engine-agnostic); each Lloyd iteration assigns by argmax cosine
    (ties → lower centroid id) and recomputes every centroid as the
    per-component mean of its assigned vectors, rounded to 6 decimals so
    both engines agree despite summation-order differences; empty clusters
    keep their previous centroid.

    Scale shape — the codebook is n_centroids·dim doubles, KB-sized *by
    definition*, so it lives on the driver and each Lloyd round embeds the
    centers as literals in a map-side argmax expression (MLlib KMeans'
    broadcast-centers pattern): assignment costs ZERO shuffles, and the
    only distributed work per round is one partial-aggregated component
    mean (posexplode → groupBy(cid, pos)) whose result — n_centroids·dim
    rows — is the only thing ever collected. The r2-initial formulation
    kept the codebook as a DataFrame: its lineage (a corpus scan per
    round, referenced twice per round and twice downstream) re-executed at
    every use — a measured 5× ivf_topk regression. At 100 TB: train on a
    sample, persist the codebook as a table, load it into this literal
    form (VERDICT r1 #8).
    """
    init = (corpus.filter(F.col(id_col) < n_centroids)
            .select(F.col(id_col).cast("long").alias("cid"),
                    V.as_double(F.col(vec_col)).alias("cv"))
            .collect())  # bounded: n_centroids rows
    cents = sorted((r.cid, list(r.cv)) for r in init)
    if not cents:
        return []
    dim = len(cents[0][1])
    vecs = corpus.select(V.as_double(F.col(vec_col)).alias("vec"))
    for _ in range(n_iters):
        assigned = (
            vecs.withColumn("vnorm", F.expr(_vnorm_sql("vec")))
            .withColumn("centroid_id", F.expr(_argmax_centroid_sql(cents)))
        )
        rows = (
            assigned.select("centroid_id", F.posexplode("vec").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(fround(F.avg("x"), ROUND_SCORE).alias("m"))
            .collect())  # bounded: n_centroids × dim rows
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r.centroid_id, {})[r.pos] = r.m
        cents = [
            (cid, [by_cid[cid][p] for p in range(dim)] if cid in by_cid else old)
            for cid, old in cents
        ]
    return cents


def kmeans_centroids(corpus: DataFrame, n_centroids: int = 16,
                     n_iters: int = 2, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """``kmeans_centroids_local`` as a (centroid_id, cent_vec) DataFrame."""
    spark = corpus.sparkSession
    cents = kmeans_centroids_local(corpus, n_centroids, n_iters, id_col, vec_col)
    return spark.createDataFrame(
        [(cid, cv) for cid, cv in cents],
        "centroid_id bigint, cent_vec array<double>")


def ivf_build_lists(corpus: DataFrame, cents: list[tuple[int, list[float]]],
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVF inverted-list index: (vid, c_vec, c_nrm, centroid_id).

    Index construction — one map-side pass (literal-centroid argmax, no
    shuffle) that also precomputes each vector's L2 norm so the serve
    path's per-pair work is a single dot + divide. At 100 TB: persist
    this partitioned by ``centroid_id`` (partition pruning turns a query
    into an ``nprobe``-list scan); here callers persist() and reuse.
    """
    return (
        _spread(corpus.select(F.col(id_col).alias("vid"),
                              F.col(vec_col).alias("raw_vec")))
        .withColumn("c_vec", V.as_double(F.col("raw_vec")))
        .withColumn("c_nrm", F.expr(_vnorm_sql("c_vec")))
        .withColumn("centroid_id",
                    F.expr(_argmax_centroid_sql(cents, "c_vec", "c_nrm")))
        .select("vid", "c_vec", "c_nrm", "centroid_id")
    )


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int, n_centroids: int = 16,
             nprobe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
             kmeans_iters: int = 2,
             centroids: list[tuple[int, list[float]]] | None = None,
             lists: DataFrame | None = None,
             dim: int | None = None) -> DataFrame:
    """IVF-style approximate search with a deterministic k-means quantizer.

    The codebook is ``kmeans_centroids_local`` (seeded init = first ids,
    Lloyd iterations, cross-engine-deterministic means; ``kmeans_iters=0``
    uses the raw first-N-ids vectors). Both the corpus inverted-list
    assignment and the query probe selection are map-side literal-centroid
    expressions — no shuffle, no crossJoin; the search itself is one
    broadcast join (queries × their probed lists) plus the top-k window.
    At 100 TB the inverted-list key is the table's partition column →
    partition pruning turns each query into a few-list scan.

    ``centroids``: a pretrained codebook (``kmeans_centroids_local``
    output). Index construction and search are separate phases in every
    IVF system (the reference builds its ChromaDB/HNSW index once at
    ingest, `Hybrid_Recom_vecdb.py:150-165`, and its published timings
    are query-only) — callers that query the same corpus repeatedly
    should train once and pass it in.
    """
    if centroids is not None:
        cents = centroids
    else:
        iters = kmeans_iters if kmeans_iters > 0 else 0
        cents = kmeans_centroids_local(corpus, n_centroids, iters, id_col, vec_col)
    if not cents:
        return queries.sparkSession.createDataFrame(
            [], "qid long, cand long, score double, rank int")
    if lists is None:
        lists = ivf_build_lists(corpus, cents, id_col, vec_col)
    if dim is None:
        # the codebook IS the dim authority when supplied — no probe job
        dim = len(cents[0][1]) if cents else _vec_dim(corpus, vec_col)
    probes = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("q_raw"))
        .withColumn("vec", V.as_double(F.col("q_raw")))
        .withColumn("vnorm", F.expr(_vnorm_sql("vec")))
        .withColumn("centroid_id",
                    F.explode(F.expr(_probe_centroids_sql(cents, nprobe))))
        .select("qid", F.col("vec").alias("q_vec"),
                F.col("vnorm").alias("q_nrm"), "centroid_id")
    )
    # Hoisted-norm scoring (the _scored_pairs discipline): both sides
    # carry their sqrt(v·v) — the index stores it, probes compute it once
    # per query — so the per-pair expression is one dim-unrolled dot +
    # divide. Same ops in the same fold order as V.cosine → bit-identical
    # scores (the oracle pins this), but codegen'd instead of 3 interpreted
    # HOF folds per candidate pair.
    pair_dot = V.dot_expr("q_vec", "c_vec", dim) if dim else \
        V.dot(F.col("q_vec"), F.col("c_vec"))
    denom = F.col("q_nrm") * F.col("c_nrm")
    scored = (
        F.broadcast(probes)
        .join(lists, "centroid_id")
        .filter(F.col("vid") != F.col("qid"))
        .withColumn("score",
                    fround(F.when(denom > 0, pair_dot / denom).otherwise(F.lit(0.0)),
                           ROUND_SCORE))
        .withColumnRenamed("vid", "cand")
    )
    return topk_per_query(scored, k).select("qid", "cand", "score", "rank")


def hnsw_topk(queries: DataFrame, corpus: DataFrame, k: int,
              id_col: str = "vec_id", vec_col: str = "embedding",
              m: int = 16, ef_construction: int = 200, ef_search: int = 64,
              index_factory=None) -> DataFrame:
    """Approximate cosine top-k via per-partition HNSW graphs (hnswlib).

    The reference's index IS hnswlib-backed ChromaDB
    (``Hybrid_Recom_vecdb.py:157`` ``{"hnsw:space": "cosine"}``); this is
    SURVEY §4 option (c): each corpus partition builds an in-memory HNSW
    graph over its own vectors inside ``mapInPandas`` and answers the
    broadcast query matrix locally, then the exact global top-k is a
    small window over ≤ partitions·|Q|·k rows — the same
    local-top-k/global-merge shape as ``cosine_topk_gemm``, so shuffle
    volume is independent of corpus size. Per-query work is
    O(partitions · log n_part) instead of a full scan; at 100 TB the
    partition graphs would be built once and persisted alongside the
    parquet (index/serve split), exactly like the LSH/IVF indexes.

    hnswlib is optional (not in this container): gated behind an
    import-try like PIL/sentence-transformers; ``index_factory`` injects
    a compatible fake for tests (``(dim) -> obj`` with ``add_items``,
    ``knn_query``). Scores are 1 − cosine-distance, rounded with the
    repo-wide fround convention, ties broken by candidate id — NOTE:
    HNSW is graph-approximate, so unlike the LSH/IVF paths its recall is
    not engine-reproducible and this operator carries no DuckDB oracle
    (rows-only check); the recall gate lives with the library-backed
    deployment.
    """
    if index_factory is None:
        try:
            import hnswlib  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "hnswlib not installed in this environment; use lsh_topk "
                "with multiprobe=1 (recall@10 >= 0.9) or cosine_topk_gemm"
            ) from e

        def index_factory(dim: int):
            import hnswlib as _h
            idx = _h.Index(space="cosine", dim=dim)
            # max_elements is resized per batch by the caller below
            idx.init_index(max_elements=1, ef_construction=ef_construction, M=m)
            idx.set_ef(ef_search)
            return idx

    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "qid long, cand long, score double, rank int")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float32)

    def local_topk(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float32)
            idx = index_factory(c_mat.shape[1])
            if hasattr(idx, "resize_index"):
                idx.resize_index(len(c_ids))
            idx.add_items(c_mat, c_ids)
            # k+1 then drop self: a query vector present in this partition
            # returns itself as its own nearest neighbor (B4 exclusion)
            kk = min(k + 1, len(c_ids))
            labels, dists = idx.knn_query(q_mat, k=kk)
            scale = 10.0 ** ROUND_SCORE
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                for lab, dist in zip(labels[j], dists[j]):
                    if int(lab) == int(qid):
                        continue
                    score = np.floor((1.0 - float(dist)) * scale + 0.5) / scale
                    out_q.append(int(qid)); out_c.append(int(lab)); out_s.append(score)
            yield pd.DataFrame({"qid": out_q, "cand": out_c, "score": out_s})

    local = corpus.select(id_col, vec_col).mapInPandas(
        local_topk, schema="qid long, cand long, score double")
    return topk_per_query(local, k).select("qid", "cand", "score", "rank")


def embedding_neardup_pairs(corpus: DataFrame, threshold: float = 0.9,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            n_bits: int = 4, n_salts: int = 32,
                            dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking.

    Self-join within LSH buckets (id1 < id2 halves the pair space), keep
    cosine ≥ threshold. The join is **salted**: the bucket key alone has
    only 2^n_bits values, so one side is sliced by ``id % n_salts`` and
    the other replicated across salts — join-key cardinality becomes
    2^n_bits · n_salts and the per-pair cosine runs at full parallelism
    straight out of the join, no second shuffle of the pair stream. The
    replication cost is n_salts copies of (id, vector) on one side —
    cheap relative to the pair volume it spreads.
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    spark = corpus.sparkSession
    # cast to double AND take the L2 norm BEFORE the pair join: per-row
    # cost, not per-pair cost. The per-pair expression is then one dot +
    # divide — 3× less work than a full cosine, and small enough to stay
    # inside whole-stage codegen (3 unrolled 64-dim dots in the join's
    # consume path overflows the JVM's 64KB method limit and falls back
    # to interpreted eval). sqrt(dot(v,v)) * sqrt(dot(w,w)) hoisted
    # per-row is the same ops in the same order → bitwise-identical to
    # the inline cosine and to the oracle.
    b = with_lsh_bucket(corpus.select(id_col, vec_col), vec_col, n_bits) \
        .withColumn("_vd", V.as_double(F.col(vec_col))) \
        .withColumn("_nrm", V.l2_norm(F.col("_vd")))
    left = b.select(F.col(id_col).alias("id1"), F.col("_vd").alias("v1"),
                    F.col("_nrm").alias("n1"), "bucket",
                    F.pmod(F.col(id_col), F.lit(n_salts)).alias("salt"))
    right = (
        b.select(F.col(id_col).alias("id2"), F.col("_vd").alias("v2"),
                 F.col("_nrm").alias("n2"), "bucket")
        .crossJoin(spark.range(n_salts).select(F.col("id").cast("bigint").alias("salt")))
    )
    # Explicit-N repartition on the join keys: AQE would coalesce the
    # join's shuffle by BYTES (a few MB of vectors → 1 task) while the
    # within-bucket pair generation + cosine is the CPU hot spot; the
    # explicit repartition keeps the join stage at full parallelism.
    parallelism = spark.sparkContext.defaultParallelism
    pairs = (
        left.repartition(parallelism, "bucket", "salt")
        .join(right.repartition(parallelism, "bucket", "salt"), ["bucket", "salt"])
        .filter(F.col("id1") < F.col("id2"))
    )
    pair_dot = V.dot_expr("v1", "v2", dim) if dim else \
        V.dot(F.col("v1"), F.col("v2"))
    denom = F.col("n1") * F.col("n2")
    cos = F.when(denom > 0, pair_dot / denom).otherwise(F.lit(0.0))
    return (
        pairs
        .withColumn("score", fround(cos, ROUND_SCORE))
        .filter(F.col("score") >= threshold)
        .select("id1", "id2", "score")
    )


def cluster_centroids(assigned: DataFrame, cluster_col: str = "cluster_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Per-cluster mean vector (long format: cluster_id, pos, val, n_vectors).

    The Spark-first vector aggregation: ``posexplode`` the arrays and hash-
    aggregate on (cluster, pos) — partial aggregation combines map-side, so
    the shuffle carries one partial sum per (cluster, pos) per partition,
    never raw vectors. Long output keeps the result order-insensitively
    hashable by the oracle (same convention as ``hash_embeddings``).
    Pairs with IVF maintenance: recomputing codebook centroids from the
    current inverted lists is exactly this aggregate.
    """
    exploded = assigned.select(
        F.col(cluster_col).alias("cluster_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    # each vector contributes exactly one value per position (the same
    # full-dim assumption avg makes), so count(1) inside the (cluster,
    # pos) aggregate IS n_vectors — no second scan, no join
    return (
        exploded.groupBy("cluster_id", "pos")
        .agg(fround(F.avg(F.col("val").cast("double")), ROUND_SCORE).alias("val"),
             F.count(F.lit(1)).alias("n_vectors"))
        .select("cluster_id", F.col("pos").cast("int").alias("pos"), "val", "n_vectors")
    )


# ---------------------------------------------------------------------------
# Scalar quantization (int8 embedding compression + asymmetric search)
# ---------------------------------------------------------------------------

def quantization_params(corpus: DataFrame, vec_col: str = "embedding",
                        dim: int | None = None) -> list:
    """Per-dimension (pos, min, max) — the scalar-quantization codebook.

    One posexplode + partial-agg pass over the corpus; the collect is
    bounded at ``dim`` rows (the same driver-resident-codebook pattern as
    ``kmeans_centroids_local`` — KBs, independent of corpus size). Train
    once per corpus, reuse across quantize/search calls.
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    px = corpus.select(F.posexplode(V.as_double(F.col(vec_col))).alias("pos", "x"))
    rows = px.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx")).collect()
    d = {r["pos"]: (float(r["mn"]), float(r["mx"])) for r in rows}
    return [(i, d[i][0], d[i][1]) for i in range(dim)]


def _param_arrays(params: list):
    mn_arr = F.array(*[F.lit(mn) for _, mn, _ in params])
    mx_arr = F.array(*[F.lit(mx) for _, _, mx in params])
    return mn_arr, mx_arr


def scalar_quantize(corpus: DataFrame, params: list, n_levels: int = 256,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Quantize vectors to integer codes (default 256 levels = int8 range).

    code_i = floor((x_i − mn_i) / (mx_i − mn_i) · (L−1) + 0.5); degenerate
    dimensions (mx == mn) code to 0. Map-only (zero exchanges): the
    per-dimension codebook rides as two literal arrays inside a single
    ``transform``. At 100 TB the win is the storage/serve layer — codes
    are 4× smaller than float32 on disk and in shuffle/broadcast, the
    standard vector-DB index-compression trade (reconstruction error
    bounded by step/2 per dimension; recall floor pinned by test).
    """
    L = n_levels - 1
    mn_arr, mx_arr = _param_arrays(params)
    x = V.as_double(F.col(vec_col))
    # clamp to [0, L]: params are train-once artifacts, so vectors appended
    # after training may fall outside the trained [mn, mx] range — without
    # the clamp those rows silently extrapolate past the int8 range and
    # void the step/2 reconstruction bound (ADVICE r5)
    codes = F.transform(x, lambda v, i: F.when(
        F.element_at(mx_arr, i + 1) > F.element_at(mn_arr, i + 1),
        F.greatest(F.lit(0), F.least(F.lit(L).cast("bigint"),
            F.floor((v - F.element_at(mn_arr, i + 1))
                    / (F.element_at(mx_arr, i + 1) - F.element_at(mn_arr, i + 1))
                    * F.lit(L) + F.lit(0.5))))
    ).otherwise(F.lit(0)).cast("int"))
    return corpus.select(F.col(id_col), codes.alias("codes"))


def dequantize(codes_df: DataFrame, params: list, n_levels: int = 256,
               id_col: str = "vec_id", codes_col: str = "codes",
               out_col: str = "embedding") -> DataFrame:
    """Reconstruct double vectors from codes: x̂_i = mn_i + c_i·(mx_i−mn_i)/(L−1).

    Map-only; the exact expression association is mirrored in the DuckDB
    oracle so reconstructed values are bit-identical across engines.
    """
    L = float(n_levels - 1)
    mn_arr, mx_arr = _param_arrays(params)
    deq = F.transform(F.col(codes_col), lambda c, i:
                      F.element_at(mn_arr, i + 1)
                      + c.cast("double")
                      * (F.element_at(mx_arr, i + 1) - F.element_at(mn_arr, i + 1))
                      / F.lit(L))
    return codes_df.select(F.col(id_col), deq.alias(out_col))


def quantized_topk(queries: DataFrame, corpus: DataFrame, k: int,
                   n_levels: int = 256, params: list | None = None,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   dim: int | None = None) -> DataFrame:
    """Asymmetric quantized cosine top-k (ADC-style): full-precision
    queries scored against the int8-reconstructed corpus.

    The serving shape when the float corpus doesn't fit the serving tier:
    store/scan 4×-smaller codes, reconstruct in-plan (map-only transform,
    fused into the scoring stage), rank exactly as ``cosine_topk`` with
    the same pinned tiebreaks. Quantize+search here is one plan — at
    scale, persist ``scalar_quantize`` output once and serve from it.
    """
    if params is None:
        params = quantization_params(corpus, vec_col, dim)
    codes = scalar_quantize(corpus, params, n_levels, id_col, vec_col)
    recon = dequantize(codes, params, n_levels, id_col)
    return cosine_topk(queries, recon, k, id_col, "embedding",
                       dim=dim or len(params))


# ---------------------------------------------------------------------------
# Product quantization (per-subspace codebooks, ADC search)
# ---------------------------------------------------------------------------

def pq_train(corpus: DataFrame, m: int = 8, n_centroids: int = 64,
             n_iters: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int | None = None) -> list:
    """Train PQ codebooks: one spherical k-means per length-(dim/m) subspace.

    Returns ``m`` codebooks (each ``kmeans_centroids_local``-shaped:
    sorted (cid, subvector) lists) — driver-resident (m·k·(dim/m)
    doubles, KBs), the same train-once/literal-serve split as the IVF
    codebook. At 100 TB: train on a sample, persist, reload.

    FUSED training: the m subspace trainings are independent, so each
    Lloyd round runs as ONE corpus pass — all m assignments as sibling
    constant-folded argmax expressions, then a single
    explode(m structs) → posexplode → partial-agg mean keyed by
    (subspace, centroid, pos). Row volume into the aggregate is m·(dim/m)
    = dim per vector, identical to ONE full-dim k-means round — the naive
    per-subspace loop pays m× the corpus scans for the same math
    (equivalence pinned by ``test_pq_train_fused_equals_per_subspace``).
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    assert dim % m == 0, "dim must divide into m subspaces"
    sub = dim // m
    init = (corpus.filter(F.col(id_col) < n_centroids)
            .select(F.col(id_col).cast("long").alias("cid"),
                    V.as_double(F.col(vec_col)).alias("cv"))
            .collect())  # bounded: n_centroids rows
    full = sorted((r.cid, list(r.cv)) for r in init)
    if not full:
        return []
    books = [[(cid, cv[s * sub:(s + 1) * sub]) for cid, cv in full]
             for s in range(m)]
    vecs = corpus.select(V.as_double(F.col(vec_col)).alias("__v"))
    for _ in range(n_iters):
        df = vecs
        for s in range(m):
            df = df.withColumn(f"__v{s}", F.slice(F.col("__v"), s * sub + 1, sub))
            df = df.withColumn(f"__n{s}", F.expr(_vnorm_sql(f"__v{s}")))
            df = df.withColumn(f"__c{s}", F.expr(_argmax_centroid_sql(
                books[s], f"__v{s}", f"__n{s}")))
        exploded = df.select(F.explode(F.array(*[
            F.struct(F.lit(s).alias("s"), F.col(f"__c{s}").alias("cid"),
                     F.col(f"__v{s}").alias("sv"))
            for s in range(m)])).alias("e")
        ).select("e.s", "e.cid", F.posexplode("e.sv").alias("pos", "x"))
        rows = (exploded.groupBy("s", "cid", "pos")
                .agg(fround(F.avg("x"), ROUND_SCORE).alias("m"))
                .collect())  # bounded: m × n_centroids × sub = dim·k rows
        by_key: dict[tuple, dict[int, float]] = {}
        for r in rows:
            by_key.setdefault((r.s, r.cid), {})[r.pos] = r.m
        books = [
            [(cid, [by_key[(s, cid)][p] for p in range(sub)]
              if (s, cid) in by_key else old)
             for cid, old in books[s]]
            for s in range(m)
        ]
    return books


def _argmax_centroid_cv_sql(cents: list, vec_col: str, norm_col: str) -> str:
    """Map-side nearest-centroid VECTOR (max rounded csim, ties → lower
    centroid id) — the decode half of PQ fused into the encode argmax."""
    lit = _cents_literal_sql(cents)
    cf = _cos_vs_c_sql(vec_col, norm_col)
    return (f"(array_max(transform({lit}, "
            f"c -> named_struct('s', {cf}, 'n', -c.cid, 'cv', c.cv)))).cv")


def pq_reconstruct(corpus: DataFrame, codebooks: list,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """PQ encode+decode in one map-only projection: each subvector is
    replaced by its nearest codeword (argmax rounded cosine, ties → lower
    centroid id), codewords concatenated back to a full vector.

    Zero shuffles; every codebook rides as a constant-folded literal
    (the Janino-safe pattern of ``_cents_literal_sql``). Storage story:
    persisting the m code ids instead of the floats is dim·4 / m bytes →
    32× smaller at dim=64, m=8, k≤256; the reconstruct expression is the
    serve-time decoder over that layout.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0][1])
    df = corpus.select(F.col(id_col), V.as_double(F.col(vec_col)).alias("__v"))
    parts = []
    for s in range(m):
        df = df.withColumn(f"__v{s}", F.slice(F.col("__v"), s * sub + 1, sub))
        df = df.withColumn(f"__n{s}", F.expr(_vnorm_sql(f"__v{s}")))
        parts.append(F.expr(_argmax_centroid_cv_sql(
            codebooks[s], f"__v{s}", f"__n{s}")))
    return df.select(F.col(id_col), F.concat(*parts).alias(vec_col))


def pq_topk(queries: DataFrame, corpus: DataFrame, k: int,
            codebooks: list | None = None, m: int = 8, n_centroids: int = 64,
            id_col: str = "vec_id", vec_col: str = "embedding",
            dim: int | None = None) -> DataFrame:
    """Asymmetric PQ cosine top-k: full-precision queries scored against
    the PQ-reconstructed corpus — exact ranking over the compressed
    representation, same pinned tiebreaks as ``cosine_topk``.

    Default codebook size is 64/subspace (6 bits) — a measured recall
    compromise for this container's oracle-replicable training budget;
    the industry standard at scale is 256/subspace (8 bits = 1 byte per
    code). Uniform random vectors are PQ's worst case (cosine gaps
    smaller than quantization error): measured recall@10 on the uniform
    testdata is 0.30-0.41 at k=64, while on clustered data (the actual
    ANN-serving regime, see ``test_pq_recall_floor_clustered``) the same
    defaults measure 0.75 with a pinned ≥0.7 floor — the residual loss is
    within-cluster fine ranking, which production PQ recovers with an
    exact re-rank of the ADC shortlist. The gated ``ann_recall`` metric
    carries the honest uniform-data row."""
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    if codebooks is None:
        codebooks = pq_train(corpus, m, n_centroids, id_col=id_col,
                             vec_col=vec_col, dim=dim)
    recon = pq_reconstruct(corpus, codebooks, id_col, vec_col)
    return cosine_topk(queries, recon, k, id_col, vec_col, dim=dim)


def pq_encode(corpus: DataFrame, codebooks: list, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode vectors to their m PQ code ids — the persisted index layout.

    (id, pq_codes array<smallint>): one nearest-codeword id per subspace
    (argmax rounded cosine, ties → lower centroid id — the SAME argmax as
    ``pq_reconstruct``, so decode(encode(v)) ≡ reconstruct(v) exactly).
    Map-only, zero shuffles; each codebook rides as a constant-folded
    literal. This is where PQ's storage win is realized: m small ints
    per vector instead of dim floats — dim·4 / m bytes ≈ 32× smaller at
    dim=64, m=8 (measured on-disk ratio in SCALE.md), which is the tier
    that lets a 100 TB float corpus serve from ~3 TB of codes.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0][1])
    df = corpus.select(F.col(id_col), V.as_double(F.col(vec_col)).alias("__v"))
    codes = []
    for s in range(m):
        df = df.withColumn(f"__v{s}", F.slice(F.col("__v"), s * sub + 1, sub))
        df = df.withColumn(f"__n{s}", F.expr(_vnorm_sql(f"__v{s}")))
        codes.append(F.expr(_argmax_centroid_sql(
            codebooks[s], f"__v{s}", f"__n{s}")).cast("smallint"))
    return df.select(F.col(id_col), F.array(*codes).alias("pq_codes"))


def _codeword_map_sql(cents: list, code_expr: str) -> str:
    """Constant-folded cid → codeword lookup: element_at over a literal
    map (same Janino-safe one-Literal pattern as ``_cents_literal_sql``)."""
    keys = ", ".join(f"CAST({cid} AS INT)" for cid, _ in cents)
    vals = ", ".join(
        "array(" + ", ".join(_dlit(x) for x in cv) + ")" for _, cv in cents)
    return (f"element_at(map_from_arrays(array({keys}), array({vals})), "
            f"CAST({code_expr} AS INT))")


def pq_decode(codes_df: DataFrame, codebooks: list, id_col: str = "vec_id",
              codes_col: str = "pq_codes",
              out_col: str = "embedding") -> DataFrame:
    """Serve-time decoder over the persisted code layout: each code id maps
    to its codeword through a constant-folded literal map, codewords
    concatenated back to a full vector. Map-only — the float corpus is
    never touched (that's the point: at scale it may not even be mounted
    on the serving tier)."""
    m = len(codebooks)
    parts = [F.expr(_codeword_map_sql(
        codebooks[s], f"element_at({codes_col}, {s + 1})"))
        for s in range(m)]
    return codes_df.select(F.col(id_col), F.concat(*parts).alias(out_col))


def pq_topk_from_codes(queries: DataFrame, codes_df: DataFrame,
                       codebooks: list, k: int, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       codes_col: str = "pq_codes") -> DataFrame:
    """ADC search over a persisted PQ index (``pipeline.write_pq_index``):
    decode the code table in-plan and rank exactly as ``cosine_topk``.
    Hash-identical to the inline ``pq_topk`` on the same codebooks (the
    encode and reconstruct argmaxes share one tiebreak) — pinned by
    ``test_pq_index_roundtrip_serves_identically``."""
    sub = len(codebooks[0][0][1])
    recon = pq_decode(codes_df, codebooks, id_col, codes_col, vec_col)
    return cosine_topk(queries, recon, k, id_col, vec_col,
                       dim=len(codebooks) * sub)

# ---------------------------------------------------------------------------
# IVF-PQ (coarse quantizer + product-quantized residuals — the FAISS
# IndexIVFPQ layout, the standard billion-scale ANN index)
# ---------------------------------------------------------------------------

def _argmax_centroid_pick_sql(cents: list, vec_col: str, norm_col: str) -> str:
    """Map-side nearest-centroid pick returning BOTH the id and the
    centroid vector in one constant-folded argmax (max rounded csim,
    ties → lower centroid id — the shared codebook tiebreak)."""
    lit = _cents_literal_sql(cents)
    cf = _cos_vs_c_sql(vec_col, norm_col)
    return (f"array_max(transform({lit}, "
            f"c -> named_struct('s', {cf}, 'n', -c.cid, 'cv', c.cv)))")


def ivf_residuals(corpus: DataFrame, cents: list,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Residual vectors v − nearest-coarse-centroid(v): one map-side pass
    (literal-codebook argmax, zero shuffles). The residual distribution
    is what PQ actually quantizes in an IVF-PQ index — residual energy is
    a fraction of the full vectors', so the same codebook budget buys a
    much finer quantization (Jégou et al., PAMI 2011)."""
    df = (corpus.select(F.col(id_col), V.as_double(F.col(vec_col)).alias("__v"))
          .withColumn("__n", F.expr(_vnorm_sql("__v")))
          .withColumn("__pick", F.expr(_argmax_centroid_pick_sql(cents, "__v", "__n"))))
    return df.select(
        F.col(id_col),
        F.zip_with(F.col("__v"), F.col("__pick.cv"), lambda x, y: x - y).alias(vec_col))


def ivfpq_train(corpus: DataFrame, n_centroids: int = 16, m: int = 8,
                pq_centroids: int = 16, kmeans_iters: int = 2,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dim: int | None = None) -> tuple[list, list]:
    """(coarse centroids, residual PQ codebooks) — the two-level IVF-PQ
    codebook. Coarse = the deterministic spherical k-means shared with
    ``ivf_topk``; PQ = ``pq_train`` over the coarse residuals (one extra
    map-side pass per Lloyd round, no new shuffle shapes). Both books are
    driver-resident KBs; at 100 TB train on a sample and persist."""
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    cents = kmeans_centroids_local(corpus, n_centroids, kmeans_iters,
                                   id_col, vec_col)
    if not cents:
        return [], []
    resid = ivf_residuals(corpus, cents, id_col, vec_col)
    books = pq_train(resid, m, pq_centroids, id_col=id_col, vec_col=vec_col,
                     dim=dim)
    return cents, books


def ivfpq_build_lists(corpus: DataFrame, cents: list, books: list,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ inverted lists: (vid, c_vec, c_nrm, centroid_id) where
    ``c_vec`` is the two-level reconstruction coarse_centroid +
    decoded-residual — the EXACT table shape ``ivf_topk`` serves from, so
    the probe/score/topk tail is shared verbatim.

    One map-side pass, zero shuffles: coarse argmax pick (id + vector),
    residual subtract, per-subspace nearest-codeword decode (the
    ``pq_reconstruct`` argmax), element-wise add, hoisted norm. At 100 TB
    persist partitioned by ``centroid_id`` (partition pruning = nprobe-
    list scans) with the codes from ``pq_encode`` over the residuals as
    the compact storage tier."""
    m = len(books)
    sub = len(books[0][0][1])
    df = (_spread(corpus.select(F.col(id_col).alias("vid"),
                                V.as_double(F.col(vec_col)).alias("__v")))
          .withColumn("__n", F.expr(_vnorm_sql("__v")))
          .withColumn("__pick", F.expr(_argmax_centroid_pick_sql(cents, "__v", "__n")))
          .withColumn("centroid_id",
                      (-F.col("__pick.n")).cast("long"))
          .withColumn("__r", F.zip_with(F.col("__v"), F.col("__pick.cv"),
                                        lambda x, y: x - y)))
    parts = []
    for s in range(m):
        df = df.withColumn(f"__r{s}", F.slice(F.col("__r"), s * sub + 1, sub))
        df = df.withColumn(f"__rn{s}", F.expr(_vnorm_sql(f"__r{s}")))
        parts.append(F.expr(_argmax_centroid_cv_sql(books[s], f"__r{s}", f"__rn{s}")))
    df = df.withColumn("c_vec", F.zip_with(F.col("__pick.cv"), F.concat(*parts),
                                           lambda x, y: x + y))
    return (df.withColumn("c_nrm", F.expr(_vnorm_sql("c_vec")))
            .select("vid", "c_vec", "c_nrm", "centroid_id"))


def ivfpq_topk(queries: DataFrame, corpus: DataFrame | None, k: int,
               n_centroids: int = 16, m: int = 8, pq_centroids: int = 16,
               nprobe: int = 4, kmeans_iters: int = 2,
               cents: list | None = None, books: list | None = None,
               lists: DataFrame | None = None,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int | None = None) -> DataFrame:
    """IVF-PQ ADC search: full-precision queries vs the probed lists'
    two-level reconstructions — coarse pruning (nprobe of n_centroids
    lists scanned) AND ~32× compressed storage, composed from the
    measured ``ivf_topk`` serve tail. Train-once callers pass
    ``cents``/``books`` (and optionally a persisted ``lists``);
    serve-from-index callers (``pipeline.load_ivfpq_index`` +
    ``ivfpq_lists_from_codes``) may pass ``corpus=None`` — the float
    corpus is only needed to train, build lists, or probe ``dim``."""
    if dim is None:
        assert corpus is not None, "pass dim when serving without the corpus"
        dim = _vec_dim(corpus, vec_col)
    if cents is None or books is None:
        assert corpus is not None, "pass cents+books when serving without the corpus"
        cents, books = ivfpq_train(corpus, n_centroids, m, pq_centroids,
                                   kmeans_iters, id_col, vec_col, dim)
    if not cents:
        return queries.sparkSession.createDataFrame(
            [], "qid long, cand long, score double, rank int")
    if lists is None:
        assert corpus is not None, "pass lists when serving without the corpus"
        lists = ivfpq_build_lists(corpus, cents, books, id_col, vec_col)
    return ivf_topk(queries, corpus, k, nprobe=nprobe, centroids=cents,
                    lists=lists, id_col=id_col, vec_col=vec_col, dim=dim)


def ivfpq_rerank_topk(queries: DataFrame, corpus: DataFrame, k: int,
                      pool_k: int | None = None, nprobe: int = 4,
                      n_centroids: int = 16, m: int = 8,
                      pq_centroids: int = 16,
                      cents: list | None = None, books: list | None = None,
                      lists: DataFrame | None = None,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      dim: int | None = None) -> DataFrame:
    """Two-stage IVF-PQ serving with exact refinement (the FAISS
    ``IndexRefineFlat`` pattern): stage 1 takes an ADC shortlist of
    ``pool_k`` (default 3k) candidates per query from the compressed
    reconstructions; stage 2 re-scores ONLY the shortlist against the
    full-precision corpus and re-ranks to the final top-k. Recall
    approaches exact search while the full-precision reads stay
    O(|Q|·pool_k) — the standard way production ANN gets quantized
    storage without quantized quality.

    Scale shape: the shortlist (|Q|·pool_k (qid, cand) pairs) is
    BROADCAST into a single join against the float corpus — the corpus
    is scanned once, no shuffle of vectors; query vectors attach by a
    second broadcast. One window over |Q|·pool_k rescored rows finishes.
    At 100 TB the float tier is only touched for the shortlist rows
    (storage-tiering: codes hot, floats cold).
    """
    if pool_k is None:
        pool_k = 3 * k
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    pool = ivfpq_topk(queries, corpus, pool_k, n_centroids, m, pq_centroids,
                      nprobe, cents=cents, books=books, lists=lists,
                      id_col=id_col, vec_col=vec_col, dim=dim) \
        .select("qid", "cand")
    q = queries.select(
        F.col(id_col).alias("qid"),
        V.as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("q_nrm", V.l2_norm(F.col("q_vec")))
    c = _spread(corpus.select(
        F.col(id_col).alias("cand"),
        V.as_double(F.col(vec_col)).alias("c_vec"),
    )).withColumn("c_nrm", V.l2_norm(F.col("c_vec")))
    pair_dot = V.dot_expr("q_vec", "c_vec", dim) if dim else \
        V.dot(F.col("q_vec"), F.col("c_vec"))
    denom = F.col("q_nrm") * F.col("c_nrm")
    cos = F.when(denom > 0, pair_dot / denom).otherwise(F.lit(0.0))
    scored = (
        c.join(F.broadcast(pool), "cand")
        .join(F.broadcast(q), "qid")
        .withColumn("score", fround(cos, ROUND_SCORE))
    )
    return topk_per_query(scored, k).select("qid", "cand", "score", "rank")


def ivfpq_encode(corpus: DataFrame, cents: list, books: list,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Encode to the persisted IVF-PQ layout: (vid, centroid_id,
    pq_codes array<smallint>) — the coarse list id plus one residual
    codeword id per subspace. Map-only, zero shuffles (constant-folded
    codebooks); the storage tier is m smallints + one list id per vector,
    the same ~32× ratio as ``pq_encode`` with coarse pruning on top."""
    m = len(books)
    sub = len(books[0][0][1])
    df = (corpus.select(F.col(id_col).alias("vid"),
                        V.as_double(F.col(vec_col)).alias("__v"))
          .withColumn("__n", F.expr(_vnorm_sql("__v")))
          .withColumn("__pick", F.expr(_argmax_centroid_pick_sql(cents, "__v", "__n")))
          .withColumn("centroid_id", (-F.col("__pick.n")).cast("long"))
          .withColumn("__r", F.zip_with(F.col("__v"), F.col("__pick.cv"),
                                        lambda x, y: x - y)))
    codes = []
    for s in range(m):
        df = df.withColumn(f"__r{s}", F.slice(F.col("__r"), s * sub + 1, sub))
        df = df.withColumn(f"__rn{s}", F.expr(_vnorm_sql(f"__r{s}")))
        codes.append(F.expr(_argmax_centroid_sql(
            books[s], f"__r{s}", f"__rn{s}")).cast("smallint"))
    return df.select("vid", "centroid_id", F.array(*codes).alias("pq_codes"))


def ivfpq_lists_from_codes(codes_df: DataFrame, cents: list, books: list,
                           codes_col: str = "pq_codes") -> DataFrame:
    """Serve-time decoder over the persisted IVF-PQ codes: coarse centroid
    vector (literal-map lookup by list id) + per-subspace residual
    codewords, concatenated and summed back to the reconstruction — the
    (vid, c_vec, c_nrm, centroid_id) table ``ivf_topk`` serves from. The
    float corpus is never touched. decode(encode(v)) ≡
    ``ivfpq_build_lists(v)`` exactly (shared argmax tiebreaks) — pinned by
    ``test_ivfpq_index_roundtrip_serves_identically``."""
    gcv = F.expr(_codeword_map_sql(cents, "centroid_id"))
    res = F.concat(*[
        F.expr(_codeword_map_sql(books[s], f"element_at({codes_col}, {s + 1})"))
        for s in range(len(books))])
    df = codes_df.withColumn("c_vec", F.zip_with(gcv, res, lambda x, y: x + y))
    return (df.withColumn("c_nrm", F.expr(_vnorm_sql("c_vec")))
            .select("vid", "c_vec", "c_nrm", "centroid_id"))


def mmr_rerank(pool: DataFrame, k: int, lam: float = 0.7,
               vec_col: str = "cvec") -> DataFrame:
    """Maximal-marginal-relevance re-rank of a per-query candidate pool.

    MMR (Carbonell & Goldstein 1998) trades relevance against redundancy:
    step t selects argmax over unpicked candidates of

        obj = λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)

    (step 1 has an empty selected set, so it is argmax rel). The standard
    vector-DB serving feature for result diversification — near-duplicate
    hits that would fill a plain top-k are pushed down by their high
    similarity to an already-selected result.

    ``pool``: (qid, cand, score, cvec) — relevance-scored candidates with
    their vectors attached (build one with :func:`mmr_topk`). Returns
    (qid, cand, score, rank) where score is the rounded MMR objective at
    selection time and rank the selection step.

    Determinism: rel comes in rounded (``fround`` 6dp); pair similarities
    and the objective are rounded the same way before each argmax, and
    ties break by candidate id ascending — so the selection sequence is
    reproducible bit-for-bit against the unrolled-SQL DuckDB oracle.

    Scale shape: selection is inherently sequential *within* a query but
    embarrassingly parallel *across* queries — ``applyInPandas`` grouped
    by qid over a bounded pool (|pool| ≤ pool_k rows per group, Arrow-
    batched, vectorized NumPy inside). One shuffle keyed by qid; nothing
    corpus-sized moves. This is the (b)-tier custom-operator pattern: the
    iterative argmax has no relational form, so the per-group state is
    bounded by construction instead.
    """
    import numpy as np
    import pandas as pd

    scale = 10.0 ** ROUND_SCORE
    out_schema = "qid long, cand long, score double, rank int"

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("cand").reset_index(drop=True)  # tiebreak order
        n = len(pdf)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0  # zero vector ⇒ all sims 0, matching _cos guard
        rel = pdf["score"].to_numpy(dtype=np.float64)
        qid = int(pdf["qid"].iloc[0])
        cands = pdf["cand"].to_numpy(dtype=np.int64)
        maxsim = np.zeros(n)
        picked = np.zeros(n, dtype=bool)
        rows = []
        for step in range(1, min(k, n) + 1):
            obj = np.floor((lam * rel - (1.0 - lam) * maxsim) * scale
                           + 0.5) / scale
            obj_masked = np.where(picked, -np.inf, obj)
            i = int(np.argmax(obj_masked))  # first max = lowest cand (sorted)
            picked[i] = True
            rows.append((qid, int(cands[i]), float(obj[i]), step))
            sims = np.floor((mat @ mat[i]) / (nrm * nrm[i]) * scale
                            + 0.5) / scale
            maxsim = np.maximum(maxsim, sims)
        return pd.DataFrame(rows, columns=["qid", "cand", "score", "rank"])

    return pool.groupBy("qid").applyInPandas(pick, schema=out_schema)


def mmr_topk(queries: DataFrame, corpus: DataFrame, k: int,
             pool_k: int = 20, lam: float = 0.7,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int | None = None) -> DataFrame:
    """Diversified top-k: exact cosine pool → MMR re-rank.

    Pool generation is the existing ``cosine_topk`` plan (broadcast
    queries, windowed top-pool_k); candidate vectors are re-attached with
    a broadcast join of the |Q|·pool_k pool against the corpus scan (the
    corpus side stays map-only). Swap the pool builder for ``lsh_topk``/
    ``ivf_topk`` output joined the same way when the corpus outgrows
    brute force — the re-rank stage is pool-shaped either way.
    """
    pool = cosine_topk(queries, corpus, pool_k, id_col, vec_col, dim)
    pool_v = corpus.select(
        F.col(id_col).alias("cand"),
        V.as_double(F.col(vec_col)).alias("cvec"),
    ).join(F.broadcast(pool), "cand")
    return mmr_rerank(pool_v, k, lam)


def label_filtered_topk(queries: DataFrame, corpus: DataFrame, k: int,
                        label_col: str = "label",
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int | None = None) -> DataFrame:
    """Metadata-filtered exact top-k: candidates must share the query's
    label (the vector-DB ``where`` filter / multi-tenant isolation case;
    the reference's ChromaDB collection stores ``group`` metadata per
    vector for exactly this, ``Hybrid_Recom_vecdb.py:371``).

    Pre-filter semantics: the top-k is computed over the matching
    candidates only (never "top-k then discard", which under-fills the
    result when the filter is selective).

    Plan shape: the label rides the broadcast-hash join as an EQUI-join
    key — unlike ``cosine_topk``'s query fan-out, non-matching pairs are
    dropped by the hash probe BEFORE the cosine is evaluated, so the
    scored pair count is Σ_label |Q_label|·|C_label|, not |Q|·|C|. A
    constant filter (one tenant) additionally pushes into the parquet
    scan (PushedFilters row-group skipping); at scale, partition or
    bucket the corpus by the label so the probe prunes at the file level
    — the same layout lever as ``write_ivf_index``.
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(label_col).alias("lbl"),
        V.as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("q_nrm", V.l2_norm(F.col("q_vec")))
    c = _spread(corpus.select(
        F.col(id_col).alias("cand"),
        F.col(label_col).alias("lbl"),
        V.as_double(F.col(vec_col)).alias("c_vec"),
    )).withColumn("c_nrm", V.l2_norm(F.col("c_vec")))
    pair_dot = V.dot_expr("q_vec", "c_vec", dim) if dim else \
        V.dot(F.col("q_vec"), F.col("c_vec"))
    denom = F.col("q_nrm") * F.col("c_nrm")
    cos = F.when(denom > 0, pair_dot / denom).otherwise(F.lit(0.0))
    scored = (
        F.broadcast(q).join(c, "lbl")
        .filter(F.col("cand") != F.col("qid"))
        .withColumn("score", fround(cos, ROUND_SCORE))
    )
    return (topk_per_query(scored, k)
            .select("qid", "cand", F.col("lbl").alias(label_col),
                    "score", "rank"))


def hard_negative_topk(queries: DataFrame, corpus: DataFrame,
                       positives: DataFrame, k: int,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       dim: int | None = None,
                       broadcast_positives: bool = True) -> DataFrame:
    """Hard-negative mining: per query, the top-k most-similar candidates
    that are NOT in the query's positive set — the standard training-pair
    generator for contrastive embedding / reranker training (a negative
    the current embedding ranks high is the informative one; random
    negatives are trivially separable).

    ``positives``: (qid, cand) pairs to exclude (known relevant items,
    graph neighbors, same-class members — caller's notion of "positive").
    Pre-filter semantics like :func:`label_filtered_topk`: the ranking is
    computed over non-positives only, so the result never under-fills
    because positives crowded the pool.

    Plan shape: broadcast query fan-out + codegen'd cosine (the
    ``cosine_topk`` scoring stage), then a LEFT ANTI join on (qid, cand)
    drops positives before the ranking window.  The positive table is
    query-batch-sized (|Q| · avg positives), so it broadcasts by default
    — the anti probe is a map-side hash lookup, no extra shuffle; pass
    ``broadcast_positives=False`` for a corpus-scale positive relation
    (shuffled anti-join on the composite key).  At 100 TB the scoring
    stage can be swapped for any pooled ANN variant (``lsh_topk`` with
    k + max-positives headroom) feeding the same anti join + window tail.
    """
    scored = _scored_pairs(queries, corpus, id_col, vec_col, dim)
    pos = positives.select(F.col("qid"), F.col("cand"))
    if broadcast_positives:
        pos = F.broadcast(pos)
    neg = scored.join(pos, ["qid", "cand"], "left_anti")
    return topk_per_query(neg, k).select("qid", "cand", "score", "rank")


# ---------------------------------------------------------------------------
# SemDeDup (semantic deduplication: cluster, then dedup within clusters)
# ---------------------------------------------------------------------------

def semdedup(corpus: DataFrame, cents: list, eps: float = 0.95,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_salts: int = 32, dim: int | None = None) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023, arXiv:2303.09540).

    Cluster the embedding space with the k-means codebook ``cents`` (from
    :func:`kmeans_centroids_local`), then within each cluster drop every
    vector whose cosine similarity to a LOWER-id cluster member is
    ``>= eps``. Output: (``id_col``, centroid_id, kept) for every input
    row — the survivors are the semantically-unique subset. The paper
    keeps the member farthest from the centroid per duplicate group; this
    implementation pins keep-lowest-id instead (the repo-wide star-removal
    convention of ``dedup.dedup_clusters``) so results are deterministic
    across partitionings and engines.

    Scale shape (100 TB): the quadratic pair space is bounded per cluster
    — the whole point of clustering first — and the within-cluster
    self-join reuses ``embedding_neardup_pairs``'s layout: assignment is
    a map-side literal-codebook argmax (ZERO shuffles, same expression as
    IVF assignment), the assigned table is materialized once
    (``localCheckpoint`` — both join sides derive from it; without the
    checkpoint the assignment pipeline executes twice, the
    ``simhash_neardup`` double-compute class of VERDICT r5 #1), and the
    self-join is salted so one hot cluster spreads over ``n_salts``
    tasks instead of one. Per-pair cost is one dot + divide (norms
    hoisted per-row). At the paper's scale (k clusters ~ sqrt(N)), pair
    volume is N·(N/k)/2 per cluster-average — tune k upward for denser
    corpora; the operator never materializes more than the candidate
    pair stream.
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    spark = corpus.sparkSession
    b = (corpus.select(F.col(id_col).alias("vid"),
                       V.as_double(F.col(vec_col)).alias("v"))
         .withColumn("vnorm", F.expr(_vnorm_sql("v")))
         .withColumn("centroid_id",
                     F.expr(_argmax_centroid_sql(cents, "v", "vnorm")))
         .localCheckpoint(eager=True))
    left = b.select(F.col("vid").alias("id1"), F.col("v").alias("v1"),
                    F.col("vnorm").alias("n1"), "centroid_id",
                    F.pmod(F.col("vid"), F.lit(n_salts)).alias("salt"))
    right = (
        b.select(F.col("vid").alias("id2"), F.col("v").alias("v2"),
                 F.col("vnorm").alias("n2"), "centroid_id")
        .crossJoin(spark.range(n_salts)
                   .select(F.col("id").cast("bigint").alias("salt")))
    )
    parallelism = spark.sparkContext.defaultParallelism
    pairs = (
        left.repartition(parallelism, "centroid_id", "salt")
        .join(right.repartition(parallelism, "centroid_id", "salt"),
              ["centroid_id", "salt"])
        .filter(F.col("id1") < F.col("id2"))
    )
    pair_dot = V.dot_expr("v1", "v2", dim) if dim else \
        V.dot(F.col("v1"), F.col("v2"))
    denom = F.col("n1") * F.col("n2")
    cos = F.when(denom > 0, pair_dot / denom).otherwise(F.lit(0.0))
    dominated = (
        pairs.withColumn("score", fround(cos, ROUND_SCORE))
        .filter(F.col("score") >= eps)
        .select(F.col("id2").alias("vid")).distinct()
    )
    return (
        b.join(dominated.withColumn("_dom", F.lit(True)), "vid", "left")
        .select(F.col("vid").alias(id_col), "centroid_id",
                F.coalesce(~F.col("_dom"), F.lit(True)).alias("kept"))
    )


def centroid_outliers(corpus: DataFrame, cents: list, frac: float = 0.1,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Prototypicality / outlier flagging: the bottom ``frac`` of each
    k-means cluster by similarity-to-centroid (the D4 / SSL-prototypes
    curation step, Sorscher et al. 2022: least-prototypical examples are
    the drop/inspect candidates; its dual — dropping the MOST prototypical
    — is the same ranking read from the other end).

    Output: (``id_col``, centroid_id, csim, outlier) for every row,
    outlier ∈ {0,1}. Deterministic: rounded csim, ties by id ascending,
    cutoff = ceil(frac · cluster_size) computed with the same double
    product in both engines.

    Scale shape: assignment is the zero-shuffle literal-codebook argmax
    (shared with IVF/SemDeDup); the only exchange is ONE window shuffle
    keyed by centroid_id — the rank and the cluster-size windows share
    the partition key, so the second Window op reuses the first's
    partitioning (one Exchange in the plan, two Window nodes). No
    all-pairs anything; at 100 TB this is assignment-scan + one shuffle
    of (id, cid, csim) triples, never vectors.
    """
    b = (corpus.select(F.col(id_col).alias("vid"),
                       V.as_double(F.col(vec_col)).alias("__v"))
         .withColumn("__n", F.expr(_vnorm_sql("__v")))
         .withColumn("__pick",
                     F.expr(_argmax_centroid_pick_sql(cents, "__v", "__n")))
         .select("vid",
                 (-F.col("__pick.n")).cast("long").alias("centroid_id"),
                 F.col("__pick.s").alias("csim")))
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("csim").asc(), F.col("vid").asc())
    wc = Window.partitionBy("centroid_id")
    return (
        b.withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(wc))
        .select(
            F.col("vid").alias(id_col), "centroid_id", "csim",
            (F.col("__rn") <= F.ceil(F.lit(frac) * F.col("__cnt")))
            .cast("int").alias("outlier"))
    )


def mutual_topk_pairs(corpus: DataFrame, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      ranked: DataFrame | None = None) -> DataFrame:
    """Reciprocal nearest-neighbor (mutual-kNN) pairs: (u, v) where each
    is in the other's top-k — the high-precision matching signal entity
    alignment and RNN-clustering build on (a one-sided neighbor is often
    a hub artifact; a MUTUAL one almost never is).

    Output: (u, v, r_uv, r_vu, score), u < v; r_uv = v's rank in u's
    list.  ``ranked`` lets the caller supply ANY (qid, cand, score,
    rank ≤ k) table — the exact ranker here, or an ANN ranker
    (``lsh_topk``/``ivf_topk``) at scale, where all-pairs exact ranking
    is off the table.  Default ranks with the GEMM scorer (all-corpus
    query side; driver-bounded to ~10⁵ queries like
    ``cosine_topk_gemm``).

    Scale shape: the rank table is |corpus|·k rows; the mutuality check
    is ONE self-equi-join on the (u, v) pair key of that pruned table —
    never on raw vectors. Checkpointed once so the ranking never
    executes per join side (the shared-table lifecycle)."""
    if ranked is None:
        ranked = cosine_topk_gemm(corpus, corpus, k, id_col, vec_col)
    ranked = ranked.select("qid", "cand", "score", "rank")\
        .localCheckpoint(eager=True)
    a = ranked.select(F.col("qid").alias("u"), F.col("cand").alias("v"),
                      F.col("rank").alias("r_uv"), "score")
    b = ranked.select(F.col("qid").alias("bv"), F.col("cand").alias("bu"),
                      F.col("rank").alias("r_vu"))
    return (a.join(b, (a["u"] == b["bu"]) & (a["v"] == b["bv"]))
            .filter(F.col("u") < F.col("v"))
            .select("u", "v", "r_uv", "r_vu", "score"))
