"""EP1 build pipeline: catalog → sample → edges → embeddings → vector index.

The reference's ``main()`` steps 1-7 (``Hybrid_Recom_vecdb.py:331-383``):
parse the amazon-meta dump, reservoir-sample 100k products, build the
co-purchase adjacency, synthesize doc text, embed, and upsert everything
into a ChromaDB collection. Here the same pipeline is three materialized
parquet tables (SURVEY §3 EP1) written by one lazy DAG:

- ``products``    parsed catalog (sources.amazon_meta), seeded sample
- ``edges``       co-purchase graph (operators.copurchase, C1+D1)
- ``index``       the vector collection (A3 sink): id, doc text, metadata
                  columns, embedding array<float>, LSH bucket column

"Index build" on Spark is a table layout decision, not a server process:
the index table is written partitioned by the LSH bucket so an ANN probe
prunes to matching partitions (SURVEY §4 physical notes). ``overwrite``
mode reproduces the reference's destroy-and-recreate semantics (A4,
``:150-158``, ALWAYS_FRESH_RUN ``:28``).

At 100 TB: every stage is shuffle-bounded (sample = per-partition top-n
merge; edges = one hash shuffle; embed = Arrow-batched map; write = one
shuffle into bucket partitioning) — no driver-side materialization of
anything but the final row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .embeddings import hashing_embedder
from .operators.copurchase import edges_from_similar
from .operators.sampling import seeded_sample
from .operators.similarity import with_lsh_bucket
from .sources.amazon_meta import read_amazon_meta

DEFAULT_SAMPLE = 100_000  # ref Hybrid_Recom_vecdb.py:19 SAMPLE_SIZE
INDEX_LSH_BITS = 4


def catalog_doc_text(products: DataFrame) -> DataFrame:
    """B2 doc-text projection on the ingested catalog schema
    (title | Group: g | Category: c0 — ref :124-132)."""
    return products.withColumn(
        "doc",
        F.concat_ws(
            " | ",
            F.nullif(F.col("title"), F.lit("")),
            F.when(F.nullif(F.col("group"), F.lit("")).isNotNull(),
                   F.concat(F.lit("Group: "), F.col("group"))),
            F.when(F.size("categories") > 0,
                   F.concat(F.lit("Category: "), F.element_at("categories", 1))),
        ),
    )


def build_index(spark: SparkSession, meta_path: str, out_dir: str,
                sample_size: int = DEFAULT_SAMPLE, seed: int = 42,
                embed_dim: int = 64, lsh_bits: int = INDEX_LSH_BITS) -> dict[str, int]:
    """Run the full EP1 pipeline; returns row counts per written table."""
    products = read_amazon_meta(spark, meta_path)
    sample = seeded_sample(products, sample_size, "asin", seed)
    sample.write.mode("overwrite").parquet(f"{out_dir}/products")
    sample = spark.read.parquet(f"{out_dir}/products")  # cut the lineage once

    edges = edges_from_similar(sample)
    edges.write.mode("overwrite").parquet(f"{out_dir}/edges")

    docs = catalog_doc_text(sample).select(
        F.xxhash64("asin").alias("doc_id"), "asin", "title", "group", "doc")
    embedded = hashing_embedder(docs, id_col="doc_id", text_col="doc", dim=embed_dim)
    index = (
        docs.join(embedded, "doc_id")
        .select("asin", "doc", "title", "group", "embedding")
    )
    index = with_lsh_bucket(index, "embedding", lsh_bits)
    # A3 sink: partitioned by LSH bucket → ANN probes prune partitions;
    # clustered by the partition column first so each bucket dir gets
    # one file per bucket, not one per write task (see write_lsh_index)
    index.repartition(F.col("bucket")) \
        .write.mode("overwrite").partitionBy("bucket").parquet(f"{out_dir}/index")

    return {
        "products": spark.read.parquet(f"{out_dir}/products").count(),
        "edges": spark.read.parquet(f"{out_dir}/edges").count(),
        "index": spark.read.parquet(f"{out_dir}/index").count(),
    }


def load_index(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """Load the three pipeline tables written by :func:`build_index`."""
    return {
        "products": spark.read.parquet(f"{out_dir}/products"),
        "edges": spark.read.parquet(f"{out_dir}/edges"),
        "index": spark.read.parquet(f"{out_dir}/index"),
    }


def write_ivf_index(spark: SparkSession, embeddings: DataFrame, out_dir: str,
                    n_centroids: int = 16, n_iters: int = 2) -> list:
    """Write the IVF vector index as partition-prunable parquet.

    The inverted lists land partitioned by ``centroid_id`` — an IVF probe
    of ``nprobe`` lists then scans exactly those directories and skips the
    rest at the FILE level (PartitionFilters, pinned by
    ``test_ivf_index_partition_pruning``), which is what makes nprobe a
    genuine I/O dial at 100 TB, not just a compute dial. The KB-sized
    codebook is written alongside for serve-time reload.
    """
    from .operators.similarity import ivf_build_lists, kmeans_centroids_local

    cents = kmeans_centroids_local(embeddings, n_centroids, n_iters)
    lists = ivf_build_lists(embeddings, cents)
    # clustered by the partition column: one file per centroid dir, not
    # one per write task (see write_lsh_index)
    lists.repartition(F.col("centroid_id")) \
        .write.mode("overwrite").partitionBy("centroid_id") \
        .parquet(f"{out_dir}/ivf_lists")
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in cents],
        "centroid_id int, cent_vec array<double>")
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/ivf_codebook")
    return cents


def load_ivf_index(spark: SparkSession, out_dir: str) -> tuple[DataFrame, list]:
    """(inverted lists, codebook) written by :func:`write_ivf_index`."""
    lists = spark.read.parquet(f"{out_dir}/ivf_lists")
    cents = [(r.centroid_id, list(r.cent_vec))
             for r in spark.read.parquet(f"{out_dir}/ivf_codebook").collect()]
    cents.sort(key=lambda t: t[0])
    return lists, cents


def append_ivf_index(spark: SparkSession, new_embeddings: DataFrame,
                     out_dir: str) -> None:
    """Incremental IVF maintenance: assign ONLY the new batch with the
    STORED codebook and append its list rows to the partitioned layout.

    Replaces the reference's destroy-and-recreate (A4,
    ``Hybrid_Recom_vecdb.py:28`` ALWAYS_FRESH_RUN) with partition-local
    appends: dynamic-partition append writes files only under the
    ``centroid_id=`` directories the batch actually touches, so index
    growth costs O(batch), never O(corpus). Serving is unchanged —
    ``load_ivf_index`` reads the union and probes prune at the file
    level exactly as before. Because assignment is a pure function of
    the stored codebook, an index built incrementally is ROW-IDENTICAL
    to one built from the full corpus in one shot (pinned by
    ``test_ivf_index_incremental_append_equals_bulk``). Re-train the
    codebook (full rewrite) only when drift degrades recall — the
    standard IVF maintenance trade.
    """
    from .operators.similarity import ivf_build_lists

    _, cents = load_ivf_index(spark, out_dir)
    ivf_build_lists(new_embeddings, cents) \
        .repartition(F.col("centroid_id")) \
        .write.mode("append") \
        .partitionBy("centroid_id").parquet(f"{out_dir}/ivf_lists")


def write_lsh_index(spark: SparkSession, embeddings: DataFrame, out_dir: str,
                    n_bits: int = 5, n_tables: int = 8) -> None:
    """Write the multi-table hyperplane LSH index as partition-prunable
    parquet: bucket rows land partitioned by ``(t, bucket)`` so a probe
    of one bucket per table scans exactly ``n_tables`` directories
    (multi-probe: ×(1+n_bits)) and skips the rest at the FILE level —
    the same I/O-dial layout the IVF lists get. The (n_bits, n_tables)
    params ride in a sidecar so serve calls re-attach the metadata that
    makes a parameter mismatch fail loudly (``_check_index_params``).

    This was the one index family a user had to rebuild from scratch
    (VERDICT r8 missing #3): the bucket assignment is a pure map of the
    stored hyperplane parameters, so the append lifecycle below is
    O(batch) like every other family.
    """
    from .operators.similarity import lsh_build_index

    # cluster by the partition columns before the dynamic-partition
    # write: without it every write task opens a file in every (t,
    # bucket) dir it sees — tasks × dirs tiny files (measured 45 s of
    # filesystem ops for a 16k-row index at sf0.1). Hash-clustered,
    # each (t, bucket) group lands in exactly one task → one file per
    # dir. At very large scale add a salt column to the repartition
    # for intra-bucket parallelism; the layout is unchanged.
    lsh_build_index(embeddings, n_bits=n_bits, n_tables=n_tables) \
        .repartition(F.col("t"), F.col("bucket")) \
        .write.mode("overwrite").partitionBy("t", "bucket") \
        .parquet(f"{out_dir}/lsh_buckets")
    # compact appended-ids ledger: the append replay guard probes THIS
    # (one narrow row per vector) instead of distinct-scanning the whole
    # bucket table (n_tables rows × vector payload each) — ADVICE r9
    embeddings.select(F.col("vec_id").alias("doc_id")).distinct() \
        .write.mode("overwrite").parquet(f"{out_dir}/lsh_docs")
    spark.createDataFrame([(n_bits, n_tables)],
                          "n_bits int, n_tables int") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/lsh_params")


def load_lsh_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The (cand, c_vec, c_nrm, t, bucket) table written by
    :func:`write_lsh_index`, with the param metadata re-attached —
    drop-in for ``lsh_topk(..., index=...)``.

    The read pins an explicit schema for the two PARTITION columns:
    ``bucket`` is a hyperplane BIT-STRING ('01010'), and partition-value
    type inference would silently parse it as the integer 1010 — losing
    the leading zeros that distinguish buckets. File-column types come
    from the footer of a first (metadata-only) inferred read."""
    _finish_lsh_commit(spark, out_dir, as_reader=True)
    _finish_lsh_compact(spark, out_dir, as_reader=True)
    p = spark.read.parquet(f"{out_dir}/lsh_params").collect()[0]
    return (_read_lsh_buckets(spark, out_dir)
            .withMetadata("bucket", {"lsh.n_bits": int(p.n_bits),
                                     "lsh.n_tables": int(p.n_tables)}))


def _read_lsh_buckets(spark: SparkSession, out_dir: str) -> DataFrame:
    """The live bucket table with the partition-column schema pinned
    (``bucket`` as STRING — see :func:`load_lsh_index`)."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    base = spark.read.parquet(f"{out_dir}/lsh_buckets")
    schema = StructType(
        [f for f in base.schema.fields if f.name not in ("t", "bucket")]
        + [StructField("t", IntegerType()), StructField("bucket", StringType())])
    return spark.read.schema(schema).parquet(f"{out_dir}/lsh_buckets")


def _finish_lsh_commit(spark: SparkSession, out_dir: str,
                       as_reader: bool = False) -> bool:
    """LSH-artifact staged-commit publish: bucket rows + ledger rows
    appended together through :func:`_finish_staging`. The bucket
    append's replay guard is partition-PRUNED to the (t, bucket)
    rectangle the staged rows touch, so a crash-retry publish re-scans
    only the live files the batch could have landed in — O(batch), not
    O(corpus) (ADVICE r9)."""
    return _LSH_FAMILY.finish(spark, out_dir, as_reader=as_reader)


def _finish_lsh_compact(spark: SparkSession, out_dir: str,
                        as_reader: bool = False) -> bool:
    """Compaction publish: the rewritten bucket layout SWAPS the live
    dir wholesale (atomic rename, no append/replay semantics). A
    separate stage family from ``lsh__staging``: the recovery routine
    is chosen by stage NAME, and publishing a crashed compaction
    through the append protocol would anti-join-append the entire
    rewritten corpus onto itself."""
    return _LSH_COMPACT_FAMILY.finish(spark, out_dir, as_reader=as_reader)


def compact_lsh_index(spark: SparkSession, out_dir: str,
                      target_rows_per_file: int = 4_000_000) -> dict:
    """OPTIMIZE the persisted LSH artifact in place: rewrite the bucket
    table to ONE file per (t, bucket) directory and the docs ledger to
    ~``target_rows_per_file``-row files, then atomically swap. Closes
    the artifact lifecycle (write → append → load → serve → COMPACT →
    vacuum): every ``append_lsh_index`` batch adds at least one file to
    each touched partition dir, so after k appends a probe reads k
    footers per bucket — at 100 TB scan planning is O(files), and this
    rewrite resets it to O(dirs) while preserving the partition-pruned
    layout exactly (``compact_parquet`` would flatten it).

    Crash safety: the rewritten tables stage under
    ``lsh_compact__staging`` with the ``_COMMIT`` marker protocol; the
    publish is a pure directory swap (no replay read of the staged
    partitioned data, so the bit-string bucket values never round-trip
    through partition type inference — they become the live dirs by
    rename). A crash before the marker discards; after, any
    maintenance path (append/compact/vacuum) or reader claim rolls the
    swap forward. Maintenance-actor contract as everywhere: ONE
    append/compact/vacuum actor per artifact root at a time.

    Returns {files_in, files_out, rows} for the bucket table.
    """
    import math

    _finish_lsh_commit(spark, out_dir)    # fold pending appends first
    _finish_lsh_compact(spark, out_dir)   # recover a crashed compaction
    fs, P = _hadoop_fs(spark, out_dir)
    staging = f"{out_dir}/lsh_compact__staging"
    if fs.exists(P(staging)):             # uncommitted debris
        fs.delete(P(staging), True)
    df = _read_lsh_buckets(spark, out_dir)
    files_in = len(df.inputFiles())
    rows = df.count()
    (df.repartition(F.col("t"), F.col("bucket"))
       .write.mode("overwrite").partitionBy("t", "bucket")
       .parquet(f"{staging}/buckets"))
    docs = spark.read.parquet(f"{out_dir}/lsh_docs")
    n_files = max(1, math.ceil(docs.count() / max(1, target_rows_per_file)))
    docs.repartition(n_files).write.mode("overwrite") \
        .parquet(f"{staging}/docs")
    _LSH_COMPACT_FAMILY.mark(spark, out_dir)     # the commit point
    files_out = len(_read_lsh_buckets(spark, out_dir).inputFiles())
    return {"files_in": files_in, "files_out": files_out, "rows": rows}


def append_lsh_index(spark: SparkSession, new_embeddings: DataFrame,
                     out_dir: str, id_col: str = "vec_id") -> None:
    """Incremental LSH maintenance: bucket ONLY the new batch with the
    STORED hyperplane params and dynamic-partition-append its rows —
    file writes land only under the ``t=/bucket=`` directories the
    batch touches, so growth costs O(batch), never O(corpus).

    Replay guard (ADVICE r9): the batch anti-joins the compact
    ``lsh_docs`` ledger (one narrow row per stored vector), never a
    distinct over the full bucket table — a re-appended vector is a
    no-op at O(|ledger ids|) probe cost, with no vector payloads read.

    Crash safety (VERDICT r9 #7): bucket rows and ledger rows move
    through the SAME staged commit as the dedup/KN/LID families —
    stage both, mark ``_COMMIT``, publish via :func:`_finish_staging`.
    A crash before the marker discards the stage on the next append; a
    crash after replays idempotently (full-row anti-join append with
    the live side pruned to the touched (t, bucket) partitions), so a
    partial bucket-file exposure can never double-count or lose rows.

    Because bucketing is a pure function of the params, an index grown
    incrementally is ROW-IDENTICAL to a bulk rebuild over the union
    (pinned by ``test_lsh_index_incremental_append_equals_bulk``)."""
    from .operators.similarity import lsh_build_index

    _finish_lsh_commit(spark, out_dir)   # recover any interrupted append
    _finish_lsh_compact(spark, out_dir)  # …or interrupted compaction
    p = spark.read.parquet(f"{out_dir}/lsh_params").collect()[0]
    fs, P = _hadoop_fs(spark, out_dir)
    if fs.exists(P(f"{out_dir}/lsh_docs")):
        stored_ids = (spark.read.parquet(f"{out_dir}/lsh_docs")
                      .select(F.col("doc_id").alias(id_col)))
    else:
        # pre-ledger layout (index written before the ledger existed):
        # one-time fallback probe of the bucket table, then the staged
        # commit below starts the ledger from this batch onward
        stored_ids = (spark.read.parquet(f"{out_dir}/lsh_buckets")
                      .select(F.col("cand").alias(id_col)).distinct())
        stored_ids.write.mode("overwrite").parquet(f"{out_dir}/lsh_docs")
        stored_ids = (spark.read.parquet(f"{out_dir}/lsh_docs")
                      .select(F.col("doc_id").alias(id_col)))
    batch = new_embeddings.join(stored_ids, id_col, "left_anti") \
        .localCheckpoint(eager=True)
    if batch.isEmpty():
        return
    # staged UNpartitioned (commit_tables' contract): bucket must stay a
    # real string column here — staging it as a partition value would
    # round-trip through partition type inference on the publish read
    # and lose its leading zeros
    _LSH_FAMILY.commit_tables(spark, out_dir, {
        "buckets": lsh_build_index(batch, id_col=id_col,
                                   n_bits=int(p.n_bits),
                                   n_tables=int(p.n_tables)),
        "docs": batch.select(F.col(id_col).alias("doc_id")).distinct()})


def write_pq_index(spark: SparkSession, embeddings: DataFrame, out_dir: str,
                   m: int = 8, n_centroids: int = 64,
                   n_iters: int = 2) -> list:
    """Write the product-quantization index: codes table + codebook table.

    The codes table is the 32×-compressed serve artifact (m smallints per
    vector instead of dim floats — the measured on-disk ratio is in
    SCALE.md): at 100 TB of float32 embeddings the codes tier is ~3 TB,
    small enough to live on the serving cluster while the float corpus
    stays in cold storage. The KB-sized codebook lands alongside (same
    split as ``write_ivf_index``); ``load_pq_index`` +
    ``similarity.pq_topk_from_codes`` serve without ever re-reading the
    float corpus.
    """
    from .operators.similarity import pq_encode, pq_train

    books = pq_train(embeddings, m, n_centroids, n_iters)
    codes = pq_encode(embeddings, books)
    codes.write.mode("overwrite").parquet(f"{out_dir}/pq_codes")
    rows = [(s, int(cid), [float(x) for x in cv])
            for s, book in enumerate(books) for cid, cv in book]
    spark.createDataFrame(
        rows, "subspace int, cid int, codeword array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/pq_codebook")
    return books


def append_pq_index(spark: SparkSession, new_embeddings: DataFrame,
                    out_dir: str) -> None:
    """Incremental PQ maintenance: encode ONLY the new batch with the
    STORED codebooks and append to the codes table — the
    :func:`append_ivf_index` story for the compressed tier. Encoding is
    a pure function of the codebooks, so an incrementally-grown codes
    table is row-identical to a one-shot encode of the full corpus with
    the same books (pinned by
    ``test_pq_index_incremental_append_equals_bulk``); cost is O(batch),
    map-only, zero shuffles. Codebooks are NOT retrained — when the new
    data drifts off the trained distribution the quantization error
    rises (the SQ clamp note in ``scalar_quantize`` is the same trade);
    re-train + full rewrite is the drift response, not the append path.
    """
    from .operators.similarity import pq_encode

    _, books = load_pq_index(spark, out_dir)
    pq_encode(new_embeddings, books).write.mode("append") \
        .parquet(f"{out_dir}/pq_codes")


def load_pq_index(spark: SparkSession, out_dir: str) -> tuple[DataFrame, list]:
    """(codes table, codebooks) written by :func:`write_pq_index`."""
    codes = spark.read.parquet(f"{out_dir}/pq_codes")
    by_s: dict[int, list] = {}
    for r in spark.read.parquet(f"{out_dir}/pq_codebook").collect():
        by_s.setdefault(r.subspace, []).append((r.cid, list(r.codeword)))
    books = [sorted(by_s[s]) for s in sorted(by_s)]
    return codes, books


def write_ivfpq_index(spark: SparkSession, embeddings: DataFrame,
                      out_dir: str, n_centroids: int = 16, m: int = 8,
                      pq_centroids: int = 16,
                      n_iters: int = 2) -> tuple[list, list]:
    """Write the IVF-PQ index: coarse-partitioned codes + both codebooks.

    The codes table — (vid, pq_codes) partitioned by ``centroid_id`` —
    combines both storage levers: partition pruning makes nprobe an I/O
    dial (the ``write_ivf_index`` story) AND each vector is m smallints
    instead of dim floats (the ``write_pq_index`` story). At 100 TB of
    float32 embeddings the serving tier is ~3 TB of prunable codes; the
    float corpus stays in cold storage and is never read at serve time.
    """
    from .operators.similarity import ivfpq_encode, ivfpq_train

    cents, books = ivfpq_train(embeddings, n_centroids, m, pq_centroids,
                               n_iters)
    codes = ivfpq_encode(embeddings, cents, books)
    # clustered by the partition column: one file per centroid dir, not
    # one per write task (see write_lsh_index)
    codes.repartition(F.col("centroid_id")) \
        .write.mode("overwrite").partitionBy("centroid_id") \
        .parquet(f"{out_dir}/ivfpq_codes")
    spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in cents],
        "centroid_id int, cent_vec array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/ivfpq_coarse")
    rows = [(s, int(cid), [float(x) for x in cv])
            for s, book in enumerate(books) for cid, cv in book]
    spark.createDataFrame(
        rows, "subspace int, cid int, codeword array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/ivfpq_books")
    return cents, books


def append_ivfpq_index(spark: SparkSession, new_embeddings: DataFrame,
                       out_dir: str) -> None:
    """Incremental IVF-PQ maintenance: encode ONLY the new batch with the
    STORED coarse centroids + residual codebooks and dynamic-partition-
    append — files land only under the ``centroid_id=`` directories the
    batch touches. Encoding is a pure per-row function of both stored
    artifacts, so incremental == bulk row-identically (pinned by
    ``test_ivfpq_index_incremental_append_equals_bulk``); the
    ``append_ivf_index``/``append_pq_index`` contract combined."""
    from .operators.similarity import ivfpq_encode

    _, cents, books = load_ivfpq_index(spark, out_dir)
    ivfpq_encode(new_embeddings, cents, books) \
        .repartition(F.col("centroid_id")) \
        .write.mode("append") \
        .partitionBy("centroid_id").parquet(f"{out_dir}/ivfpq_codes")


def load_ivfpq_index(spark: SparkSession,
                     out_dir: str) -> tuple[DataFrame, list, list]:
    """(codes table, coarse centroids, residual codebooks) written by
    :func:`write_ivfpq_index`."""
    codes = spark.read.parquet(f"{out_dir}/ivfpq_codes")
    cents = [(r.centroid_id, list(r.cent_vec))
             for r in spark.read.parquet(f"{out_dir}/ivfpq_coarse").collect()]
    cents.sort(key=lambda t: t[0])
    by_s: dict[int, list] = {}
    for r in spark.read.parquet(f"{out_dir}/ivfpq_books").collect():
        by_s.setdefault(r.subspace, []).append((r.cid, list(r.codeword)))
    books = [sorted(by_s[s]) for s in sorted(by_s)]
    return codes, cents, books


def write_bm25_index(spark: SparkSession, documents: DataFrame,
                     out_dir: str, id_col: str = "doc_id",
                     text_col: str = "text",
                     n_term_partitions: int = 8) -> None:
    """Write the BM25 lexical index: postings + df + corpus stats.

    The postings land hash-partitioned AND sorted by ``term`` — Lucene's
    term-sorted segment layout expressed as parquet: every row group's
    min/max ``term`` statistics are tight, so a query-vocabulary probe
    skips non-matching row groups at the reader level, and a downstream
    repartition-by-term consumer gets clustered input. df (one row per
    vocabulary term) and the single-row stats table land alongside, the
    same KB-sized-sidecar split as ``write_ivf_index``.

    At 100 TB the posting build is the one expensive corpus pass a
    lexical engine makes; this artifact amortizes it over every query
    batch (``bm25_topk(index=load_bm25_index(...))`` never re-tokenizes
    the corpus).
    """
    from .operators.retrieval import bm25_build_index

    postings, df_, stats = bm25_build_index(documents, id_col, text_col)
    (postings.repartition(n_term_partitions, "term")
     .sortWithinPartitions("term")
     .write.mode("overwrite").parquet(f"{out_dir}/bm25_postings"))
    df_.write.mode("overwrite").parquet(f"{out_dir}/bm25_df")
    stats.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/bm25_stats")


def append_bm25_index(spark: SparkSession, new_documents: DataFrame,
                      out_dir: str, id_col: str = "doc_id",
                      text_col: str = "text",
                      n_term_partitions: int = 8,
                      assume_disjoint: bool = False) -> None:
    """Incremental BM25 maintenance: tokenize ONLY the new batch, append
    its postings, and MERGE the sidecar tables exactly.

    The merge math is only exact over doc-DISJOINT batches, so by
    default the batch is anti-joined against the stored index's doc ids
    (one column-pruned scan of the postings' ``cand`` column) — an
    accidental replay of already-indexed docs is silently skipped
    instead of double-counting df and inflating n_docs/avgdl. Callers
    with an upstream exactly-once guarantee can pass
    ``assume_disjoint=True`` to skip the scan.

    Unlike IVF/PQ appends (pure per-row functions of a stored artifact),
    BM25's df and (n_docs, avgdl) are corpus-global — but over disjoint
    doc sets they merge exactly: per-term df adds; the stored avgdl·n is
    the integer token total (recovered via round(), exact for any real
    corpus magnitude), so the merged avgdl is the same sum/count double
    division the bulk build performs — serving through an appended index
    is bit-identical to a one-shot build over the union (pinned by
    ``test_bm25_index_incremental_append_equals_bulk``). Cost: one
    O(batch) tokenize pass + a |vocabulary|-row sidecar rewrite; the
    corpus-sized postings are append-only, never rewritten.
    """
    from pyspark.sql import functions as SF

    from .operators.retrieval import bm25_build_index

    if not assume_disjoint:
        stored_ids = (spark.read.parquet(f"{out_dir}/bm25_postings")
                      .select(SF.col("cand").alias(id_col)).distinct())
        new_documents = new_documents.join(stored_ids, id_col, "left_anti")
    postings_b, df_b, stats_b = bm25_build_index(new_documents, id_col,
                                                 text_col)
    sn = stats_b.collect()[0]
    if not sn.n_docs:           # whole batch was a replay (or empty): no-op
        return
    (postings_b.repartition(n_term_partitions, "term")
     .sortWithinPartitions("term")
     .write.mode("append").parquet(f"{out_dir}/bm25_postings"))
    # sidecars are read-merge-rewritten: materialize the merge first
    # (localCheckpoint) so overwriting the directory being read is safe
    old_df = spark.read.parquet(f"{out_dir}/bm25_df")
    merged_df = (old_df.unionByName(df_b)
                 .groupBy("term").agg(SF.sum("df").alias("df"))
                 .localCheckpoint(eager=True))
    merged_df.write.mode("overwrite").parquet(f"{out_dir}/bm25_df")
    so = spark.read.parquet(f"{out_dir}/bm25_stats").collect()[0]
    n = so.n_docs + sn.n_docs
    sumdl = round(so.avgdl * so.n_docs) + round(sn.avgdl * sn.n_docs)
    spark.createDataFrame([(float(n), float(sumdl) / n)],
                          "n_docs double, avgdl double") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/bm25_stats")


def load_bm25_index(spark: SparkSession, out_dir: str
                    ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(postings, df, stats) written by :func:`write_bm25_index` — pass
    as ``bm25_topk(..., index=...)``."""
    return (spark.read.parquet(f"{out_dir}/bm25_postings"),
            spark.read.parquet(f"{out_dir}/bm25_df"),
            spark.read.parquet(f"{out_dir}/bm25_stats"))


def write_maxsim_index(spark: SparkSession, documents: DataFrame,
                       out_dir: str, chunk_tokens: int = 64,
                       overlap: int = 16) -> None:
    """Write the MaxSim component-extrema index: chunk → hash-embed →
    per-(doc, pos) max/min summary (``maxsim_component_index``),
    PARTITIONED BY pos.

    This is the artifact that makes ``maxsim_topk`` serve
    chunk-count-independent: the per-term chunk max is folded at ingest,
    and storing long-form partitioned by ``pos`` turns the query-bucket
    probe into partition pruning — a term batch touches exactly the
    ``pos=`` directories its buckets name, never the full summary.
    |docs|·dim rows regardless of chunk count.
    """
    from .embeddings import hashing_embedder
    from .operators.retrieval import maxsim_component_index
    from .operators.textops import chunk_documents

    chunks = chunk_documents(documents, chunk_tokens=chunk_tokens,
                             overlap=overlap)
    cv = hashing_embedder(chunks, id_col=["doc_id", "chunk_id"],
                          text_col="chunk_text")
    (maxsim_component_index(cv)
     .write.mode("overwrite").partitionBy("pos")
     .parquet(f"{out_dir}/maxsim_components"))


def append_maxsim_index(spark: SparkSession, new_documents: DataFrame,
                        out_dir: str, chunk_tokens: int = 64,
                        overlap: int = 16) -> None:
    """Incremental MaxSim maintenance: chunk + embed + summarize ONLY the
    new batch and dynamic-partition-append under the same ``pos=``
    layout. The per-(doc, pos) extrema depend only on a document's OWN
    chunks (and the hashing embedder is stateless), so over disjoint doc
    sets incremental == bulk row-identically (pinned by
    ``test_maxsim_index_incremental_append_equals_bulk``). Cost is
    O(batch); chunk/embed params must match the original build — the
    same contract as the IVF codebook."""
    from .embeddings import hashing_embedder
    from .operators.retrieval import maxsim_component_index
    from .operators.textops import chunk_documents

    chunks = chunk_documents(new_documents, chunk_tokens=chunk_tokens,
                             overlap=overlap)
    cv = hashing_embedder(chunks, id_col=["doc_id", "chunk_id"],
                          text_col="chunk_text")
    (maxsim_component_index(cv)
     .write.mode("append").partitionBy("pos")
     .parquet(f"{out_dir}/maxsim_components"))


def load_maxsim_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The component summary written by :func:`write_maxsim_index` —
    pass as ``maxsim_topk(..., components=...)``."""
    return spark.read.parquet(f"{out_dir}/maxsim_components")


def write_bucketed_edges(spark: SparkSession, edges: DataFrame,
                         table: str = "edges_bucketed",
                         n_buckets: int = 8) -> DataFrame:
    """Persist the co-purchase edge table bucketed (and sorted) by ``src``.

    Bucketing is the 100 TB co-location strategy for the serve-side joins
    (SCALE.md): every downstream join or aggregation keyed by ``src`` —
    CF ranking, per-source normalization, edge⋈edge composition — reads
    the bucket layout from the table metadata and skips its shuffle
    entirely (zero Exchange on the bucketed side; two tables bucketed the
    same way join with NO shuffle at all, pinned by
    ``test_bucketed_edges_join_has_no_exchange``). Spark bucketing
    requires a catalog table (``saveAsTable``), not a bare parquet path —
    the bucket spec lives in the metastore.
    """
    (edges.write.mode("overwrite")
     .bucketBy(n_buckets, "src").sortBy("src")
     .format("parquet").saveAsTable(table))
    return spark.table(table)


# ---------------------------------------------------------------------------
# dedup-cluster artifact family (4th persisted index family)
# ---------------------------------------------------------------------------
# The minhash→band→verify→CC chain is the most expensive reusable artifact
# of a training-data pipeline after the ANN indexes: every consumer
# (keep-best canonicalization, decontamination, stats) needs the SAME
# cluster assignment, and recomputing the chain per consumer pays the
# corpus tokenize+minhash+shingle-verify repeatedly. Persist it once:
#
#   clusters   (doc_id, cluster_id)        the assignment (min reachable id)
#   bands      (doc_id, band, key)         banding table — the probe target
#   pairs      (id1, id2, jaccard)         verified near-dup edges
#   params     (n_hashes, n_bands, threshold, shingle_n)  sidecar
#
# Append is O(batch) in the expensive stages: the batch is signed and
# banded alone, probes the STORED band table for collisions, and only the
# adjacency DELTA is Jaccard-verified. Exactness (append == bulk over the
# union, hash-identical) holds by construction because the chain-candidate
# rule is recomputed on exactly the buckets whose adjacency an insertion
# can change — including edges the insertion REMOVES from the candidate
# set (a new doc landing between two chained old docs splits their link;
# a label-only union-find merge cannot express that, which is why the
# artifact stores the verified edge list, not just labels).


def write_dedup_clusters(spark: SparkSession, documents: DataFrame,
                         out_dir: str, n_hashes: int = 8, n_bands: int = 4,
                         threshold: float = 0.5, shingle_n: int = 3,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> None:
    """Bulk-build the near-dup cluster artifact (banded MinHash chain →
    exact n-gram-Jaccard verify → large-star/small-star CC) and persist
    all four tables. One corpus pass for signatures; everything
    downstream is linear in the candidate volume."""
    from .operators.dedup import (bucket_chain_links, connected_components_star,
                                  jaccard_neardup_pairs, minhash_band_keys,
                                  minhash_signatures)

    sigs = minhash_signatures(documents, n_hashes, id_col, text_col)
    bands = minhash_band_keys(sigs, n_hashes, n_bands) \
        .localCheckpoint(eager=True)
    cand = bucket_chain_links(bands).distinct()
    pairs = jaccard_neardup_pairs(documents, threshold, shingle_n,
                                  id_col=id_col, text_col=text_col,
                                  candidates=cand) \
        .localCheckpoint(eager=True)
    clusters = connected_components_star(
        pairs, documents.select(F.col(id_col).alias("doc_id")))
    clusters.write.mode("overwrite").parquet(f"{out_dir}/dedup_clusters")
    bands.write.mode("overwrite").parquet(f"{out_dir}/dedup_bands")
    pairs.write.mode("overwrite").parquet(f"{out_dir}/dedup_pairs")
    spark.createDataFrame(
        [(n_hashes, n_bands, float(threshold), shingle_n)],
        "n_hashes int, n_bands int, threshold double, shingle_n int") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/dedup_params")


def _finish_dedup_commit(spark: SparkSession, out_dir: str,
                         as_reader: bool = False) -> bool:
    """Dedup-artifact staged-commit publish: clusters + pairs swap,
    bands keyed append, through :func:`_finish_staging` (the cluster/
    band/pair triple previously committed non-atomically — the same
    crash-window class ADVICE r7 flagged for the count artifacts)."""
    return _DEDUP_FAMILY.finish(spark, out_dir, as_reader=as_reader)


def load_dedup_clusters(spark: SparkSession, out_dir: str) -> DataFrame:
    """(doc_id, cluster_id) written by :func:`write_dedup_clusters` —
    the table keep-best canonicalization / decontamination serve from.

    A committed-but-unpublished stage is rolled FORWARD first, then the
    stable live directory is read: serving the lazy DataFrame straight
    off ``__staging`` left it bound to a directory the next append
    renames away, failing the reader's next action (ADVICE r8). The
    roll-forward runs under the atomic rename claim (``as_reader=True``,
    ADVICE r9): a lost claim or an in-flight publish falls back to
    reading the live dir READ-ONLY, so concurrent readers can never
    interleave the swap and lose the table. An UNcommitted stage is
    left untouched (it may belong to an in-flight append; only append
    paths discard those), and the live dir is the committed truth by
    the staging invariant."""
    _finish_dedup_commit(spark, out_dir, as_reader=True)
    return spark.read.parquet(f"{out_dir}/dedup_clusters")


def append_dedup_clusters(spark: SparkSession, new_documents: DataFrame,
                          corpus: DataFrame, out_dir: str,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> None:
    """Incremental cluster maintenance — O(batch) signature/verify work,
    hash-identical to a bulk rebuild over the union (pinned by
    ``test_dedup_cluster_incremental_append_equals_bulk``).

    ``corpus`` must cover the texts of BOTH stored and new docs: the
    exact-Jaccard verify of a new↔old candidate needs the old doc's
    shingles (only candidate ENDPOINTS are shingled — the semi-join in
    ``jaccard_neardup_pairs`` prunes the rest, so this never re-reads
    the whole stored corpus' text).

    Algorithm (exactness per bucket-adjacency semantics):
    1. replay guard — drop batch docs already clustered (mirrors
       ``append_bm25_index``).
    2. sign + band ONLY the batch; touched buckets = its (band, key)s.
    3. expand to every bucket of every old doc seen in a touched bucket
       (one hop, no cascade: adjacency only changes in touched buckets,
       and a broken old↔old link must be re-checked against ALL of its
       endpoints' other buckets before being declared removed).
    4. recompute chain adjacency over the expanded buckets twice — old
       members only vs old+new — the set diffs are exactly the candidate
       edges the batch adds/removes under the bulk rule (added edges
       always involve a new doc; removed edges are always old↔old).
    5. verify ONLY added candidates; drop stored pairs matching removed
       candidates.
    6. labels: if nothing was removed, a supernode CC over (new docs ∪
       affected old cluster labels) merges against stored labels —
       bounded by the batch. If a verified edge WAS removed a cluster
       may split, so CC reruns over the full (small, near-dup-edge-
       sized) pair table — still no corpus re-verify.

    Writes: bands appended; pairs + clusters rewritten (the label table
    rewrite is a linear join, dwarfed by the tokenize+verify it avoids;
    a production layout would partition clusters and rewrite only
    remapped partitions)."""
    from .operators.dedup import (bucket_chain_links, connected_components_star,
                                  jaccard_neardup_pairs, minhash_band_keys,
                                  minhash_signatures)

    _finish_dedup_commit(spark, out_dir)   # recover any interrupted append
    p = spark.read.parquet(f"{out_dir}/dedup_params").collect()[0]
    stored_clusters = spark.read.parquet(f"{out_dir}/dedup_clusters")
    stored_bands = spark.read.parquet(f"{out_dir}/dedup_bands")
    stored_pairs = spark.read.parquet(f"{out_dir}/dedup_pairs")

    batch = new_documents.join(
        stored_clusters.select(F.col("doc_id").alias(id_col)),
        id_col, "left_anti")
    sigs_b = minhash_signatures(batch, p.n_hashes, id_col, text_col)
    bands_b = minhash_band_keys(sigs_b, p.n_hashes, p.n_bands) \
        .localCheckpoint(eager=True)
    if bands_b.isEmpty():
        return

    touched = bands_b.select("band", "key").distinct()
    affected_old = (stored_bands.join(touched, ["band", "key"], "left_semi")
                    .select("doc_id").distinct())
    expanded = (stored_bands.join(affected_old, "doc_id", "left_semi")
                .select("band", "key").distinct()
                .unionByName(touched).distinct()
                .localCheckpoint(eager=True))
    old_members = stored_bands.join(expanded, ["band", "key"], "left_semi") \
        .localCheckpoint(eager=True)
    all_members = old_members.unionByName(
        bands_b.join(expanded, ["band", "key"], "left_semi"))

    old_adj = bucket_chain_links(old_members).distinct()
    new_adj = bucket_chain_links(all_members).distinct() \
        .localCheckpoint(eager=True)
    added = new_adj.join(old_adj, ["id1", "id2"], "left_anti")
    removed = old_adj.join(new_adj, ["id1", "id2"], "left_anti")

    verified_added = jaccard_neardup_pairs(
        corpus, p.threshold, p.shingle_n, id_col=id_col, text_col=text_col,
        candidates=added).localCheckpoint(eager=True)
    removed_verified = stored_pairs.join(removed, ["id1", "id2"], "left_semi") \
        .localCheckpoint(eager=True)
    final_pairs = (stored_pairs.join(removed, ["id1", "id2"], "left_anti")
                   .unionByName(verified_added)
                   .localCheckpoint(eager=True))

    batch_ids = bands_b.select("doc_id").distinct()
    if removed_verified.isEmpty():
        # common path: edges only grew — merge against stored labels with
        # a supernode CC bounded by the batch's candidate fan-out
        lab = stored_clusters.select(F.col("doc_id").alias("__d"),
                                     F.col("cluster_id").alias("__l"))
        m = (verified_added.select("id1", "id2")
             .join(lab.withColumnRenamed("__d", "id1"), "id1", "left")
             .withColumn("u", F.coalesce("__l", "id1")).drop("__l")
             .join(lab.withColumnRenamed("__d", "id2"), "id2", "left")
             .withColumn("v", F.coalesce("__l", "id2")).drop("__l")
             .select(F.col("u").alias("id1"), F.col("v").alias("id2")))
        nodes = (batch_ids.unionByName(m.select(F.col("id1").alias("doc_id")))
                 .unionByName(m.select(F.col("id2").alias("doc_id")))
                 .distinct())
        cc = connected_components_star(m, nodes) \
            .localCheckpoint(eager=True)
        new_rows = batch_ids.join(cc, "doc_id", "left") \
            .select("doc_id", F.coalesce("cluster_id", "doc_id")
                    .alias("cluster_id"))
        remap = (cc.filter(F.col("cluster_id") != F.col("doc_id"))
                 .select(F.col("doc_id").alias("cluster_id"),
                         F.col("cluster_id").alias("__new")))
        clusters = (stored_clusters.join(F.broadcast(remap), "cluster_id",
                                         "left")
                    .select("doc_id",
                            F.coalesce("__new", "cluster_id")
                            .alias("cluster_id"))
                    .unionByName(new_rows))
    else:
        # a verified edge disappeared: a cluster may SPLIT — rerun CC over
        # the full near-dup edge table (small) with all known nodes
        nodes = stored_clusters.select("doc_id").unionByName(batch_ids) \
            .distinct()
        clusters = connected_components_star(final_pairs, nodes)

    clusters = clusters.localCheckpoint(eager=True)
    # all three tables move through ONE staged commit: stage, mark,
    # publish (swap clusters/pairs, keyed-append bands) — a crash at any
    # point leaves the artifact untouched or fully updated, never the
    # stale-bands/new-clusters mix the old in-place writes risked
    _DEDUP_FAMILY.commit_tables(spark, out_dir, {
        "clusters": clusters, "pairs": final_pairs, "bands": bands_b})


# ---------------------------------------------------------------------------
# count-statistic model artifacts (KN LM, LID profiles)
# ---------------------------------------------------------------------------
# Both models are pure functions of an ADDITIVE sufficient statistic (bigram
# counts / per-language gram counts), so the artifact stores the counts plus
# a doc-id ledger for replay protection; append = count batch → union →
# re-sum — O(batch) compute, and the merged counts derive a model
# bit-identical to a bulk retrain (shared derivation in operators/textops).


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path-class) for ``path`` via the JVM Hadoop API —
    works on local FS, HDFS, and object stores alike (unlike driver-side
    ``glob``, which silently returns nothing off the local FS)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def _publish_stage(spark: SparkSession, stage: str,
                   swaps: dict, appends: dict,
                   prune: dict | None = None,
                   partition_by: dict | None = None) -> None:
    """Idempotently publish a COMMITTED stage dir (``_COMMIT`` present).

    - ``swaps``: {stage-subdir → live dir} — atomic-rename
      replacement (skipped if the subdir is already renamed away).
    - ``appends``: {stage-subdir → (live dir, key col)} — append
      staged rows not already present in the live table. The replay
      guard is FULL-ROW (null-safe) identity, not the key column alone:
      the v1 FileOutputCommitter's job commit renames task files
      sequentially, so a crash mid-publish can expose SOME of a key's
      rows — a keyed anti-join would then drop the key's remaining
      staged rows for good (ADVICE r8). Staged tables are row-distinct
      (bands: one row per (doc_id, band); ledgers: one row per doc_id),
      so exact-row anti-join appends exactly the missing rows and a
      replay of a fully-landed batch is a no-op. ``key`` documents the
      table's nominal append key for callers/tests.
    - ``prune``: {stage-subdir → [partition cols]} — the anti-join's
      LIVE side is filtered to the partition values the staged rows
      actually touch (literal ``isin`` per column, so the parquet scan
      prunes at the FILE level). Without this the replay guard of a
      partitioned table (LSH buckets) re-scans the whole live table on
      every publish — O(corpus) where the append itself is O(batch)
      (ADVICE r9). Sound because a staged row outside the touched
      rectangle cannot exist in the live partitions that were excluded.
    - ``partition_by``: {stage-subdir → [partition cols]} — the live
      table is partitioned on these columns; the replay append writes
      with the same ``partitionBy`` so retried rows land under the
      correct directories. Staged tables are ALWAYS written
      UNpartitioned (plain columns) — staging a bit-string bucket as a
      partition value would round-trip through partition-type
      inference and lose its leading zeros — so the staged schema
      carries the true column types, and the live side is read with
      that exact schema pinned (partition values parse as the staged
      type, never re-inferred).

    Every step is idempotent, so a crash mid-publish re-runs cleanly.
    The marker is deleted LAST: its absence means the live dirs are
    consistent.
    """
    fs, P = _hadoop_fs(spark, stage)
    for sub, live in swaps.items():
        staged = P(f"{stage}/{sub}")
        if fs.exists(staged):          # swap not yet done (or mid-way)
            if fs.exists(P(live)):
                fs.delete(P(live), True)
            fs.rename(staged, P(live))
    for sub, (live, key) in appends.items():
        spath = f"{stage}/{sub}"
        if fs.exists(P(spath)):
            staged = spark.read.parquet(spath).alias("s")
            livedf = spark.read.schema(staged.schema).parquet(live) \
                .alias("l")
            for c in (prune or {}).get(sub, []):
                # bounded driver collect: distinct partition values the
                # batch touches (≤ n_tables × batch buckets for LSH)
                vals = [r[0] for r in
                        spark.read.parquet(spath).select(c).distinct()
                        .collect()]
                livedf = livedf.filter(F.col(c).isin(vals)).alias("l")
            cond = None
            for c in staged.columns:   # full-row, null-safe identity
                eq = F.col(f"s.{c}").eqNullSafe(F.col(f"l.{c}"))
                cond = eq if cond is None else (cond & eq)
            fresh = (staged.join(livedf, cond, "left_anti")
                     .localCheckpoint(eager=True))
            if not fresh.isEmpty():    # idempotent: replay-safe append
                pcols = (partition_by or {}).get(sub)
                if pcols:
                    # cluster by the partition cols first: one file per
                    # touched dir instead of tasks × dirs tiny files
                    fresh = fresh.repartition(*[F.col(c) for c in pcols])
                    fresh.write.mode("append").partitionBy(*pcols) \
                        .parquet(live)
                else:
                    fresh.write.mode("append").parquet(live)
    fs.delete(P(f"{stage}/_COMMIT"), False)  # marker last: its absence
    fs.delete(P(stage), True)                # means live is consistent


def _finish_staging(spark: SparkSession, staging: str,
                    swaps: dict, appends: dict,
                    prune: dict | None = None,
                    partition_by: dict | None = None,
                    as_reader: bool = False) -> bool:
    """Roll forward (or discard) a staged multi-table artifact commit.

    Multi-file artifacts (count tables + replay ledgers, the dedup
    cluster/band/pair triple, the LSH bucket/ledger pair) must move
    together; updating them non-atomically risks double-applying a
    batch on crash-retry (one half landed, the other didn't) or
    destroying a live table mid-overwrite (ADVICE r7). Append paths
    stage EVERY updated table under ``staging/`` and drop a ``_COMMIT``
    marker file as the single commit point; this helper publishes a
    committed stage and discards an uncommitted one (see
    :func:`_publish_stage` for the publish semantics).

    Invariant readers rely on: ``_COMMIT`` present under ``__staging``
    or its ``__publishing`` sibling → that staged table is the
    committed truth; otherwise the live dir is.

    Concurrency contract (ADVICE r9): publish steps are idempotent
    under crash-RETRY but not under concurrent INTERLEAVING, so every
    publish first CLAIMS the stage by atomically renaming
    ``…__staging`` → ``…__publishing``. Exactly one claimer wins the
    rename; the publish then runs on the claimed dir.

    - ``as_reader=True`` (load paths, which roll committed stages
      forward per ADVICE r8): a lost claim, or a pre-existing
      committed ``__publishing`` dir (another actor's in-flight or
      crashed publish), returns **False** — the caller must fall back
      to reading the live dir read-only and MUST NOT publish. A
      crashed claimed publish is recovered by the next maintenance
      call (append/vacuum), never by readers racing each other. One
      fail-LOUD window remains: a publisher that crashed between a
      swap's delete-live and rename leaves the live dir missing until
      maintenance rolls the claimed stage forward — readers then error
      on the read (never serve stale/partial data silently).
    - ``as_reader=False`` (append paths + vacuum — ONE maintenance
      actor per artifact root at a time): a committed ``__publishing``
      leftover is rolled forward first; a lost claim means a
      concurrent reader won it, so this path waits (bounded) for that
      publish to complete.

    Returns True when, on return, the live dirs are the committed
    truth; False only in the reader-fallback case.
    """
    import time as _time

    fs, P = _hadoop_fs(spark, staging)
    publishing = (staging[: -len("__staging")] + "__publishing"
                  if staging.endswith("__staging")
                  else staging + "__publishing")
    if fs.exists(P(f"{publishing}/_COMMIT")):
        if as_reader:
            return False   # claimed publish in flight (or crashed —
            #                maintenance recovers it); live is readable
        _publish_stage(spark, publishing, swaps, appends, prune,
                       partition_by)
    elif fs.exists(P(publishing)) and not as_reader:
        # marker gone → that publish completed; the dir is debris from a
        # crash between the marker delete and the dir delete
        fs.delete(P(publishing), True)
    if not fs.exists(P(f"{staging}/_COMMIT")):
        if fs.exists(P(staging)) and not as_reader:
            fs.delete(P(staging), True)  # uncommitted debris from a
            #                              crashed append — never truth
        return True
    if not fs.rename(P(staging), P(publishing)):
        # lost the claim: a concurrent actor renamed it first
        if as_reader:
            return False
        for _ in range(120):             # maintenance path: wait for the
            if not fs.exists(P(f"{publishing}/_COMMIT")) \
                    and not fs.exists(P(f"{staging}/_COMMIT")):
                return True              # winner's publish to finish
            _time.sleep(0.5)
        raise RuntimeError(
            f"timed out waiting for a concurrent publish of {staging}")
    _publish_stage(spark, publishing, swaps, appends, prune,
                   partition_by)
    return True


class _StagedFamily:
    """ONE staged-commit family: a staging-dir base name plus the
    declarative swap/append table spec :func:`_finish_staging` consumes.

    Every persisted-artifact family (LSH buckets+ledger, the dedup
    cluster/band/pair triple, the KN/LID counts+ledger pairs, LSH
    compaction) shares the SAME stage → presence-check → ``_COMMIT``
    mark → rename-claim → publish mechanics — so the crash matrix
    (claim race, stale marker, partial rename, vanished stage) lives
    HERE once and is tested once, not re-implemented per family
    (VERDICT r10 next #4). What differs per family is pure declaration:

    - ``swaps``: {stage-subdir: live-subdir} — wholesale atomic-rename
      replacement on publish.
    - ``appends``: {stage-subdir: (live-subdir, nominal append key)} —
      full-row anti-join replay-guarded append.
    - ``prune`` / ``partition_by``: per-subdir partition-column lists
      (see :func:`_publish_stage`).

    Live names are RELATIVE to the artifact root passed at call time.
    """

    def __init__(self, base: str, swaps: dict | None = None,
                 appends: dict | None = None, prune: dict | None = None,
                 partition_by: dict | None = None):
        self.base = base
        self.swaps = swaps or {}
        self.appends = appends or {}
        self.prune = prune
        self.partition_by = partition_by

    def staging(self, out_dir: str) -> str:
        return f"{out_dir}/{self.base}__staging"

    def finish(self, spark: SparkSession, out_dir: str,
               as_reader: bool = False) -> bool:
        """Roll forward a committed stage (or discard an uncommitted
        one) — the family-specialized :func:`_finish_staging`."""
        return _finish_staging(
            spark, self.staging(out_dir),
            swaps={s: f"{out_dir}/{l}" for s, l in self.swaps.items()},
            appends={s: (f"{out_dir}/{l}", k)
                     for s, (l, k) in self.appends.items()},
            prune=self.prune, partition_by=self.partition_by,
            as_reader=as_reader)

    def mark(self, spark: SparkSession, out_dir: str) -> None:
        """Drop ``_COMMIT`` over an already-written stage — THE commit
        point — then roll forward. Every declared table must still
        exist at the mark: a concurrent vacuum/cleanup that deleted the
        stage mid-write would otherwise be papered over by ``create()``
        recreating parent dirs, leaving a marker over an empty stage —
        the finish would then "publish" nothing and silently drop the
        batch. Fail loudly instead (previously only the counts family
        carried this guard; now every family does)."""
        staging = self.staging(out_dir)
        fs, P = _hadoop_fs(spark, out_dir)
        for sub in list(self.swaps) + list(self.appends):
            if not fs.exists(P(f"{staging}/{sub}")):
                raise RuntimeError(
                    f"staged table vanished before commit: "
                    f"{staging}/{sub} (concurrent cleanup? one "
                    "maintenance actor per artifact root at a time)")
        fs.create(P(f"{staging}/_COMMIT")).close()   # the commit point
        self.finish(spark, out_dir)

    def commit_tables(self, spark: SparkSession, out_dir: str,
                      tables: dict[str, DataFrame]) -> None:
        """Stage every table (plain unpartitioned overwrite — staged
        tables carry true column types; partition values never
        round-trip through partition-type inference), then
        :meth:`mark`. Callers needing custom staged layouts (e.g.
        compaction's pre-partitioned buckets) write the stage
        themselves and call :meth:`mark` directly."""
        staging = self.staging(out_dir)
        for sub, df in tables.items():
            df.write.mode("overwrite").parquet(f"{staging}/{sub}")
        self.mark(spark, out_dir)


_LSH_FAMILY = _StagedFamily(
    "lsh",
    appends={"buckets": ("lsh_buckets", "cand"),
             "docs": ("lsh_docs", "doc_id")},
    prune={"buckets": ["t", "bucket"]},
    partition_by={"buckets": ["t", "bucket"]})

_LSH_COMPACT_FAMILY = _StagedFamily(
    "lsh_compact",
    swaps={"buckets": "lsh_buckets", "docs": "lsh_docs"})

_DEDUP_FAMILY = _StagedFamily(
    "dedup",
    swaps={"clusters": "dedup_clusters", "pairs": "dedup_pairs"},
    appends={"bands": ("dedup_bands", "doc_id")})

# recognized fixed-name families, used by vacuum_staging's recovery
_FAMILIES = {f.base: f for f in
             (_LSH_FAMILY, _LSH_COMPACT_FAMILY, _DEDUP_FAMILY)}


def _counts_family(counts_name: str, docs_name: str) -> _StagedFamily:
    """Count-statistic artifact family (KN LM / LID profiles): counts
    swap + doc-ledger append, parameterized by table name."""
    return _StagedFamily(
        counts_name,
        swaps={"counts": counts_name},
        appends={"docs": (docs_name, "doc_id")})


def _staged_commit_finish(spark: SparkSession, out_dir: str,
                          counts_name: str, docs_name: str,
                          as_reader: bool = False) -> bool:
    """Count-artifact (KN LM / LID profile) staged-commit publish:
    counts swap + ledger append through :func:`_finish_staging`."""
    return _counts_family(counts_name, docs_name).finish(
        spark, out_dir, as_reader=as_reader)


def _committed_counts(spark: SparkSession, out_dir: str,
                      counts_name: str, docs_name: str) -> DataFrame:
    """Read the committed counts table per the staging invariant.

    Rolls a committed-but-unpublished stage forward FIRST and reads the
    stable live dir — previously this returned the ``__staging/counts``
    path, leaving the caller's lazy DataFrame bound to a directory the
    next append deletes (ADVICE r8). The roll-forward runs under the
    atomic rename claim (``as_reader=True``, ADVICE r9) — a lost claim
    falls back to the live dir read-only. An uncommitted stage is left
    untouched (may belong to an in-flight append)."""
    _staged_commit_finish(spark, out_dir, counts_name, docs_name,
                          as_reader=True)
    return spark.read.parquet(f"{out_dir}/{counts_name}")


def _staged_commit_write(spark: SparkSession, out_dir: str,
                         counts_name: str, docs_name: str,
                         merged_counts: DataFrame,
                         batch_ids: DataFrame) -> None:
    """Stage both halves, mark ``_COMMIT``, roll forward. Crash before
    the marker → retry discards the stage and recomputes against
    untouched live state; crash after → the next append (or this call's
    own finish step) completes the publish exactly once."""
    _counts_family(counts_name, docs_name).commit_tables(
        spark, out_dir, {"docs": batch_ids, "counts": merged_counts})


def write_kn_lm(spark: SparkSession, documents: DataFrame, out_dir: str,
                id_col: str = "doc_id", text_col: str = "text") -> None:
    """Bulk-build the KN word-bigram count artifact: (w1, w2, c) counts
    plus the indexed doc ledger."""
    from .operators.textops import kn_bigram_counts

    kn_bigram_counts(documents, text_col) \
        .write.mode("overwrite").parquet(f"{out_dir}/kn_counts")
    documents.select(F.col(id_col).alias("doc_id")) \
        .write.mode("overwrite").parquet(f"{out_dir}/kn_docs")


def load_kn_lm(spark: SparkSession, out_dir: str) -> DataFrame:
    """Derive the serving model from the stored counts — one
    vocab²-bounded pass, no corpus re-read."""
    from .operators.textops import kn_model_from_counts

    return kn_model_from_counts(
        _committed_counts(spark, out_dir, "kn_counts", "kn_docs"))


def append_kn_lm(spark: SparkSession, new_documents: DataFrame,
                 out_dir: str, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
    """O(batch) incremental LM maintenance: replay-guard the batch
    against the doc ledger (a re-appended doc is a no-op, mirroring
    ``append_bm25_index``), count ONLY the batch, merge by re-summing
    the union — counts are additive, so merged == bulk exactly.
    Counts + ledger move together through the staged-commit protocol
    (``_staged_commit_write``): a crash at ANY point either leaves the
    artifact untouched or the batch fully applied — never the
    double-count / destroyed-counts windows of a naive two-file write.
    """
    from .operators.textops import kn_bigram_counts

    _staged_commit_finish(spark, out_dir, "kn_counts", "kn_docs")
    ledger = spark.read.parquet(f"{out_dir}/kn_docs")
    batch = new_documents.join(
        ledger.select(F.col("doc_id").alias(id_col)), id_col, "left_anti")
    if batch.isEmpty():
        return
    stored = spark.read.parquet(f"{out_dir}/kn_counts")
    merged = (stored.unionByName(kn_bigram_counts(batch, text_col))
              .groupBy("w1", "w2").agg(F.sum("c").alias("c"))
              .localCheckpoint(eager=True))
    batch_ids = batch.select(F.col(id_col).alias("doc_id")) \
        .localCheckpoint(eager=True)
    _staged_commit_write(spark, out_dir, "kn_counts", "kn_docs",
                         merged, batch_ids)


def write_lid_profiles(spark: SparkSession, documents: DataFrame,
                       out_dir: str, lang_col: str = "lang",
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = 3) -> None:
    """Bulk-build the LID gram-count artifact: (lang, gram, cnt) plus
    the indexed doc ledger."""
    from .operators.textops import lid_gram_counts

    lid_gram_counts(documents, lang_col, text_col, n) \
        .write.mode("overwrite").parquet(f"{out_dir}/lid_counts")
    documents.select(F.col(id_col).alias("doc_id")) \
        .write.mode("overwrite").parquet(f"{out_dir}/lid_docs")


def load_lid_profiles(spark: SparkSession, out_dir: str,
                      alpha: float = 1.0,
                      max_grams_per_lang: int = 8192) -> DataFrame:
    """Derive the (lang, gram, logp, oov) profile table from the stored
    counts — bounded by |langs| × charset^n, no corpus re-read."""
    from .operators.textops import lid_profiles_from_counts

    return lid_profiles_from_counts(
        _committed_counts(spark, out_dir, "lid_counts", "lid_docs"),
        alpha, max_grams_per_lang)


def append_lid_profiles(spark: SparkSession, new_documents: DataFrame,
                        out_dir: str, lang_col: str = "lang",
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3) -> None:
    """O(batch) incremental profile maintenance — same additive-counts
    merge and staged-commit crash safety as :func:`append_kn_lm`."""
    from .operators.textops import lid_gram_counts

    _staged_commit_finish(spark, out_dir, "lid_counts", "lid_docs")
    ledger = spark.read.parquet(f"{out_dir}/lid_docs")
    batch = new_documents.join(
        ledger.select(F.col("doc_id").alias(id_col)), id_col, "left_anti")
    if batch.isEmpty():
        return
    stored = spark.read.parquet(f"{out_dir}/lid_counts")
    merged = (stored.unionByName(lid_gram_counts(batch, lang_col, text_col, n))
              .groupBy("lang", "gram").agg(F.sum("cnt").alias("cnt"))
              .localCheckpoint(eager=True))
    batch_ids = batch.select(F.col(id_col).alias("doc_id")) \
        .localCheckpoint(eager=True)
    _staged_commit_write(spark, out_dir, "lid_counts", "lid_docs",
                         merged, batch_ids)


# ---------------------------------------------------------------------------
# dataset maintenance: small-file compaction
# ---------------------------------------------------------------------------


def compact_parquet(spark: SparkSession, in_dir: str, out_dir: str,
                    target_rows_per_file: int = 1_000_000,
                    sort_cols: list[str] | None = None) -> dict:
    """OPTIMIZE-style compaction: rewrite a parquet dataset into
    ~``target_rows_per_file``-row files, optionally range-sorted on
    ``sort_cols`` (pair with ``layout.with_zorder_key`` for 2-D
    skipping). Long-lived incremental sinks accumulate small files —
    every ``mode("append")`` batch (the bands/postings/ledger appends
    here, every streaming micro-batch in production) adds at least one
    file per partition, and at 100 TB scan-planning cost and footer I/O
    become O(files), not O(bytes). Returns {files_in, files_out, rows}.

    Scale shape: one read → one exchange (repartitionByRange when
    sorting — distributed sampled-boundary sort, NOT a global
    single-task sort — else a round-robin repartition) → one write.
    Row-count preserving by construction; content equality is
    test-pinned. The file census uses the scan's own file listing
    (``DataFrame.inputFiles``), which works on HDFS/object stores, not
    a driver-local directory walk; ``out_dir == in_dir`` is rejected —
    the overwrite would destroy the input while the lazy read still
    references it.
    """
    import math

    fs, P = _hadoop_fs(spark, in_dir)
    q_in = fs.makeQualified(P(in_dir)).toString()
    q_out = fs.makeQualified(P(out_dir)).toString()
    if q_in.rstrip("/") == q_out.rstrip("/"):
        raise ValueError(
            f"compact_parquet: out_dir resolves to in_dir ({q_in}); "
            "overwrite-while-reading would destroy the dataset — "
            "compact to a fresh path and swap")
    df = spark.read.parquet(in_dir)
    files_in = len(df.inputFiles())
    rows = df.count()
    n_files = max(1, math.ceil(rows / max(1, target_rows_per_file)))
    if sort_cols:
        out = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols]) \
            .sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_dir)
    files_out = len(spark.read.parquet(out_dir).inputFiles())
    return {"files_in": files_in, "files_out": files_out, "rows": rows}


# ---------------------------------------------------------------------------
# dataset maintenance: staging vacuum + index health stats
# ---------------------------------------------------------------------------


def vacuum_staging(spark: SparkSession, out_dir: str,
                   ttl_seconds: int = 86400) -> dict:
    """Garbage-collect orphaned ``*__staging`` directories under an
    artifact root.

    COMMITTED stages of a RECOGNIZED family name (the dedup triple, the
    LSH bucket/ledger pair, a counts/docs pair) are rolled forward
    (published) through that family's finish routine, never deleted —
    they are the committed truth of an interrupted append. The finish
    runs whenever ``_COMMIT`` exists REGARDLESS of which staged subdirs
    remain (ADVICE r9): a crash between the publish renames and the
    marker delete leaves a stale ``_COMMIT`` over an empty stage, and
    the finish handles exactly that state idempotently — keeping it
    "for safety" would leave the debris in place forever. Only a
    committed stage whose NAME matches no known family is KEPT, loudly
    counted under ``kept`` — publishing it through the wrong protocol
    would delete the marker without moving anything and erase that
    family's committed truth. ``…__publishing`` siblings (the
    rename-claimed publish work dirs, ADVICE r9) are recovered the
    same way: committed → rolled forward; marker-less → completed-
    publish debris, deleted by the family finish. UNcommitted stages
    older than ``ttl_seconds`` are deleted: debris from a writer that
    crashed before its commit point. The age is the stage's RECURSIVE
    max modification time — task writes land in grandchild files
    (``subdir/_temporary/...``) that never refresh the staging dir's
    own mtime, so a top-level-mtime TTL would delete a stage mid-write
    under a slow live writer. Returns {published, deleted, kept}.

    Driver-side metadata only — no Spark job beyond the publish reads a
    committed stage itself needs. Like the staged-commit protocol it
    cleans up after, vacuum assumes ONE maintenance actor per artifact
    root at a time (see ``_finish_staging``)."""
    import time as _time

    fs, P = _hadoop_fs(spark, out_dir)
    root = P(out_dir)
    published = deleted = kept = 0
    if not fs.exists(root):
        return {"published": 0, "deleted": 0, "kept": 0}
    now_ms = int(_time.time() * 1000)

    def _max_mtime(path) -> int:
        newest = 0
        stack = [path]
        while stack:
            cur = stack.pop()
            for child in fs.listStatus(cur):
                newest = max(newest, child.getModificationTime())
                if child.isDirectory():
                    stack.append(child.getPath())
        return newest

    def _family_finish(base: str) -> bool:
        """Run the staged-commit finish of a recognized family name;
        True if the name was recognized (finish is idempotent and
        handles empty/renamed-away stages + __publishing leftovers)."""
        if base in _FAMILIES:
            _FAMILIES[base].finish(spark, out_dir)
            return True
        if base.endswith("_counts"):
            _counts_family(base, base.replace("_counts", "_docs")) \
                .finish(spark, out_dir)
            return True
        return False

    finished: set = set()
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not st.isDirectory():
            continue
        if name.endswith("__staging"):
            base = name[: -len("__staging")]
        elif name.endswith("__publishing"):
            base = name[: -len("__publishing")]
        else:
            continue
        stage = f"{out_dir}/{name}"
        if fs.exists(P(f"{stage}/_COMMIT")):
            if base in finished:     # sibling already rolled this family
                continue             # forward in this very sweep
            if _family_finish(base):
                finished.add(base)
                published += 1
            else:
                kept += 1        # committed but unrecognized: never touch
        elif name.endswith("__publishing"):
            # marker gone → that publish completed; the dir is debris
            # from a crash between the marker delete and the dir delete
            fs.delete(st.getPath(), True)
            deleted += 1
        elif now_ms - max(st.getModificationTime(),
                          _max_mtime(st.getPath())) > ttl_seconds * 1000:
            fs.delete(st.getPath(), True)
            deleted += 1
        else:
            kept += 1            # possibly a live writer — leave it
    return {"published": published, "deleted": deleted, "kept": kept}


def index_stats(spark: SparkSession, index: DataFrame,
                key_cols: list[str]) -> DataFrame:
    """Health profile of a persisted index's bucket/list layout:
    (n_keys, total_rows, min_rows, max_rows, avg_rows, p99_rows,
    skew = max/avg) over the ``key_cols`` grouping — the number an
    operator reads before choosing nprobe / deciding a rebuild (a
    skewed IVF list or LSH bucket turns a probe into a scan; at 100 TB
    this table IS the retrain trigger).

    Scale shape: one partial-aggregated exchange on the key columns to
    |keys| rows, then a single-row global aggregate; the nearest-rank
    p99 runs on the bounded per-key count table."""
    per_key = index.groupBy(*[F.col(c) for c in key_cols]) \
        .agg(F.count(F.lit(1)).alias("rows"))
    from pyspark.sql import Window

    ranked = (per_key
              .withColumn("rn", F.row_number().over(
                  Window.orderBy(F.col("rows").asc())))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy(F.lit(1)))))
    p99 = (ranked.filter(F.col("rn") == F.ceil(F.col("n") * 0.99 - 1e-9))
           .select(F.col("rows").alias("p99_rows")))
    from .functions.portable import fround

    agg = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("rows").alias("total_rows"),
        F.min("rows").alias("min_rows"),
        F.max("rows").alias("max_rows"))
    # LEFT join, not crossJoin: an EMPTY index yields one global-agg row
    # (n_keys=0) with a null p99 — a crossJoin against the empty p99 side
    # returned ZERO rows, vanishing exactly when the index is at its worst
    return (agg.join(p99, F.lit(True), "left")
            .select("n_keys", "total_rows", "min_rows", "max_rows",
                    "p99_rows",
                    fround(F.col("total_rows").cast("double")
                           / F.col("n_keys"), 6).alias("avg_rows"),
                    fround(F.col("max_rows").cast("double")
                           * F.col("n_keys") / F.col("total_rows"), 6)
                    .alias("skew")))
