"""BPE tokenizer training over the corpus (Sennrich et al. 2016).

Not in the reference (it never tokenizes subword); this is the
tokenizer-training stage of an LLM data pipeline, and the classic
iterative Spark workload: each merge round is one bounded aggregation
over the WORD VOCABULARY (distinct words × counts — corpus-size
independent after the first pass), an argmax collected to the driver
(one row), and a map-only re-segmentation of the vocab.

Scale design (100 TB corpus):
- The corpus is read ONCE: the word-count aggregation shuffles
  (word, count) pairs with map-side combine; everything after runs on
  the vocabulary table, which is bounded by |distinct words| and does
  not grow with corpus size.
- Per merge round: pair counts explode ≤ |word|−1 pairs per vocab row
  into a partial-agg sum keyed by pair (bounded by distinct adjacent
  pairs), a 1-row driver collect picks the argmax (count desc, pair asc
  — deterministic), and the greedy merge is a pure array-expression fold
  (``aggregate`` HOF) — map-only, no shuffle.
- The vocab is ``localCheckpoint``ed per round: the loop would otherwise
  stack n_merges aggregate-HOF plans and re-execute the whole history
  each round (the iterative-lineage lifecycle of ``graph.pagerank``).
  Checkpoints are LAZY (``eager=False``): the re-segmented vocab
  materializes inside the NEXT round's argmax action, so each round
  costs exactly one Spark action (collect) instead of two
  (checkpoint-materialize + collect) — halving the job count, which at
  n_merges=8 is the dominant cost (job overhead, not data).

The merge table is NOT SQL-expressible without per-row recursion
(re-segmentation feeds the next round's counts), so the driver entry is
rows-only checked; exactness is pinned in pytest against an independent
pure-Python BPE reference on the same corpus
(``tests/test_extensions.py::test_bpe_train_matches_python_reference``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texttools as TT


def _merge_pair_expr(syms, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol, as a pure array fold: acc + x, except when the accumulator's
    last element is ``left`` and x is ``right`` — then the pair collapses
    to ``left||right``.  Greedy-left matches the reference algorithm on
    runs (e.g. pair (a,a) over "aaaa" → [aa, aa])."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l) & (x == lit_r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(documents: DataFrame, n_merges: int = 8,
              text_col: str = "text",
              end_of_word: str = "</w>") -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (merge_rank int, left, right, pair_count bigint) in learned order.

    Words are the repo-wide space-split tokens; each word starts as its
    character sequence plus an ``end_of_word`` marker symbol (the
    Sennrich formulation, so word-final merges are distinct from
    word-internal ones).  Ties on pair count break lexicographically on
    (left, right) — deterministic across engines and runs.
    """
    spark = documents.sparkSession
    vocab = (
        documents.select(F.explode(TT.tokens(F.col(text_col))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.split(F.col("w"), ""),
                F.array(F.lit(end_of_word)),
            ).alias("syms"),
            "cnt",
        )
        .localCheckpoint(eager=False)
    )
    merges = []
    for rank in range(n_merges):
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda l, r: F.struct(l.alias("l"), r.alias("r")),
                )
            ).alias("p"),
            "cnt",
        )
        top = (
            pairs.groupBy("p").agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, n = top[0]["p"]["l"], top[0]["p"]["r"], top[0]["n"]
        merges.append((rank, left, right, int(n)))
        vocab = vocab.select(
            _merge_pair_expr(F.col("syms"), left, right).alias("syms"),
            "cnt",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long")


def bpe_encode(documents: DataFrame, merges, id_col: str = "doc_id",
               text_col: str = "text",
               end_of_word: str = "</w>") -> DataFrame:
    """Apply a trained merge table: (id_col, n_words, n_tokens, tokens).

    ``merges``: the ``bpe_train`` output DataFrame (or a list of
    (left, right) pairs in rank order). The merge table is driver-side
    by construction — it is the tokenizer artifact, n_merges rows.

    Scale design: segmentation is computed once per DISTINCT word (the
    dictionary-encode trick — the word vocabulary is corpus-size-bounded,
    occurrences are not), as one map-only projection folding the merges
    in rank order over the character array (each fold is the same
    greedy-left ``aggregate`` HOF the trainer uses, so train and encode
    cannot diverge). Occurrences then join the segmented vocabulary on
    the word key — AQE picks broadcast when the vocab fits, hash join
    otherwise — and re-aggregate per document. The document text is
    never re-scanned per merge.
    """
    if isinstance(merges, DataFrame):
        merges = [(r["left"], r["right"])
                  for r in merges.orderBy("merge_rank").collect()]
    words = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(TT.tokens(F.col(text_col))).alias("pos", "w"))
    vocab = words.select("w").distinct()
    syms = F.concat(F.split(F.col("w"), ""), F.array(F.lit(end_of_word)))
    for left, right in merges:
        syms = _merge_pair_expr(syms, left, right)
    seg = vocab.select("w", syms.alias("syms"))
    # collect_list is partition-order-nondeterministic — sort the (pos,
    # syms) structs before flattening so the token sequence is stable
    return (
        words.join(seg, "w")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_words"),
             F.sum(F.size("syms")).alias("n_tokens"),
             F.flatten(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                 lambda s: s["syms"])).alias("tokens"))
        .select(F.col("doc_id").alias(id_col), "n_words", "n_tokens", "tokens")
    )
