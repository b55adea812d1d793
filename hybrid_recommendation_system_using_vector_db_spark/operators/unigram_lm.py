"""Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece model).

Not in the reference (it never tokenizes subword); with ``bpe.py`` this
completes the two tokenizer families an LLM data pipeline trains. Where
BPE greedily merges the single most frequent pair per round, unigram-LM
starts from a LARGE seed piece inventory and runs EM — Viterbi-segment
every word under current piece log-probs, re-estimate probs from usage,
prune to the target vocabulary.

Scale design (100 TB corpus):
- The corpus is read ONCE into the word vocabulary (word, cnt): the
  same corpus-size-independent table ``bpe.bpe_train`` uses. Seeding,
  EM, and pruning all run on vocab-bounded tables.
- Seeding is pure SQL: explode every ≤ ``max_piece_len`` substring of
  every vocab word (≤ |word|·L pieces per row) into a partial-agg count
  keyed by piece, keep the top ``seed_size`` by (weighted count desc,
  piece asc) plus every single character (so segmentation always exists).
- The E-step is the one genuinely non-relational stage: per-word Viterbi
  DP over the piece inventory. It runs as an Arrow-batched ``mapInPandas``
  over the WORD VOCABULARY (not the corpus) with the piece table captured
  in the closure — piece inventory ≤ seed_size rows, words bounded by
  |distinct words|; O(|word|·L) per word. A row-at-a-time UDF over the
  corpus would be wrong; a vocab-bounded batch UDF is the designed
  exception (SURVEY §custom-operators tier (b)).
- The M-step is one partial-agg sum keyed by piece; the updated table
  (≤ seed_size rows) is collected to the driver per round — the bounded
  driver state every iterative trainer here holds (BPE's argmax, the
  IVF/PQ codebooks), one Spark action per EM round.

Correctness: EM + Viterbi recursion is not SQL-expressible, so driver
entries are rows-only; exactness is pinned in pytest against an
independent pure-Python implementation on the same corpus
(``tests/test_extensions.py::test_unigram_lm_matches_python_reference``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texttools as TT

_EOW = "▁"  # SentencePiece-style word marker (leading, per the original)


def _word_counts(documents: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt) over marker-prefixed whitespace words — one corpus pass."""
    return (
        documents.select(F.explode(TT.tokens(F.col(text_col))).alias("w0"))
        .select(F.concat(F.lit(_EOW), F.col("w0")).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    )


def _seed_pieces(words: DataFrame, seed_size: int,
                 max_piece_len: int) -> DataFrame:
    """Top-``seed_size`` substrings by weighted frequency, plus every
    single character. Pure SQL: substring explode → partial-agg →
    TakeOrdered-style window with (cnt desc, piece asc) ties."""
    subs = words.select(
        F.explode(
            F.flatten(F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.transform(
                    F.sequence(
                        F.lit(1),
                        F.least(F.lit(max_piece_len), F.length("w") - i + 1)),
                    lambda l: F.col("w").substr(i, l)),
            ))
        ).alias("piece"),
        "cnt")
    counts = subs.groupBy("piece").agg(F.sum("cnt").alias("n"))
    # global top-N via orderBy().limit() — TakeOrderedAndProject, which
    # runs per-partition top-N then merges on the driver; NOT a global
    # row_number window, which would funnel every piece through one task
    # (the zorder_layout_stats defect class, ADVICE r6 #1)
    top = counts.filter(F.length("piece") > 1) \
        .orderBy(F.col("n").desc(), F.col("piece").asc()).limit(seed_size)
    chars = counts.filter(F.length("piece") == 1)
    return chars.unionByName(top)


def _viterbi(word: str, logp: dict, max_piece_len: int):
    """Best segmentation of ``word`` under piece log-probs: max total
    logp, ties → fewer pieces, then lexicographically smaller piece list
    (deterministic across engines and partitionings). Returns a list of
    pieces, or None if unsegmentable (unseen character)."""
    n = len(word)
    NEG = float("-inf")

    def better(a, b):
        """a strictly preferred over b: higher score (rounded to kill
        float-order noise), then fewer pieces, then lexicographically
        smaller piece tuple — deterministic across engines/partitions."""
        ka = (round(a[0], 12), a[1])
        kb = (round(b[0], 12), b[1])
        if ka != kb:
            return ka > kb
        return a[2] < b[2]

    # dp[i]: (score, -n_pieces, pieces_tuple) best for prefix of length i
    dp = [(NEG, 0, ())] * (n + 1)
    dp[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        best = (NEG, 0, ())
        for j in range(max(0, i - max_piece_len), i):
            if dp[j][0] == NEG:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            cand = (dp[j][0] + lp, dp[j][1] - 1, dp[j][2] + (piece,))
            if best[0] == NEG or better(cand, best):
                best = cand
        dp[i] = best
    return list(dp[n][2]) if dp[n][0] != NEG else None


def _estep_counts(words: DataFrame, logp: dict, max_piece_len: int) -> DataFrame:
    """E-step: Viterbi-segment each vocab word, emit (piece, n) usage
    weighted by word count. Arrow-batched over the vocab table; the
    piece dict rides the closure (≤ seed_size entries)."""
    import pandas as pd

    def seg(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            counts: dict[str, int] = {}
            for w, c in zip(pdf["w"], pdf["cnt"]):
                pieces = _viterbi(w, logp, max_piece_len)
                if pieces is None:
                    continue
                for p in pieces:
                    counts[p] = counts.get(p, 0) + int(c)
            if counts:
                yield pd.DataFrame(
                    {"piece": list(counts), "n": list(counts.values())})

    part = words.mapInPandas(seg, "piece string, n long")
    return part.groupBy("piece").agg(F.sum("n").alias("n"))


def unigram_lm_train(documents: DataFrame, vocab_size: int = 64,
                     n_iters: int = 3, seed_size: int = 256,
                     max_piece_len: int = 4,
                     text_col: str = "text") -> DataFrame:
    """Train a unigram-LM piece inventory; returns (piece, logp, n_used)
    sorted by (n_used desc, piece asc), |rows| ≤ vocab_size (single
    characters are always retained so every word stays segmentable).

    EM rounds: Viterbi E-step over the word vocab → usage M-step →
    re-normalized log-probs; after the final round, prune multi-char
    pieces outside the top ``vocab_size`` by usage and re-run one
    E/M pass so the reported usage reflects the pruned inventory.
    """
    spark = documents.sparkSession
    words = _word_counts(documents, text_col).localCheckpoint(eager=False)
    seed = _seed_pieces(words, seed_size, max_piece_len)
    # bounded driver state: ≤ seed_size + |charset| rows, the codebook
    # lifecycle — one collect per EM round
    rows = seed.collect()
    inventory = sorted(r["piece"] for r in rows)
    charset = [p for p in inventory if len(p) == 1]
    total = sum(r["n"] for r in rows) or 1
    logp = {r["piece"]: math.log(r["n"] / total) for r in rows}

    def em_round(cur: dict) -> dict:
        used = _estep_counts(words, cur, max_piece_len).collect()
        return {r["piece"]: int(r["n"]) for r in used}

    def smooth(usage: dict, inv: list) -> dict:
        """Add-1-smoothed log-probs over a FIXED inventory: zero-usage
        pieces (single chars EM never picks) keep a finite floor instead
        of vanishing — dropping them would make rare-char words
        unsegmentable mid-EM (SentencePiece never drops the charset)."""
        tot = sum(usage.get(p, 0) for p in inv) + len(inv)
        return {p: math.log((usage.get(p, 0) + 1) / tot) for p in inv}

    used: dict = {}
    for _ in range(n_iters):
        used = em_round(logp)
        logp = smooth(used, inventory)
    # prune multi-char pieces outside the top vocab_size by usage; ALL
    # single chars are retained, then one final E/M pass so usage counts
    # describe the pruned inventory
    keep_multi = sorted(
        [(p, n) for p, n in used.items() if len(p) > 1],
        key=lambda pn: (-pn[1], pn[0]))
    n_multi = max(0, vocab_size - len(charset))
    kept = charset + [p for p, _ in keep_multi[:n_multi]]
    logp = smooth(used, kept)
    final = em_round(logp)
    # report the FULL kept inventory (single chars with zero final usage
    # included — they are what keeps every in-charset word segmentable),
    # add-1 smoothed over the inventory so unused pieces get a finite logp
    flogp = smooth(final, kept)
    out = sorted(((p, final.get(p, 0)) for p in kept),
                 key=lambda pn: (-pn[1], pn[0]))
    return spark.createDataFrame(
        [(p, flogp[p], n) for p, n in out],
        "piece string, logp double, n_used long")


def unigram_lm_encode(documents: DataFrame, pieces, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_piece_len: int = 4) -> DataFrame:
    """Apply a trained inventory: (id_col, n_words, n_tokens, tokens).

    ``pieces``: the ``unigram_lm_train`` output DataFrame (or a list of
    (piece, logp) pairs). Segmentation is computed once per DISTINCT
    word (the ``bpe_encode`` dictionary-encode trick) via the same
    Viterbi the trainer uses — train and encode cannot diverge —
    then occurrences join the segmented vocab and re-aggregate per doc.
    Words containing characters outside the inventory yield null pieces
    and are counted in ``n_oov_words``.
    """
    import pandas as pd

    if isinstance(pieces, DataFrame):
        logp = {r["piece"]: float(r["logp"]) for r in pieces.collect()}
    else:
        logp = {p: float(lp) for p, lp in pieces}

    words = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(TT.tokens(F.col(text_col))).alias("pos", "w0")
    ).select("doc_id", "pos", F.concat(F.lit(_EOW), F.col("w0")).alias("w"))
    vocab = words.select("w").distinct()

    def seg(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = pdf[["w"]].copy()
            out["syms"] = [_viterbi(w, logp, max_piece_len)
                           for w in pdf["w"]]
            yield out

    segd = vocab.mapInPandas(seg, "w string, syms array<string>")
    return (
        words.join(segd, "w")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_words"),
             F.sum(F.when(F.col("syms").isNull(), 1).otherwise(0))
              .alias("n_oov_words"),
             F.sum(F.coalesce(F.size("syms"), F.lit(0))).alias("n_tokens"),
             F.flatten(F.transform(
                 F.array_sort(F.collect_list(F.struct(
                     "pos", F.coalesce("syms", F.array()).alias("syms")))),
                 lambda s: s["syms"])).alias("tokens"))
        .select(F.col("doc_id").alias(id_col), "n_words", "n_oov_words",
                "n_tokens", "tokens")
    )
