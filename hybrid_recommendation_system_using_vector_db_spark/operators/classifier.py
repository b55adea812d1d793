"""Trained document-quality classifier (fastText-class linear filter).

Large-scale LLM data pipelines train a lightweight linear classifier on
weak labels — "looks like the trusted corpus" vs not (GPT-3's WebText
quality filter, LLaMA's Wikipedia-reference classifier, the CCNet
variants) — and keep / bucket crawl documents by the scored probability.
This is that stage, Spark-first; not in the reference (which never
filters by learned quality — its corpus is the curated amazon-meta dump,
`Hybrid_Recom_vecdb.py:96-117` trusts every record).

Design:

- **features**: the repo's deterministic hashing-trick embedding
  (``embeddings.hashing_embedder`` — Arrow-batched ``mapInPandas``,
  dim-bounded, reproduced in SQL by the ``hash_embeddings`` oracle), so
  the whole scoring chain stays oracle-expressible.
- **training**: MLlib ``LogisticRegression`` on the labeled sample.
  Iterative LBFGS — state bounded by ``dim``, not corpus size; at 100 TB
  you train on a labeled sample (as every production quality filter
  does) and the coefficients are the ~dim-sized artifact. Rows-only at
  the static-oracle layer (like ALS / trained PCA); cross-engine pinned
  by a DYNAMIC DuckDB oracle test that injects the trained coefficients
  as literals.
- **serving**: coefficients fold into a LITERAL dot product + sigmoid —
  one map-only projection over the corpus, no MLlib anywhere on the
  scoring path, broadcast-nothing (the weights are plan literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import ROUND_SCORE
from ..embeddings import EMBED_DIM, hashing_embedder
from ..functions.portable import fround


def train_quality_classifier(labeled: DataFrame, label_col: str = "label",
                             id_col: str = "doc_id", text_col: str = "text",
                             dim: int = EMBED_DIM, max_iter: int = 100,
                             reg_param: float = 0.0) -> tuple[list[float], float]:
    """Train a binary logistic-regression quality model over hashed
    features; returns ``(weights, bias)`` — the dim-sized serving
    artifact (driver-side by construction, like the PQ codebooks).

    ``labeled``: rows with ``label_col`` ∈ {0, 1} (1 = keep-quality).
    ``standardization=False`` so the learned weights apply to the raw
    unit-norm hashed features the serving path computes.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = hashing_embedder(
        labeled.select(F.col(id_col), F.col(text_col)), id_col, text_col,
        dim=dim)
    data = feats.join(
        labeled.select(F.col(id_col),
                       F.col(label_col).cast("double").alias("label")),
        id_col)
    ds = data.select(
        array_to_vector(F.col("embedding").cast("array<double>"))
        .alias("features"),
        "label")
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            standardization=False)
    model = lr.fit(ds)
    return [float(w) for w in model.coefficients], float(model.intercept)


def quality_classifier_scores(documents: DataFrame, weights: list[float],
                              bias: float, id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Score documents with a trained linear quality model:
    (doc_id, prob, pred) with prob = σ(w·x + b) over the hashed
    features, pred = 1 at the standard 0.5 threshold.

    Scale shape: one Arrow-batched feature pass + a map-only literal
    dot/sigmoid projection — zero joins, zero shuffles, zero driver
    round-trips on the scoring path; the weights ride the plan as
    literals exactly like the PCA/whitening projections.
    """
    emb = hashing_embedder(documents.select(F.col(id_col), F.col(text_col)),
                           id_col, text_col, dim=len(weights))
    warr = F.array(*[F.lit(float(w)) for w in weights])
    z = F.aggregate(
        F.zip_with(F.col("embedding").cast("array<double>"), warr,
                   lambda x, w: x * w),
        F.lit(0.0), lambda a, x: a + x) + F.lit(float(bias))
    # pred derives from the SAME rounded prob the caller sees (and the
    # streaming gate thresholds on): at the 0.5 boundary the rounded and
    # unrounded sigmoid can straddle the threshold, and cross-engine
    # pins rely on the rounding convention, not exact float agreement.
    prob = fround(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), ROUND_SCORE)
    return emb.select(
        F.col(id_col),
        prob.alias("prob"),
        (prob >= 0.5).cast("int").alias("pred"))
