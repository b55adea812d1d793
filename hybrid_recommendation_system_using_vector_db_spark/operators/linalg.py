"""Distributed linear algebra over embedding columns: Gram matrix + PCA.

Not in the reference (its vector math is per-query HNSW distances); these
are the batch-analytics primitives a 100 TB embedding corpus needs —
covariance/PCA for whitening, dimensionality reduction before ANN
indexing (the OPQ/``PCAMatrix`` preprocessing step in FAISS pipelines),
and drift monitoring (covariance deltas between corpus snapshots).

Scale design: X^T X is computed as per-partition partial Gram matrices
through Arrow (``mapInPandas`` + one NumPy GEMM per batch — the
``cosine_topk_gemm`` pattern), so the shuffle carries dim·(dim+1)/2 rows
PER PARTITION, never vectors. The driver only ever holds dim×dim doubles
(the codebook pattern of ``kmeans_centroids_local``): eigendecomposition
of a 64×64 (or 1024×1024) matrix is driver-trivial regardless of corpus
size, and the resulting projection matrix re-enters the plan as a
constant-folded literal for a map-only, zero-shuffle projection pass.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.portable import fround
from ..functions import vector as V
from .similarity import _spread, _vec_dim


def gram_matrix(corpus: DataFrame, vec_col: str = "embedding",
                dim: int | None = None) -> DataFrame:
    """Upper-triangular Gram matrix G = X^T X as (i, j, g) rows, i ≤ j.

    One Arrow pass: each record batch contributes ``B.T @ B`` (a single
    dim×dim GEMM), flattened to its dim·(dim+1)/2 upper-triangular
    entries; one hash aggregate sums the partials. The shuffle volume is
    O(partitions · dim²) — independent of row count — and the aggregate
    is partial-agg friendly (map-side combine collapses each partition to
    one partial per (i, j) before the exchange). Feeds :func:`pca_components`
    (center with the mean vector for covariance: cov = G/n − μμ^T).
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    d = dim

    def partial_gram(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        iu = np.triu_indices(d)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.vstack(pdf["__v"].to_numpy()).astype("float64")
            g = x.T @ x
            yield pd.DataFrame({"i": iu[0].astype("int32"),
                                "j": iu[1].astype("int32"),
                                "g": g[iu]})

    part = _spread(corpus.select(
        V.as_double(F.col(vec_col)).alias("__v"))).mapInPandas(
        partial_gram, "i int, j int, g double")
    return (part.groupBy("i", "j")
            .agg(fround(F.sum("g"), 6).alias("g")))


def pca_components(gram_rows: list, n_rows: int | None = None,
                   mean: list | None = None,
                   n_components: int = 8) -> list[list[float]]:
    """Driver-side eigendecomposition of a collected Gram/covariance.

    ``gram_rows``: (i, j, g) upper-triangular entries (the
    :func:`gram_matrix` collect — dim·(dim+1)/2 rows, KBs). With ``mean``
    (the dim-list mean vector) and ``n_rows``, the Gram is centered to
    the scatter matrix S = G − n·μμ^T (eigenvectors of S = principal
    axes of the centered data). Returns the top ``n_components``
    eigenvectors (rows), sign-pinned so the largest-|x| component of each
    vector is positive — deterministic across LAPACK builds up to
    eigenvalue ties.
    """
    import numpy as np

    d = max(j for _, j, _ in gram_rows) + 1
    g = np.zeros((d, d))
    for i, j, v in gram_rows:
        g[i, j] = v
        g[j, i] = v
    if mean is not None:
        mu = np.asarray(mean)
        g = g - float(n_rows if n_rows is not None else 1) * np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:n_components]
    comps = []
    for k in order:
        v = vecs[:, k]
        pin = np.argmax(np.abs(v))
        if v[pin] < 0:
            v = -v
        comps.append([round(float(x), 6) for x in v])
    return comps


def pca_project(corpus: DataFrame, components: list[list[float]],
                id_col: str = "vec_id", vec_col: str = "embedding",
                out_col: str = "pca",
                offsets: list[float] | None = None) -> DataFrame:
    """Project vectors onto literal PCA components — map-only, zero
    shuffles. Each output coordinate is one HOF dot against a constant-
    folded component literal (the ``hyperplane_bits`` expression shape);
    at 100 TB this is a pure scan+write pass, and the projected column
    is what the ANN index should be built on when dim reduction pays.

    ``offsets``: optional per-coordinate constants subtracted AFTER the
    dot — mean-centering folded into the projection, since
    (x − μ)·w = x·w − μ·w and μ·w is a literal. This is how
    :func:`whitening_components` applies without a second pass."""
    dots = []
    for k, comp in enumerate(components):
        arr = "array(" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in comp) + ")"
        d = (f"aggregate(zip_with({arr}, transform({vec_col}, "
             f"v -> CAST(v AS DOUBLE)), (x, y) -> x * y), "
             f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
        if offsets is not None:
            d = f"({d} - CAST('{offsets[k]!r}' AS DOUBLE))"
        dots.append(d)
    # integer scale constants (not 1000000.0 — a decimal literal would
    # drag the whole expression into DECIMAL arithmetic)
    expr = "array(" + ", ".join(
        f"floor(({dt}) * 1000000 + 0.5) / 1000000" for dt in dots) + ")"
    return corpus.select(F.col(id_col), F.expr(expr).alias(out_col))


def whitening_components(gram_rows: list, n_rows: int, mean: list,
                         n_components: int | None = None,
                         eps: float = 1e-9) -> tuple[list, list]:
    """BERT-whitening transform (Su et al. 2021, arXiv:2103.15316):
    W = U·diag(1/√λ) from the eigendecomposition of the sample
    covariance, applied as x → W^T(x − μ). Whitened coordinates have
    ~zero mean and identity covariance — the cheap post-processing that
    makes anisotropic sentence-embedding spaces cosine-retrievable.

    Input is the :func:`gram_matrix` collect + the mean vector + row
    count (all bounded driver state); returns (components, offsets) to
    feed :func:`pca_project` — components are the 1/√λ-scaled
    eigenvector rows, offsets the folded-in μ·w constants, so the apply
    pass stays map-only with literal constants. ``eps`` floors λ so a
    degenerate direction can't blow up the scale."""
    import numpy as np

    d = max(j for _, j, _ in gram_rows) + 1
    g = np.zeros((d, d))
    for i, j, v in gram_rows:
        g[i, j] = v
        g[j, i] = v
    mu = np.asarray(mean, dtype=float)
    cov = g / float(n_rows) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:n_components if n_components else d]
    comps, offs = [], []
    for k in order:
        v = vecs[:, k]
        pin = np.argmax(np.abs(v))
        if v[pin] < 0:
            v = -v
        w = v / float(np.sqrt(max(vals[k], eps)))
        w = [round(float(x), 6) for x in w]
        comps.append(w)
        offs.append(round(float(np.dot(mu, w)), 6))
    return comps, offs


def mean_vector(corpus: DataFrame, vec_col: str = "embedding",
                dim: int | None = None) -> list[float]:
    """Exact per-dimension mean as a driver list (dim doubles): one
    partial-agg aggregate over ``posexplode`` — shuffle volume
    O(partitions·dim), the :func:`gram_matrix` cost class."""
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    rows = (corpus.select(F.posexplode(V.as_double(F.col(vec_col)))
                          .alias("i", "x"))
            .groupBy("i").agg(F.sum("x").alias("s"),
                              F.count(F.lit(1)).alias("n"))
            .collect())
    by_i = {r.i: r.s / r.n for r in rows}
    return [float(by_i.get(i, 0.0)) for i in range(dim)]


def rp_components(out_dim: int = 16) -> list[list[float]]:
    """Johnson–Lindenstrauss random-projection matrix: the first
    ``out_dim`` shared seeded Gaussian hyperplanes
    (``functions.hashing.HYPERPLANES`` — the same fixed-seed constants
    the LSH family embeds in both engines), scaled by 1/√out_dim so
    expected squared norms are preserved.

    With out_dim a power of 4 the scale is a power of two and the scaled
    literals stay exactly representable — both engines parse identical
    decimal strings. This is the data-independent sibling of
    :func:`pca_components` (no training pass at all — the FAISS
    ``PCAMatrix`` slot when you can't afford even one corpus scan);
    apply with :func:`pca_project`.
    """
    from ..functions.hashing import HYPERPLANES

    assert out_dim <= len(HYPERPLANES)
    s = 1.0 / (out_dim ** 0.5)
    return [[x * s for x in plane] for plane in HYPERPLANES[:out_dim]]
