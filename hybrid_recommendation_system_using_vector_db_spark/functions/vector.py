"""Vector column expressions over ``array<float>`` embeddings.

All math is JVM-side (higher-order functions inside whole-stage codegen) —
no Python crosses the hot path. Vectors are SQL ``array<float>`` on disk
(parquet-friendly, SURVEY §1.2) and are cast to ``array<double>`` before any
arithmetic so results are reproducible against the DuckDB oracle: both
engines then fold the identical doubles in array order.

Cosine semantics follow the reference: ChromaDB cosine distance → similarity
``1 - d`` (``Hybrid_Recom_vecdb.py:183-184``) i.e. plain cosine similarity,
clamped to [0,1] (``:184-185``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    """array<float> → array<double> (element-wise exact widening)."""
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product as a left fold in array order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize; zero vectors stay zero."""
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with zero-norm guard (→ 0.0)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def clamp01(x: Column) -> Column:
    """max(0, min(1, x)) — ref :184-185 (G7)."""
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), x))
