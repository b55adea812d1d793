"""Deterministic distinct-count sketch (KMV / k-minimum-values).

Not in the reference (its only distinct counting is Python ``set``); this
is the "novel sketch" extension slot of the training-data-pipeline
surface. KMV estimates a group's distinct cardinality from the k smallest
values of a uniform hash of its elements: with u_k the k-th smallest
distinct hash in (0,1], estimate = (k-1)/u_k; groups with fewer than k
distinct elements are exact by construction.

Unlike HLL (whose register layout is engine-specific, so Spark's
``approx_count_distinct`` can never value-match another engine), KMV on a
portable hash is a pure function of the input SET — the DuckDB oracle
reproduces the estimate bit-for-bit, which is what makes an approximate
operator hash-checkable at all.

Scale shape: the relational form below shuffles the distinct (group,
hash) pairs — O(distinct) like exact count-distinct, chosen here because
it is plan-transparent and oracle-checkable. The bounded-state production
form is the same estimator inside a custom Aggregator/UDAF keeping a
k-element max-heap per group (state = k doubles per group regardless of
cardinality), or `pandas_udf` GROUPED_AGG; the estimator and this
module's tests carry over unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hex8_u32


def _uniform_hash(col: F.Column) -> F.Column:
    """Deterministic uniform (0,1] hash: first 8 md5 hex chars as u32.

    Unseeded md5 of the raw value (not ``seeded_key``) — the sketch hash
    is part of the estimator's identity, mirrored verbatim in the oracle.
    """
    return (hex8_u32(F.md5(col.cast("string"))) + F.lit(1.0)) / F.lit(4294967296.0)


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group KMV distinct-count estimate: (group_col, est_distinct)."""
    d = (
        df.select(F.col(group_col).alias("grp"),
                  _uniform_hash(F.col(value_col)).alias("u"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("u")
    ranked = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    per = ranked.groupBy("grp").agg(
        F.max("u").alias("uk"), F.count(F.lit(1)).alias("m"))
    est = F.when(F.col("m") < k, F.col("m").cast("double")) \
        .otherwise(F.floor(F.lit(float(k - 1)) / F.col("uk") + F.lit(0.5)))
    return per.select(
        F.col("grp").alias(group_col),
        est.cast("bigint").alias("est_distinct"),
    )
