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


def cms_heavy_hitters(df: DataFrame, value_col: str,
                      depth: int = 4, width: int = 256,
                      phi: float = 0.01) -> DataFrame:
    """Count-min-sketch φ-heavy-hitters: (value, est_count) for every
    value whose CMS point estimate reaches ``ceil(phi · N)``.

    est(v) = min over the ``depth`` hash rows of the (row, bucket) counter
    v lands in — the classic one-sided estimator (est ≥ true count, with
    est ≤ true + 2N/width at ≥ 1 − (1/2)^depth per row pair).  Like KMV,
    every hash is deterministic md5 arithmetic, so the whole sketch — and
    therefore the approximate answer itself — is a pure function of the
    input multiset that a DuckDB oracle reproduces bit-for-bit.

    Scale shape: the build explodes each row into ``depth`` (row, bucket)
    keys whose partial aggregation collapses to ≤ depth·width entries PER
    PARTITION before the shuffle — the sketch table is bounded at
    depth·width rows regardless of corpus size (the bounded-state claim
    CMS exists for).  The probe joins the DISTINCT values (O(distinct),
    the same honesty note as ``kmv_distinct``) against the broadcast
    sketch; the production point-query form holds the depth·width table
    driver-side and answers lookups without a job.  NULL values are
    dropped (no meaningful count key).
    """
    v = (df.filter(F.col(value_col).isNotNull())
         .select(F.col(value_col).alias("val"),
                 F.col(value_col).cast("string").alias("vs")))
    buckets = [
        (hex8_u32(F.md5(F.concat(F.lit(f"cms{r}:"), F.col("vs"))))
         % F.lit(width)).alias(f"b{r}")
        for r in range(depth)
    ]
    keyed = v.select("val", *buckets)
    expl = keyed.select(
        "val",
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"), F.col(f"b{r}").alias("b"))
            for r in range(depth)])).alias("rb"),
    ).select("val", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    sketch = expl.groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))
    n = v.agg(F.count(F.lit(1)).cast("double").alias("n"))
    probe = expl.distinct()
    est = (
        probe.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("val")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.crossJoin(F.broadcast(n))
        .filter(F.col("est_count") >= F.ceil(F.lit(phi) * F.col("n")))
        .select(F.col("val").alias(value_col), "est_count")
    )
