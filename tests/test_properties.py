"""Property-based tests (hypothesis): portable rounding identity, vector
math vs numpy, top-k partition-invariance (SURVEY §5.3)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hybrid_recommendation_system_using_vector_db_spark.functions.portable import fround
from hybrid_recommendation_system_using_vector_db_spark.operators.similarity import cosine_topk

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@given(st.lists(finite, min_size=1, max_size=40))
@settings(max_examples=20, deadline=None)
def test_fround_matches_python_formula(spark, xs):
    """Spark fround == the pure-python floor(x*1e6+0.5)/1e6 on every input."""
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [r.y for r in df.select(fround(F.col("x"), 6).alias("y")).collect()]
    want = [math.floor(x * 1e6 + 0.5) / 1e6 for x in xs]
    assert got == want


@given(st.integers(min_value=1, max_value=96), st.integers(min_value=0, max_value=2**31))
@settings(max_examples=10, deadline=None)
def test_vector_dot_unrolled_equals_hof_any_dim(spark, dim, seed):
    """Unrolled dot (dim hint) is bitwise-identical to the HOF fold."""
    from hybrid_recommendation_system_using_vector_db_spark.functions import vector as V

    rng = np.random.RandomState(seed % (2**31))
    a = rng.randn(dim).tolist()
    b = rng.randn(dim).tolist()
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    [row] = df.select(
        V.dot(F.col("a"), F.col("b")).alias("hof"),
        V.dot(F.col("a"), F.col("b"), dim).alias("unrolled"),
    ).collect()
    assert row.hof == row.unrolled  # exact, not approx


def test_topk_invariant_under_partitioning(spark):
    """cosine_topk results identical for 1 vs 17 input partitions."""
    rng = np.random.RandomState(7)
    rows = [(int(i), rng.randn(8).astype("float32").tolist()) for i in range(300)]
    emb1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    emb17 = emb1.repartition(17)
    q = emb1.filter(F.col("vec_id") % 50 == 0)
    r1 = sorted(map(tuple, cosine_topk(q, emb1, 5).collect()))
    r17 = sorted(map(tuple, cosine_topk(q.repartition(3), emb17, 5).collect()))
    assert r1 == r17
