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


def test_snapshot_diff_identity_and_inverse(spark, sf_dir):
    """diff(x, x) is empty; swapping old/new swaps added<->removed and
    preserves the changed set — algebraic invariants on real data."""
    from pyspark.sql import functions as F

    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table
    from hybrid_recommendation_system_using_vector_db_spark.operators import snapshot

    docs = load_table(spark, sf_dir, "documents")
    assert snapshot.snapshot_diff(docs, docs, ["doc_id"]).count() == 0
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0)
    fwd = {(r.doc_id, r.status)
           for r in snapshot.snapshot_diff(old, new, ["doc_id"]).collect()}
    rev = {(r.doc_id, r.status)
           for r in snapshot.snapshot_diff(new, old, ["doc_id"]).collect()}
    flip = {"added": "removed", "removed": "added", "changed": "changed"}
    assert rev == {(d, flip[s]) for d, s in fwd}


def test_funnel_counts_monotone_nonincreasing(spark, sf_dir):
    """An ordered funnel can only lose users step over step, with or
    without a conversion window; conv_rate starts at 1."""
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table
    from hybrid_recommendation_system_using_vector_db_spark.operators import funnels

    ev = load_table(spark, sf_dir, "events")
    for within in (None, 259200.0):
        rows = sorted(funnels.funnel_steps(
            ev, ["signup", "view", "click", "purchase"],
            within_seconds=within).collect(), key=lambda r: r.step)
        assert rows[0].conv_rate == 1.0
        for a, b in zip(rows, rows[1:]):
            assert b.users <= a.users


@given(st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=1,
                         max_size=60), min_size=2, max_size=8),
       st.integers(min_value=2, max_value=6))
@settings(max_examples=12, deadline=None)
def test_dup_spans_and_removal_invariants(spark, token_lists, anchor_mod):
    """Random token corpora: every reported span has n_copies >= 2 with
    exactly one is_first per digest and n_copies equal to the digest's
    occurrence count; removal keeps first copies (token count conserved:
    removed tokens = tokens of stripped non-first duplicated chunks)."""
    from hybrid_recommendation_system_using_vector_db_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        ["doc_id", "text"])
    spans = dedup.dup_token_spans(docs, anchor_mod=anchor_mod,
                                  min_tokens=1).collect()
    by_digest = {}
    for r in spans:
        by_digest.setdefault(r.digest, []).append(r)
    for occ in by_digest.values():
        assert len(occ) >= 2
        assert all(r.n_copies == len(occ) for r in occ)
        assert sum(1 for r in occ if r.is_first) == 1
        assert len({r.n_tokens for r in occ}) == 1  # same chunk everywhere
    kept = dedup.exact_substring_dedup(docs, anchor_mod=anchor_mod,
                                       min_tokens=1).collect()
    n_in = sum(len(t) for t in token_lists)
    n_out = sum(len(r.text.split()) for r in kept)
    n_stripped = sum(r.n_tokens for occ in by_digest.values()
                     for r in occ if not r.is_first)
    assert n_in == n_out + n_stripped


@given(st.lists(st.floats(min_value=-1e4, max_value=1e4,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=10, deadline=None)
def test_ewma_bounded_by_window_extremes(spark, vs, window_n):
    """EWMA is a convex combination of its window: every output lies in
    [min, max] of the trailing window_n values, for any series."""
    from hybrid_recommendation_system_using_vector_db_spark.operators.profiling import ewma_smooth

    df = spark.createDataFrame(
        [(1, t, v) for t, v in enumerate(vs)], "grp long, t long, v double")
    out = sorted((r.t, r.ewma) for r in ewma_smooth(
        df, "grp", ["t"], "v", alpha=0.4, window_n=window_n).collect())
    for t, e in out:
        win = vs[max(0, t - window_n + 1): t + 1]
        assert min(win) - 1e-6 <= e <= max(win) + 1e-6, (t, e, win)


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50))
@settings(max_examples=10, deadline=None)
def test_grouped_quantiles_values_from_data_and_monotone(spark, vs):
    """Nearest-rank quantiles are actual data values and monotone in p."""
    from hybrid_recommendation_system_using_vector_db_spark.operators.profiling import grouped_quantiles

    df = spark.createDataFrame([("g", v) for v in vs], "grp string, v double")
    out = {r.p: r.q for r in grouped_quantiles(
        df, "grp", "v", ps=(0.1, 0.5, 0.9)).collect()}
    assert set(out) == {0.1, 0.5, 0.9}
    sv = set(vs)
    assert all(q in sv for q in out.values())
    assert out[0.1] <= out[0.5] <= out[0.9]


@given(st.lists(st.lists(st.integers(min_value=0, max_value=25),
                         min_size=0, max_size=12),
                min_size=2, max_size=14),
       st.sampled_from([0.3, 0.5, 0.7, 0.9]))
@settings(max_examples=12, deadline=None)
def test_set_similarity_join_recall_one_property(spark, docs, th):
    """RANDOM token multisets at random thresholds: the prefix-filter
    join equals brute-force all-pairs Jaccard EXACTLY — recall 1 is a
    theorem, so hypothesis hunting the prefix-length/tie edges must
    never find a dropped pair."""
    import itertools
    import math as m

    from hybrid_recommendation_system_using_vector_db_spark.operators.dedup import set_similarity_join

    texts = {i: " ".join(chr(97 + t) for t in toks)
             for i, toks in enumerate(docs)}
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    want = {}
    for i, j in itertools.combinations(sorted(texts), 2):
        a = {w for w in texts[i].split(" ") if w}
        b = {w for w in texts[j].split(" ") if w}
        inter = len(a & b)
        if inter == 0:
            continue
        jac = m.floor(inter / len(a | b) * 1e6 + 0.5) / 1e6
        if jac >= th:
            want[(i, j)] = (inter, jac)
    got = {(r.id1, r.id2): (r.n_common, r.jaccard)
           for r in set_similarity_join(df, threshold=th).collect()}
    assert got == want


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=8, deadline=None)
def test_temporal_reachability_vs_python_relaxation(spark, seed):
    """Random timestamped digraphs: the delta/frontier rounds equal a
    pure-python FULL Bellman-Ford-style earliest-arrival relaxation
    with the same fixed round count — the induction the oracle relies
    on, hunted over random graphs instead of one hand case."""
    import random

    from hybrid_recommendation_system_using_vector_db_spark.operators.graph import temporal_reachability

    rng = random.Random(seed)
    n_nodes = rng.randint(3, 9)
    edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes),
              rng.randint(0, 12))
             for _ in range(rng.randint(1, 22))]
    edges = [(a, b, t) for a, b, t in edges if a != b]
    seeds = sorted({rng.randrange(n_nodes)
                    for _ in range(rng.randint(1, 2))})
    rounds = rng.randint(1, 4)

    arr = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(arr)
        for a, b, t in edges:
            if a in arr and t >= arr[a] and (b not in nxt or t < nxt[b]):
                nxt[b] = min(nxt.get(b, t), t)
        arr = nxt
    if not edges:
        edges = [(0, 0, 0)]  # self-loop: filtered out, schema intact
    edf = spark.createDataFrame(edges, "src long, dst long, t long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r.node: r.arr
           for r in temporal_reachability(edf, sdf,
                                          n_rounds=rounds).collect()}
    assert got == arr, (edges, seeds, rounds)
