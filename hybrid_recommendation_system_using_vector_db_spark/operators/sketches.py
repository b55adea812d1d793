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
from ..functions.portable import fround


_PARAMS_KEY = "sketch_params"


def _stamp_params(df: DataFrame, what: str, **params) -> DataFrame:
    """Stamp a state table with its sketch parameters (r13 ADVICE: the
    same-parameters merge contract was documentation-only — merging
    states built with different p / depth·width / k / (n_shards, seed)
    type-checked and produced silently meaningless results).

    The stamp rides as METADATA on the first column's schema field, so
    it survives ``select``/``unionByName``/``localCheckpoint`` AND a
    parquet round-trip (Spark persists field metadata in the parquet
    footer's schema property, exactly how ML attribute metadata
    travels) — which is what lets the versioned-state folds in
    ``streaming.events`` keep the stamp across snapshots without any
    schema change: no extra columns, no sidecar files, byte-identical
    data pages."""
    first = df.columns[0]
    meta = {_PARAMS_KEY: {"what": what, **{k: v for k, v in
                                           sorted(params.items())}}}
    return df.withColumn(first, F.col(first).alias(first, metadata=meta))


def read_state_params(df: DataFrame) -> dict | None:
    """The sketch-parameter stamp of a state table (None if unstamped —
    e.g. a pre-r14 snapshot or a hand-built table)."""
    for f in df.schema.fields:
        if f.metadata and _PARAMS_KEY in f.metadata:
            p = f.metadata[_PARAMS_KEY]
            # Spark metadata round-trips ints as longs and may hand back
            # floats for ints read from JSON; normalize numerics so
            # equality is by value
            return {k: (int(v) if isinstance(v, float) and v == int(v)
                        else v) for k, v in p.items()}
    return None


def union_states(states: tuple, what: str) -> DataFrame:
    """Union-all of sketch/manifest state tables — the shared preamble
    of every merge monoid (``hll_merge`` / ``cms_merge`` /
    ``bottomk_merge`` / ``textops.shard_manifest_merge``), with the one
    authoritative empty-input error and (r14) the same-parameters
    contract ENFORCED: every stamped input (:func:`_stamp_params`) must
    carry identical parameters — a mixed-parameter union (different
    p / depth·width / k / (n_shards, seed)) is silently meaningless, so
    it raises here, once, for every merge. Unstamped inputs (pre-r14
    snapshots, hand-built tables) pass through unchecked for
    compatibility; the check engages as soon as two stamps exist."""
    if not states:
        raise ValueError(f"{what}: need at least one state table")
    stamped = [p for p in (read_state_params(s) for s in states)
               if p is not None]
    for p in stamped[1:]:
        if p != stamped[0]:
            raise ValueError(
                f"{what}: mixed sketch parameters — {stamped[0]} vs {p}; "
                "states must be built with identical parameters to merge")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u


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

    Scale shape: ONE corpus scan and ONE exchange. The emit-all-heavy-
    hitters form needs the distinct-value table anyway (the probe side —
    same honesty note as ``kmv_distinct``), so the per-value counts are
    aggregated first (wordcount partial agg, keyed on the value) and
    checkpointed; the depth·width sketch, the probe, and N are all
    derived from that bounded-by-distinct table without touching the
    corpus again (previously the sketch/probe/N branches re-scanned and
    re-hashed the corpus 3× per action). The production point-query form
    keeps the classic bounded-state build: fold the (row, bucket) partial
    aggregation straight off the scan — ≤ depth·width entries per
    partition — hold the table driver-side, answer lookups without a
    job. NULL values are dropped (no meaningful count key).
    """
    v = (df.filter(F.col(value_col).isNotNull())
         .select(F.col(value_col).alias("val"),
                 F.col(value_col).cast("string").alias("vs")))
    buckets = [
        (hex8_u32(F.md5(F.concat(F.lit(f"cms{r}:"), F.col("vs"))))
         % F.lit(width)).alias(f"b{r}")
        for r in range(depth)
    ]
    # buckets are pure functions of val, so grouping by (val, b0..bd) is
    # grouping by val; cnt_by_val feeds three tiny branches — checkpoint
    # so the scan+shuffle runs once per call (the re-execution class)
    cnt_by_val = (v.select("val", *buckets)
                  .groupBy("val", *[f"b{r}" for r in range(depth)])
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .localCheckpoint(eager=True))
    expl = cnt_by_val.select(
        "val", "cnt",
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"), F.col(f"b{r}").alias("b"))
            for r in range(depth)])).alias("rb"),
    ).select("val", "cnt", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    sketch = expl.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))
    # every value lands in hash row 0 exactly once, so row 0's bucket
    # counters sum to N — no extra corpus pass
    n = (sketch.filter(F.col("r") == 0)
         .agg(F.sum("cnt").cast("double").alias("n")))
    est = (
        expl.drop("cnt").join(F.broadcast(sketch), ["r", "b"])
        .groupBy("val")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.crossJoin(F.broadcast(n))
        .filter(F.col("est_count") >= F.ceil(F.lit(phi) * F.col("n")))
        .select(F.col("val").alias(value_col), "est_count")
    )


def cms_cells(df: DataFrame, value_col: str,
              depth: int = 4, width: int = 256) -> DataFrame:
    """The count-min sketch's mergeable STATE: the (r, b, cnt) counter
    table (same md5 bucket derivation as :func:`cms_heavy_hitters`) —
    exposed (r13) because CMS counters obey the additive sketch-union
    algebra: cells(A ∪ B) = cell-wise SUM of cells(A) and cells(B)
    (:func:`cms_merge`), the manifest's monoid applied to frequency
    counters. ≤ depth·width rows regardless of corpus size; point
    estimates and heavy-hitter probes finalize from this table alone."""
    v = (df.filter(F.col(value_col).isNotNull())
         .select(F.col(value_col).cast("string").alias("vs")))
    rb = F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"),
                 (hex8_u32(F.md5(F.concat(F.lit(f"cms{r}:"), F.col("vs"))))
                  % F.lit(width)).alias("b"))
        for r in range(depth)])).alias("rb")
    return _stamp_params(
        v.select(rb)
        .select(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt")),
        "cms", depth=depth, width=width)


def cms_merge(*states: DataFrame) -> DataFrame:
    """Cell-wise SUM of CMS counter tables — merging per-batch sketches
    gives EXACTLY the sketch of the union'd input (counter addition is
    the CMS update rule), so every point estimate from the merged table
    equals the one-shot build's. Bounded: ≤ sides·depth·width rows in,
    ≤ depth·width out. Mixed (depth, width) inputs raise in
    :func:`union_states`; the merged table re-carries the stamp."""
    u = union_states(states, "cms_merge")
    merged = u.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))
    p = next((q for q in map(read_state_params, states) if q), None)
    return _stamp_params(merged, "cms", depth=p["depth"],
                         width=p["width"]) if p else merged


def hll_distinct(df: DataFrame, group_col: str, value_col: str,
                 p: int = 8) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (Flajolet et al.
    2007), portable-hash edition: (group_col, est_distinct).

    Spark's ``approx_count_distinct`` IS an HLL++ — but its register
    layout is engine-private, so its estimate can never be value-checked
    against another engine. This sketch derives both coordinates from
    md5 arithmetic (register = first-8-hex-chars u32 mod m; rank ρ = one
    plus the number of leading zeros of the NEXT 8 hex chars as a u32),
    making the estimate a pure function of the input SET that the DuckDB
    oracle reproduces bit-for-bit — the same honesty contract as
    ``kmv_distinct`` / ``cms_heavy_hitters``.

    Estimator: raw = α_m·m²/(Σ_used 2^(−M_j) + (m − used)); small-range
    correction (raw ≤ 2.5m and empty registers exist) → m·ln(m/zeros).
    Every term is engine-deterministic: 2^(−M_j) are exact binary
    fractions (their sum is exact in a 53-bit double), the α_m literal is
    embedded identically in both engines, and the single ``ln`` sits
    under a half-up floor to an integer — the bm25 idf argument.

    Scale shape: duplicates of a value hash to the SAME (register, ρ),
    so the ``max`` aggregate absorbs them map-side — no DISTINCT
    pre-pass, unlike the relational KMV. State is ≤ m rows per group
    after the first partial aggregate: this is the form whose shuffle is
    bounded by groups·m regardless of corpus size (the production UDAF
    holds the m-byte register array per group; same estimator).
    """
    return hll_estimate(hll_registers(df, group_col, value_col, p),
                        group_col, p)


def hll_registers(df: DataFrame, group_col: str, value_col: str,
                  p: int = 8) -> DataFrame:
    """The HLL's mergeable STATE: the (grp, reg, mr) register table —
    per (group, register) the max rank seen. Exposed separately (r13)
    because registers obey the sketch-union algebra: registers(A ∪ B)
    = register-wise MAX of registers(A) and registers(B)
    (:func:`hll_merge`), so a 100 TB profile maintains its HLL by
    folding per-batch register tables — like the manifest's additive
    sums, but with max as the monoid. ≤ 2^p rows per group."""
    m = 1 << p
    src = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.md5(F.col(value_col).cast("string")).alias("h"))
    u2 = F.conv(F.substring("h", 9, 8), 16, 10).cast("bigint")
    # ρ = 33 − bit_length(u2): leading zeros of the 32-bit window + 1;
    # u2 = 0 (all zeros) pins ρ = 33. bit_length via base-2 conv — exact
    # integer string math, no float log in the hot path.
    rho = F.when(u2 == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.conv(u2.cast("string"), 10, 2)))
    keyed = src.select(
        "grp", (hex8_u32(F.col("h")) % m).alias("reg"), rho.alias("rho"))
    return _stamp_params(
        keyed.groupBy("grp", "reg").agg(F.max("rho").alias("mr")),
        "hll", p=p)


def hll_merge(*states: DataFrame) -> DataFrame:
    """Register-wise MAX of HLL register tables — the sketch-union
    monoid: merging per-batch registers gives EXACTLY the registers of
    the union'd input (same md5 derivation, max is associative/
    commutative/idempotent), so the merged estimate equals the one-shot
    estimate bit-for-bit. Bounded work: a union of ≤ groups·2^p-row
    tables + one partial-agg max. Mixed-``p`` inputs raise in
    :func:`union_states`; the merged table re-carries the stamp."""
    u = union_states(states, "hll_merge")
    merged = u.groupBy("grp", "reg").agg(F.max("mr").alias("mr"))
    p = next((q for q in map(read_state_params, states) if q), None)
    return _stamp_params(merged, "hll", p=p["p"]) if p else merged


def hll_estimate(regs: DataFrame, group_col: str, p: int = 8) -> DataFrame:
    """The HLL estimator tail over a register table (raw harmonic mean
    + small-range correction — see :func:`hll_distinct` for the
    portability argument). If ``regs`` carries a parameter stamp, its
    ``p`` must match — finalizing with the wrong m mis-scales every
    estimate silently (r14, same contract as the merges)."""
    sp = read_state_params(regs)
    if sp is not None and sp.get("what") == "hll" and sp["p"] != p:
        raise ValueError(
            f"hll_estimate: register table was built with p={sp['p']}, "
            f"finalize called with p={p}")
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard bias constant, m ≥ 128
    per = regs.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mr"))).alias("s_used"),
        F.count(F.lit(1)).alias("used"))
    raw = F.lit(alpha * m * m) / (F.col("s_used") + (F.lit(m) - F.col("used")))
    zeros = (F.lit(m) - F.col("used")).cast("double")
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
                 ).otherwise(raw)
    return per.select(
        F.col("grp").alias(group_col),
        F.floor(est + F.lit(0.5)).cast("bigint").alias("est_distinct"))


def _bloom_word(col: F.Column) -> F.Column:
    """48-bit uniform word: first 12 md5 hex chars of the salted value —
    ONE digest + ONE ``conv`` per row, sliced into 12-bit positions by
    integer shifts (pure codegen arithmetic). Mirrored verbatim in the
    oracle's ``_bpos``."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit("bloom:"), col.cast("string"))), 1, 12),
        16, 10).cast("bigint")


def bloom_build(df: DataFrame, value_col: str, m: int = 4096,
                k: int = 3) -> DataFrame:
    """Portable Bloom filter build: the DISTINCT set bit positions of a
    column's values — (pos int), ≤ m rows regardless of corpus size.

    Each value sets ``k`` positions derived from disjoint 12-bit slices
    of ONE 48-bit md5 window (one md5 + one hex→int conversion per row —
    the conversion, not the digest, dominates the per-row cost, so the
    slicing matters; hence k ≤ 4 and m ≤ 4096), making the filter — and
    every downstream membership verdict including its false positives —
    a pure deterministic function of the input SET that the DuckDB
    oracle reproduces bit-for-bit (the sketch-family honesty contract).

    Scale shape: one explode(k) + distinct over positions; the partial
    aggregate collapses to ≤ m entries per partition before the shuffle,
    so the build is bounded-state like the CMS. The production point
    form packs the positions into an m-bit array driver-side (m/8 bytes;
    4096 bits = 512 B) — this relational long form is what makes the
    filter plan-transparent and joinable.
    """
    assert 1 <= k <= 4 and 2 <= m <= 4096, "k·12 bits from one 48-bit window"
    v = (df.filter(F.col(value_col).isNotNull())
         .select(_bloom_word(F.col(value_col)).alias("w")))
    return (v.select(F.explode(F.array(*[
        (F.shiftright(F.col("w"), 12 * i) % F.lit(m)).cast("int")
        for i in range(k)])).alias("pos"))
        .distinct())


def bloom_probe(df: DataFrame, value_col: str, bits: DataFrame,
                m: int = 4096, k: int = 3) -> DataFrame:
    """Bloom membership pre-filter: rows of ``df`` whose value has ALL
    ``k`` positions set in ``bits`` (a ``bloom_build`` table with the
    same m/k) — the manual runtime-filter: build the filter on the small
    side of a join, probe the fact side to prune it BEFORE the shuffle.

    One-sided error: never drops a true member (no false negatives —
    test-pinned); false positives pass at rate ≈ (1 − e^(−kn/m))^k and
    are eliminated by the real join afterwards.

    The positions table is collected once (bounded ≤ m rows — the
    codebook-collect pattern of ``kmeans_centroids_local``) into an
    m-BIT mask packed into ⌈m/64⌉ longs riding the plan as ONE array
    literal, so the probe is a pure map-side filter — zero joins, zero
    shuffles, duplicate fact rows preserved, whole-stage codegen end to
    end — and each bit test is O(1): ``element_at`` on the packed words
    + shift/mask.  (A char-mask ``substring(mask, pos, 1)`` prototype
    measured 30× slower: Substring on a long UTF8String literal walks
    the string per row — the bit-packing is load-bearing, not cosmetic.)
    """
    from .similarity import _spread

    assert 1 <= k <= 4 and 2 <= m <= 4096, "k·12 bits from one 48-bit window"
    words = [0] * ((m + 63) // 64)
    for r in bits.collect():  # bounded: ≤ m rows by construction
        p = int(r.pos)
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed int64 (Spark LongType); (w >> s) & 1
    # still extracts bit s under the arithmetic shift. The whole check is
    # one SQL expression so the variable shift amounts stay legal
    # (F.shiftright only takes literal offsets) — the constant-folded
    # one-Literal pattern of similarity._cents_literal_sql.
    words_sql = "array(" + ", ".join(
        f"{w - (1 << 64) if w >= (1 << 63) else w}L" for w in words) + ")"
    wv = (f"CAST(conv(substring(md5(concat('bloom:', "
          f"CAST(`{value_col}` AS STRING))), 1, 12), 16, 10) AS BIGINT)")
    checks = []
    for i in range(k):
        pos = f"CAST((shiftright({wv}, {12 * i}) % {m}) AS INT)"
        checks.append(
            f"((shiftright(element_at({words_sql}, "
            f"CAST((({pos}) div 64) + 1 AS INT)), "
            f"({pos}) % 64) & 1L) = 1L)")
    cond = F.expr(" AND ".join(checks))
    # _spread: per-row md5 work needs parallelism even from few input
    # files (a local-mode artifact — a no-op on a many-partition corpus)
    return _spread(df.filter(F.col(value_col).isNotNull())).filter(cond)


def sampled_quantiles(df: DataFrame, group_col: str, value_col: str,
                      id_col: str, k: int = 256,
                      ps: tuple = (0.5, 0.9, 0.99),
                      seed: int = 42) -> DataFrame:
    """Bounded-state per-group quantile ESTIMATES from a seeded bottom-k
    uniform row sample — the quantile member of the hash-checkable
    sketch family (KMV distinct / CMS frequency / HLL / Bloom): because
    the sample is the k smallest md5 keys (a pure function of the data,
    like KMV's bottom-k value hashes), the approximate answer itself is
    reproducible bit-for-bit by the DuckDB oracle — which Spark's
    built-in ``percentile_approx`` register layout never can be.

    Estimate: nearest-rank quantile of the sample; for a uniform sample
    of size k the rank error concentrates at O(n·√(ln(1/δ)/k)) (DKW),
    test-bounded against the exact table. State is k rows per group
    through both windows — corpus-size-independent, mergeable (union of
    bottom-k sets → re-take bottom-k), the property that lets 100 TB
    profiles run as partial aggregations. For exact answers on bounded
    groups use ``profiling.grouped_quantiles``; this is the tier for
    unbounded ones.

    Returns (grp, p, q_est, n_sample).
    """
    sample = bottomk_sample(df, group_col, value_col, id_col, k, seed) \
        .select("grp", "v")
    return quantiles_from_sample(sample, ps)


def bottomk_sample(df: DataFrame, group_col: str, value_col: str,
                   id_col: str, k: int = 256,
                   seed: int = 42) -> DataFrame:
    """The quantile sketch's mergeable STATE: the per-group bottom-k
    rows (grp, u, v) under the seeded-md5 key — exposed (r13) because
    bottom-k obeys the sketch-union algebra: the k smallest keys of
    A ∪ B are among the union of each side's k smallest
    (:func:`bottomk_merge`), so per-batch samples fold into exactly the
    sample the full corpus would have produced — the seeded key makes
    that equality bit-exact, not just distributional."""
    from ..functions.hashing import seeded_key

    base = df.select(F.col(group_col).alias("grp"),
                     F.col(value_col).alias("v"),
                     seeded_key(F.col(id_col), seed).alias("u"))
    wk = Window.partitionBy("grp").orderBy("u", "v")
    return _stamp_params(
        base.withColumn("__rk", F.row_number().over(wk))
        .filter(F.col("__rk") <= k)
        .select("grp", "u", "v"),
        "bottomk", k=k, seed=seed)


def bottomk_merge(*states: DataFrame, k: int = 256) -> DataFrame:
    """Re-take the per-group bottom-k over a union of bottom-k samples:
    bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) for any k — the
    merged sample (and every quantile read from it) is bit-identical to
    the one-shot sample of the union'd data. Bounded work: the union
    holds ≤ sides·k rows per group. Mixed (k, seed) inputs — or a
    merge ``k`` larger than the states' build ``k`` (a k-element sample
    cannot be widened after the fact) — raise; the merged table
    re-carries the stamp."""
    p = next((q for q in map(read_state_params, states) if q), None)
    if p is not None and k > p["k"]:
        raise ValueError(
            f"bottomk_merge: merge k={k} exceeds the states' build "
            f"k={p['k']} — a bottom-k sample cannot be widened")
    u = union_states(states, "bottomk_merge")
    wk = Window.partitionBy("grp").orderBy("u", "v")
    merged = (u.withColumn("__rk", F.row_number().over(wk))
              .filter(F.col("__rk") <= k)
              .select("grp", "u", "v"))
    return (_stamp_params(merged, "bottomk", k=k, seed=p["seed"])
            if p else merged)


def quantiles_from_sample(sample: DataFrame,
                          ps: tuple = (0.5, 0.9, 0.99)) -> DataFrame:
    """Nearest-rank quantile estimates over a (grp, v) sample — the
    finalize tail shared by :func:`sampled_quantiles` and the merged-
    sample path."""
    wq = Window.partitionBy("grp").orderBy("v")
    ranked = (sample
              .withColumn("rn", F.row_number().over(wq))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy("grp"))))
    pexp = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    # same 1e-9 rank-product epsilon as profiling.grouped_quantiles
    # (p·n in doubles can land just above an exact integer; ADVICE r8)
    return (ranked.select("grp", "v", "rn", "n", pexp)
            .filter(F.col("rn") == F.ceil(F.col("p") * F.col("n") - 1e-9))
            .select("grp", "p", F.col("v").alias("q_est"),
                    F.col("n").alias("n_sample")))


def kmv_set_ops(a: DataFrame, b: DataFrame, value_col: str,
                k: int = 64) -> DataFrame:
    """KMV set algebra over two element sets — the theta-sketch
    operation family (union / intersection / Jaccard from mergeable
    bottom-k signatures), hash-checkable because KMV on a portable
    hash is a pure function of the input sets (HLL set ops never are).

    Estimators (Beyer et al. 2007 / theta-sketch convention):
      est_union        = KMV over the union's bottom-k
      jaccard_est      = |both-members among the union's bottom-k| / m
                         (m = |bottom-k| — the union sketch is a
                         uniform sample of the union, so the fraction
                         present in BOTH sets estimates J exactly the
                         way a theta sketch does)
      est_intersection = round(jaccard_est · est_union)
    Sides with fewer than k distinct elements are exact by
    construction (the "sketch" is the whole set).

    Scale shape: each side contributes its DISTINCT (hash, flag) rows
    (O(distinct) like the relational ``kmv_distinct``; the bounded-
    state production form is the same k-element heap per side); the
    bottom-k selections are TakeOrdered (no global sort, no
    single-partition exchange) and every aggregate thereafter runs
    over ≤ k rows. All comparisons are on integers or on doubles from
    bit-identical arithmetic — the DuckDB oracle reproduces every
    output value exactly.

    Returns ONE row: (est_a, est_b, est_union, est_intersection,
    jaccard_est).
    """
    ha = a.select(_uniform_hash(F.col(value_col)).alias("u")).distinct()
    hb = b.select(_uniform_hash(F.col(value_col)).alias("u")).distinct()

    def _est(m, uk):
        return (F.when(m < k, m.cast("double"))
                .otherwise(F.floor(F.lit(float(k - 1)) / uk + F.lit(0.5))))

    def _side(h):
        top = h.orderBy("u").limit(k) \
            .agg(F.max("u").alias("uk"), F.count(F.lit(1)).alias("m"))
        return top.select(_est(F.col("m"), F.col("uk")).cast("bigint")
                          .alias("est"))

    # membership flags via union + max-flag aggregate, NOT a full-outer
    # join: FullOuter can't broadcast, so the join form degrades to a
    # SortMergeJoin (two sorts over the distinct-hash tables); the
    # aggregate partial-combines map-side and shuffles one row per
    # distinct hash
    merged = (ha.select("u", F.lit(1).alias("fa"), F.lit(0).alias("fb"))
              .unionByName(hb.select("u", F.lit(0).alias("fa"),
                                     F.lit(1).alias("fb")))
              .groupBy("u")
              .agg((F.max("fa") == 1).alias("in_a"),
                   (F.max("fb") == 1).alias("in_b")))
    utop = (merged.orderBy("u").limit(k)
            .agg(F.max("u").alias("uk"), F.count(F.lit(1)).alias("m"),
                 F.sum(F.when(F.col("in_a") & F.col("in_b"), 1)
                       .otherwise(0)).alias("both")))
    est_u = _est(F.col("m"), F.col("uk"))
    # empty union (both inputs empty) → m = 0: pin J to 0.0 instead of
    # the NULL a 0/0 division yields, so the one-row contract stays
    # fully defined on the edge (ADVICE r10; mirrored in the oracle)
    jacc = F.when(F.col("m") == 0, F.lit(0.0)) \
        .otherwise(F.col("both") / F.col("m"))
    out = utop.select(
        est_u.cast("bigint").alias("est_union"),
        F.floor(jacc * est_u + F.lit(0.5)).cast("bigint")
        .alias("est_intersection"),
        fround(jacc).alias("jaccard_est"))
    return (_side(ha.select("u")).withColumnRenamed("est", "est_a")
            .crossJoin(_side(hb.select("u"))
                       .withColumnRenamed("est", "est_b"))
            .crossJoin(out)
            .select("est_a", "est_b", "est_union",
                    "est_intersection", "jaccard_est"))


def kmv_overlap_by_group(a: DataFrame, b: DataFrame, group_col: str,
                         value_col: str, k: int = 64) -> DataFrame:
    """Per-GROUP KMV set algebra between two element tables — the
    grouped form of :func:`kmv_set_ops` (r14): "how much does corpus
    B's vocabulary overlap corpus A's, PER LANGUAGE / PER DOMAIN?" is
    the corpus-comparison question the one-row global form can't
    answer without a driver loop over groups. Same estimators
    (Beyer et al. 2007 / theta-sketch convention), same portable-hash
    honesty contract: every output value is a pure function of the
    input sets that the DuckDB oracle reproduces bit-for-bit.

    Scale shape: each side contributes its DISTINCT (group, hash)
    rows; membership flags come from the union + max-flag aggregate
    (NOT a full-outer join — the :func:`kmv_set_ops` SortMergeJoin
    argument, per group); the three bottom-k selections are ONE
    group-keyed window each (row_number over the hash order —
    parallel across groups, never a single-partition sort), and every
    aggregate thereafter runs over ≤ k rows per group. Groups present
    on one side only report est=0 for the missing side (their union
    sketch is just the present side).

    Returns (group_col, est_a, est_b, est_union, est_intersection,
    jaccard_est) — one row per group observed on either side.
    """
    def _hashes(df: DataFrame) -> DataFrame:
        return (df.filter(F.col(group_col).isNotNull()
                          & F.col(value_col).isNotNull())
                .select(F.col(group_col).alias("grp"),
                        _uniform_hash(F.col(value_col)).alias("u"))
                .distinct())

    ha, hb = _hashes(a), _hashes(b)
    merged = (ha.select("grp", "u", F.lit(1).alias("fa"),
                        F.lit(0).alias("fb"))
              .unionByName(hb.select("grp", "u", F.lit(0).alias("fa"),
                                     F.lit(1).alias("fb")))
              .groupBy("grp", "u")
              .agg(F.max("fa").alias("in_a"), F.max("fb").alias("in_b"))
              # feeds three window branches (union/a/b bottom-k) —
              # bounded by distinct (grp, hash); pin once
              .localCheckpoint(eager=True))

    def _est(m, uk):
        return (F.when(m < k, m.cast("double"))
                .otherwise(F.floor(F.lit(float(k - 1)) / uk + F.lit(0.5))))

    def _side_est(flag: str, out: str) -> DataFrame:
        wk = Window.partitionBy("grp").orderBy("u")
        side = merged.filter(F.col(flag) == 1)
        top = (side.withColumn("__rk", F.row_number().over(wk))
               .filter(F.col("__rk") <= k)
               .groupBy("grp")
               .agg(F.max("u").alias("uk"), F.count(F.lit(1)).alias("m")))
        return top.select("grp", _est(F.col("m"), F.col("uk"))
                          .cast("bigint").alias(out))

    wk = Window.partitionBy("grp").orderBy("u")
    utop = (merged.withColumn("__rk", F.row_number().over(wk))
            .filter(F.col("__rk") <= k)
            .groupBy("grp")
            .agg(F.max("u").alias("uk"), F.count(F.lit(1)).alias("m"),
                 F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1),
                              1).otherwise(0)).alias("both")))
    est_u = _est(F.col("m"), F.col("uk"))
    jacc = F.when(F.col("m") == 0, F.lit(0.0)) \
        .otherwise(F.col("both") / F.col("m"))
    uni = utop.select(
        "grp", est_u.cast("bigint").alias("est_union"),
        F.floor(jacc * est_u + F.lit(0.5)).cast("bigint")
        .alias("est_intersection"),
        fround(jacc).alias("jaccard_est"))
    return (uni
            .join(_side_est("in_a", "est_a"), "grp", "left")
            .join(_side_est("in_b", "est_b"), "grp", "left")
            .select(F.col("grp").alias(group_col),
                    F.coalesce("est_a", F.lit(0)).alias("est_a"),
                    F.coalesce("est_b", F.lit(0)).alias("est_b"),
                    "est_union", "est_intersection", "jaccard_est"))
