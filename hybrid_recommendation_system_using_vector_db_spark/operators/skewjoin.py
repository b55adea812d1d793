"""Skew-mitigated equi-join: explicit key salting.

AQE's skew-join handles MOST hot keys at runtime (splitting oversized
partitions post-shuffle), but it only fires for sort-merge joins and
after a stage materializes; a pipeline that KNOWS its key distribution
(from ``profiling.key_skew_profile`` — the measurement this module
pairs with) can salt up front: append a deterministic row-level salt to
the skewed side's key, replicate the other side across all salt values,
and the single hottest key fans out over ``n_salts`` reducers instead
of one straggler task. The same technique ``similarity.
embedding_neardup_pairs`` applies to its low-cardinality bucket key,
generalized to any equi-join.

Cost model (the trade the caller signs up for): the other side is
replicated ``n_salts``× through the shuffle — correct when that side is
small-ish (dimension-scale but above the broadcast threshold, the
classic salting regime) or when the skew penalty dominates. Result
equality with the plain join is test-pinned; plan shape (salt in the
join key) likewise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__skew_salt"


def salted_join(skewed: DataFrame, other: DataFrame, on, n_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column(s) ``on`` with an
    ``n_salts``-way salted key. Returns exactly the rows of the plain
    join (row-for-row, duplicates preserved).

    The salt is DETERMINISTIC — ``pmod(hash(entire skewed row), n)`` —
    so repeated runs shuffle identically (the repo-wide reproducibility
    rule; a ``rand()`` salt would spread fully-identical rows better
    but makes every run's shuffle layout different). Fully-identical
    skewed rows share a salt: that residual hotspot is irreducible
    without nondeterminism and is noted here rather than hidden.

    ``how``: ``inner`` or ``left`` (skewed side preserved). Outer joins
    that preserve ``other`` are refused — each unmatched ``other`` row
    exists ``n_salts`` times post-replication and would duplicate.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "outer joins preserving the replicated side would emit "
            "n_salts copies of every unmatched row")
    keys = [on] if isinstance(on, str) else list(on)
    s = skewed.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in skewed.columns]),
                      F.lit(n_salts)))
    o = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return s.join(o, keys + [_SALT], how).drop(_SALT)
