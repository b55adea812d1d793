"""Snapshot diff: CDC-style change detection between two corpus versions.

A 100 TB training-data pipeline re-ingests sources on a cadence; the first
question after every refresh is "what changed?" — which documents were
added, removed, or edited since the last snapshot.  This is the batch diff
that drives incremental downstream work (re-embed only `changed`/`added`,
tombstone `removed` from the ANN index via ``pipeline.append_ivf_index``'s
partition-touching writes).

Scale design: one co-partitioned full-outer join on the key columns —
with both snapshots bucketed by key (``pipeline.write_bucketed_edges``'s
layout argument) the join is shuffle-free; the content digest is a
map-side md5 over the compared columns, so unchanged rows (the vast
majority at every refresh) are dropped right after the join with nothing
else ever computed for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"   # unit separator - outside every normal text alphabet
_NULL = "\x1e"  # record separator as the NULL sentinel (!= empty string)


def _digest(cols: list[str]) -> F.Column:
    """Order-stable content digest over the compared columns; nulls get a
    dedicated sentinel so (NULL, 'x') never collides with ('', 'x').
    Caveat: values are compared via their string casts, which are
    engine-portable for strings/ints/dates but NOT for raw floats —
    pre-round floats to a fixed scale (``fround``) before diffing."""
    return F.md5(F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]))


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``.

    Returns (key_cols..., status) with status ∈ {'added', 'removed',
    'changed'} — unchanged rows are dropped (the point: output is
    O(churn), not O(corpus)).  ``compare_cols`` defaults to every
    non-key column common to both snapshots.
    """
    if compare_cols is None:
        common = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in common if c not in set(key_cols)]
    o = old.select(*key_cols, _digest(compare_cols).alias("__od"))
    n = new.select(*key_cols, _digest(compare_cols).alias("__nd"))
    return (
        o.join(n, list(key_cols), "full_outer")
        .withColumn("status", F.when(F.col("__od").isNull(), F.lit("added"))
                    .when(F.col("__nd").isNull(), F.lit("removed"))
                    .when(F.col("__od") != F.col("__nd"), F.lit("changed")))
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )
