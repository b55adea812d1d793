"""Z-order (Morton) layout keys: multi-dimensional data-skipping layout.

At 100 TB the scan you avoid is worth more than the scan you speed up:
sorting a table by ONE column gives tight per-file min/max on that column
only, so a predicate over a second dimension prunes nothing.  Interleaving
the bits of two quantized dimensions into one Morton key and range-
partitioning/sorting by it gives every file a small axis-aligned box in
(x, y) space — a 2-D box predicate then skips the files whose box misses
it (the `OPTIMIZE ZORDER BY` idea in Delta/Iceberg/Hudi, Morton 1966).

Engine design: the key is a PURE integer expression (clamp → scale →
magic-number bit spread → interleave) emitted as ONE SQL fragment that
both Spark (`F.expr`) and the DuckDB oracle evaluate verbatim — `<<`,
`|`, `&` have identical two's-complement semantics in both engines, so
the key is hash-checkable, and in Spark it stays inside whole-stage
codegen (no UDF).  Quantization ranges are caller-fixed literals, like
``psi_drift``'s bin edges: a layout key must be stable across ingests or
every refresh would re-cluster the whole table.

``zorder_layout_stats`` measures the payoff: per-partition (min, max)
boxes of both dimensions under a given layout key — the exact numbers a
file-skipping planner would read from parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-number bit-spread masks (insert one 0 between bits; valid for
# inputs < 2^16, output < 2^32 — Morton 1966 via the standard shifts)
_SPREAD = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _quantize_sql(col: str, lo: float, hi: float, bits: int) -> str:
    """Clamp ``col`` into [lo, hi) and scale to an integer in [0, 2^bits).
    Literal edges (repr round-trips identically in Spark and DuckDB)."""
    n = 1 << bits
    scaled = (f"CAST(floor((CAST({col} AS DOUBLE) - {lo!r}) * {n} "
              f"/ ({hi!r} - {lo!r})) AS BIGINT)")
    return f"greatest(0, least({n - 1}, {scaled}))"


def _spread_sql(e: str) -> str:
    """Spread a 16-bit integer's bits to even positions (one SQL text for
    both engines)."""
    for shift, mask in _SPREAD:
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


def morton_sql(x_col: str, y_col: str, x_range: tuple[float, float],
               y_range: tuple[float, float], bits: int = 8) -> str:
    """SQL fragment for the 2-D Morton key of (x, y): even bits carry x,
    odd bits carry y.  ``bits`` per dimension (≤ 16)."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    sx = _spread_sql(_quantize_sql(x_col, *x_range, bits))
    sy = _spread_sql(_quantize_sql(y_col, *y_range, bits))
    return f"({sx} | ({sy} << 1))"


def with_zorder_key(df: DataFrame, x_col: str, y_col: str,
                    x_range: tuple[float, float],
                    y_range: tuple[float, float],
                    bits: int = 8, out_col: str = "zkey") -> DataFrame:
    """Attach the Morton key column — map-only, codegen'd, zero shuffles;
    follow with ``repartitionByRange(n, out_col)`` + ``sortWithinPartitions``
    (or a writer's ``sortBy``) to realize the clustered layout."""
    return df.withColumn(
        out_col, F.expr(morton_sql(x_col, y_col, x_range, y_range, bits)))


def zorder_write(df: DataFrame, path: str, x_col: str, y_col: str,
                 x_range: tuple[float, float], y_range: tuple[float, float],
                 bits: int = 8, n_files: int = 16) -> None:
    """Write ``df`` parquet clustered by the Morton key: range-partitioned
    into ``n_files`` key ranges and sorted within each — every output file
    covers a compact (x, y) box, which is what parquet footer min/max
    pruning skips on."""
    keyed = with_zorder_key(df, x_col, y_col, x_range, y_range, bits)
    (keyed.repartitionByRange(n_files, "zkey")
     .sortWithinPartitions("zkey")
     .write.mode("overwrite").parquet(path))


def zorder_layout_stats(df: DataFrame, x_col: str, y_col: str,
                        layout_key: str, n_parts: int = 16) -> DataFrame:
    """Per-partition (min, max) boxes of both dimensions under a layout:
    equal-depth partitions in ``layout_key`` order, then each partition's
    bounding box — the footer stats a skipping planner consults.  Output:
    (part, x_min, x_max, y_min, y_max, cnt), one row per non-empty
    partition.

    Partition boundaries come from ONE exact-``percentile`` aggregate
    over the layout key, then rows are assigned map-side by a
    searchsorted-style sum of comparisons — no global window (an
    unpartitioned ``ntile``/``row_number`` funnels the whole table
    through a single task: a single-node sort/OOM at scale) and no
    ``repartitionByRange`` (the RangePartitioner SAMPLES with a seed
    tied to session RDD ids, so the same call could report different
    boxes run-to-run; it flaked a strict pruning comparison in CI once).
    Exact percentile keeps per-group state proportional to the number
    of DISTINCT key values — bounded by construction for Morton keys
    (≤ 4^bits values); for arbitrary high-cardinality keys prefer the
    production writer's sampled ranges. Key ties land in one partition
    (exact equal-depth up to ties), which is what a real writer does
    anyway. The boundary list (n_parts − 1 doubles) is the only
    driver-side state."""
    qs = [i / n_parts for i in range(1, n_parts)]
    key_d = F.col(layout_key).cast("double")
    bounds = (df.agg(F.percentile(
        key_d, F.array(*[F.lit(q) for q in qs])).alias("b"))
        .head()["b"]) or []
    part = F.lit(0)
    for b in bounds:
        part = part + F.when(key_d > F.lit(float(b)), 1).otherwise(0)
    return (df.withColumn("part", part.cast("int"))
            .groupBy("part")
            .agg(F.min(x_col).alias("x_min"), F.max(x_col).alias("x_max"),
                 F.min(y_col).alias("y_min"), F.max(y_col).alias("y_max"),
                 F.count(F.lit(1)).alias("cnt")))
