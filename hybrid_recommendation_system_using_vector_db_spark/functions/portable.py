"""Cross-engine portable rounding.

``round()`` semantics differ between engines at exact half-way points
(Spark rounds the shortest decimal representation HALF_UP via BigDecimal;
DuckDB scales-and-rounds the raw double), so two engines can disagree by
1 ulp-of-the-last-digit on values that land on a .5 boundary — e.g. blends
of decimal ratios. ``fround`` avoids the whole class: floor(x·10^d + 0.5)
is a pure IEEE-double computation that yields bit-identical results in any
engine given the same input double. Every score/measure the engine emits
for oracle comparison goes through this.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(c: Column, digits: int = 6) -> Column:
    s = float(10 ** digits)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)


def fround_sql(expr: str, digits: int = 6) -> str:
    """The identical computation as a SQL fragment (DuckDB oracle side)."""
    s = 10 ** digits
    return f"floor(({expr}) * {s} + 0.5) / {s}"


def epoch_seconds(c: Column | str) -> Column:
    """Epoch seconds (double) of a timestamp column, portable across
    TIMESTAMP and TIMESTAMP_NTZ sources.

    Parquet timestamps written without ``isAdjustedToUTC`` load as
    TIMESTAMP_NTZ in Spark 4, which cannot cast directly to a numeric
    type; the NTZ→TIMESTAMP hop interprets the wall time in the session
    timezone, which the engine pins to UTC (session.py), so the result is
    the same instant either way.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp").cast("double")
