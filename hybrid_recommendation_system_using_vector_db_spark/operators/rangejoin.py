"""Bin-bucketed range join — the standard trick for interval predicates.

Spark plans a raw ``l.point BETWEEN r.lo AND r.hi`` join as a
BroadcastNestedLoopJoin (quadratic). The scalable shape: quantize the
range dimension into fixed-width bins, explode each interval over the
bins it covers, equi-join on the bin, then apply the exact predicate.
Candidate volume scales with (rows × bins-per-interval), not |L|·|R|;
the equi-join shuffles once on the bin key and AQE handles bin skew.

Bin width is the tuning knob: ≈ the typical interval length keeps
bins-per-interval ~2. The same pattern serves time-window joins,
IP-range lookups, and genomic interval overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hybrid_recommendation_system_using_vector_db_spark.functions.portable import epoch_seconds


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, lo_col: str, hi_col: str,
               bin_width: float) -> DataFrame:
    """Inner-join rows of ``points`` to every interval containing them.

    Inclusive bounds: ``lo <= point <= hi``. Returns all columns of both
    inputs (names must not collide).
    """
    p = points.withColumn("__bin", F.floor(F.col(point_col) / bin_width))
    i = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(F.col(lo_col) / bin_width),
                             F.floor(F.col(hi_col) / bin_width))),
    )
    return (
        p.join(i, "__bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("__bin")
    )


def cross_user_coactivity(events: DataFrame, window_s: int = 30) -> DataFrame:
    """For each purchase, how many *other* users were active within ±window_s.

    A time-window self-join expressed as a range join: purchases carry the
    ±window interval, all events are the points. One shuffle keyed by the
    time bin; exact predicate applied post-join.
    """
    ev = events.select(
        F.col("event_id"), F.col("user_id"),
        epoch_seconds("ts").alias("t"),
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"),
            (epoch_seconds("ts") - window_s).alias("lo"),
            (epoch_seconds("ts") + window_s).alias("hi"),
        )
    )
    joined = range_join(ev, purchases, "t", "lo", "hi", bin_width=float(window_s))
    return (
        joined.filter(F.col("user_id") != F.col("p_user"))
        .groupBy(F.col("p_id").alias("purchase_id"))
        .agg(
            F.count(F.lit(1)).alias("n_nearby_events"),
            F.countDistinct("user_id").alias("n_nearby_users"),
        )
    )
