"""As-of (point-in-time) join — a time-series operator Spark lacks natively.

Not in the reference (its data is static; SURVEY §2.3 notes "no as-of
joins"), but a first-class need for event/feature pipelines: attach to each
left row the most recent right row with ``right.ts <= left.ts`` per key.

Spark-first design — the union+window trick, one shuffle total:

1. tag both inputs and union them (schema-aligned),
2. sort within each key partition by (ts, side, id) — right rows sort
   before left rows at equal timestamps, so "at or before" includes ties,
3. ``last(value, ignorenulls)`` over an unbounded-preceding running window
   carries the latest right row forward onto every subsequent left row.

This is the scalable plan: a single hash shuffle on the key (no range
join, no per-key collect), spill-safe sort, O(n) window scan. At 100 TB,
pre-bucketing both tables by the key makes the shuffle disappear.

Determinism: ties on (ts) between multiple right rows resolve to the
largest (ts, id) — pinned total order, reproducible in the SQL oracle via
the identical window specification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hybrid_recommendation_system_using_vector_db_spark.functions.portable import epoch_seconds


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              left_id: str = "event_id", right_id: str = "event_id",
              carry_cols: tuple[str, ...] = (),
              direction: str = "backward",
              tolerance_s: float | None = None) -> DataFrame:
    """For each left row, the nearest right row per key: at-or-before
    (``direction="backward"``, the default) or at-or-after (``"forward"``).

    Returns the left rows with ``match_id``/``match_ts`` (+ ``match_<c>``
    for each carry col), null when no qualifying right row exists.
    ``tolerance_s`` nulls out matches farther than that many seconds from
    the left timestamp (pandas ``merge_asof(tolerance=...)`` semantics).
    Determinism: equal-ts right rows count as a match in both directions;
    among right-side ties, backward picks the largest (ts, id), forward
    the smallest — both pinned total orders.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    asc = direction == "backward"
    l_tag = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"), F.col(left_id).alias("__id"),
        F.lit(None).cast("long").alias("__rid"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in carry_cols],
    )
    r_tag = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"), F.col(right_id).alias("__id"),
        F.col(right_id).cast("long").alias("__rid"),
        *[F.col(c).alias(f"__r_{c}") for c in carry_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc() if asc else F.col("__ts").desc(),
                 F.col("__side").asc(),
                 F.col("__id").asc() if asc else F.col("__id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        l_tag.unionByName(r_tag)
        .withColumn("match_id", F.last("__rid", ignorenulls=True).over(w))
        .withColumn("match_ts",
                    F.last(F.when(F.col("__side") == 0, F.col("__ts")),
                           ignorenulls=True).over(w))
    )
    for c in carry_cols:
        merged = merged.withColumn(
            f"match_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    if tolerance_s is not None:
        within = (
            F.col("match_ts").isNotNull()
            & (F.abs(epoch_seconds(F.col("__ts"))
                     - epoch_seconds(F.col("match_ts"))) <= F.lit(float(tolerance_s)))
        )
        for c in ["match_id", "match_ts", *[f"match_{c}" for c in carry_cols]]:
            merged = merged.withColumn(c, F.when(within, F.col(c)))
    return (
        merged.filter(F.col("__side") == 1)
        .select(
            F.col("__k").alias(key), F.col("__id").alias(left_id),
            F.col("__ts").alias(left_ts), "match_id", "match_ts",
            *[F.col(f"match_{c}") for c in carry_cols],
        )
    )


def purchase_attribution(events: DataFrame,
                         left_type: str = "purchase",
                         right_type: str = "click") -> DataFrame:
    """Attribute each purchase to the user's most recent prior click.

    Timestamps are emitted as epoch seconds (timezone-free — safe to
    compare across engines); ``gap_s`` is the purchase→click latency.
    """
    purchases = events.filter(F.col("event_type") == left_type)
    clicks = events.filter(F.col("event_type") == right_type)
    out = asof_join(purchases, clicks, key="user_id")
    return out.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        epoch_seconds("ts").cast("long").alias("purchase_ts"),
        F.col("match_id").alias("click_id"),
        epoch_seconds("match_ts").cast("long").alias("click_ts"),
        (epoch_seconds("ts").cast("long")
         - epoch_seconds("match_ts").cast("long")).alias("gap_s"),
    )
