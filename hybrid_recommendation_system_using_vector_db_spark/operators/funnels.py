"""Ordered conversion-funnel analytics over an event stream.

The product-analytics companion to ``sessionization``/``cohort_retention``
(driver entries in ``__spark_entry__``): how many users progress through an
ordered sequence of event types, where each step must occur at-or-after the
user's earliest qualifying time for the previous step.

Scale design (100 TB events):

- Each step is ONE filtered partial-agg (min ts per user) joined to the
  previous step's per-user frontier — every shuffle is keyed by the user
  column, so consecutive steps reuse the same hash partitioning (no
  re-partitioning between steps; AQE coalesces the tails).
- Nothing is ever collected: per-step counts are single-row aggregates
  unioned into an |steps|-row result, and the conversion denominator rides
  an unpartitioned window over that |steps|-row table (bounded by
  construction, not by data volume).
- The optional conversion window (``within_seconds``) filters against the
  step-1 frontier time carried through the chain — no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import ROUND_SCORE
from ..functions.portable import epoch_seconds, fround


def funnel_steps(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts",
                 within_seconds: float | None = None) -> DataFrame:
    """Ordered funnel: (step, event_type, users, conv_rate).

    A user reaches step i when they have an event of type ``steps[i]``
    at ``ts >=`` their earliest time of reaching step i-1 (ties allowed:
    simultaneous events count, matching the at-or-after convention).
    With ``within_seconds`` set, steps 2..n must also land within that
    many seconds of the user's step-1 time (the classic "conversion
    window" anchored at funnel entry).

    ``conv_rate`` = users at step / users at step 1, rounded at the repo
    score scale — an exact integer ratio, so engine-portable.
    """
    assert len(steps) >= 1, "funnel needs at least one step"
    frontier = (events.filter(F.col(type_col) == steps[0])
                .groupBy(F.col(user_col).alias("u"))
                .agg(F.min(ts_col).alias("t")))
    if within_seconds is not None:
        frontier = frontier.withColumn("t0e", epoch_seconds("t"))
    # each tier feeds TWO plan branches (the next step's join and its own
    # count) — without materialization tier i's whole upstream chain
    # re-executes once per downstream consumer, so the step-1 scan runs
    # |steps| times (verified: 52 corpus scans in the un-checkpointed
    # 4-step plan). Tiers are per-user bounded rows; same
    # localCheckpoint lifecycle as triangle_count's shared tables.
    tiers = [frontier.localCheckpoint(eager=True)]
    for s in steps[1:]:
        nxt = events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("ts"))
        cond = F.col("ts") >= F.col("t")
        if within_seconds is not None:
            cond = cond & (epoch_seconds("ts") <= F.col("t0e") + within_seconds)
        prev = tiers[-1]
        stepped = (nxt.join(prev, "u")
                   .filter(cond)
                   .groupBy("u")
                   .agg(F.min("ts").alias("t")))
        if within_seconds is not None:
            # re-attach the step-1 anchor (bounded: one row per surviving
            # user, same user-keyed partitioning as every other shuffle)
            stepped = stepped.join(prev.select("u", "t0e"), "u")
        tiers.append(stepped.localCheckpoint(eager=True))
    counts = None
    for i, (name, tier) in enumerate(zip(steps, tiers), start=1):
        c = tier.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).alias("step"), F.lit(name).alias("event_type"), "users")
        counts = c if counts is None else counts.unionByName(c)
    w = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    entry = F.max(F.when(F.col("step") == 1, F.col("users"))).over(w)
    return counts.select(
        "step", "event_type", "users",
        fround(F.when(entry > 0, F.col("users").cast("double") / entry)
               .otherwise(F.lit(0.0)), ROUND_SCORE).alias("conv_rate"))


def path_ngrams(events: DataFrame, n: int = 3, top_k: int = 50,
                group_col: str = "user_id", type_col: str = "event_type",
                ts_col: str = "ts", tie_col: str = "event_id") -> DataFrame:
    """Top-k most common length-``n`` event-type paths across per-user
    journeys — the n-step generalization of the first-order
    ``event_transitions`` matrix (journey mining: which 3-step flows
    dominate, where do they detour).

    One user-keyed window sort produces all sliding windows via n−1
    ``lead()``s (map-only after the sort — no self-joins, no explode of
    per-user arrays into driver-bounded state), then a partial-agg count
    keyed on the path and a TakeOrdered top-k (no global sort). Paths
    are total-ordered by (count desc, path asc) — the repo-wide pinned
    tiebreak. State is bounded by |distinct paths| ≤ |types|ⁿ per
    aggregation, corpus-independent for a fixed event vocabulary.
    """
    w = Window.partitionBy(group_col).orderBy(ts_col, tie_col)
    # window exprs must land as columns before the completeness filter
    # (predicates can't hold window functions)
    stepped = events.select(
        F.col(type_col).alias("__s0"),
        *[F.lead(type_col, i).over(w).alias(f"__s{i}")
          for i in range(1, n)])
    complete = F.lit(True)
    for i in range(1, n):
        complete = complete & F.col(f"__s{i}").isNotNull()
    return (stepped
            .filter(complete)
            .select(F.concat_ws(" > ", *[F.col(f"__s{i}")
                                         for i in range(n)]).alias("path"))
            .groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_paths"))
            .orderBy(F.col("n_paths").desc(), F.col("path").asc())
            .limit(top_k))
