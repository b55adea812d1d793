"""Query resolution (C4): exact item-id probe, else case-insensitive
substring match over names, shortest name wins.

Reference: ``resolve_query_to_asin`` (``Hybrid_Recom_vecdb.py:199-210``) —
exact ASIN lookup (``:201-202``) falling back to a substring scan over all
titles sorted by length (``:204-209``). Python's stable sort breaks
length-ties by insertion order; we pin (length, name, id) as the total
order (SURVEY §7.1) and encode the same tiebreak in the oracle SQL.

The substring branch is a theta-join → Spark plans a
BroadcastNestedLoopJoin with the (tiny) query table broadcast; the name
table streams through it once. At 100 TB the name side would carry an
inverted token index instead; the API is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_queries(queries: DataFrame, names: DataFrame) -> DataFrame:
    """Resolve query strings to item ids.

    queries: (qid int, query_text string)
    names:   (item_id bigint, name string)
    returns: (qid, query_text, item_id nullable, name nullable)
    """
    q = queries.select("qid", F.trim(F.col("query_text")).alias("query_text"))
    # exact-id probe and substring theta-match in ONE pass over names:
    # the OR-condition join is a BroadcastNestedLoopJoin over the tiny
    # broadcast query side — the same cost the substring arm alone already
    # paid, but names is scanned once instead of twice (two joins + a
    # union was two scans and two broadcasts). A row matching both arms
    # gets prio 1, exactly as the union form's window resolved it.
    is_exact = F.col("query_text") == F.col("item_id").cast("string")
    is_sub = F.lower(F.col("name")).contains(F.lower(F.col("query_text")))
    matched = (
        F.broadcast(q)
        .join(names, is_exact | is_sub)
        .select("qid", "query_text", "item_id", "name",
                F.when(is_exact, F.lit(1)).otherwise(F.lit(2)).alias("prio"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("prio").asc(), F.length("name").asc(), F.col("name").asc(),
        F.col("item_id").asc(),
    )
    resolved = (
        matched
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", "query_text", "item_id", "name")
    )
    # keep unresolved queries with null item_id (ref returns None, :206-207)
    return (
        q.join(F.broadcast(resolved.select("qid", "item_id", "name")), "qid", "left")
        .select("qid", "query_text", "item_id", "name")
    )


def fuzzy_match_pairs(names: DataFrame, max_dist: int = 2,
                      id_col: str = "id", name_col: str = "name",
                      block: F.Column | None = None) -> DataFrame:
    """Blocked fuzzy self-match: entity-resolution candidate pairs by
    Levenshtein distance ≤ ``max_dist`` within blocking-key groups.

    The lexical sibling of the MinHash/SimHash near-dup family (edit
    distance catches typo-class variation that token-set similarity
    misses — the dirty-catalog dedup problem the reference's exact-ASIN
    lookup at ``Hybrid_Recom_vecdb.py:201-202`` can't).  Output:
    (id1, id2, name1, name2, dist), ``name1 < name2`` canonical order.

    ``block`` defaults to the last whitespace token (the head noun of a
    product name).  Scale shape: the self-join is an equi-join on the
    block key, so pair fanout is Σ_b |block_b|² — bounded by the blocking
    design, never a crossJoin (the jaccard_neardup block-mode argument);
    `levenshtein` is JVM-side codegen.  At real scale run MULTIPLE
    blocking passes (first token, last token, length bucket) and union —
    the standard sorted-neighborhood recall recipe; skewed blocks are
    `key_skew_profile` + salting territory.  Engine parity: Levenshtein
    is integer-exact, so the oracle comparison has no float surface.
    """
    nm = F.lower(F.trim(F.col(name_col)))
    base = names.select(F.col(id_col).alias("id"), nm.alias("nm"))
    blk = (F.element_at(F.split(F.col("nm"), " "), -1) if block is None
           else block).alias("blk")
    # both self-join sides derive from this table — materialize once so
    # an upstream aggregation (e.g. the distinct-name build) runs once
    k = base.select("id", "nm", blk).localCheckpoint(eager=True)
    a = k.select(F.col("id").alias("id1"), F.col("nm").alias("name1"), "blk")
    b = k.select(F.col("id").alias("id2"), F.col("nm").alias("name2"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("name1") < F.col("name2"))
        .withColumn("dist", F.levenshtein(F.col("name1"), F.col("name2")))
        .filter(F.col("dist") <= max_dist)
        .select("id1", "id2", "name1", "name2", "dist")
    )


def entity_resolve(names: DataFrame, max_dist: int = 2,
                   id_col: str = "id", name_col: str = "name",
                   block: F.Column | None = None,
                   max_iter: int = 25) -> DataFrame:
    """End-to-end entity resolution over a dirty name catalog — the
    full master-data pipeline composed from tested pieces:
    :func:`fuzzy_match_pairs` (blocked Levenshtein candidates) →
    ``dedup.connected_components`` (min-label transitive closure: A~B
    and B~C merge even when A and C differ by more than ``max_dist``) →
    survivorship (the cluster's canonical record = its smallest id, the
    keep-first policy; swap the min for a quality argmax for keep-best,
    the ``dedup_keep_best`` pattern).

    Returns one row per INPUT entity: (id, name, canonical_id,
    canonical_name, cluster_size) — singletons resolve to themselves
    with cluster_size 1, so the output is a total id→canonical map a
    downstream join can broadcast.

    Scale shape: the pair fanout is the blocking design's Σ|block|²
    (never a cross join), CC is the O(diameter) min-label propagation
    over the (sparse) match graph, and the survivor attach is one
    cluster-keyed partial aggregate + a broadcast-able join back to the
    entities. Every stage is integer/string-exact, so the recursive-CTE
    SQL oracle is row-exact.
    """
    from .dedup import connected_components

    nm = F.lower(F.trim(F.col(name_col)))
    base = (names.select(F.col(id_col).alias("id"), nm.alias("name"))
            .localCheckpoint(eager=True))   # feeds pairs, CC nodes, output
    pairs = fuzzy_match_pairs(base, max_dist, "id", "name", block)
    cc = connected_components(pairs.select("id1", "id2"),
                              base.select("id"), id_col="id",
                              max_iter=max_iter)
    canon = (cc.groupBy(F.col("cluster_id").alias("canonical_id"))
             .agg(F.count(F.lit(1)).alias("cluster_size")))
    names_by_id = base.select(F.col("id").alias("canonical_id"),
                              F.col("name").alias("canonical_name"))
    return (base
            .join(cc.select("id",
                            F.col("cluster_id").alias("canonical_id")),
                  "id")
            .join(F.broadcast(canon), "canonical_id")
            .join(F.broadcast(names_by_id), "canonical_id")
            .select("id", "name", "canonical_id", "canonical_name",
                    "cluster_size"))
