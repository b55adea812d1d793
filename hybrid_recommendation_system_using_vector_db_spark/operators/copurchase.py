"""Co-purchase graph construction + CF candidate generation.

Reference semantics: the item-item graph is a ``defaultdict(Counter)`` built
from each product's ``similar`` list restricted to in-sample items
(``Hybrid_Recom_vecdb.py:133-141``), and CF candidates are the max-normalized
top-n neighbors (``:189-198``). Here the graph is an edge DataFrame (SURVEY
§1.1) and both steps are declarative:

- C1 edge semi-join + D1 count aggregation
- D2 per-source max normalizer (analytic window, E2)
- G9 ratio normalize with zero guard
- F1/E1 per-source top-n with pinned tiebreaks

On the driver test schema, "bought together" is derived from ``lineitem``:
two parts sharing an order key form a directed edge each way; the weight is
the number of co-occurrences (COUNT(*) GROUP BY src,dst) — the same shape
the reference builds from the ``similar`` field.

Scale notes: the self-join shuffles on ``l_orderkey`` once and the count
aggregates map-side first (partial hash agg). At 100 TB, bucket the edge
table by ``src`` on write so every downstream per-source operation
(normalize, top-n, CF lookup) is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import fround

from .. import ROUND_SCORE


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Directed weighted co-purchase edges from order co-occurrence (C1+D1).

    The self-join is hinted SHUFFLE_HASH: order keys are high-cardinality
    and per-order group sizes are tiny, so hashing one side beats the
    sort-merge default (skips two full sorts of the fact table); per-task
    build sides stay small at any scale because the shuffle is keyed by
    order. ~2.5x faster than SMJ on the sf0.1 bench.
    """
    a = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b.hint("SHUFFLE_HASH"), "ok")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def edges_from_similar(products: DataFrame) -> DataFrame:
    """Reference-shaped edge build from a ``similar`` array column
    (explode → in-sample semi-join → self-loop drop → count).

    Mirrors ``Hybrid_Recom_vecdb.py:133-141`` for catalogs ingested from
    amazon-meta (see sources.amazon_meta).
    """
    exploded = products.select(
        F.col("asin").alias("src"), F.explode("similar").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    in_sample = products.select(F.col("asin").alias("dst"))
    return (
        exploded.join(in_sample, "dst", "left_semi")  # B5 membership
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def restrict_to_universe(edges: DataFrame, universe: DataFrame,
                         key: str = "vec_id") -> DataFrame:
    """Keep only edges whose both endpoints are indexed items (B5).

    ``universe`` is the set of items with embeddings — the reference's
    "in-sample" set. Broadcast semi-joins: the universe is small relative
    to the edge table at every scale.
    """
    u_src = universe.select(F.col(key).alias("src"))
    u_dst = universe.select(F.col(key).alias("dst"))
    return (
        edges.join(F.broadcast(u_src), "src", "left_semi")
        .join(F.broadcast(u_dst), "dst", "left_semi")
    )


def cf_topn(edges: DataFrame, top_n: int) -> DataFrame:
    """Per-source normalized CF candidates (D2+G9+E1/F1).

    cf_score = weight / max(weight per src), rounded; rank by raw weight
    desc then dst asc (raw weights are exact integers → cross-engine-safe
    ranking), keep top_n.
    """
    w_max = Window.partitionBy("src")
    w_rank = Window.partitionBy("src").orderBy(F.col("weight").desc(), F.col("dst").asc())
    return (
        edges.withColumn("max_w", F.max("weight").over(w_max))
        .withColumn(
            "cf_score",
            F.when(F.col("max_w") > 0,
                   fround(F.col("weight") / F.col("max_w"), ROUND_SCORE)).otherwise(F.lit(0.0)),
        )
        .withColumn("cf_rank", F.row_number().over(w_rank))
        .filter(F.col("cf_rank") <= top_n)
        .select("src", "dst", "weight", "cf_score", "cf_rank")
    )


def association_rules(edges: DataFrame, min_weight: int = 3,
                      top_n: int = 100) -> DataFrame:
    """Association rules src→dst over a weighted co-occurrence edge
    table: (src, dst, weight, support, confidence, lift), the market-
    basket statistics behind "customers who bought X also bought Y"
    when a raw CF score is not enough (lift corrects for item
    popularity — a rule to a bestseller is not informative).

        support    = w(s,d) / Σw          confidence = w(s,d) / out_w(s)
        lift       = confidence / (in_w(d) / Σw)

    computed as (w/out_w)·(Σw/in_w) — one fixed float-op order, mirrored
    exactly in the oracle. Top ``top_n`` by (lift desc, src, dst) —
    deterministic after rounding.

    Scale shape: two partial-agg aggregations (out-weight by src,
    in-weight by dst), two AQE-sized joins back on those keys, the
    corpus-total as a broadcast 1-row crossJoin, and a TakeOrdered
    top-n — no window, no global sort. ``min_weight`` prunes the rule
    candidates BEFORE the joins (Catalyst pushes the filter below
    them), which at 100 TB is the difference between joining every
    hapax pair and joining only supported rules.
    """
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    in_w = edges.groupBy("dst").agg(F.sum("weight").alias("in_w"))
    tot = edges.agg(F.sum("weight").cast("double").alias("tot"))
    wd = F.col("weight").cast("double")
    conf = wd / F.col("out_w").cast("double")
    return (edges.filter(F.col("weight") >= min_weight)
            .join(out_w, "src").join(in_w, "dst")
            .crossJoin(F.broadcast(tot))
            .select(
                "src", "dst", "weight",
                fround(wd / F.col("tot"), ROUND_SCORE).alias("support"),
                fround(conf, ROUND_SCORE).alias("confidence"),
                fround(conf * (F.col("tot") / F.col("in_w").cast("double")),
                       ROUND_SCORE).alias("lift"))
            .orderBy(F.col("lift").desc(), F.col("src").asc(),
                     F.col("dst").asc())
            .limit(top_n))


def frequent_triples(lineitem: DataFrame, min_support: int = 2,
                     basket_col: str = "l_orderkey",
                     item_col: str = "l_partkey") -> DataFrame:
    """Apriori level-3 frequent itemsets: (i1 < i2 < i3, support) for
    every item TRIPLE co-occurring in ≥ ``min_support`` baskets — one
    level beyond :func:`association_rules`' pair mining (Agrawal &
    Srikant 1994). Pair rules answer "what goes with X"; triples catch
    bundle structure pairs factor away (bread+peanut-butter and
    bread+jelly frequent ≠ the trio frequent).

    Level-wise pruning is the scale story: the raw triple generator is
    Σ_b C(|b|, 3) rows — cubic in basket width. Here triples generate
    ONLY from basket pairs whose (i1, i2) is already a frequent PAIR
    (the Apriori property: every sub-itemset of a frequent itemset is
    frequent, so the restriction loses nothing), after items are first
    pruned to frequent singletons. Each level is one equi-join on the
    basket id + one partial-agg count — all shuffles keyed on basket
    or itemset, counts exact integers, so the UNPRUNED all-triples SQL
    oracle is bit-equal by the same property that makes the prune
    sound.

    The distinct per-basket item table feeds four plan branches (L1
    count, both pair-join sides, the closing-item join) — checkpointed
    once; wide baskets are the skew knob (a 10 k-item basket still
    pays C(w,2) pair rows — cap basket width upstream the way
    ``adamic_adar_links`` caps hub degree).
    """
    items = (lineitem.select(F.col(basket_col).alias("b"),
                             F.col(item_col).alias("i"))
             .distinct()
             .localCheckpoint(eager=True))
    l1 = (items.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
          .filter(F.col("c") >= min_support).select("i"))
    i1 = items.join(l1, "i", "left_semi").localCheckpoint(eager=True)
    a = i1.select("b", F.col("i").alias("i1"))
    bb = i1.select("b", F.col("i").alias("i2"))
    pairs = a.join(bb, "b").filter(F.col("i1") < F.col("i2"))
    l2 = (pairs.groupBy("i1", "i2").agg(F.count(F.lit(1)).alias("c"))
          .filter(F.col("c") >= min_support).select("i1", "i2"))
    pb = pairs.join(l2, ["i1", "i2"], "left_semi")
    cc = i1.select("b", F.col("i").alias("i3"))
    tri = pb.join(cc, "b").filter(F.col("i3") > F.col("i2"))
    return (tri.groupBy("i1", "i2", "i3")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= min_support))
