"""r11 second/third-wave scale decades on local[32] (SCALE.md method:
id-shifted disjoint unions / row explosion, warm iteration reported).

  - dq_checks: orders exploded 1x/10x/100x (one-scan linearity)
  - temporal_reach: events with user-id-shifted copies 1x/10x
  - k_truss: strong co-purchase graph id-shifted 1x/10x

Usage: python scripts/r11_decades.py [dq|reach|truss ...]
"""
import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def grow(df, k, shift_cols, off):
    if k == 1:
        return df
    out = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__i"), "*")
    for c in shift_cols:
        # cast the copy index: __i * off overflows INT under ANSI at
        # 100x with a 1e8 offset
        out = out.withColumn(
            c, F.col(c) + F.col("__i").cast("long") * F.lit(int(off)))
    return out.drop("__i")


def main():
    which = set(sys.argv[1:]) or {"dq", "reach", "truss"}
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.driver.memory", "64g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table
    from hybrid_recommendation_system_using_vector_db_spark.operators import (
        copurchase, graph, profiling)
    from hybrid_recommendation_system_using_vector_db_spark.functions.portable import epoch_seconds

    if "dq" in which:
        orders = load_table(spark, SF_DIR, "orders")
        for k in (1, 10, 100):
            big = grow(orders, k, ["o_orderkey"], 100_000_000) \
                .localCheckpoint(eager=True)
            for tag in ("cold", "warm"):
                t0 = time.time()
                n = profiling.dq_checks(big, [
                    {"check": "not_null", "col": "o_custkey"},
                    {"check": "unique", "col": "o_orderkey"},
                    {"check": "range", "col": "o_totalprice",
                     "lo": 0.0, "hi": 400000.0},
                    {"check": "accepted_values", "col": "o_orderstatus",
                     "values": ["O", "F", "P"]},
                ]).count()
                print(f"dq_checks k={k} {tag}: {time.time()-t0:.1f}s "
                      f"({n} checks)", flush=True)
            big.unpersist()

    if "reach" in which:
        ev = load_table(spark, SF_DIR, "events")
        p0 = (ev.filter(F.col("event_type") == "purchase")
              .select(F.col("user_id").alias("u"),
                      epoch_seconds("ts").cast("long").alias("t")))
        for k in (1, 10):
            p = grow(p0, k, ["u"], 10_000_000).localCheckpoint(eager=True)
            W = 1800
            a = p.select(F.col("u").alias("src"), F.col("t").alias("ta"),
                         F.explode(F.array(F.floor(F.col("t") / W),
                                           F.floor(F.col("t") / W) + 1))
                         .alias("bin"))
            b = p.select(F.col("u").alias("dst"), F.col("t").alias("tb"),
                         F.floor(F.col("t") / W).alias("bin"))
            edges = (a.join(b, "bin")
                     .filter((F.col("tb") - F.col("ta") > 0)
                             & (F.col("tb") - F.col("ta") <= W)
                             & (F.col("src") != F.col("dst")))
                     .select("src", "dst", F.col("tb").alias("t"))
                     .localCheckpoint(eager=True))
            seeds = p.filter(F.col("u") % 20 == 0) \
                .select(F.col("u").alias("node"))
            ne = edges.count()
            for tag in ("cold", "warm"):
                t0 = time.time()
                n = graph.temporal_reachability(edges, seeds,
                                                n_rounds=3).count()
                print(f"temporal_reach k={k} edges={ne} {tag}: "
                      f"{time.time()-t0:.1f}s rows={n}", flush=True)

    if "truss" in which:
        li = load_table(spark, SF_DIR, "lineitem")
        base = (copurchase.copurchase_edges(li)
                .filter(F.col("weight") >= 2)
                .localCheckpoint(eager=True))
        off = (base.agg(F.max(F.greatest("src", "dst"))).first()[0] or 0) + 1
        for k in (1, 10):
            big = grow(base, k, ["src", "dst"], off) \
                .localCheckpoint(eager=True)
            ne = big.count()
            for tag in ("cold", "warm"):
                t0 = time.time()
                n = graph.k_truss(big, k=3, max_rounds=5).count()
                print(f"k_truss k={k} edges={ne} {tag}: "
                      f"{time.time()-t0:.1f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
