"""A/B harness for weighted_sssp round shapes at 10x/100x edges.

Variants:
  A  full relaxation, union+min merge, eager dist checkpoint per round (r10)
  B  frontier relaxation, improved-only left join, eager dist checkpoint
  C  frontier relaxation, lazy anti-join/union dist chain (r11 candidate)

Usage: python scripts/sssp_ab.py <copies> <variant...>
"""
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def sssp_a(und, seeds, n_rounds):
    dist = (seeds.withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint(eager=True))
    for _ in range(n_rounds):
        relaxed = (dist.join(und, dist["node"] == und["a"])
                   .select(F.col("b").alias("node"),
                           (F.col("dist") + F.col("cost")).alias("dist")))
        dist = (dist.unionByName(relaxed)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True))
    return dist


def sssp_b(und, seeds, n_rounds):
    dist = (seeds.withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint(eager=True))
    frontier = dist
    for _ in range(n_rounds):
        cand = (frontier.join(und, frontier["node"] == und["a"])
                .select(F.col("b").alias("node"),
                        (F.col("dist") + F.col("cost")).alias("cand"))
                .groupBy("node").agg(F.min("cand").alias("cand")))
        improved = (cand.join(dist, "node", "left")
                    .filter(F.col("dist").isNull()
                            | (F.col("cand") < F.col("dist")))
                    .select("node", F.col("cand").alias("dist"))
                    .localCheckpoint(eager=True))
        if improved.isEmpty():
            break
        dist = (dist.join(improved.select("node"), "node", "left_anti")
                .unionByName(improved)
                .localCheckpoint(eager=True))
        frontier = improved
    return dist


def sssp_c(und, seeds, n_rounds):
    dist = (seeds.withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint(eager=True))
    frontier = dist
    for r in range(1, n_rounds + 1):
        cand = (frontier.join(und, frontier["node"] == und["a"])
                .select(F.col("b").alias("node"),
                        (F.col("dist") + F.col("cost")).alias("cand"))
                .groupBy("node").agg(F.min("cand").alias("cand")))
        improved = (cand.join(dist, "node", "left")
                    .filter(F.col("dist").isNull()
                            | (F.col("cand") < F.col("dist")))
                    .select("node", F.col("cand").alias("dist"))
                    .localCheckpoint(eager=True))
        if improved.isEmpty():
            break
        dist = (dist.join(improved.select("node"), "node", "left_anti")
                .unionByName(improved))
        if r % 3 == 0 and r < n_rounds:
            dist = dist.localCheckpoint(eager=True)
        frontier = improved
    return dist


VARIANTS = {"A": sssp_a, "B": sssp_b, "C": sssp_c}


def main():
    copies = int(sys.argv[1])
    names = sys.argv[2:] or ["A", "B", "C"]
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.driver.memory", "64g")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from hybrid_recommendation_system_using_vector_db_spark.operators import copurchase

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    base = copurchase.copurchase_edges(li).localCheckpoint(eager=True)
    off = (base.agg(F.max(F.greatest("src", "dst"))).first()[0] or 0) + 1
    big = base
    if copies > 1:
        big = base.select(
            F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("i"),
            "src", "dst", "weight"
        ).select((F.col("src") + F.col("i") * off).alias("src"),
                 (F.col("dst") + F.col("i") * off).alias("dst"), "weight")
    und = big.select(
        "src", "dst",
        F.when(F.col("weight") >= 10, F.lit(1))
        .otherwise(11 - F.col("weight")).cast("long").alias("cost")
    ).filter(F.col("src") != F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b"), "cost"
    ).localCheckpoint(eager=True)
    seeds = (big.filter(F.col("src") % 100 == 0)
             .select(F.col("src").alias("node")).distinct()
             .localCheckpoint(eager=True))
    print(f"edges={und.count()} seeds={seeds.count()}", flush=True)
    for name in names:
        fn = VARIANTS[name]
        for it in range(2):
            t0 = time.time()
            n = fn(und, seeds, 3).count()
            print(f"copies={copies} variant={name} iter={it}: "
                  f"{time.time() - t0:.1f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
