"""Measure weighted_sssp wall at 1x/10x/100x edges (id-shifted disjoint
unions of the sf0.1 co-purchase graph) — the SCALE.md r10 graph-decade
methodology, re-run for the r11 delta/frontier formulation.

Usage: python scripts/sssp_decade.py [copies ...]   (default: 1 10 100)
"""
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    copies_list = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.driver.memory", "64g")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from hybrid_recommendation_system_using_vector_db_spark.operators import copurchase, graph

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    base = copurchase.copurchase_edges(li).localCheckpoint(eager=True)
    n_base = base.count()
    off = (base.agg(F.max(F.greatest("src", "dst"))).first()[0] or 0) + 1
    for k in copies_list:
        big = base
        if k > 1:
            big = base.select(
                F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
                "src", "dst", "weight"
            ).select((F.col("src") + F.col("i") * off).alias("src"),
                     (F.col("dst") + F.col("i") * off).alias("dst"),
                     "weight")
        big = big.localCheckpoint(eager=True)
        costed = big.select(
            "src", "dst",
            F.when(F.col("weight") >= 10, F.lit(1))
            .otherwise(11 - F.col("weight")).cast("long").alias("cost"))
        seeds = (big.filter(F.col("src") % 100 == 0)
                 .select(F.col("src").alias("node")).distinct())
        for tag in ("cold", "warm"):
            t0 = time.time()
            n = graph.weighted_sssp(costed, seeds, n_rounds=3,
                                    symmetric=True).count()
            print(f"copies={k} edges={n_base * k} {tag}: "
                  f"{time.time() - t0:.1f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
