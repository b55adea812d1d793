import os, sys, time
sys.path.insert(0, "/root/repo")
SF_DIR = "/root/testdata/sf0.1"
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .appName("lpa-ab")
         .config("spark.sql.shuffle.partitions", 32)
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "16g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table
from hybrid_recommendation_system_using_vector_db_spark.operators import copurchase

li = load_table(spark, SF_DIR, "lineitem")
li.count()
tracker = spark.sparkContext.statusTracker()

def rounds(und, n_rounds=4):
    labels = und.select(F.col("a").alias("node")).distinct() \
        .withColumn("label", F.col("node"))
    for r in range(1, n_rounds + 1):
        labels = (und.join(labels, und["b"] == labels["node"])
                  .groupBy("a", "label").agg(F.sum("w").alias("s"))
                  .groupBy("a")
                  .agg(F.min(F.struct((-F.col("s")).alias("ns"), F.col("label"))).alias("m"))
                  .select(F.col("a").alias("node"), F.col("m.label")))
        if r % 3 == 0 and r < n_rounds:
            labels = labels.localCheckpoint(eager=True)
    return labels

def base():
    edges = copurchase.copurchase_edges(li)
    w = F.col("weight").cast("long")
    return (edges.select(F.col("src").alias("a"), F.col("dst").alias("b"), w.alias("w"))
            .filter(F.col("a") != F.col("b")))

def jmax():
    ids = tracker.getJobIdsForGroup(None) or []
    return max(ids) if ids else -1

for p in range(5):
    for variant in ["C_ckpt", "A_persist32", "B_persistAQE"]:
        und0 = base()
        j0, t0 = jmax(), time.perf_counter()
        if variant == "A_persist32":
            und = und0.repartition(32, "b").persist(); und.count()
        elif variant == "B_persistAQE":
            und = und0.repartition("b").persist(); und.count()
        else:
            und = und0.repartition("b").localCheckpoint(eager=True)
        t1 = time.perf_counter(); j1 = jmax()
        n = rounds(und).count()
        t2 = time.perf_counter(); j2 = jmax()
        print(f"{variant} pass{p}: build={t1-t0:.2f}s ({j1-j0}j) rounds={t2-t1:.2f}s ({j2-j1}j) rows={n}", flush=True)
        if variant != "C_ckpt":
            und.unpersist()
spark.stop()
