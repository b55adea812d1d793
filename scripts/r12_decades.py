"""r12 scale decade for set_similarity_join on a REALISTIC-density
corpus (VERDICT r11 next #6: the sf0.1 synthetic corpus is ~8 %-dense —
965 k true pairs in 13 k docs — so its 33 s full-corpus number measures
output writing, not the prefix filter; a production dedup corpus has
duplicate rates in the percents).

Construction (all relational, seeded, no driver data):
- every token is salted with the doc's 500-way block id, so pairs can
  only form WITHIN a block (realistic sparse cross-doc similarity);
- 2 % of docs get a planted exact copy under a shifted id — the true
  near-dup population a dedup pass must certify against;
- growth to 10x is the disjoint-union methodology of the graph decades
  (SCALE.md): each copy additionally salts tokens with its copy index,
  so copies share no vocabulary and the true-pair population scales
  exactly linearly — sublinear-ish wall growth then isolates the
  engine, not the output.

Usage: python scripts/r12_decades.py [k ...]   (default: 1 10)
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
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.driver.memory", "64g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table
    from hybrid_recommendation_system_using_vector_db_spark.operators import dedup

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    def build(k: int):
        grown = docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
            "doc_id", "text")
        salted = grown.selectExpr(
            "doc_id + CAST(i AS BIGINT) * 10000000 AS doc_id",
            "array_join(transform(split(lower(text), ' '), t -> "
            " concat(t, '#', CAST(doc_id % 500 AS STRING), 'x',"
            "        CAST(i AS STRING))), ' ') AS text",
            "i", "doc_id AS orig_id")
        dups = (salted.filter(F.col("orig_id") % 50 == 0)
                .selectExpr("doc_id + 5000000 AS doc_id", "text"))
        return (salted.select("doc_id", "text").unionByName(dups)
                .localCheckpoint(eager=True))

    ks = tuple(int(a) for a in sys.argv[1:]) or (1, 10)
    for k in ks:
        corpus = build(k)
        nd = corpus.count()
        for tag in ("cold", "warm"):
            t0 = time.time()
            n = dedup.set_similarity_join(corpus, threshold=0.8).count()
            print(f"set_sim_join k={k} docs={nd} {tag}: "
                  f"{time.time()-t0:.1f}s pairs={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
