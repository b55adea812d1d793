"""A/B one bench-like sweep pass over a fixed entry subset with an AQE
coalescing config, printing per-entry min-of-3 plus the host steal-time
delta per pass (the environment's known confounder) so a polluted pass is
visible. Usage: python scripts/r14_aqe_ab.py default|coalesce
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NAMES = ["copurchase_edges", "cf_topn", "tpch_q9", "tpch_q1",
         "session_windows", "bm25_topk", "rrf_hybrid_topk",
         "tfidf_top_terms", "simhash_neardup", "pmi_collocations",
         "theil_sen", "k_core", "label_propagation", "weighted_sssp"]


def steal() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def main() -> None:
    from pyspark.sql import SparkSession

    tag = sys.argv[1]
    extra = {}
    if tag == "coalesce":
        extra = {
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        }
    b = (SparkSession.builder.master("local[32]")
         .appName(f"aqe-{tag}")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "16g"))
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import (
        load_table,
    )
    for t in ("part", "orders", "lineitem", "events", "documents",
              "embeddings"):
        load_table(spark, SF, t).count()
    qmap = {**m.extra_queries(), **m.queries()}
    times: dict[str, list] = {}
    for p in range(4):
        s0, t0 = steal(), time.perf_counter()
        for n in NAMES:
            q0 = time.perf_counter()
            qmap[n](spark, SF).count()
            times.setdefault(n, []).append(time.perf_counter() - q0)
        dt = time.perf_counter() - t0
        print(f"# pass{p}: {dt:.1f}s steal={(steal() - s0) / dt:.1f} j/s")
    # drop pass 0 (memo builds), min over warm passes
    tot = sum(min(v[1:]) for v in times.values())
    print(f"{tag}: warm min total over {len(NAMES)} = {tot:.2f}s")
    for n, v in times.items():
        print(f"  {min(v[1:]):6.2f} {n} {[round(x, 2) for x in v]}")
    spark.stop()


if __name__ == "__main__":
    main()
