"""Capture .explain('formatted') for named entries into plans/r14/.

Usage: python scripts/r14_plans.py before|after entry [entry ...]

Streaming/foreachBatch entries return a post-drain DataFrame (memory
table or state-parquet read), so their formatted plan documents the
*returned* relation; the fold/stream evidence for those lives in the
job-count and wall-time numbers in OPTIMIZATION_r14.md.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")


def main() -> None:
    from pyspark.sql import SparkSession

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("r14-plans")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from hybrid_recommendation_system_using_vector_db_spark.plans import (
        formatted_plan,
    )

    qmap = {**entry_mod.extra_queries(), **entry_mod.queries()}
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qmap[name](spark, SF_DIR)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
