"""r15 plan capture: dump .explain("formatted") for named declared/extra
entries to plans/r15/<name>_<tag>.txt.

Usage: python scripts/r15_plans.py TAG entry [entry ...]

TAG is "before" or "after" (or anything else for ad-hoc captures).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r15")


def main() -> None:
    from pyspark.sql import SparkSession

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("r15-plans")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from hybrid_recommendation_system_using_vector_db_spark.plans import (
        formatted_plan,
    )

    os.makedirs(OUT, exist_ok=True)
    qmap = {**entry_mod.extra_queries(), **entry_mod.queries()}
    for name in names:
        if name not in qmap:
            print(f"{name}: NOT FOUND")
            continue
        df = qmap[name](spark, SF_DIR)
        plan = formatted_plan(df)
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('InMemoryTableScan')} InMemoryTableScan)")
    spark.stop()


if __name__ == "__main__":
    main()
