"""r14 per-entry profiler: times an entry like bench.py does (count action,
bench-identical session) and reports per-pass wall time plus the number of
Spark jobs/stages each pass scheduled — the job count is the floor signature
(every action / eager checkpoint / AQE re-optimization is a job; an entry at
~1 s with 15 jobs is floor-bound, one with 3 jobs is compute-bound).

Usage: python scripts/r14_profile.py entry [entry ...] [--passes N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1])

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("r14-profile")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import (
        load_table,
    )

    for t in ("part", "orders", "lineitem", "events", "documents",
              "embeddings"):
        try:
            load_table(spark, SF_DIR, t).count()
        except Exception:
            pass

    qmap = {**entry_mod.extra_queries(), **entry_mod.queries()}
    tracker = spark.sparkContext.statusTracker()

    def _max_job(ids):
        return max(ids) if ids else -1

    for name in names:
        if name not in qmap:
            print(f"{name}: NOT FOUND")
            continue
        for p in range(passes):
            j0 = _max_job(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            n = qmap[name](spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            j1 = _max_job(tracker.getJobIdsForGroup(None) or [])
            print(f"{name} pass{p}: {dt:.3f}s rows={n} jobs={j1 - j0}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
