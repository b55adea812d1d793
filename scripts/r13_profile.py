"""r13 profiling of the two slowest oracle entries (VERDICT r12 #6).

- ``attribution``: how much of streaming_attribution's ~5.8 s is the
  Structured Streaming floor (query startup + micro-batch scheduling +
  state-store plumbing on a static file source) vs the interval-join
  work? Measured by timing, on the SAME source and sink: (a) a
  watermarked passthrough (no join, no state beyond the watermark),
  (b) a watermarked stream-static join (one state-free lookup), and
  (c) the full stream-stream interval join. (c)−(a) bounds the join's
  own cost; (a) IS the floor any streaming entry pays per run.

- ``lpa``: label_propagation per-round cost — run with n_rounds
  1/2/4 on the same checkpointed co-purchase graph; the fixed offset
  (round-0 setup: edges build + degree init) vs the per-round slope.

Usage: python scripts/r13_profile.py [attribution lpa ...]
"""
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.driver.memory", "64g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_attribution():
    spark = _spark()
    from hybrid_recommendation_system_using_vector_db_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        stream_stream_attribution,
    )

    def timed(tag, build):
        for i in range(3):
            for q in spark.streams.active:
                q.stop()
            t0 = time.time()
            sq = run_stream_to_memory(build(), f"prof_{tag}_{i}",
                                      output_mode="append")
            sq.stop()
            n = spark.table(f"prof_{tag}_{i}").count()
            print(f"attribution {tag} pass{i}: {time.time()-t0:.2f}s "
                  f"rows={n}", flush=True)

    # (a) floor: watermarked passthrough, no join
    timed("floor", lambda: read_events_stream(spark, SF_DIR)
          .withWatermark("ts", "2 hours")
          .select("event_id", "user_id", "ts"))
    # (b) stream-static broadcast lookup (no stream-stream state)
    static = (spark.range(0, 100000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("segment")))
    timed("stream_static", lambda: read_events_stream(spark, SF_DIR)
          .withWatermark("ts", "2 hours")
          .join(F.broadcast(static), "user_id")
          .select("event_id", "user_id", "segment", "ts"))
    # (c) the full stream-stream interval join
    def full():
        ev = read_events_stream(spark, SF_DIR)
        return stream_stream_attribution(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
            horizon="1 hour")
    timed("full_join", full)
    spark.stop()


def run_lpa():
    spark = _spark()
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table
    from hybrid_recommendation_system_using_vector_db_spark.operators import (
        copurchase,
        graph,
    )

    edges = copurchase.copurchase_edges(
        load_table(spark, SF_DIR, "lineitem")).localCheckpoint(eager=True)
    print(f"lpa edges={edges.count()}", flush=True)
    for rounds in (1, 2, 4):
        for tag in ("cold", "warm"):
            t0 = time.time()
            n = graph.label_propagation(edges, n_rounds=rounds).count()
            print(f"lpa rounds={rounds} {tag}: {time.time()-t0:.2f}s "
                  f"nodes={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    names = sys.argv[1:] or ["attribution", "lpa"]
    for nm in names:
        {"attribution": run_attribution, "lpa": run_lpa}[nm]()
