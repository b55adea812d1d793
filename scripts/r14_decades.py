"""r14 scale measurements (VERDICT r13 next #5 and #6).

Experiments, each runnable by name (default: all):

- ``manifest``: shard_manifest's one-pass claim at 1x/10x/100x docs
  (disjoint-union growth — true per-shard sums scale exactly), plus
  shard_manifest_merge on the resulting n_shards-row states, whose
  cost must be independent of the corpus the states came from.

- ``sketch_merge``: the merge monoids' sides x state-size bound —
  hll_merge / cms_merge / bottomk_merge over 2 / 8 / 32 per-batch
  states built from the SAME grown corpus: merge wall time must track
  the number of state rows (sides x bounded-state), never the corpus.

- ``psi``: streaming_psi_drift's windows-in-flight x bins state claim
  — same row count (~2M), event-time span grown 10x (so ~10x the
  tumbling windows flow through the two chained stateful aggs). Time
  should track rows (the scan+bin work), not explode with windows;
  per-window state is <= n_bins cells by construction.

- ``set_sim_auto``: the r14 auto-materialization pick at the 510k-doc
  scale where the r13 measurements localized the localCheckpoint
  block-manager degradation: the DEFAULT call (no spill_dir, no knob)
  must count the token table, choose the parquet spill, and land on
  the linear ~0.9x-per-doc warm cost SCALE.md:1427 recorded for the
  explicit spill_dir strategy.

Usage: python scripts/r14_decades.py [manifest sketch_merge psi set_sim_auto]
"""
import glob
import os
import sys
import tempfile
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


def _grown_docs(spark, k: int):
    """Disjoint-union doc growth: copy i shifts ids by i*10^7 and salts
    every token, so shard contents stay disjoint across copies and the
    per-shard sums grow exactly linearly."""
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    grown = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        "doc_id", "text")
    return (grown.selectExpr(
        "doc_id + CAST(i AS BIGINT) * 10000000 AS doc_id",
        "concat(text, ' s', CAST(i AS STRING)) AS text")
        .localCheckpoint(eager=True))


def run_manifest(ks=(1, 10, 100)):
    spark = _spark()
    from hybrid_recommendation_system_using_vector_db_spark.operators import textops

    states = {}
    for k in ks:
        corpus = _grown_docs(spark, k)
        nd = corpus.count()
        for tag in ("cold", "warm"):
            t0 = time.time()
            m = textops.shard_manifest(corpus, n_shards=64)
            rows = m.count()
            print(f"manifest k={k} docs={nd} {tag}: {time.time()-t0:.1f}s "
                  f"shards={rows}", flush=True)
        states[k] = textops.shard_manifest(corpus, n_shards=64) \
            .localCheckpoint(eager=True)
    # merge cost must not depend on which corpus the states came from
    for k in ks:
        t0 = time.time()
        n = textops.shard_manifest_merge(states[k], states[k]).count()
        print(f"manifest_merge k={k}: {time.time()-t0:.2f}s rows={n}",
              flush=True)
    spark.stop()


def run_sketch_merge(sides_list=(2, 8, 32)):
    spark = _spark()
    from hybrid_recommendation_system_using_vector_db_spark.operators import sketches

    corpus = _grown_docs(spark, 10)
    nd = corpus.count()
    df = corpus.select(
        (F.col("doc_id") % 5).cast("string").alias("grp"),
        F.col("doc_id").alias("id"),
        (F.col("doc_id") % 100000).cast("double").alias("v"))
    for sides in sides_list:
        parts = [df.filter(F.col("id") % sides == j) for j in range(sides)]
        hs = [sketches.hll_registers(p, "grp", "v", p=8)
              .localCheckpoint(eager=True) for p in parts]
        cs = [sketches.cms_cells(p, "v", depth=4, width=256)
              .localCheckpoint(eager=True) for p in parts]
        bs = [sketches.bottomk_sample(p, "grp", "v", "id", k=256)
              .localCheckpoint(eager=True) for p in parts]
        t0 = time.time()
        nh = sketches.hll_merge(*hs).count()
        t1 = time.time()
        nc = sketches.cms_merge(*cs).count()
        t2 = time.time()
        nb = sketches.bottomk_merge(*bs, k=256).count()
        t3 = time.time()
        print(f"sketch_merge rows={nd} sides={sides}: "
              f"hll={t1-t0:.2f}s ({nh}) cms={t2-t1:.2f}s ({nc}) "
              f"bottomk={t3-t2:.2f}s ({nb})", flush=True)
    spark.stop()


def run_psi(spans_h=(72, 720)):
    """Fixed ~2M rows; event-time span 72h vs 720h => ~12 vs ~120
    6-hour windows through the chained stateful aggregations."""
    spark = _spark()
    from hybrid_recommendation_system_using_vector_db_spark.streaming.events import (
        run_stream_to_memory,
        streaming_psi_drift,
    )

    n = 2_000_000
    ref = [10] * 20
    for span in spans_h:
        rows = spark.range(n).select(
            F.timestamp_seconds(1700000000 + (F.col("id") * span * 3600)
                                / n).alias("ts"),
            ((F.col("id") * 37) % 100).cast("double").alias("value"))
        feed = tempfile.mkdtemp(prefix="psi_feed_")
        rows.repartition(8).write.mode("overwrite").parquet(feed)
        stream = (spark.readStream.schema(rows.schema)
                  .option("maxFilesPerTrigger", 2).parquet(feed))
        out = streaming_psi_drift(stream, ref, lo=0.0, hi=100.0,
                                  window="6 hours", watermark="2 hours")
        t0 = time.time()
        sq = run_stream_to_memory(out, f"psi_decade_{span}",
                                  output_mode="append")
        sq.stop()
        got = spark.table(f"psi_decade_{span}").count()
        print(f"psi rows={n} span={span}h windows_emitted={got}: "
              f"{time.time()-t0:.1f}s", flush=True)
    spark.stop()


def run_set_sim_auto(ks=(100,)):
    spark = _spark()
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table
    from hybrid_recommendation_system_using_vector_db_spark.operators import dedup

    # the r12/r13 realistic-density corpus (500-way block salt, 2%
    # planted dups) — the EXACT construction the r13 spill_dir decade
    # measured, so numbers are comparable
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for k in ks:
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
        corpus = (salted.select("doc_id", "text").unionByName(dups)
                  .localCheckpoint(eager=True))
        nd = corpus.count()
        before = set(glob.glob(os.path.join(tempfile.gettempdir(),
                                            "spark_graft_ssj_spill_*")))
        for tag in ("cold", "warm"):
            t0 = time.time()
            n = dedup.set_similarity_join(corpus, threshold=0.8).count()
            print(f"set_sim_auto k={k} docs={nd} default {tag}: "
                  f"{time.time()-t0:.1f}s pairs={n}", flush=True)
        after = set(glob.glob(os.path.join(tempfile.gettempdir(),
                                           "spark_graft_ssj_spill_*")))
        print(f"set_sim_auto k={k}: auto_spill_dirs_created="
              f"{len(after - before)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1:] or ["manifest", "sketch_merge", "psi",
                             "set_sim_auto"]
    for w in which:
        {"manifest": run_manifest, "sketch_merge": run_sketch_merge,
         "psi": run_psi, "set_sim_auto": run_set_sim_auto}[w]()
