"""r13 scale measurements (VERDICT r12 next #4 and #5).

Experiments, each runnable by name (default: all):

- ``set_sim``: close the r12 100x-decade question with MEASUREMENTS,
  not hypotheses. The r12 attribution was the ~40 M-row eagerly
  localCheckpointed token table under the single local block manager.
  Testable: re-run the 100x decade with (a) the token table spilled to
  parquet (disk-backed, column-pruned — the cluster shape), (b) no
  token checkpoint at all, pinning only the small prefix table the
  self-join reads twice, vs (c) the r12 baseline. Same realistic-
  density corpus construction as scripts/r12_decades.py (500-way block
  salt, 2% planted dups, disjoint-union growth).

- ``ppr``: personalized_pagerank vs pagerank on the SAME grown graph —
  the r12 addition should cost the same per iteration (one extra
  broadcast seed join), decades 1x/10x.

- ``er``: entity_resolution blocking fanout Sigma|block|^2 under a
  planted skewed block — decades on customer-row growth, plus one run
  with a hot block 10x the median to show the documented skew shape.

- ``drift``: drift_report column-count scaling — should be linear in
  |cols| with bounded (bottom-k) per-column work: 2 / 4 / 8 monitored
  columns over the same orders table.

Usage: python scripts/r13_decades.py [set_sim ppr er drift ...]
"""
import os
import shutil
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
    """The r12_decades corpus: block-salted tokens, 2% planted dups,
    disjoint-union growth (true pairs scale exactly linearly)."""
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
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


def run_set_sim(ks=(10, 100)):
    spark = _spark()
    from hybrid_recommendation_system_using_vector_db_spark.operators import dedup

    for k in ks:
        corpus = _grown_docs(spark, k)
        nd = corpus.count()
        for cfg, kw in (
                ("baseline-ckpt", {}),
                ("parquet-spill", {"spill_dir": None}),  # set per-run below
                ("prefix-only", {"checkpoint_tokens": False})):
            tmp = None
            if cfg == "parquet-spill":
                tmp = tempfile.mkdtemp(prefix="setsim_tok_")
                kw = {"spill_dir": tmp}
            for tag in ("cold", "warm"):
                t0 = time.time()
                n = dedup.set_similarity_join(corpus, threshold=0.8,
                                              **kw).count()
                print(f"set_sim k={k} docs={nd} {cfg} {tag}: "
                      f"{time.time()-t0:.1f}s pairs={n}", flush=True)
            if tmp:
                shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def _grown_edges(spark, k: int):
    """Disjoint-union graph growth (the SCALE.md graph methodology):
    copy i shifts every node id by i*10^7, so components never merge
    and per-iteration work scales exactly linearly."""
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    base = (li.select((F.col("l_suppkey")).alias("src"),
                      (F.col("l_partkey") % 10000).alias("dst"))
            .filter(F.col("src") != F.col("dst")).distinct())
    grown = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        "src", "dst").selectExpr(
        "src + CAST(i AS BIGINT) * 10000000 AS src",
        "dst + CAST(i AS BIGINT) * 10000000 AS dst",
        "CAST(1.0 AS DOUBLE) AS weight")
    return grown.localCheckpoint(eager=True)


def run_ppr(ks=(1, 10)):
    spark = _spark()
    from hybrid_recommendation_system_using_vector_db_spark.operators import graph

    for k in ks:
        edges = _grown_edges(spark, k)
        ne = edges.count()
        seeds = (edges.select(F.col("src").alias("node")).distinct()
                 .filter(F.col("node") % 97 == 0)
                 .localCheckpoint(eager=True))
        ns = seeds.count()
        for tag in ("cold", "warm"):
            t0 = time.time()
            n1 = graph.pagerank(edges, n_iters=3).count()
            t1 = time.time()
            n2 = graph.personalized_pagerank(edges, seeds,
                                             n_iters=3).count()
            t2 = time.time()
            print(f"ppr k={k} edges={ne} seeds={ns} {tag}: "
                  f"pagerank={t1-t0:.1f}s ({n1}) ppr={t2-t1:.1f}s ({n2})",
                  flush=True)
    spark.stop()


def run_er(ks=(1, 10)):
    """entity_resolve decades: blocks of 3 near-identical names (the
    default last-token block → Σ|block|² = 9·n/3, linear), plus a
    skew variant routing 1/32 of rows into ONE hot block whose |hot|²
    Levenshtein fanout shows the documented skew shape."""
    spark = _spark()
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table
    from hybrid_recommendation_system_using_vector_db_spark.operators import resolve

    cust = load_table(spark, SF_DIR, "customer")
    for k in ks:
        grown = cust.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
            "c_custkey").selectExpr(
            "c_custkey + CAST(i AS BIGINT) * 10000000 AS id",
            # triples of names differing in ONE char, block = the
            # copy-salted last token (blocks never merge across copies)
            "concat('v', CAST(c_custkey % 3 AS STRING), ' g',"
            " CAST(CAST(floor(c_custkey / 3) AS BIGINT) AS STRING), '#',"
            " CAST(i AS STRING)) AS name")
        for skew in (False, True):
            recs = grown
            if skew:
                recs = grown.selectExpr(
                    "id",
                    "CASE WHEN id % 32 = 0 THEN"
                    " concat('c', CAST(id AS STRING), ' hotblk')"
                    " ELSE name END AS name")
            recs = recs.localCheckpoint(eager=True)
            nr = recs.count()
            for tag in ("cold", "warm"):
                t0 = time.time()
                out = resolve.entity_resolve(recs, max_dist=2).count()
                print(f"er k={k} rows={nr} skew={skew} {tag}: "
                      f"{time.time()-t0:.1f}s resolved={out}", flush=True)
    spark.stop()


def run_drift(col_counts=(2, 4, 8)):
    spark = _spark()
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table
    from hybrid_recommendation_system_using_vector_db_spark.operators import profiling

    orders = load_table(spark, SF_DIR, "orders")
    ref = orders.filter(F.col("o_orderstatus") == "F")
    cur = orders.filter(F.col("o_orderstatus") == "O")
    base_cols = ["o_totalprice", "o_custkey", "o_orderkey"]
    for nc in col_counts:
        cols = []
        r, c = ref, cur
        for j in range(nc):
            src = base_cols[j % len(base_cols)]
            name = f"m{j}"
            r = r.withColumn(name, F.col(src) + j)
            c = c.withColumn(name, F.col(src) + j)
            cols.append(name)
        r2, c2 = r.localCheckpoint(eager=True), c.localCheckpoint(eager=True)
        for tag in ("cold", "warm"):
            t0 = time.time()
            n = profiling.drift_report(r2, c2, cols, id_col="o_orderkey",
                                       k=512).count()
            print(f"drift cols={nc} {tag}: {time.time()-t0:.1f}s rows={n}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    names = sys.argv[1:] or ["set_sim", "ppr", "er", "drift"]
    for nm in names:
        {"set_sim": run_set_sim, "ppr": run_ppr,
         "er": run_er, "drift": run_drift}[nm]()
