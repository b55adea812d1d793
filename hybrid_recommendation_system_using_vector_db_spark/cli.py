"""Command-line surface mirroring the reference's interactive REPL.

The reference runs ``python Hybrid_Recom_vecdb.py``, builds its index, then
loops on stdin: a query string (ASIN or title substring) prints hybrid
top-k; ``eval`` runs the Precision@K harness (``Hybrid_Recom_vecdb.py:
384-421``). Batch-first Spark equivalent:

    python -m hybrid_recommendation_system_using_vector_db_spark.cli build --meta amazon-meta.txt.gz --out /tmp/idx
    python -m hybrid_recommendation_system_using_vector_db_spark.cli recommend --index /tmp/idx --query "calculus"
    python -m hybrid_recommendation_system_using_vector_db_spark.cli recommend --index /tmp/idx   # interactive loop
    python -m hybrid_recommendation_system_using_vector_db_spark.cli eval --sf-dir /root/testdata/sf0.01

The query path is the same lazy plan as ``__spark_entry__``: resolve (C4)
→ embed the query doc → content top-n (C5) ⊕ CF top-n (D2/F1) → α-blend
(C2/G8) → top-k (F1).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import TOP_K
from .embeddings import hashing_embedder
from .operators import hybrid, resolve
from .pipeline import build_index, load_index
from .session import get_spark


def _recommend(spark: SparkSession, index_dir: str, query: str, k: int) -> DataFrame:
    t = load_index(spark, index_dir)
    index, edges = t["index"], t["edges"]
    names = index.select(F.col("asin").alias("item_id"), F.col("title").alias("name"))
    qdf = spark.createDataFrame([(1, query)], "qid int, query_text string")
    resolved = resolve.resolve_queries(qdf, names).filter(F.col("item_id").isNotNull())
    corpus = index.select(F.col("asin").alias("vec_id"), "embedding")
    queries = resolved.join(corpus, resolved.item_id == corpus.vec_id).select("vec_id", "embedding")
    e = edges.select("src", "dst", "weight")
    return hybrid.hybrid_recommend(queries, corpus, e, names, k=k)


def _index_cmd(spark: SparkSession, family: str, action: str,
               sf_dir: str, out: str, where: str | None = None) -> dict:
    """Index-lifecycle dispatch (the ``index`` subcommand body, kept
    session-injectable for tests): ``write`` trains + persists, ``append``
    encodes only the selected batch with the stored artifacts — the
    O(batch) maintenance path that replaces the reference's
    destroy-and-recreate (A4). Returns row counts of the written dirs."""
    from . import pipeline
    from .datamodel import load_table

    src_table = "documents" if family in {"bm25", "maxsim"} else "embeddings"
    src = load_table(spark, sf_dir, src_table)
    if where:
        src = src.filter(where)
    fns = {
        ("ivf", "write"): lambda: pipeline.write_ivf_index(spark, src, out),
        ("ivf", "append"): lambda: pipeline.append_ivf_index(spark, src, out),
        ("pq", "write"): lambda: pipeline.write_pq_index(spark, src, out),
        ("pq", "append"): lambda: pipeline.append_pq_index(spark, src, out),
        ("ivfpq", "write"): lambda: pipeline.write_ivfpq_index(spark, src, out),
        ("ivfpq", "append"): lambda: pipeline.append_ivfpq_index(spark, src, out),
        ("bm25", "write"): lambda: pipeline.write_bm25_index(spark, src, out),
        ("bm25", "append"): lambda: pipeline.append_bm25_index(spark, src, out),
        ("maxsim", "write"): lambda: pipeline.write_maxsim_index(spark, src, out),
        ("maxsim", "append"): lambda: pipeline.append_maxsim_index(spark, src, out),
    }
    fns[(family, action)]()
    dirs = {"ivf": ["ivf_lists"], "pq": ["pq_codes"],
            "ivfpq": ["ivfpq_codes"],
            "bm25": ["bm25_postings", "bm25_df"],
            "maxsim": ["maxsim_components"]}[family]
    return {d: spark.read.parquet(f"{out}/{d}").count() for d in dirs}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hybrid_recommendation_system_using_vector_db_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="EP1: parse catalog, build edges + vector index")
    b.add_argument("--meta", required=True, help="amazon-meta .txt or .txt.gz path")
    b.add_argument("--out", required=True, help="output directory for the index tables")
    b.add_argument("--sample-size", type=int, default=100_000)

    r = sub.add_parser("recommend", help="EP2: hybrid top-k for a query")
    r.add_argument("--index", required=True)
    r.add_argument("--query", default=None, help="ASIN or title substring; omit for a stdin loop")
    r.add_argument("-k", type=int, default=TOP_K)

    e = sub.add_parser("eval", help="EP3: Precision@K harness on the test tables")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    pr = sub.add_parser(
        "profile", help="data profiling: key-skew, histogram, anomalies")
    pr.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pr.add_argument("--table", default="lineitem")
    pr.add_argument("--key", default="l_partkey",
                    help="column for the heavy-key shuffle profile")
    pr.add_argument("--value", default=None,
                    help="numeric column for an equal-width histogram")
    pr.add_argument("--top-n", type=int, default=20)

    x = sub.add_parser(
        "explain", help="print the formatted physical plan of a query")
    x.add_argument("name", help="a queries()/extra_queries() entry name")
    x.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    ix = sub.add_parser(
        "index", help="index lifecycle: train+write, or O(batch) append "
                      "with the stored artifacts (no retrain, no rewrite)")
    ix.add_argument("--family", required=True,
                    choices=["ivf", "pq", "ivfpq", "bm25", "maxsim"])
    ix.add_argument("--action", default="write",
                    choices=["write", "append"])
    ix.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ix.add_argument("--out", required=True, help="index directory")
    ix.add_argument("--where", default=None,
                    help="SQL predicate selecting the source batch "
                         "(e.g. \"vec_id % 2 = 1\" for an append)")
    e.add_argument("--out", default=None,
                   help="write precision_k.csv (+ PNGs when matplotlib is "
                        "available) here, mirroring the reference's plot "
                        "artifacts (Hybrid_Recom_vecdb.py:294-318)")

    args = p.parse_args(argv)
    spark = get_spark()
    try:
        if args.cmd == "build":
            counts = build_index(spark, args.meta, args.out, args.sample_size)
            print({k: v for k, v in counts.items()})
        elif args.cmd == "recommend":
            if args.query is not None:
                _recommend(spark, args.index, args.query, args.k).show(args.k, truncate=60)
            else:
                for line in sys.stdin:  # the reference's REPL loop (:384-410)
                    q = line.strip()
                    if not q or q.lower() in {"quit", "exit"}:
                        break
                    _recommend(spark, args.index, q, args.k).show(args.k, truncate=60)
        elif args.cmd == "explain":
            import __spark_entry__ as entry  # noqa: PLC0415

            from .plans import formatted_plan, pushed_filters  # noqa: PLC0415

            qmap = {**entry.extra_queries(), **entry.queries()}
            if args.name not in qmap:
                print(f"unknown query {args.name!r}; known: "
                      f"{', '.join(sorted(qmap))}", file=sys.stderr)
                return 2
            df = qmap[args.name](spark, args.sf_dir)
            plan = formatted_plan(df)
            print(plan)
            pf = pushed_filters(df)
            if pf:
                print("# PushedFilters:", "; ".join(pf))
            print(f"# scans={plan.count('Scan parquet')} "
                  f"exchanges={plan.count('Exchange')} "
                  f"aggregates={plan.count('HashAggregate')}")
        elif args.cmd == "index":
            counts = _index_cmd(spark, args.family, args.action,
                                args.sf_dir, args.out, args.where)
            print({k: v for k, v in sorted(counts.items())})
        elif args.cmd == "profile":
            from .datamodel import load_table  # noqa: PLC0415
            from .operators import profiling  # noqa: PLC0415

            df = load_table(spark, args.sf_dir, args.table)
            print(f"# key skew: {args.table}.{args.key}")
            profiling.key_skew_profile(df, args.key, top_n=args.top_n)\
                .show(args.top_n, truncate=False)
            if args.value:
                print(f"# histogram: {args.table}.{args.value}")
                profiling.value_histogram(df, args.value)\
                    .orderBy("bin").show(25, truncate=False)
        elif args.cmd == "eval":
            import time  # noqa: PLC0415

            import __spark_entry__ as entry  # noqa: PLC0415 — repo-root module

            from .reports import print_results, write_eval_report  # noqa: PLC0415

            t0 = time.monotonic()
            rows = entry.q_precision_eval(spark, args.sf_dir).collect()
            elapsed = time.monotonic() - t0
            # one shared Spark job serves every model — attribute the wall
            # time to the batch, as the reference reports per-model totals
            runtimes = {m: elapsed for m in sorted({r["model"] for r in rows})}
            print_results(rows, runtimes)
            if args.out:
                written = write_eval_report(rows, args.out, runtimes)
                print({k: v for k, v in sorted(written.items())})
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
