#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line to stdout:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Stdout carries ONLY that line (VERDICT r4 #1: per-iteration arrays grew the
line past the driver's tail capture and BENCH_r04 recorded parsed:null).
The full payload — per-iteration times, index-build timings, load average —
goes to stderr and to ``bench_full.json`` next to this file.

Headline set = the reference-parity pipeline (edges → CF → content ANN →
hybrid fusion → precision eval) plus the scale-path operators (GEMM ANN,
LSH/IVF ANN, MinHash near-dup, exact dedup, token stats) and the analytic
queries. Each query is timed end-to-end including the action (count), after
a warm-up of the input scans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# the queries that make up the headline number (reference-parity EP1-EP3
# pipeline + scale-path extensions); keys match __spark_entry__.queries()
HEADLINE = [
    "copurchase_edges",
    "cf_topn",
    "content_topk",
    "content_topk_gemm",
    "lsh_topk",
    "lsh_topk_mp",
    "ivf_topk",
    "hybrid_topk",
    "hybrid_topk_ann",
    "precision_eval",
    "query_resolution",
    "seeded_sample",
    "amazon_meta_ingest",
    "jsonl_ingest",
    "csv_ingest",
    "pretrain_corpus",
    "token_budget_mix",
    "dedup_exact",
    "minhash_dup_pairs",
    "minhash_jaccard_neardup",
    "embedding_neardup",
    "token_stats",
    "quality_scores",
    "doc_fingerprints",
    "tfidf_top_terms",
    "cluster_centroids",
    "kmv_distinct",
    "session_windows",
    "tpch_q1",
    "top_parts_by_revenue",
    "events_hourly",
    "sessionization",
    "asof_attribution",
    "stratified_sample",
    "weighted_sample",
    "pack_sequences",
    "rollup_revenue",
    "parts_unindexed",
    "doc_length_stats",
    "coactivity",
    "distinct_users",
    "user_type_setops",
    "simhash_neardup",
    "cube_revenue",
    "repetition_stats",
    "decontaminate",
    "quantized_topk",
    "pq_topk",
    "domain_mix",
    "bm25_topk",
    "rrf_hybrid_topk",
    # r6 additions: two-level/diversified/filtered ANN serving, graph
    # rank, span dedup, CCNet filters, semantic dedup, importance
    # weighting, cross-corpus decontamination, quantile filtering, linalg
    "ivfpq_topk",
    "ivfpq_rerank",
    "mmr_topk",
    "filtered_topk",
    "pagerank",
    "paragraph_dedup",
    "boilerplate_removal",
    "lm_perplexity",
    "kn_perplexity",
    "semdedup",
    "dsir_weights",
    "cross_dedup",
    "quality_band",
    "gram_matrix",
    "chunk_documents",
    "centroid_outliers",
    "hard_negatives",
    "cms_heavy_hitters",
    "chunk_pooled_embeddings",
    "bpe_merges",
    "maxsim_topk",
    "hll_distinct",
    "tpch_q3",
    "tpch_q5",
    "tpch_q10",
    "tpch_q6",
    "bpe_encode",
    "unigram_pieces",
    "unigram_encode",
    "link_prediction",
    "cohort_retention",
    "ranking_eval",
    "funnel",
    "triangles",
    "key_skew",
    "activity_anomalies",
    "fuzzy_names",
    "snapshot_diff",
    "bloom_prune",
    "pmi_collocations",
    "mutual_knn",
    "rnn_clusters",
    "value_histogram",
    "event_transitions",
    "rp_topk",
    "pca_topk",
    "dup_spans",
    "substring_dedup",
    "diversity_eval",
    "whitened_topk",
    "negative_samples",
    "dedup_keep_best",
    "leakage_safe_split",
    "als_fold_in",
    "lang_confusion",
    "lang_id_trained",
    "char_entropy",
    "quality_classifier",
    "scd2_intervals",
    "psi_drift",
    "zorder_key",
    "grouped_quantiles",
    "ewma_revenue",
    "association_rules",
    "containment_neardup",
    "winsorize",
    "tpch_q4",
    "tpch_q18",
    "tpch_q14",
    "tpch_q16",
    "tpch_q19",
    "tpch_q21",
    "robust_zscore",
    "temporal_split",
    "streaming_enrich",
    "idf_jaccard_neardup",
    "band_recall",
    "bfs_distances",
    "k_core",
    "seasonal_anomalies",
    "path_ngrams",
    "sampled_quantiles",
    # r10: persisted-index write→append→load→serve lifecycle (A3/A4)
    "index_lifecycle",
    # r10: the remaining partsupp-free TPC-H shapes — with q7/q8/q15 the
    # suite covers every TPC-H query expressible without partsupp
    "tpch_q12",
    "tpch_q13",
    "tpch_q17",
    "tpch_q22",
    "tpch_q7",
    "tpch_q8",
    "tpch_q15",
    # r10 second wave: the four partsupp-DEPENDENT shapes over the
    # derived supply view (all 22 TPC-H shapes covered), CDC MERGE
    # apply, edit-verified near-dup, and LPA communities
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q20",
    "cdc_apply",
    "edit_neardup",
    "label_propagation",
    "gap_fill",
    "weighted_sssp",
    "kmv_set_ops",
    "hopping_windows",
    "orc_roundtrip",
    "unpivot_measures",
    "bag_setops",
    # r11 (VERDICT r10 next #7): the previously-unbenched tail — every
    # oracle-backed entry now has a recorded timing each sweep (most of
    # these are building blocks whose cost also rides larger entries,
    # which is why they were skipped before; a few are micro-benchmarks
    # of streaming/one-batch paths)
    "als_recommend",
    "ann_recall",
    "customer_order_topn",
    "dedup_clusters",
    "dedup_clusters_chained",
    "dedup_clusters_star",
    "events_pivot",
    "fraction_sample",
    "hash_embeddings",
    "jaccard_neardup",
    "language_id",
    "media_frame_sample",
    "media_resize",
    "minhash_signatures",
    "multimodal_features",
    "orders_running_total",
    "part_doc_projection",
    "simhash_fingerprints",
    "split_assign",
    "streaming_attribution",
    "streaming_dedup",
    "streaming_hourly",
    "streaming_neardup",
    "streaming_sessions",
    "text_scrub",
    "vocab_topk",
    # r11 second wave
    "set_sim_join",
    "k_truss",
    "dq_checks",
    "temporal_reach",
    "weighted_median",
    "equidepth_histogram",
    "frequent_triples",
    "streaming_cdc",
    "theil_sen",
    "ks_drift",
    "ks_drift_grouped",
    "spearman",
    "benford",
    "kendall",
    # r12 (VERDICT r11 next #2/#3): the stated 100 TB tiers, now real
    "ks_drift_sketched",
    "kendall_sampled",
    "theil_sen_sampled",
    # r12 (VERDICT r11 next #7): HLL approximate-unique DQ tier
    "dq_checks_approx",
    # r12: equi-depth sketch tier (sample edges, no global sort)
    "equidepth_sketched",
    # r12: per-column KS monitoring table
    "drift_report",
    # r12: match -> closure -> survivorship composition
    "entity_resolution",
    # r12: classifier-eval completions
    "roc_auc",
    "average_precision",
    "calibration_table",
    # r12: seed-restart PageRank
    "personalized_pagerank",
    # r12: additive trend/seasonal/resid split
    "seasonal_decompose",
    # r12: pre-join cardinality profile
    "join_fanout",
    # r13: dataset-publishing manifest (one-pass, order-independent hash),
    # its additive merge, and the streaming foreachBatch fold
    "shard_manifest",
    "shard_manifest_merge",
    "streaming_shard_manifest",
    # r13: examples-proportional interleave schedule
    "mixing_order",
    # r13: chained stateful aggs — per-window streaming PSI monitor
    "streaming_psi_drift",
    # r13: sketch-union algebras (register max / bottom-k / counter sum)
    "hll_merge",
    "streaming_hll",
    "sampled_quantiles_merge",
    "cms_merge",
    # r14: bounded/sampling-theory drift members, categorical
    # association, the calibration gate summary, grouped theta-sketch
    # algebra, and the CMS streaming fold
    "js_drift",
    "chi2_drift",
    "cramers_v",
    "calibration_ece",
    "kmv_overlap_grouped",
    "streaming_cms",
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spark-graft-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    # the bench measures the whole implemented surface — driver-checked
    # entries plus the pytest-only extras — so headline membership stays
    # stable round-over-round even as entries move between surfaces
    qmap = {**entry_mod.extra_queries(), **entry_mod.queries()}
    names = [n for n in HEADLINE if n in qmap]

    # warm the file-scan + JVM (not counted): touch every input table once
    from hybrid_recommendation_system_using_vector_db_spark.datamodel import load_table

    for t in ("part", "orders", "lineitem", "events", "documents", "embeddings"):
        try:
            load_table(spark, SF_DIR, t).count()
        except Exception:
            pass

    # min of N runs per query: measures steady-state engine throughput, not
    # first-run JIT/codegen compilation (which amortizes to zero at scale).
    # ALL iteration times are reported (VERDICT r2 #4: a single min hid a
    # noisy-machine artifact in BENCH_r02), plus a load sentinel so a
    # loaded-host run is identifiable after the fact.
    #
    # Iterations run as FULL PASSES over the sweep, not back-to-back per
    # entry (r9): the VM host shows transient CPU-steal windows of a few
    # minutes that made CONTIGUOUS runs of entries 2-4x slower — with
    # back-to-back iterations both landed inside the window and min()
    # couldn't recover (observed as a different arbitrary regression set
    # on every run of identical code). Interleaved passes cost the same
    # total work, but a steal window hits DIFFERENT entries in each pass,
    # so the per-entry min rejects it. THREE passes (r10, VERDICT r9
    # wrong #1): min-of-2 recorded pq_topk at 4x its true warm cost when
    # one steal window spanned the same entry in both adjacent passes —
    # a third pass makes a window covering all of an entry's iterations
    # far less likely, and entries whose iteration spread still exceeds
    # 3x are flagged in the stderr report so a polluted record is
    # self-describing.
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    all_iters: dict[str, list] = {}
    rowcounts: dict[str, int] = {}
    failed: set = set()
    pass_load_avg: list[list[float]] = []   # host load at each pass start

    def _load() -> list[float]:
        try:
            return [round(x, 2) for x in os.getloadavg()]
        except OSError:
            return []

    # r14 (VERDICT r13 wrong #2): the warm-spread gate only catches steal
    # WINDOWS — a uniformly busy host inflates every pass equally and
    # sailed through as contended:false while shared-key totals drifted
    # +7.6%. Canary: a fixed SINGLE-THREADED numpy workload runs before
    # each pass while Spark is idle; one runnable thread on a 32-CPU box
    # cannot meaningfully self-stall, so any CPU pressure (PSI
    # /proc/pressure/cpu `some total` delta) during the canary window is
    # EXTERNAL load — exactly the signal loadavg can't give because
    # loadavg includes this bench's own local[32] work. Two gates:
    # stall fraction > 10% in any canary window (uniform external load),
    # canary max/min > 1.25 across passes (load that comes and goes).
    def _psi_total():
        try:
            with open("/proc/pressure/cpu") as fh:
                return int(fh.readline().rsplit("total=", 1)[1])
        except Exception:
            return None

    # r14 second gate: HYPERVISOR STEAL. PSI only sees runnable-but-
    # not-running inside this kernel; CPU stolen by the host shows up
    # in /proc/stat field 8 (steal jiffies) and in nothing PSI reports
    # — measured here as exactly the failure mode that inflated a sweep
    # 1.5x while every canary stall read ~0. Sampled around each PASS
    # (not just the canary window: steal hits the local[32] work).
    def _steal():
        try:
            with open("/proc/stat") as fh:
                return int(fh.readline().split()[8])
        except Exception:
            return None

    def _canary():
        import numpy as _np
        a = _np.random.default_rng(0).random(500_000)
        p0, t0 = _psi_total(), time.perf_counter()
        acc = 0.0
        for _ in range(40):
            acc += float(_np.sort(a)[0] + a.sum())
        dt = time.perf_counter() - t0
        p1 = _psi_total()
        stall = (None if p0 is None or p1 is None
                 else round((p1 - p0) / 1e6 / dt, 4))
        return round(dt * 1000.0, 1), stall

    canary_ms: list[float] = []
    canary_stall: list = []
    pass_steal_frac: list = []   # stolen fraction of machine capacity/pass
    # ADVICE r14: under cgroup CPU limits os.cpu_count() overstates usable
    # capacity (understating the steal fraction), and USER_HZ is a kernel
    # build choice, not a constant — take both from the OS.
    try:
        n_cpu = min(os.cpu_count() or int(CPUS),
                    len(os.sched_getaffinity(0)))
    except (AttributeError, OSError):
        n_cpu = os.cpu_count() or int(CPUS)
    try:
        user_hz = float(os.sysconf("SC_CLK_TCK"))
    except (ValueError, OSError):
        user_hz = 100.0

    for _pass in range(iters):
        pass_load_avg.append(_load())
        cms, cstall = _canary()
        canary_ms.append(cms)
        canary_stall.append(cstall)
        s0, pt0 = _steal(), time.perf_counter()
        for name in names:
            if name in failed:
                continue
            try:
                t0 = time.perf_counter()
                rowcounts[name] = qmap[name](spark, SF_DIR).count()
                all_iters.setdefault(name, []).append(
                    round(time.perf_counter() - t0, 3))
            except Exception as e:  # one broken query must not zero the report
                failed.add(name)
                all_iters.pop(name, None)
                print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      file=sys.stderr)
        s1, pdt = _steal(), time.perf_counter() - pt0
        # capacity = SC_CLK_TCK jiffies/s per usable CPU
        pass_steal_frac.append(
            None if s0 is None or s1 is None or pdt <= 0
            else round((s1 - s0) / (n_cpu * user_hz * pdt), 4))
    timings: dict[str, float] = {}
    total = 0.0
    windowed: list[str] = []
    for name in names:
        if name not in all_iters:
            continue
        best = min(all_iters[name])
        timings[name] = best
        total += best
        # VERDICT r9 wrong #1: iteration spread >3x marks a probable
        # host CPU-steal window — the recorded min may still be polluted
        # if the window spanned every pass of this entry. The spread is
        # computed over the WARM passes only (iters[1:]): pass 1 is
        # expected-cold for every session-memoized entry, so including
        # it flags half the sweep on every clean run.
        warm = all_iters[name][1:] if len(all_iters[name]) > 2 \
            else all_iters[name]
        spread = (max(warm) / min(warm)) if min(warm) > 0 else 1.0
        flag = ""
        if len(warm) > 1 and spread > 3.0:
            flag = f"  ** warm spread {spread:.1f}x (steal-window suspect)"
            windowed.append(name)
        print(f"# {name}: {best:.3f}s ({rowcounts[name]} rows) "
              f"iters={all_iters[name]}{flag}", file=sys.stderr)
    if windowed:
        print(f"# steal-window suspects (iter spread >3x): {windowed}",
              file=sys.stderr)
    # VERDICT r11 next #1: the suspects list and the contention verdict
    # go INTO the JSON record (previously stderr-only, so a polluted
    # record wasn't machine-readably self-describing). `contended` keys
    # off the suspects + the canary gates — absolute load_avg includes
    # this bench's own local[32] work, so it is recorded for forensics,
    # not judged; the canary isolates EXTERNAL load (r14, VERDICT r13
    # wrong #2: a uniform +7.6% inflation passed as contended:false).
    stalls = [s for s in canary_stall if s is not None]
    canary_spread = (max(canary_ms) / min(canary_ms)
                     if canary_ms and min(canary_ms) > 0 else 1.0)
    canary_contended = (bool(stalls) and max(stalls) > 0.10) \
        or canary_spread > 1.25
    if canary_contended:
        print(f"# canary contention: ms={canary_ms} "
              f"stall_frac={canary_stall} spread={canary_spread:.2f}x",
              file=sys.stderr)
    # steal gate (r14): >1% of machine capacity stolen during any pass.
    # A clean host measures ~0.1-0.6% at idle; the sweep that drifted
    # 1.5x measured 2.3-2.7% during its passes with every other gate
    # green. Hypervisor steal is invisible to PSI and to loadavg.
    steals = [s for s in pass_steal_frac if s is not None]
    steal_contended = bool(steals) and max(steals) > 0.01
    if steal_contended:
        print(f"# steal contention: pass_steal_frac={pass_steal_frac}",
              file=sys.stderr)
    contended = bool(windowed) or canary_contended or steal_contended

    # index build phases, timed separately (VERDICT r2 #8): the serve-path
    # entries above ride session-memoized persisted indexes, so the build
    # cost would otherwise be invisible in the headline numbers. These are
    # un-memoized single-shot builds (build cost is paid once per corpus
    # in production — min-of-iters would just measure the scan cache).
    from hybrid_recommendation_system_using_vector_db_spark.operators import (
        copurchase, linalg, mf, similarity,
    )

    def _lsh_lifecycle_build() -> int:
        # un-memoized persisted-lifecycle cost: write half, append half
        # through the staged commit, load back (the index_lifecycle
        # sweep entry above rides the session memo after pass 1)
        import shutil
        import tempfile

        from hybrid_recommendation_system_using_vector_db_spark import pipeline
        from pyspark.sql import functions as _F

        out = tempfile.mkdtemp(prefix="spark_graft_bench_lsh_")
        try:
            pipeline.write_lsh_index(
                spark, emb.filter(_F.col("vec_id") % 2 == 0), out,
                n_bits=5, n_tables=8)
            pipeline.append_lsh_index(
                spark, emb.filter(_F.col("vec_id") % 2 == 1), out)
            return pipeline.load_lsh_index(spark, out).count()
        finally:
            shutil.rmtree(out, ignore_errors=True)

    emb = load_table(spark, SF_DIR, "embeddings")
    builds = {
        "lsh_build": lambda: similarity.lsh_build_index(
            emb, n_bits=5, n_tables=8).count(),
        "lsh_lifecycle_build": _lsh_lifecycle_build,
        "ivf_build": lambda: similarity.ivf_build_lists(
            emb, similarity.kmeans_centroids_local(emb, 16, 2)).count(),
        "cf_build": lambda: copurchase.cf_topn(
            copurchase.copurchase_edges(
                load_table(spark, SF_DIR, "lineitem")), 60).count(),
        # PCA training = the gram_matrix corpus pass + driver eigh; the
        # pca_topk serve entry above rides the memoized components
        "pca_build": lambda: len(linalg.pca_components(
            [(r.i, r.j, r.g)
             for r in linalg.gram_matrix(emb, dim=64).collect()],
            n_components=16)),
        # implicit-ALS factorization over the co-purchase graph (the
        # als_recommend entry rides the session-memoized rec table)
        "als_train": lambda: mf.als_recommend(
            copurchase.copurchase_edges(
                load_table(spark, SF_DIR, "lineitem")),
            k=10, user_mod=20).count(),
    }
    # r7 trainers (their serve entries ride session memos, so the train
    # cost is only visible here): LID char-trigram profiles, KN word LM,
    # the LR quality classifier, and the unigram-LM EM loop
    from hybrid_recommendation_system_using_vector_db_spark.operators import (
        classifier, textops, unigram_lm,
    )

    docs = load_table(spark, SF_DIR, "documents")
    builds.update({
        "lid_train": lambda: textops.train_language_profiles(docs).count(),
        "kn_train": lambda: textops.kn_word_lm(docs).count(),
        "qclf_train": lambda: len(classifier.train_quality_classifier(
            docs.selectExpr("doc_id", "text",
                            "CAST(lang = 'en' AS DOUBLE) AS label"))[0]),
        "unigram_train": lambda: unigram_lm.unigram_lm_train(docs).count(),
    })
    build_timings: dict[str, float] = {}
    for name, fn in builds.items():
        try:
            t0 = time.perf_counter()
            n = fn()
            dt = round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:120]}", file=sys.stderr)
            continue
        build_timings[name] = dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    # amortized hybrid serve: BASELINE.md's published unit is PER-QUERY
    # latency over a batch (50 hybrid queries ≈ 0.168 s ≈ 3.4 ms/q
    # in-process). A 40-query Spark total is dominated by the per-action
    # scheduling floor, so measure ~500 queries through the memoized serve
    # chain in ONE batched action and report ms/query (VERDICT r6 next #6).
    #
    # Measurement discipline (VERDICT r8 What's-wrong #1): the r8 driver
    # record came in 4x slower than an identical-code snapshot three hours
    # earlier (8.65 vs 2.11 ms/q) — BOTH serve iterations slow, so not
    # cold-start; the serve batch ran last, after the 126-entry sweep had
    # accumulated ~30 persisted memo DataFrames and their cached blocks
    # (GC/memory-pressure suspects). Three changes: (1) quiesce the
    # session first — drop every sweep memo + cached relation and force a
    # JVM GC, so serving starts from the same state a fresh session has;
    # (2) >=5 timed iterations; (3) report the MEDIAN as the canonical
    # ms/q (min recorded alongside) so one noisy iteration cannot set the
    # round's number. Observed spread after quiescing at sf0.1/local[32]
    # (r9): iters [0.672..2.854] s — bimodal (occasional GC/scheduler
    # stall doubles an iteration), which is exactly why the canonical
    # number is the median of >=5, not a single run or the mean; the
    # median landed within 25% of min across repeated r9 runs.
    serve_per_q_ms = None
    serve_per_q_ms_min = None
    serve_iters: list[float] = []
    n_serve_q = 0
    try:
        entry_mod._reset_serving_caches()   # drop sweep-phase memos
        spark.catalog.clearCache()          # and any stray cached plans
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        sdf = entry_mod.hybrid_serve_batch(spark, SF_DIR)
        n_serve_q = sdf.select("qid").distinct().count()  # warm run
        if n_serve_q:
            sdf.count()                     # second warm: indexes persisted
            for _ in range(max(iters, 5)):
                t0 = time.perf_counter()
                sdf.count()
                serve_iters.append(round(time.perf_counter() - t0, 3))
            srt = sorted(serve_iters)
            median = srt[len(srt) // 2] if len(srt) % 2 else \
                (srt[len(srt) // 2 - 1] + srt[len(srt) // 2]) / 2.0
            serve_per_q_ms = round(median / n_serve_q * 1000, 3)
            serve_per_q_ms_min = round(min(serve_iters) / n_serve_q * 1000, 3)
        print(f"# hybrid_serve_batch: {n_serve_q} queries, "
              f"median {serve_per_q_ms} ms/q, min {serve_per_q_ms_min} ms/q "
              f"iters={serve_iters}", file=sys.stderr)
    except Exception as e:
        print(f"# hybrid_serve_batch: FAILED {type(e).__name__}: "
              f"{str(e)[:120]}", file=sys.stderr)

    try:
        load_avg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_avg = []

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    headline = {
        "metric": "headline_total_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # machine-readable contention record (VERDICT r11 next #1):
        # entries whose WARM iteration spread exceeded 3x, and the
        # one-bit verdict — a polluted sweep is self-describing
        "contended": contended,
        "suspects": windowed[:12],
        # r15 (VERDICT r14 next #2): the r14 per-pass gate ARRAYS cost the
        # stdout line ~11 per-query keys (queries_omitted 140 -> 151), so
        # the compact line now carries SCALAR summaries only — the full
        # arrays stay in bench_full.json. canary_ms_min = host per-core
        # speed floor (cross-round comparable); canary_spread + steal_max
        # are the values the contention gates actually judge.
        "canary_ms_min": min(canary_ms) if canary_ms else None,
        "canary_spread": round(canary_spread, 3),
        "steal_max": max(steals) if steals else None,
    }
    if serve_per_q_ms is not None:
        headline["hybrid_serve_per_query_ms"] = serve_per_q_ms
        headline["hybrid_serve_per_query_ms_min"] = serve_per_q_ms_min
    full = {**headline, "suspects": windowed, "iters": all_iters,
            "builds": build_timings, "serve_iters": serve_iters,
            "load_avg": load_avg, "pass_load_avg": pass_load_avg,
            # full per-pass gate arrays (scalar-summarized on stdout)
            "canary_ms": canary_ms, "canary_stall": canary_stall,
            "pass_steal_frac": pass_steal_frac,
            "hybrid_serve_n_queries": n_serve_q}
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_full.json")
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1)
    print(f"# full payload (iters/builds/load_avg): {full_path}", file=sys.stderr)
    print(json.dumps(full), file=sys.stderr)
    # stdout: the compact headline line ONLY. The driver tail-captures the
    # last ~2000 chars of stdout and json-parses the final line; rounds 6-7
    # recorded parsed=null because the line outgrew that window as the query
    # surface passed ~90 entries. Keep the line under the window: compact
    # separators, 2-decimal times, and if still too long drop the FASTEST
    # queries from the stdout copy (bench_full.json always has every entry
    # at full precision — "queries_omitted" says how many were trimmed).
    # r15: 1940 (was 1900) — the driver window is 2000 chars and the line
    # ends the stream, so line+newline <= 2000 is the hard bound; 60 chars
    # of slack plus the scalar gate fields buys back the ~11 per-query
    # keys the r14 arrays cost (VERDICT r14 next #2: >= 80 keys).
    line_budget = 1940
    headline["queries"] = {k: round(v, 2) for k, v in timings.items()}
    line = json.dumps(headline, separators=(",", ":"))
    if len(line) > line_budget:
        by_time = sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
        kept = dict(by_time)
        while len(line) > line_budget and kept:
            name, _ = by_time.pop()  # drop current fastest
            kept.pop(name, None)
            headline["queries"] = {
                k: round(v, 2) for k, v in timings.items() if k in kept}
            headline["queries_omitted"] = len(timings) - len(kept)
            line = json.dumps(headline, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
