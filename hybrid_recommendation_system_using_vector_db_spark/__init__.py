"""hybrid_recommendation_system_using_vector_db_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference hybrid recommender
(karthikraj2103/Hybrid-recommendation-system-using-Vector-DB,
``Hybrid_Recom_vecdb.py``), re-expressed as declarative DataFrame plans:

- ingest of the SNAP amazon-meta multi-line record format (``sources.amazon_meta``)
- co-purchase graph construction + CF candidate generation (``operators.copurchase``)
- brute-force / LSH / IVF cosine similarity search (``operators.similarity``)
- hybrid alpha-blend fusion + top-k (``operators.hybrid``)
- query resolution (exact id or title substring) (``operators.resolve``)
- seeded deterministic sampling (``operators.sampling``)
- Precision@K evaluation harness (``operators.evaluate``)

plus the LLM-data-pipeline extensions (exact/near dedup, text analysis,
multimodal column plumbing, streaming ingestion) designed for 100 TB scale:
every operator is a composition of built-in Spark SQL expressions (JVM-side,
whole-stage-codegen) unless Python is genuinely required, in which case it is
an Arrow-batched ``mapInPandas``.
"""

__version__ = "0.1.0"

ALPHA = 0.6          # hybrid blend weight (ref Hybrid_Recom_vecdb.py:25)
CONTENT_TOP_N = 60   # content candidate pool (ref :23)
CF_TOP_N = 60        # CF candidate pool (ref :24)
TOP_K = 10           # final recommendations (ref :26 DEFAULT_K)
EVAL_KS = [10, 20, 30, 40, 50]  # precision@k grid (ref :281)
QUERY_MOD = 50       # deterministic eval query set: id % QUERY_MOD == 0
SEED = 42            # ref :18 RANDOM_SEED
ROUND_SCORE = 6      # score rounding for cross-engine determinism (SURVEY §7.1)
