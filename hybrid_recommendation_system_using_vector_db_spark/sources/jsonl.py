"""JSONL document ingest: the standard LLM-corpus interchange format.

The reference ingests one bespoke text format (``Hybrid_Recom_vecdb.py:33-101``
→ ``amazon_meta.py``); a training-data pipeline's day-to-day input is
newline-delimited JSON (one document object per line, usually gzip shards).
Spark-first shape: ``spark.read.json`` with an EXPLICIT schema (schema
inference is a full extra pass over 100 TB — never pay it) in PERMISSIVE
mode, so a malformed line lands in the ``_corrupt_record`` column instead of
aborting the scan — the same malformed-input tolerance the reference's
``errors="ignore"`` gives its parser (``:31``).

Scale shape: JSONL is line-splittable (uncompressed/zstd/bzip2) so a shard
fans out across tasks; gzip shards read one task each, like the meta scan.
Parsing is JVM-side Jackson inside whole-stage codegen — no Python in the
parse path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: the corpus interchange schema: ids + text payload + routing metadata.
DOCUMENT_FIELDS: list[tuple[str, str]] = [
    ("doc_id", "bigint"),
    ("lang", "string"),
    ("source", "string"),
    ("text", "string"),
]

_CORRUPT_COL = "_corrupt_record"


def document_schema() -> StructType:
    """Explicit read schema incl. the PERMISSIVE corrupt-record sink."""
    from pyspark.sql.types import _parse_datatype_string

    fields = [StructField(n, _parse_datatype_string(t), True)
              for n, t in DOCUMENT_FIELDS]
    fields.append(StructField(_CORRUPT_COL, StringType(), True))
    return StructType(fields)


def _validity_gate(raw: DataFrame) -> DataFrame:
    """The format's B1-style gate: parsed (``_corrupt_record`` null) AND
    the two non-optional fields present. Stateless/map-only, so the
    batch and streaming readers share it verbatim and are
    batch-equivalent by construction."""
    return (raw.filter(F.col(_CORRUPT_COL).isNull()
                       & F.col("doc_id").isNotNull()
                       & F.col("text").isNotNull())
            .drop(_CORRUPT_COL))


def read_jsonl_documents(spark: SparkSession, path: str) -> DataFrame:
    """Parsed + validated document rows from a JSONL path (plain or .gz).

    A row is VALID when it parsed (``_corrupt_record`` null) and carries
    the two non-optional fields (doc_id, text) — the B1-style validity
    gate of this format. Corrupt/partial lines are dropped here; use
    :func:`read_jsonl_rejects` to audit them.

    PERMISSIVE-mode caveat baked in: Spark only populates
    ``_corrupt_record`` when the parsed columns are ALSO selected in the
    same scan, and a cached scan keyed on the corrupt column alone is an
    analysis error — so the gate filters first, then prunes the column.
    """
    raw = (spark.read.schema(document_schema())
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", _CORRUPT_COL)
           .json(path))
    return _validity_gate(raw)


def read_jsonl_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_jsonl_documents`: the same explicit
    schema + PERMISSIVE corrupt-record gate over a file-source stream —
    the shape a continuous corpus ingest runs (JSONL shards landing in a
    directory, each micro-batch gated statelessly). No state store, no
    watermark, no shuffle: every micro-batch filters independently, and
    the union of micro-batch outputs equals the batch read of the same
    files (the gate is a pure row predicate — the ``streaming_dedup_keys``
    batch-equivalence argument, degenerate case)."""
    raw = (spark.readStream.schema(document_schema())
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", _CORRUPT_COL)
           .json(path))
    return _validity_gate(raw)


def read_jsonl_rejects(spark: SparkSession, path: str) -> DataFrame:
    """The audit side: (reason, raw) for every line the validity gate
    drops — 'malformed' (JSON parse failure) or 'missing_required'
    (parsed but doc_id/text absent). At scale this writes to a rejects
    sink next to the corpus so ingest loss is measured, never silent."""
    raw = (spark.read.schema(document_schema())
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", _CORRUPT_COL)
           .json(path))
    bad = raw.filter(F.col(_CORRUPT_COL).isNotNull()
                     | F.col("doc_id").isNull() | F.col("text").isNull())
    return bad.select(
        F.when(F.col(_CORRUPT_COL).isNotNull(), F.lit("malformed"))
        .otherwise(F.lit("missing_required")).alias("reason"),
        F.coalesce(F.col(_CORRUPT_COL),
                   F.to_json(F.struct(*[n for n, _ in DOCUMENT_FIELDS])))
        .alias("raw"))
