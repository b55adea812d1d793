"""CSV table ingest with the engine's malformed-input discipline.

Third source format (after the reference's record-delimited meta dump and
JSONL): header CSV with an EXPLICIT schema — schema inference is two full
passes over 100 TB (one to infer, one to read) and type-flaps on dirty
data, so it is never paid here — in PERMISSIVE mode with a
``_corrupt_record`` sink, mirroring ``sources/jsonl.py``: a malformed line
(broken quoting, un-castable value) lands in the corrupt column instead of
aborting the scan, a stateless validity gate drops it, and a rejects view
accounts for every dropped line by reason.

Scale shape: CSV is line-splittable uncompressed, one-task-per-file under
gzip (like the meta scan); parsing is JVM-side Univocity inside whole-stage
codegen — no Python in the parse path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema_ddl: str) -> StructType:
    from pyspark.sql.types import _parse_datatype_string

    base = _parse_datatype_string(schema_ddl)
    return StructType(list(base.fields)
                      + [StructField(_CORRUPT_COL, StringType(), True)])


def read_csv_table(spark: SparkSession, path: str, schema_ddl: str,
                   required: list[str]) -> DataFrame:
    """Parsed + validated rows from a header CSV path (plain or .gz).

    ``schema_ddl``: the table schema as a DDL string (explicit — never
    inferred). ``required``: columns that must be non-null for a row to
    pass the validity gate (the format's B1 analogue; a type-cast
    failure nulls the column AND records the raw line in
    ``_corrupt_record``, so both detection paths funnel into one gate).
    """
    raw = (spark.read.schema(_with_corrupt(schema_ddl))
           .option("header", "true")
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", _CORRUPT_COL)
           .csv(path))
    cond = F.col(_CORRUPT_COL).isNull()
    for c in required:
        cond = cond & F.col(c).isNotNull()
    return raw.filter(cond).drop(_CORRUPT_COL)


def read_csv_rejects(spark: SparkSession, path: str, schema_ddl: str,
                     required: list[str]) -> DataFrame:
    """(reason, raw) for every line the validity gate drops —
    'malformed' (parse/cast failure captured in the corrupt column) or
    'missing_required'. The audit sink that keeps ingest loss measured,
    never silent (same contract as ``jsonl.read_jsonl_rejects``)."""
    raw = (spark.read.schema(_with_corrupt(schema_ddl))
           .option("header", "true")
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", _CORRUPT_COL)
           .csv(path))
    miss = F.lit(False)  # required=[] degrades to a corrupt-only rejects view
    for c in required:
        miss = miss | F.col(c).isNull()
    bad = raw.filter(F.col(_CORRUPT_COL).isNotNull() | miss)
    cols = [f.name for f in bad.schema.fields if f.name != _CORRUPT_COL]
    return bad.select(
        F.when(F.col(_CORRUPT_COL).isNotNull(), F.lit("malformed"))
        .otherwise(F.lit("missing_required")).alias("reason"),
        F.coalesce(F.col(_CORRUPT_COL),
                   F.concat_ws(",", *cols)).alias("raw"))
