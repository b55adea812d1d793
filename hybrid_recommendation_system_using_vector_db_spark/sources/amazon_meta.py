"""SNAP amazon-meta ingest: gzip text scan (A1) + multi-line record parse (A2).

The reference parses the format with a stateful line-by-line generator
(``Hybrid_Recom_vecdb.py:33-101``): records are ``Id:``-delimited blocks
containing ``ASIN:``, ``title:``, ``group:``, ``similar: n a1 a2 …`` and
``categories: N`` followed by N indented ``|``-path lines; records missing
asin or title are dropped (``:46``).

Spark-first design (SURVEY §2.1 A2, option (a)): a Hadoop text input with a
custom record delimiter turns each record into ONE string row in parallel
(gzip is unsplittable → one task per file, so ``repartition`` after the
scan), and all field extraction is declarative ``regexp_extract`` — pure
SQL, whole-stage codegen, no Python in the parse path. At 100 TB the input
would be many gzip shards → one task each, scan scales linearly.

Encoding note: the SNAP dump is latin-1; Hadoop Text decodes UTF-8 with
replacement characters for the few non-ASCII bytes, matching the
reference's ``errors="ignore"`` tolerance (``:31``) in spirit — malformed
bytes never abort the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_DELIMITER = "\nId:"


def read_record_blocks(spark: SparkSession, path: str) -> DataFrame:
    """One row per ``Id:``-delimited record block (A1 + record split)."""
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf={"textinputformat.record.delimiter": RECORD_DELIMITER},
    )
    blocks = rdd.map(lambda kv: (kv[1],))
    return spark.createDataFrame(blocks, "block string")


def parse_blocks(blocks: DataFrame) -> DataFrame:
    """Record block → product row, entirely with SQL regexp extraction.

    Field semantics mirror the reference parser:
    - asin/title/group: first matching header line, trimmed
    - similar: tokens after the count on the ``similar:`` line (the count
      itself is dropped, ref ``:93-98``)
    - categories: exactly N ``|``-prefixed lines where N is the declared
      ``categories:`` count (non-numeric count → 0, ref ``:84`` isdigit
      guard)
    - validity filter B1: empty asin or title → dropped (ref ``:46``)
    """
    b = F.col("block")
    # [ \t]* (not \s*) — Java \s matches newlines, which would let an empty
    # field value swallow the following line
    similar_rest = F.regexp_extract(b, r"(?m)^[ \t]*similar:[ \t]*\d+[ \t]*(.*)$", 1)
    # try_cast: regexp_extract yields "" on no match, which ANSI cast rejects
    cat_count = F.coalesce(
        F.regexp_extract(b, r"(?m)^[ \t]*categories:[ \t]*(\d+)[ \t]*$", 1).try_cast("int"),
        F.lit(0),
    )
    all_cats = F.regexp_extract_all(b, F.lit(r"(?m)^[ \t]*(\|.*?)[ \t]*$"), 1)
    return (
        blocks.select(
            F.trim(F.regexp_extract(b, r"(?m)^ASIN:[ \t]*(\S+)", 1)).alias("asin"),
            F.trim(F.regexp_extract(b, r"(?m)^[ \t]*title:[ \t]*(.*)$", 1)).alias("title"),
            F.trim(F.regexp_extract(b, r"(?m)^[ \t]*group:[ \t]*(.*)$", 1)).alias("group"),
            F.slice(all_cats, 1, cat_count).alias("categories"),
            F.filter(F.split(F.trim(similar_rest), r"\s+"), lambda t: t != "").alias("similar"),
        )
        .filter((F.length("asin") > 0) & (F.length("title") > 0))  # B1
    )


def read_amazon_meta(spark: SparkSession, path: str,
                     num_partitions: int | None = None) -> DataFrame:
    """Full ingest: path (plain or .gz) → products DataFrame.

    ``num_partitions``: gzip input arrives as one partition per file;
    repartition before the (CPU-heavy) regex extraction when reading a
    single large archive.
    """
    blocks = read_record_blocks(spark, path)
    if num_partitions:
        blocks = blocks.repartition(num_partitions)
    return parse_blocks(blocks)
