"""EP1 end-to-end pipeline test: ingest → sample → edges → index (A3/A4),
then an EP2 hybrid query through the CLI path over the written tables."""

import gzip

import pytest
from pyspark.sql import functions as F

from hybrid_recommendation_system_using_vector_db_spark.pipeline import build_index, load_index

META = """Id:   0
ASIN: A1
  title: Calculus Made Easy
  group: Book
  similar: 2 A2 A3
  categories: 1
   |Books[1]|Math[2]
Id:   1
ASIN: A2
  title: Advanced Calculus
  group: Book
  similar: 1 A1
  categories: 1
   |Books[1]|Math[2]
Id:   2
ASIN: A3
  title: Linear Algebra Done Right
  group: Book
  similar: 2 A1 A9
  categories: 1
   |Books[1]|Math[2]
Id:   3
ASIN: A4
  title: Cooking for Two
  group: Book
  similar: 0
  categories: 1
   |Books[1]|Cooking[3]
"""


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    meta = tmp_path_factory.mktemp("meta") / "amazon-meta.txt.gz"
    with gzip.open(meta, "wt") as f:
        f.write(META)
    out = tmp_path_factory.mktemp("idx")
    counts = build_index(spark, str(meta), str(out), sample_size=100)
    assert counts == {"products": 4, "edges": 4, "index": 4}
    return str(out)


def test_index_tables_shape(spark, index_dir):
    t = load_index(spark, index_dir)
    assert set(t["index"].columns) == {"asin", "doc", "title", "group", "embedding", "bucket"}
    # A9 not in sample → edge dropped by the B5 semi-join
    pairs = {(r.src, r.dst) for r in t["edges"].collect()}
    assert pairs == {("A1", "A2"), ("A1", "A3"), ("A2", "A1"), ("A3", "A1")}
    # index partitioned by LSH bucket on disk
    import os
    assert any(d.startswith("bucket=") for d in os.listdir(f"{index_dir}/index"))


def test_cli_recommend_query(spark, index_dir):
    """EP2 through the CLI's plan builder: substring query → hybrid top-k."""
    from hybrid_recommendation_system_using_vector_db_spark.cli import _recommend

    out = _recommend(spark, index_dir, "calculus", 5).collect()
    assert out, "substring query must resolve and return recommendations"
    # query resolves to shortest matching title: 'Advanced Calculus' (A2);
    # its top recommendation must include co-purchased A1
    assert any(r.cand == "A1" for r in out)
    for r in out:
        assert 0.0 <= r.hybrid_score <= 1.0


def test_overwrite_semantics(spark, index_dir, tmp_path_factory):
    """A4 destroy-and-recreate: rebuilding into the same dir replaces tables."""
    t1 = load_index(spark, index_dir)["products"].count()
    meta = tmp_path_factory.mktemp("meta2") / "m.txt"
    meta.write_text(META)
    counts = build_index(spark, str(meta), index_dir, sample_size=2)
    assert counts["products"] == 2
    assert load_index(spark, index_dir)["products"].count() == 2 < t1 + 1
