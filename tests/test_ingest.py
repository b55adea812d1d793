"""A1/A2 amazon-meta ingest tests (FIXTURES.md §2)."""

import gzip

import pytest

from hybrid_recommendation_system_using_vector_db_spark.sources.amazon_meta import read_amazon_meta

FIXTURE = """Id:   0
ASIN: 0771044445
  discontinued product
Id:   1
ASIN: 0827229534
  title: Patterns of Preaching
  group: Book
  salesrank: 396585
  similar: 5 0804215715 156101074X 0687023955 0687074231 082721619X
  categories: 2
   |Books[283155]|Subjects[1000]|Religion[22]
   |Books[283155]|Subjects[1000]|Preaching[12368]
Id:   2
ASIN: 0738700797
  title: Candlemas: Feast of Flames
  group: Book
  similar: 0
  categories: 0
Id:   3
ASIN: 0486287785
  title: World War Z
  group: Book
  similar: 2 B00004W3V5 0486287785
  categories: x
   |Books[283155]|Fiction[17]
Id:   4
ASIN: B00004W3V5
  title: a
  group:
  similar: 1 0827229534
  categories: 1
   |Music[5174]|Styles[301668]"""


@pytest.fixture(scope="module")
def products(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("meta") / "amazon-meta.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write(FIXTURE)
    return read_amazon_meta(spark, str(path)).orderBy("asin").collect()


def test_validity_filter_drops_titleless(products):
    # record 0 has no title (discontinued) → dropped (ref :46)
    asins = [r.asin for r in products]
    assert "0771044445" not in asins
    assert len(products) == 4


def test_fields_parsed(products):
    by_asin = {r.asin: r for r in products}
    r = by_asin["0827229534"]
    assert r.title == "Patterns of Preaching"
    assert r.group == "Book"
    assert r.similar == ["0804215715", "156101074X", "0687023955", "0687074231", "082721619X"]
    assert len(r.categories) == 2
    assert r.categories[0].startswith("|Books[283155]|Subjects[1000]|Religion")


def test_zero_and_nonnumeric_category_counts(products):
    by_asin = {r.asin: r for r in products}
    assert by_asin["0738700797"].categories == []     # categories: 0
    assert by_asin["0738700797"].similar == []        # similar: 0
    assert by_asin["0486287785"].categories == []     # non-numeric count → 0 (ref :84)


def test_trailing_record_flush(products):
    # last record has no trailing newline → still parsed (ref :99-101 EOF flush)
    by_asin = {r.asin: r for r in products}
    assert by_asin["B00004W3V5"].similar == ["0827229534"]
    assert by_asin["B00004W3V5"].group == ""


def test_roundtrip_edges(spark, products):
    """Parsed catalog feeds the reference-shaped edge builder (C1 over similar)."""
    from hybrid_recommendation_system_using_vector_db_spark.operators.copurchase import (
        edges_from_similar,
    )
    df = spark.createDataFrame(products)
    edges = edges_from_similar(df).collect()
    # only in-sample dsts survive the semi-join; self-loops dropped
    pairs = {(e.src, e.dst) for e in edges}
    assert ("B00004W3V5", "0827229534") in pairs
    assert ("0486287785", "B00004W3V5") in pairs
    assert ("0486287785", "0486287785") not in pairs  # self-loop dropped
    assert all(dst in {r.asin for r in products} for _, dst in pairs)


def test_jsonl_ingest_gate_and_rejects(spark, tmp_path):
    """JSONL source (sources/jsonl.py): explicit-schema PERMISSIVE read —
    malformed lines land in _corrupt_record instead of aborting the scan,
    missing-required lines are gated, valid rows round-trip exactly, and
    the rejects view accounts for every dropped line by reason."""
    import gzip as _gzip
    import json

    from hybrid_recommendation_system_using_vector_db_spark.sources import jsonl

    lines = [
        json.dumps({"doc_id": 1, "lang": "en", "source": "web",
                    "text": 'quote " and \\ backslash\nnewline'}),
        '{"doc_id": 2, "lang": "en", "text": "trunc',         # malformed
        json.dumps({"lang": "de", "source": "web"}),          # no doc_id/text
        json.dumps({"doc_id": 4, "text": "minimal"}),         # optional nulls ok
        "not json at all",                                    # malformed
    ]
    path = str(tmp_path / "docs.jsonl.gz")
    with _gzip.open(path, "wt", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")

    got = {r.doc_id: r for r in jsonl.read_jsonl_documents(spark, path).collect()}
    assert set(got) == {1, 4}
    # exact payload round-trip incl. escaped quote/backslash/newline
    assert got[1].text == 'quote " and \\ backslash\nnewline'
    assert got[4].lang is None and got[4].source is None
    rej = jsonl.read_jsonl_rejects(spark, path).collect()
    reasons = sorted(r.reason for r in rej)
    assert reasons == ["malformed", "malformed", "missing_required"]
    # every line is either served or accounted for
    assert len(got) + len(rej) == len(lines)


def test_csv_ingest_gate_and_rejects(spark, tmp_path):
    """CSV source (sources/csv_table.py): explicit-schema PERMISSIVE
    read — broken quoting and un-castable values funnel into the gate
    (corrupt column or nulled required field), valid rows round-trip
    with exact types, and the rejects view accounts for every drop."""
    from hybrid_recommendation_system_using_vector_db_spark.sources import csv_table

    ddl = "id bigint, price double, day date, note string"
    lines = [
        "id,price,day,note",
        "1,12.5,2024-01-02,plain",
        '2,3.25,2024-01-03,"quoted, comma"',
        "notanint,9.0,2024-01-04,badkey",       # cast failure on required id
        '4,"1.0,2024-01-05,unterminated',       # broken quoting
        "5,,2024-01-06,missing price",          # required price absent
    ]
    path = str(tmp_path / "t.csv")
    open(path, "w").write("\n".join(lines) + "\n")
    got = {r.id: r for r in csv_table.read_csv_table(
        spark, path, ddl, required=["id", "price"]).collect()}
    assert set(got) == {1, 2}
    assert got[2].note == "quoted, comma" and got[2].price == 3.25
    assert str(got[1].day) == "2024-01-02"
    rej = csv_table.read_csv_rejects(spark, path, ddl,
                                     required=["id", "price"]).collect()
    assert len(got) + len(rej) == 5
    assert sorted(r.reason for r in rej).count("malformed") >= 1

def test_csv_rejects_with_no_required_columns(spark, tmp_path):
    """ADVICE r9: ``required=[]`` must degrade the rejects view to
    corrupt-only (previously ``None | col`` raised a TypeError), and the
    table + rejects still account for every line."""
    from hybrid_recommendation_system_using_vector_db_spark.sources import csv_table

    ddl = "id bigint, note string"
    lines = [
        "id,note",
        "1,ok",
        "notanint,hello",      # cast failure -> corrupt even unrequired
        ",no id but fine",     # null id is NOT a reject when required=[]
    ]
    path = str(tmp_path / "t.csv")
    open(path, "w").write("\n".join(lines) + "\n")
    tab = csv_table.read_csv_table(spark, path, ddl, required=[]).collect()
    rej = csv_table.read_csv_rejects(spark, path, ddl, required=[]).collect()
    assert len(tab) == 2 and len(rej) == 1
    assert rej[0].reason == "malformed"
    assert len(tab) + len(rej) == 3
