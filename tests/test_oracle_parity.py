"""t2-style correctness: every queries() entry with an oracle must match
DuckDB on row count, schema, and values (order-insensitive)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

from .oracle_util import compare, duckdb_con  # noqa: E402

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(name, spark, sf_dir, con):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, con, ORACLES[name], name)
    assert not problems, "\n".join(problems)


def test_all_queries_run(spark, sf_dir):
    """Every queries() entry (incl. rows-only ones) executes and has a schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    assert out.count() >= 0
