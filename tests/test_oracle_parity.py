"""Local mirror of the driver's correctness gate: every queries() entry
with an oracle must hash-match DuckDB on the sf0.001 fixtures."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_mirror import compare_query, make_duck

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = make_duck(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    ok, detail = compare_query(
        spark, duck, name, QUERIES[name], ORACLES.get(name), sf_dir
    )
    assert ok, f"{name}: {detail}"
