"""Driver-contract smoke: entry() runs, queries()/oracle_sql() agree."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty"}


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, f"oracle {name} has no query"


def test_registry_is_nonempty_and_callable():
    qs = entrymod.queries()
    assert len(qs) >= 40
    assert all(callable(fn) for fn in qs.values())
