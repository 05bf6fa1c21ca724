"""Local mirror of the driver's DuckDB-oracle comparison.

Runs each ``__spark_entry__.queries()`` entry and its ``oracle_sql()``
twin on the same sf dir, then compares row count, column names, and an
order-insensitive value comparison (sorted rows after sorting columns
by name).  Used by tests/test_oracle_parity.py and runnable directly:

    python tests/oracle_mirror.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize_cell(v):
    import datetime

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and float32/64 representation noise
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_normalize_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _normalize_cell(x)) for k, x in v.items()))
    return v


def _normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_query(spark, duck, name: str, fn, sql: str | None, sf_dir: str):
    """Returns (ok: bool, detail: str)."""
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    if sql is None:
        return (True, f"rows-only: {len(spark_rows)} rows, schema {spark_cols}")

    res = duck.sql(sql)
    duck_cols = list(res.columns)
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        return (False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        return (False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    a = _normalize_rows(spark_cols, spark_rows)
    b = _normalize_rows(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return (False, f"values differ; first diffs: {diffs}")
    return (True, f"MATCH {len(spark_rows)} rows")


def make_duck(sf_dir: str):
    import duckdb

    duck = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return duck


def main() -> int:
    import __spark_entry__ as entrymod
    from youtube_podcast_data_pipeline_azure_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-mirror")
    duck = make_duck(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    attempted = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        attempted += 1
        try:
            ok, detail = compare_query(spark, duck, name, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION: {type(e).__name__}: {e}"
        status = "ok " if ok else "FAIL"
        print(f"[{status}] {name}: {detail}")
        failures += 0 if ok else 1
    print(f"\n{attempted - failures}/{attempted} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
