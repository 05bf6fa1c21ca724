"""Pre-verify registry queries under EXACT driver conditions.

The driver runs ``__spark_entry__.queries()`` on a plain
``local[32]`` SparkSession (no engine confs, Spark-default ANSI) and
compares against ``oracle_sql()`` in DuckDB — a builder-side green on
the engine session (``tests/oracle_mirror.py``) is necessary but not
sufficient, because engine confs (ANSI off, timezone, codegen dials)
can mask divergence.  This script replicates the driver's session
exactly and reuses the mirror's comparator.

    python tools/preverify.py [sf_dir] [query ...]

With no query names: the FIRST 50 registry entries (the driver's
correctness window).  Exit 1 on any mismatch.  Standard round close:
one run of this over the window at sf0.01 + the full-registry engine
mirror at sf0.001 (VERDICT r10 #8 — exactly two artifacts, no more).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from oracle_mirror import compare_query, make_duck

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = list(sys.argv[2:])
    run_all = only == ["--all"]  # capstone mode: the ENTIRE registry
    if run_all:
        only = []

    # plain session — EXACTLY what the driver builds, no engine confs
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("preverify")
        .getOrCreate()
    )
    duck = make_duck(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only if only else (list(qs) if run_all else list(qs)[:50])
    failures = 0
    for name in names:
        if name not in qs:
            print(f"[FAIL] {name}: not registered")
            failures += 1
            continue
        try:
            ok, detail = compare_query(
                spark, duck, name, qs[name], oracles.get(name), sf_dir
            )
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION: {type(e).__name__}: {e}"
        print(f"[{'ok ' if ok else 'FAIL'}] {name}: {detail}", flush=True)
        failures += 0 if ok else 1
    print(f"\n{len(names) - failures}/{len(names)} passed on plain ANSI "
          f"local[32] at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
