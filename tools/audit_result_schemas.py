"""Audit every registered query's RESULT schema for driver-harness
canonicalizer hazards.

The external driver canonicalizes Spark/DuckDB results with pandas
``sort_values`` over all columns before hashing; a top-level
``array<...>`` or ``map<...>`` column crashes it (``unhashable type:
'list'`` — the r9 ``pq_codes`` miss).  This audit builds every
``__spark_entry__.queries()`` plan at sf0.001 and reports any result
whose top-level schema contains an ArrayType/MapType column, so a
risky shape is caught BEFORE it burns a driver window slot.

Plans are built, not executed (schema analysis only), so the sweep is
cheap; queries that must run jobs at construction time (checkpointed
trainers, index writers) still execute those, which keeps the sweep
honest about what the driver would see.

Usage:  python tools/audit_result_schemas.py [sf_dir]
Exit 1 if any registered query has a hazardous top-level column.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entry
    from tools.plan_invariants import (
        result_schema_hazards,
        unbounded_global_windows,
    )
    from youtube_podcast_data_pipeline_azure_spark import get_spark

    spark = get_spark(app_name="audit-result-schemas")
    qs = entry.queries()
    hazards: list[tuple[str, str]] = []
    errors: list[tuple[str, str]] = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            bad = result_schema_hazards(df)
            if bad:
                hazards.append(
                    (name, "array/map top-level: " + ", ".join(bad))
                )
            for v in unbounded_global_windows(df):
                hazards.append((name, v))
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            errors.append((name, f"{type(e).__name__}: {e}"))
    print(f"swept {len(qs)} queries at {sf_dir}")
    for name, what in hazards:
        print(f"[HAZARD] {name}: {what}")
    for name, err in errors:
        print(f"[ERROR ] {name}: {err}")
    if not hazards and not errors:
        print(
            "clean: no array/map result columns, no unbounded "
            "unpartitioned windows"
        )
    return 1 if (hazards or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
