#!/usr/bin/env python
"""Isolated per-query timing (optimization r13, guide §1): ONE fresh
engine session, warm the fixture tables and the query once (bench.py
parity), then time N fresh construct+collect iterations with the
construct/collect split printed per iteration.

    python tools/isolate_query.py <query> [n_iters]

Prints one JSON line: {"query":..., "iters":[{"construct":c,"collect":k}...],
"exec_only": min of 2 extra collects on the last frame}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entrymod
    from youtube_podcast_data_pipeline_azure_spark import get_spark
    from youtube_podcast_data_pipeline_azure_spark.io.readers import TABLES, load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"isolate-{name}")
    qs = entrymod.queries()
    fn = qs[name]

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    fn(spark, sf_dir).collect()  # warm: codegen, workers, shuffle svc

    iters = []
    df = None
    for _ in range(n):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        iters.append(
            {"construct": round(t1 - t0, 3), "collect": round(t2 - t1, 3)}
        )
    execs = []
    for _ in range(2):
        ta = time.perf_counter()
        df.collect()
        execs.append(time.perf_counter() - ta)
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "iters": iters,
                "exec_only": round(min(execs), 3),
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
