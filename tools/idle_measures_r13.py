"""Idle re-measures for VERDICT r12 #2/#3 at sf0.1: pq_codes (idle
2.13 s vs 1.37 s r9 baseline — load or plan?) and
streaming_incremental_kpis (twice dispositioned as construct noise —
pin a construct-vs-exec envelope).  For each query: 5 FRESH
construct+collect timings (what timing_sweep measures: includes driver
plan compile and any eager construct-time jobs) and 5 EXEC-ONLY
timings (construct once, collect repeatedly, time the later collects —
the data-path cost).  Loadavg recorded; run on an idle machine only."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as E
from youtube_podcast_data_pipeline_azure_spark import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="idle-measures-r13")
out = {}
for name in ("pq_codes", "streaming_incremental_kpis"):
    fn = E.queries()[name]
    load0 = [round(x, 2) for x in os.getloadavg()]
    fn(spark, sf_dir).collect()  # warm codegen/workers
    fresh = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        fresh.append(round(time.perf_counter() - t0, 3))
    df = fn(spark, sf_dir)
    df.collect()  # first collect pays nothing extra to measure
    execs = []
    for _ in range(5):
        t0 = time.perf_counter()
        df.collect()
        execs.append(round(time.perf_counter() - t0, 3))
    out[name] = {
        "fresh": fresh,
        "fresh_median": sorted(fresh)[2],
        "exec_only": execs,
        "exec_median": sorted(execs)[2],
        "loadavg_start": load0,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
print(json.dumps({"sf_dir": sf_dir, "measures": out}))
spark.stop()
