"""Isolated re-measure of the r13 timing-sweep >1.5x movers (standing
r10 rule: in-batch sweep ratios move with batch composition — re-run
each flagged query ALONE on a fresh session before believing it)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as E
from youtube_podcast_data_pipeline_azure_spark import get_spark

MOVERS = ["tfidf_cosine_pairs", "semantic_dedup", "component_size_report",
          "dedup_provenance", "streaming_quality_monitor"]
spark = get_spark(app_name="recheck-movers-r13")
qs = E.queries()
out = {}
for name in MOVERS:
    fn = qs[name]
    load0 = [round(x, 2) for x in os.getloadavg()]
    fn(spark, "/root/testdata/sf0.1").collect()  # warm
    fresh = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, "/root/testdata/sf0.1").collect()
        fresh.append(round(time.perf_counter() - t0, 3))
    df = fn(spark, "/root/testdata/sf0.1")
    df.collect()
    execs = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.collect()
        execs.append(round(time.perf_counter() - t0, 3))
    out[name] = {"fresh": fresh, "exec_only": execs, "loadavg_start": load0}
print(json.dumps(out))
spark.stop()
