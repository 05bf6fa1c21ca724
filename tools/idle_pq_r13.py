"""Second idle re-measure of pq_codes at sf0.1 (VERDICT r12 #2), at
verified-idle load: 5 fresh construct+collect + 5 exec-only."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as E
from youtube_podcast_data_pipeline_azure_spark import get_spark

spark = get_spark(app_name="idle-pq-r13")
fn = E.queries()["pq_codes"]
load0 = [round(x, 2) for x in os.getloadavg()]
fn(spark, "/root/testdata/sf0.1").collect()
fresh = []
for _ in range(5):
    t0 = time.perf_counter()
    fn(spark, "/root/testdata/sf0.1").collect()
    fresh.append(round(time.perf_counter() - t0, 3))
df = fn(spark, "/root/testdata/sf0.1")
df.collect()
execs = []
for _ in range(5):
    t0 = time.perf_counter()
    df.collect()
    execs.append(round(time.perf_counter() - t0, 3))
print(json.dumps({
    "query": "pq_codes", "fresh": fresh, "fresh_median": sorted(fresh)[2],
    "exec_only": execs, "exec_median": sorted(execs)[2],
    "loadavg_start": load0,
    "loadavg_end": [round(x, 2) for x in os.getloadavg()],
}))
spark.stop()
