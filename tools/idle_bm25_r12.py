"""Idle re-measure of bm25_search at sf0.1 (VERDICT r11 #3): r11's
driver bench put it at 3.22 s (+36% vs r10) with no plan change,
consistent with ambient load.  Warm, isolated, 5 timed runs, loadavg
recorded — disposition: back in the 2.4-2.9 s band, or a plan diff."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as E
from youtube_podcast_data_pipeline_azure_spark import get_spark

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="idle-bm25-r12")
fn = E.queries()["bm25_search"]
load0 = [round(x, 2) for x in os.getloadavg()]
fn(spark, sf_dir).collect()  # warm
times = []
for _ in range(5):
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    times.append(round(time.perf_counter() - t0, 3))
print(json.dumps({
    "query": "bm25_search", "sf_dir": sf_dir, "times": times,
    "median": sorted(times)[2],
    "loadavg_start": load0,
    "loadavg_end": [round(x, 2) for x in os.getloadavg()],
}))
spark.stop()
