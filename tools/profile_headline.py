#!/usr/bin/env python
"""Per-query profile of the headline bench set (optimization r13, guide §1).

For every bench.py HEADLINE query at $SPARK_GRAFT_SF_DIR:

* t_construct — fn(spark, sf_dir): Python construction incl. any eager
  jobs (training collects, localCheckpoints) and Catalyst analysis done
  during construction,
* t_first — first .collect() (codegen + execution),
* t_exec — min of two further collects (steady-state execution only),
* plan stats — Exchange count, parquet-scan count, Python-eval nodes,
  join strategies — parsed from explain("formatted"),
* optionally writes the formatted plan to --plans-dir/<q>_<tag>.txt.

Usage:
    python tools/profile_headline.py [--plans-dir plans/r13 --tag before]
                                     [query ...]
Prints one JSON line (plus a human table on stderr).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "py_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)
        ),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "sorts": len(re.findall(r"\bSort \[", plan)),
        "windows": len(re.findall(r"\bWindow \[", plan)),
        "aggregates": len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)),
    }


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    tag = "before"
    if "--plans-dir" in args:
        i = args.index("--plans-dir")
        plans_dir = args[i + 1]
        del args[i : i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from youtube_podcast_data_pipeline_azure_spark import get_spark
    from youtube_podcast_data_pipeline_azure_spark.io.readers import TABLES, load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args or list(HEADLINE)
    spark = get_spark(app_name="profile-headline")
    qs = entrymod.queries()

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    # full warm pass, same as bench.py
    for name in names:
        qs[name](spark, sf_dir).collect()

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        execs = []
        for _ in range(2):
            ta = time.perf_counter()
            df.collect()
            execs.append(time.perf_counter() - ta)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        st = plan_stats(plan)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        rec = {
            "construct": round(t1 - t0, 3),
            "first": round(t2 - t1, 3),
            "exec": round(min(execs), 3),
            **st,
        }
        out[name] = rec
        print(
            f"{name:28s} cons={rec['construct']:6.2f} first={rec['first']:6.2f} "
            f"exec={rec['exec']:6.2f} exch={st['exchanges']:2d} scans={st['scans']:2d} "
            f"py={st['py_eval']} smj={st['smj']} bhj={st['bhj']}",
            file=sys.stderr,
        )
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": sf_dir, "tag": tag, "profile": out}))
    spark.stop()


if __name__ == "__main__":
    main()
