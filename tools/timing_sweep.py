#!/usr/bin/env python
"""Full-registry warm timing sweep (standing r5 practice, VERDICT r4 #6).

The 20-query headline bench cannot see regressions in the other ~160
registered queries — the r4 expression-placement class (226 s / 310 s
pathologies) lived entirely outside it.  This sweep times EVERY
``queries()`` entry warm (one untimed construct+collect, then a timed
one) at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and
prints one JSON line: per-query warm seconds plus everything over the
2-second plan-read threshold.

Run it with nothing else on the machine.  Chunking (``--start/--count``)
keeps each invocation inside an external supervisor's timeout; merge
chunk outputs with ``--merge out1.json out2.json ...``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries that drain a real micro-batch stream per call — inherently
#: seconds-scale wall clock (trigger latency, not plan cost); the sweep
#: reports them but never flags them
STREAMING = {
    "tumbling_windows",
    "sliding_windows",
    "session_windows",
    "stream_dedup_counts",
    "stream_static_enrich",
    "purchase_view_attribution",
    "purchase_attribution_outer",
    "user_running_totals",
    "foreach_batch_sink",
    "streaming_incremental_kpis",
    "streaming_corpus_dedup",
    "streaming_near_dup",
    "incremental_agg",
    "incremental_dedup",
    # r13: drains 4 availableNow micro-batches + ~4 s of mtime-ordering
    # sleeps per call — wall clock is trigger/sleep latency, not plan
    "paragraph_dedup_stream",
}
#: quadratic BY CONTRACT (exact pair listers / registered rationale in
#: BASELINE.md) — reported, higher flag bar (10 s)
OUTPUT_BOUND = {"ngram_jaccard_pairs", "ngram_jaccard_pairs_blocked",
                "tfidf_cosine_pairs"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=10_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--merge", nargs="*", default=None)
    args = ap.parse_args()

    if args.merge:
        merged: dict[str, float] = {}
        for p in args.merge:
            merged.update(json.load(open(p))["warm_sec"])
        flagged = sorted(
            k for k, v in merged.items()
            if k not in STREAMING and v > (10.0 if k in OUTPUT_BOUND else 2.0)
        )
        print(json.dumps({
            "metric": "registry_warm_sweep",
            "n_queries": len(merged),
            "warm_sec": dict(sorted(merged.items(), key=lambda kv: -kv[1])),
            "flagged_over_threshold": flagged,
        }))
        return

    import __spark_entry__ as entrymod
    from youtube_podcast_data_pipeline_azure_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = list(qs)[args.start:args.start + args.count]
    warm: dict[str, float] = {}
    for name in names:
        try:
            qs[name](spark, sf_dir).collect()          # warm: codegen etc.
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()          # timed, fresh plan
            warm[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # pragma: no cover - sweep robustness
            warm[name] = -1.0
            print(f"ERROR {name}: {ex}", file=sys.stderr)
    payload = {"sf_dir": sf_dir, "start": args.start, "warm_sec": warm}
    out = json.dumps(payload)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
