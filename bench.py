#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock over the headline set (lower is
better).  Each query is executed to completion via a count/collect so
the whole plan runs; timings include Catalyst planning but exclude
session startup and warmup (a warmup pass primes the JVM/codegen).

r2→r3 finding (VERDICT r2 #2/#5): the r2 ``window_running`` "regression"
(1.53→3.95 s median) was NOT a query change — warm profiling shows the
query at ~1.0 s (0.5-0.8 s compute via noop write + ~0.4 s driver
collect of 150k rows).  The r2 bench warmed only one query, so run 1
(224.7 s total) paid codegen/worker-spawn for 19 of 20 queries and the
cold costs bled into the medians.  The full warm pass below fixed both:
r3 totals [23.3, 22.9, 20.7], spread 2.6 s, window_running 1.56 s.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "product_type_profit",
    "market_share",
    "waiting_suppliers",
    "kpi_event_type_counts",
    "per_group_limit",
    "window_running",
    "asof_join",
    "tumbling_windows",
    "session_windows",
    "text_stats",
    "exact_dedup",
    "token_set_dedup",
    "minhash_near_dup",
    "ngram_jaccard_pairs",
    "knn_bruteforce",
    "knn_ivf",
    "enrich_documents",
    # r8 additions (VERDICT r7 #2): one representative per r7 operator
    # family so the driver's BENCH file regression-tracks them
    # round-over-round, not just bench_scale.py.  Baseline values for
    # these four are their first r8 measurements (BASELINE.md).
    "exact_substring_spans",
    "dsir_importance_weights",
    "bm25_search",
    "hll_shard_union",
    # r9 additions: the PQ family (train+code, then LUT ADC search) —
    # first r9 measurements are their BASELINE.md rows
    "pq_codes",
    "pq_ann",
    # r10 additions: the fused one-scan signal vector and the IVF-PQ
    # recall audit (two searches + a bounded join)
    "quality_signals",
    "ivfpq_recall",
    # r10-session additions: one representative each for the two-stage
    # int8 ANN and the multimodal (kernel + Hamming-join) near-dup
    # families — first r10 measurements are their BASELINE.md rows
    "knn_sq8_rerank",
    "image_near_dup",
    # r13 additions (VERDICT r12 #4): one representative each for the
    # r11/r12 curation families — the Dolma-style paragraph dedup and
    # the per-source anti-domination cap — first r13 idle measurements
    # are their BASELINE.md rows
    "paragraph_dedup",
    "cap_per_source",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from youtube_podcast_data_pipeline_azure_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # Ambient machine load at run start (VERDICT r11 #3): r11's driver
    # bench drifted +13% with every trivial query inflated uniformly —
    # load-shaped, not plan-shaped.  Recording 1/5/15-min loadavg in
    # the artifact lets round-over-round deltas be dispositioned as
    # load vs plan without re-running.
    load_start = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark(app_name="youtube_podcast_data_pipeline_azure_spark-bench")

    qs = entrymod.queries()
    # Warmup: one full UNTIMED pass over the headline set.  The r02
    # partial warmup (one query + table counts) left the first timed
    # run paying codegen compilation, Python-worker spawn, and shuffle
    # service init for 19 of 20 queries — run totals spread 224 s vs
    # 27 s.  A complete pass prices all of that once, so the timed runs
    # measure steady-state query execution only.
    from youtube_podcast_data_pipeline_azure_spark.io.readers import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    for name in HEADLINE:
        qs[name](spark, sf_dir).collect()

    # Median-of-N per query: this machine's run-to-run noise is ±30%,
    # which would otherwise swamp real regressions round-over-round.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    per_run: list[dict[str, float]] = []
    for _ in range(runs):
        timings: dict[str, float] = {}
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            # collect() executes the complete plan including the final
            # stage's result exchange (count() could let Spark skip
            # projections).
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        per_run.append(timings)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    med = {
        name: round(median([r[name] for r in per_run]), 3)
        for name in HEADLINE
    }
    run_totals = [round(sum(r.values()), 3) for r in per_run]
    total = round(sum(med.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": med,
                "sf": sf,
                "runs": runs,
                "run_totals": run_totals,
                "spread_sec": round(max(run_totals) - min(run_totals), 3),
                "loadavg_start": load_start,
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
