#!/usr/bin/env python
"""Targeted upscale A/B for the operators changed in optimization r14
(the r8 lesson: measure every plan-shape change at the upscaled corpus
before shipping).  Reuses bench_scale.py's builders; times only the
changed queries; prints one JSON line with base/scaled/ratio per query.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHANGED = {
    "docs_10x": (
        [
            "exact_substring_spans",
            "bm25_search",
            "bm25_search_pruned",
            "hybrid_retrieval_rrf",
            "image_near_dup",
            "audio_near_dup",
            "dsir_importance_weights",
            "dsir_resample",
            "quality_signals",
            "minhash_near_dup",
            "near_dup_pipeline",
            "paragraph_dedup",
            "cms_heavy_hitters",
            "tfidf_cosine_pairs",
            "medallion_kpis",
        ],
        10,
    ),
}


def main() -> None:
    import __spark_entry__ as entrymod
    from bench_scale import (
        build_docs_upscale,
        build_emb_upscale,
        build_tpch_upscale,
        time_queries,
    )
    from youtube_podcast_data_pipeline_azure_spark import get_spark

    builders = {
        "tpch_5x": build_tpch_upscale,
        "docs_10x": build_docs_upscale,
        "emb_10x": build_emb_upscale,
    }
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_spark(app_name="scale-check-r14opt")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    work = tempfile.mkdtemp(prefix="scale_check_")
    out: dict[str, dict] = {}
    try:
        for tag, (names, factor) in CHANGED.items():
            dst = os.path.join(work, tag)
            os.makedirs(dst, exist_ok=True)
            builders[tag](spark, sf_dir, dst)
            base = time_queries(spark, qs, names, sf_dir, runs)
            scaled = time_queries(spark, qs, names, dst, runs)
            for n in names:
                out[f"{tag}:{n}"] = {
                    "growth_factor": factor,
                    "base_sec": base[n],
                    "scaled_sec": scaled[n],
                    "ratio": round(scaled[n] / max(base[n], 1e-9), 2),
                }
            shutil.rmtree(dst, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    flagged = [
        k
        for k, v in out.items()
        if v["ratio"] > 3 * v["growth_factor"] / v["growth_factor"]
        and v["ratio"] > v["growth_factor"]
    ]
    print(
        json.dumps(
            {
                "experiments": out,
                "flagged_over_growth": [
                    k for k, v in out.items() if v["ratio"] > v["growth_factor"]
                ],
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
