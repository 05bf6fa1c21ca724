#!/usr/bin/env python
"""100x stress for the RETRIEVAL stack (VERDICT r10 #5): bm25_search,
hybrid_retrieval_rrf, and the persisted-BM25 path with the index BUILD
measured separately from the PROBE — the operational split that
matters at 100 TB (build once at ingest, probe per query workload).

Reuses bench_scale's disjoint-vocabulary builders at factor=100
(documents 5k -> 500k, embeddings 2k -> 200k at sf0.1).  The query
workload is FIXED at the base corpus's ~50 every-101st docs on both
scales, so the measured growth isolates corpus growth (the registered
queries grow their workload with the corpus, which would conflate the
two).  Linear scaling under fixed parallelism would read ~100; every
healthy ratio is far below that (fixed overheads amortize).

Run with SPARK_DRIVER_MEM=32g: local mode hosts broadcasts in the
driver JVM and the 8g default OOMs around 500k docs (cluster
executors hold broadcast replicas instead — not a cluster concern).

    SPARK_DRIVER_MEM=32g python tools/bench_scale_100x.py \
        > tools/bench_scale_100x_r11.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench_scale import (  # noqa: E402
    _median,
    build_docs_upscale,
    build_emb_upscale,
)

FACTOR = 100


def main() -> None:
    from youtube_podcast_data_pipeline_azure_spark import get_spark
    from youtube_podcast_data_pipeline_azure_spark.operators import similarity
    from youtube_podcast_data_pipeline_azure_spark.operators import text_mining as tm

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_spark(app_name="bench-scale-100x")
    spark.sparkContext.setLogLevel("ERROR")

    base_docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    base_emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    work = tempfile.mkdtemp(prefix="bench_100x_")
    experiments: dict[str, dict] = {}
    try:
        # SEPARATE dirs per builder: each builder _copy()s every OTHER
        # table from src into its dst, so sharing one dir would clobber
        # the first builder's upscaled table with the base copy
        dst_docs = os.path.join(work, "up_docs")
        dst_emb = os.path.join(work, "up_emb")
        os.makedirs(dst_docs, exist_ok=True)
        os.makedirs(dst_emb, exist_ok=True)
        build_docs_upscale(spark, sf_dir, dst_docs, factor=FACTOR)
        build_emb_upscale(spark, sf_dir, dst_emb, factor=FACTOR)

        def tables(docs_dir, emb_dir):
            docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
            emb = spark.read.parquet(f"{emb_dir}/embeddings.parquet")
            # FIXED workload: the base corpus's every-101st ids only
            # (replica ids are offset past base_n on the upscale)
            dq = docs.where(
                (F.col("doc_id") % 101 == 0) & (F.col("doc_id") < base_docs_n)
            ).select(F.col("doc_id").alias("query_id"), "text")
            eq = emb.where(
                (F.col("vec_id") % 101 == 0) & (F.col("vec_id") < base_emb_n)
            ).select(F.col("vec_id").alias("query_id"), "embedding")
            return docs, emb, dq, eq

        def timed(fn):
            """median of `runs` warm executions (one untimed warm-up)."""
            ts = []
            for i in range(runs + 1):
                t0 = time.perf_counter()
                fn()
                if i:
                    ts.append(time.perf_counter() - t0)
            return round(_median(ts), 3)

        def measure(tag, docs_dir, emb_dir):
            docs, emb, dq, eq = tables(docs_dir, emb_dir)

            out = {}
            out["bm25_search"] = timed(
                lambda: tm.bm25_topk(docs, dq, k=10).count()
            )

            def hybrid():
                lex = tm.bm25_topk(docs, dq, k=20)
                dense = similarity.knn_bruteforce(emb, eq, k=20)
                similarity.rrf_fuse(
                    [
                        lex.select("query_id", "doc_id", "rank"),
                        dense.select(
                            "query_id",
                            F.col("neighbor_id").alias("doc_id"),
                            "rank",
                        ),
                    ],
                    k=10,
                ).count()

            out["hybrid_retrieval_rrf"] = timed(hybrid)

            idx = os.path.join(work, f"bm25_index_{tag}")
            t0 = time.perf_counter()
            tm.bm25_index_write(docs, idx)
            out["bm25_index_build"] = round(time.perf_counter() - t0, 3)
            out["bm25_probe_only"] = timed(
                lambda: tm.bm25_topk_from_index(spark, idx, dq, k=10).count()
            )
            return out

        base = measure("base", sf_dir, sf_dir)
        scaled = measure("scaled", dst_docs, dst_emb)
        for name in base:
            experiments[f"retrieval_100x:{name}"] = {
                "growth": f"{FACTOR}x docs+embeddings, FIXED ~50-query workload",
                "growth_factor": FACTOR,
                "base_sec": base[name],
                "scaled_sec": scaled[name],
                "ratio": round(scaled[name] / max(base[name], 1e-9), 2),
            }
        # the operational claim: once the index is built, the probe
        # pays none of the corpus growth's tokenize/aggregate cost
        experiments["retrieval_100x:probe_vs_build"] = {
            "probe_ratio_lt_inplan_ratio": (
                experiments["retrieval_100x:bm25_probe_only"]["ratio"]
                < experiments["retrieval_100x:bm25_search"]["ratio"]
            ),
            "probe_scaled_lt_inplan_scaled": (
                scaled["bm25_probe_only"] < scaled["bm25_search"]
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "wall_ratio_at_100x_upscale_retrieval",
                "sf_dir": sf_dir,
                "runs": runs,
                "note": (
                    "Fixed ~50-query workload on both scales; linear "
                    "scaling under fixed parallelism would read ~100. "
                    "bm25_index_build is a single timed build (the "
                    "once-per-ingest cost); bm25_probe_only ranks the "
                    "same workload from the persisted index."
                ),
                "experiments": experiments,
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
