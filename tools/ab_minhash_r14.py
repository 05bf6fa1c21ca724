#!/usr/bin/env python
"""A/B minhash_lsh_pairs materialization at sf0.1 (fresh medians)."""
from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "5"))

def build(spark, docs_ck, band_ck):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.operators.dedup import (
        minhash_band_keys, shingles)
    from youtube_podcast_data_pipeline_azure_spark.operators.util import spread
    df = load_table(spark, SF_DIR, "documents")
    id_col, text_col = "doc_id", "text"
    docs = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col), shingles(F.col(text_col), 3).alias("sh"))
    if docs_ck:
        docs = docs.localCheckpoint(eager=True)
    banded = minhash_band_keys(docs, id_col, 96, 24)
    if band_ck:
        banded = banded.localCheckpoint(eager=True)
    cand = (banded.alias("a").join(banded.alias("b"), on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.doc_id") < F.col("b.doc_id")])
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    a_sh = docs.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b_sh = docs.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    jac = (F.size(F.array_intersect("sh_a", "sh_b")) /
           F.size(F.array_union("sh_a", "sh_b"))).alias("jaccard")
    return (cand.join(a_sh, "id_a").join(b_sh, "id_b")
            .select("id_a", "id_b", jac).where(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard")))

def main():
    from youtube_podcast_data_pipeline_azure_spark import get_spark
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    spark = get_spark(app_name="ab_minhash_r14")
    load_table(spark, SF_DIR, "documents").count()
    variants = {"orig": (False, False), "band_ck": (False, True),
                "docs_ck": (True, False), "both_ck": (True, True)}
    ref = None
    for name, (d, b) in variants.items():
        rows = sorted(tuple(r) for r in build(spark, d, b).collect())
        if ref is None: ref = rows
        assert rows == ref, f"{name} diverges!"
    print(f"all variants equal: {len(ref)} pairs")
    for name, (d, b) in variants.items():
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            build(spark, d, b).collect()
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts)
        print(f"{name:8s} median={ts[len(ts)//2]:.3f}s  all={[round(t,2) for t in ts]}")
    spark.stop()

if __name__ == "__main__":
    main()
