#!/usr/bin/env python
"""A/B the ngram_jaccard_pairs materialization choices at sf0.1.

Variants (all output-identical; equality asserted):
  orig     — no checkpoint (shingles recomputed per consumer, spread
             exchange reused) — the r13 shape
  docs_ck  — eager checkpoint of (id, sh)         — the r14 batch-1 shape
  pref_ck  — checkpoint of the prefix TABLE only (narrow digests)
  both_ck  — both

Timing = fresh construct+collect, median of N (the bench cost model).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "5"))


def build(spark, docs_ck: bool, pref_ck: bool):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.operators.dedup import (
        _prefix_key_col,
        _prefix_keys,
        shingles,
    )
    from youtube_podcast_data_pipeline_azure_spark.operators.util import spread

    df = load_table(spark, SF_DIR, "documents")
    id_col, text_col, shingle_n, threshold = "doc_id", "text", 3, 0.5
    docs = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    if docs_ck:
        docs = docs.localCheckpoint(eager=True)
    sz = F.size("sh")
    bp = max(int(threshold * 10000) - 1, 0)
    alpha = F.floor((F.lit(bp) * sz + F.lit(9999)) / F.lit(10000.0))
    prefix_len = (sz - alpha + 1).cast("int")
    keys = F.array_sort(F.transform("sh", _prefix_key_col))
    pref = _prefix_keys(docs, id_col, keys, prefix_len, "df", "_pid")
    if pref_ck:
        pref = pref.localCheckpoint(eager=True)
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            on=[
                F.col("a.pkey") == F.col("b.pkey"),
                F.col("a._pid") < F.col("b._pid"),
                F.col("a._sz") * 10000 >= F.lit(bp) * F.col("b._sz"),
                F.col("b._sz") * 10000 >= F.lit(bp) * F.col("a._sz"),
            ],
        )
        .select(
            F.col("a._pid").alias("id_a"),
            F.col("b._pid").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    a_sh = docs.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b_sh = docs.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = F.round(
        inter / (F.size("sh_a") + F.size("sh_b") - inter).cast("double"), 4
    ).alias("jaccard")
    return (
        cand.join(a_sh, "id_a")
        .join(b_sh, "id_b")
        .select("id_a", "id_b", jac)
        .where(F.col("jaccard") >= threshold)
    )


def main():
    from youtube_podcast_data_pipeline_azure_spark import get_spark
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table

    spark = get_spark(app_name="ab_ngram_r14")
    load_table(spark, SF_DIR, "documents").count()
    variants = {
        "orig": (False, False),
        "docs_ck": (True, False),
        "pref_ck": (False, True),
        "both_ck": (True, True),
    }
    ref = None
    # warm every variant once, and check equality
    for name, (d, p) in variants.items():
        rows = sorted(tuple(r) for r in build(spark, d, p).collect())
        if ref is None:
            ref = rows
        assert rows == ref, f"{name} diverges!"
    print(f"all variants equal: {len(ref)} pairs")
    for name, (d, p) in variants.items():
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            build(spark, d, p).collect()
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts)
        print(f"{name:8s} median={ts[len(ts)//2]:.3f}s  all={[round(t,2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
