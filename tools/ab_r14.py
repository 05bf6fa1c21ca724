#!/usr/bin/env python
"""r14 A/B experiments: candidate reformulations vs current shapes.

Each experiment builds both variants fresh, checks EXACT result
equality (sorted rows), and times fresh construct+collect (median of
N) for each — the bench's own cost model.  Run on an idle machine.

    python tools/ab_r14.py [sessions|paragraph|all]
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


def timeit(fn, runs=RUNS):
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().collect()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], sorted(ts)


def rows_equal(a, b):
    ka = sorted([tuple(r) for r in a.collect()])
    kb = sorted([tuple(r) for r in b.collect()])
    return ka == kb, len(ka), len(kb)


def exp_sessions(spark):
    """session_window native operator vs island (lag+cumsum) form."""
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import (
        sessionized_counts,
    )

    def current():
        return sessionized_counts(load_table(spark, SF_DIR, "events"))

    def island():
        ev = load_table(spark, SF_DIR, "events").select("user_id", "ts")
        w = Window.partitionBy("user_id").orderBy("ts")
        gap = F.expr("INTERVAL 30 MINUTES")
        new_sess = (
            F.col("ts") >= F.lag("ts").over(w) + gap
        ).cast("long")
        sess = ev.withColumn(
            "_sid", F.sum(F.coalesce(new_sess, F.lit(0))).over(w)
        )
        return sess.groupBy("user_id", "_sid").agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + gap).alias("session_end"),
            F.count("*").alias("n_events"),
        ).select("session_start", "session_end", "user_id", "n_events")

    eq, na, nb = rows_equal(current(), island())
    print(f"sessions: equal={eq} rows={na}/{nb}")
    mc, _ = timeit(current)
    mi, _ = timeit(island)
    print(f"sessions: current={mc:.3f}s island={mi:.3f}s")


def exp_paragraph(spark):
    """dedup_paragraphs groupBy+join winner vs window-min winner."""
    from youtube_podcast_data_pipeline_azure_spark.functions.text import tokenize
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.operators import curation
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        _occurrence_key,
    )

    def with_paras():
        d2 = load_table(spark, SF_DIR, "documents").select(
            "doc_id", tokenize(F.col("text")).alias("_toks")
        )
        seq = F.when(
            F.size("_toks") > 0,
            F.sequence(
                F.lit(0).cast("long"), F.floor((F.size("_toks") - 1) / 3)
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        paras = F.transform(
            seq,
            lambda i: F.array_join(
                F.slice(F.col("_toks"), (i * 3 + 1).cast("int"), 3), " "
            ),
        )
        return d2.select("doc_id", paras.alias("paras")).localCheckpoint()

    def shape(df):
        return df.select(
            "doc_id",
            F.array_join("paras", " | ").alias("kept_text"),
            "n_paras",
            "n_paras_removed",
        )

    def current():
        return shape(curation.dedup_paragraphs(with_paras(), paras_col="paras"))

    def windowed():
        df = with_paras()
        lid = F.col("doc_id")
        ex = (
            df.select(lid, F.posexplode(F.col("paras")).alias("_pos", "_p"))
            .withColumn("_h", F.md5(F.col("_p")))
            .withColumn("_k", _occurrence_key(lid, "doc_id"))
        )
        kmin = F.min("_k").over(Window.partitionBy("_h"))
        kept = (
            ex.withColumn("_kmin", kmin)
            .where(F.col("_k") == F.col("_kmin"))
            .select(lid, "_pos", "_p")
        )
        rebuilt = kept.groupBy("doc_id").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_p")))
                ),
                lambda s: s.getField("_p"),
            ).alias("paras"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
        original = df.select(lid, F.size(F.col("paras")).alias("_n_orig"))
        out = original.join(rebuilt, "doc_id", "left").select(
            lid,
            F.coalesce(
                F.col("paras"), F.array().cast("array<string>")
            ).alias("paras"),
            F.col("_n_orig").cast("long").alias("n_paras"),
            (F.col("_n_orig") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_paras_removed"),
        )
        return shape(out)

    eq, na, nb = rows_equal(current(), windowed())
    print(f"paragraph: equal={eq} rows={na}/{nb}")
    mc, _ = timeit(current)
    mw, _ = timeit(windowed)
    print(f"paragraph: current={mc:.3f}s windowed={mw:.3f}s")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from youtube_podcast_data_pipeline_azure_spark import get_spark

    spark = get_spark(app_name="ab_r14")
    # warm
    from youtube_podcast_data_pipeline_azure_spark.io.readers import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    if which in ("sessions", "all"):
        exp_sessions(spark)
    if which in ("paragraph", "all"):
        exp_paragraph(spark)
    spark.stop()


if __name__ == "__main__":
    main()
