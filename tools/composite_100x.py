#!/usr/bin/env python
"""Composite 100x curation-pipeline stress (VERDICT r11 #4): every
prior 100x artifact measured operators SOLO — this chains the
production path ONCE, normalize -> gopher gate -> dedup_corpus ->
dedup_paragraphs -> decontaminate -> cap_per_source -> pack, over the
100x-upscaled documents table, and records end-to-end wall plus
shuffle write bytes (from the local UI REST store) at base and 100x.
Cross-operator checkpoint/AQE interactions are the surface under test;
the claim is no super-linear stage and an end-to-end ratio far below
the 100x data growth (fixed overheads amortize; the dedup stages'
work tracks near-dup structure, which the disjoint-vocabulary upscale
keeps proportional).

Two modes per scale:

- ``one_job``: the whole chain as a single lazily-composed plan, one
  action (count of packed sequences + token mass).  dedup_corpus
  internally checkpoints its component iteration; everything else
  stays in one Catalyst plan, so AQE replans across operator seams.
- ``staged``: localCheckpoint after each operator, per-stage walls —
  the per-stage super-linearity probe (base vs 100x ratio per stage).

Run with SPARK_DRIVER_MEM=32g (local broadcasts live in the driver):

    SPARK_DRIVER_MEM=32g python tools/composite_100x.py \
        > tools/composite_100x_r12.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench_scale import build_docs_upscale  # noqa: E402

FACTOR = 100


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle write bytes across all completed stages, from the
    local UI's REST store (local mode always hosts it)."""
    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages", timeout=10
        ) as resp:
            stages = json.load(resp)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1  # UI disabled / store unavailable: report, don't fail


def main() -> None:
    # the session factory gates the UI on SPARK_UI (default off); the
    # REST status store is where shuffle bytes come from
    os.environ.setdefault("SPARK_UI", "true")
    from youtube_podcast_data_pipeline_azure_spark import get_spark
    from youtube_podcast_data_pipeline_azure_spark.functions.text import (
        normalize_text,
        tokenize,
    )
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        cap_per_source,
        decontaminate,
        dedup_paragraphs,
        quality_signals,
    )
    from youtube_podcast_data_pipeline_azure_spark.operators.dedup import (
        dedup_corpus,
    )
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        pack_sequences,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="composite-100x")
    spark.sparkContext.setLogLevel("ERROR")

    base_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # FIXED eval set on both scales: every 97th base doc's text — the
    # decontamination workload must not grow with the corpus or the
    # measured growth conflates corpus size with eval-set size
    eval_df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("eval_id"), "text")
        .localCheckpoint()
    )

    def stage_fns():
        """The production chain as (name, df -> df) steps.  Thresholds
        are dialed to the fixture's short synthetic docs (min_words=5:
        the corpus min is ~8 words; production Gopher uses 50) so each
        gate passes a healthy fraction and downstream stages see real
        volume."""

        def s_normalize(d):
            return d.select(
                "doc_id",
                "lang",
                "source",
                normalize_text(F.col("text")).alias("text"),
            ).where(F.length("text") > 0)

        def s_gopher(d):
            # six of the seven Gopher rules: the stopword-hits rule is
            # excluded because the fixture's synthetic vocabulary has
            # ~0 stopword hits (it zeroes the corpus and the pipeline
            # would measure nothing), and the disjoint-vocabulary
            # upscale re-tags every token so the rule would also flip
            # between scales.  The six kept rules are scale-stable.
            sig = quality_signals(d, min_words=5)
            keep = sig.where(
                (F.col("n_words") >= 5)
                & (F.col("n_words") <= 100_000)
                & (F.col("mean_word_len_deci") >= 30)
                & (F.col("mean_word_len_deci") <= 100)
                & (F.col("symbol_ratio_permille") <= 100)
                & (F.col("bullet_lines_permille") <= 900)
                & (F.col("ellipsis_lines_permille") <= 300)
                & (F.col("alpha_word_permille") >= 800)
            ).select("doc_id")
            return d.join(keep, "doc_id", "left_semi")

        def s_dedup_corpus(d):
            survivors = dedup_corpus(d).select("doc_id")
            return d.join(survivors, "doc_id", "left_semi")

        def s_dedup_paragraphs(d):
            toks = d.select(
                "doc_id", "lang", "source", tokenize(F.col("text")).alias("_toks")
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
            with_paras = toks.select(
                "doc_id", "lang", "source", paras.alias("paras")
            ).localCheckpoint()
            deduped = dedup_paragraphs(
                with_paras.select("doc_id", "paras"), paras_col="paras"
            )
            return (
                with_paras.select("doc_id", "lang", "source")
                .join(deduped, "doc_id")
                .select(
                    "doc_id",
                    "lang",
                    "source",
                    F.array_join("paras", " ").alias("text"),
                )
                .where(F.length("text") > 0)
            )

        def s_decontaminate(d):
            return decontaminate(
                d, eval_df, id_col="doc_id", n=8
            )

        def s_cap(d):
            kept = (
                cap_per_source(d, cap=1000)
                .where(F.col("kept"))
                .select("doc_id")
            )
            return d.join(kept, "doc_id", "left_semi")

        def s_pack(d):
            counted = d.select(
                "doc_id", "lang", F.size(tokenize(F.col("text"))).alias("n_tokens")
            )
            return pack_sequences(
                counted, "n_tokens", group_col="lang", budget=2048
            )

        return [
            ("normalize", s_normalize),
            ("gopher_gate", s_gopher),
            ("dedup_corpus", s_dedup_corpus),
            ("dedup_paragraphs", s_dedup_paragraphs),
            ("decontaminate", s_decontaminate),
            ("cap_per_source", s_cap),
            ("pack", s_pack),
        ]

    def run_one_job(docs_dir: str) -> dict:
        d = spark.read.parquet(f"{docs_dir}/documents.parquet")
        sw0 = _shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        for _, fn in stage_fns():
            d = fn(d)
        packed = d.agg(
            F.countDistinct("lang", "pack_id").alias("n_packs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.count("*").alias("n_docs"),
        ).collect()[0]
        wall = round(time.perf_counter() - t0, 3)
        sw1 = _shuffle_write_bytes(spark)
        # a stage that empties the corpus measures nothing — fail loud
        assert packed["n_docs"], "composite pipeline produced zero docs"
        return {
            "wall_sec": wall,
            "shuffle_write_bytes": (sw1 - sw0) if sw0 >= 0 and sw1 >= 0 else -1,
            "n_packs": packed["n_packs"],
            "n_docs_packed": packed["n_docs"],
            "total_tokens": int(packed["total_tokens"]),
        }

    def run_staged(docs_dir: str) -> dict:
        d = spark.read.parquet(f"{docs_dir}/documents.parquet")
        walls = {}
        n_rows = {}
        for name, fn in stage_fns():
            t0 = time.perf_counter()
            d = fn(d).localCheckpoint()
            n = d.count()
            walls[name] = round(time.perf_counter() - t0, 3)
            n_rows[name] = n
        return {"stage_walls": walls, "stage_rows": n_rows}

    work = tempfile.mkdtemp(prefix="composite_100x_")
    out: dict = {
        "metric": "composite_curation_pipeline_100x",
        "sf_dir": sf_dir,
        "factor": FACTOR,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
    }
    try:
        dst = os.path.join(work, "up_docs")
        os.makedirs(dst, exist_ok=True)
        build_docs_upscale(spark, sf_dir, dst, factor=FACTOR)

        out["base_one_job"] = run_one_job(sf_dir)
        out["scaled_one_job"] = run_one_job(dst)
        out["one_job_ratio"] = round(
            out["scaled_one_job"]["wall_sec"]
            / max(out["base_one_job"]["wall_sec"], 1e-9),
            2,
        )
        out["base_staged"] = run_staged(sf_dir)
        out["scaled_staged"] = run_staged(dst)
        ratios = {
            k: round(
                out["scaled_staged"]["stage_walls"][k]
                / max(out["base_staged"]["stage_walls"][k], 1e-9),
                2,
            )
            for k in out["base_staged"]["stage_walls"]
        }
        out["stage_ratios"] = ratios
        # super-linear = wall grows FASTER than the 100x data
        out["flagged_superlinear"] = sorted(
            k for k, v in ratios.items() if v > FACTOR
        )
        out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
