#!/usr/bin/env python
"""Standing scaling benchmark: regenerates BASELINE.md's "Measured
scaling" table every round instead of relying on one-off measurements.

Synthesizes upscaled inputs from ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) into a temp dir, then times representative
queries at 1x vs the upscale on a warmed session (median of
``$SPARK_GRAFT_BENCH_RUNS``, default 3) and prints ONE JSON line.

Upscale construction (join-integrity preserving):

* TPC-H 5x: replicas of customer/supplier/part/orders/lineitem with
  per-replica key offsets (replica i of orders references replica i of
  customer, etc.), region/nation shared — per-key group sizes stay
  constant, only cardinality grows.
* events 5x: event_id/user_id offsets — more keys, same per-key load.
* documents 10x: replica-tagged token vocabularies (disjoint shingle
  spaces), so TRUE near-dup pair counts grow linearly.
* embeddings 10x: vec_id offsets; the 5 query vectors stay fixed.
* replica pathology: 10 near-identical copies of every document
  (one extra unique token each) — quadratic true pair counts — the
  worst case for exact pair-listers; this is where the composed
  near_dup_pipeline must stay near-linear while raw PPJoin is
  Ω(output) (BASELINE.md pathology note).

A query is FLAGGED when its wall-clock growth is SUPER-linear in the
data growth (ratio > growth factor) — sub-linear ratios are healthy
(fixed overheads amortizing).  Pathology-corpus experiments are never
flagged on ratio: every pair-lister's OUTPUT is quadratic there by
contract; the signal is the relative ordering (near_dup_pipeline <=
raw MinHash << exact PPJoin), which is asserted instead.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

TPCH_5X = [
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "market_share",
    "product_type_profit",
    "waiting_suppliers",
    "pagerank_influence",
    "bloom_semi_join",
]
EVENTS_5X = ["window_running", "asof_join"]
# entity_resolution rides the customer upscale: 5x records over a
# fixed 143-name pool — collapse-first keeps rep-pair work CONSTANT
# (distinct names don't grow) and member→rep star edges linear, so
# wall growth must track record count, never the Ω(m²) same-name
# pair list
TPCH_5X_EXTRA = ["entity_resolution"]
DOCS_10X = [
    "minhash_near_dup",
    "ngram_jaccard_pairs",
    "contamination_report",
    "duplicate_ngram_spans",
    "incremental_dedup",
    "boilerplate_lines",
    "remove_repeated_spans",
    "training_shards",
    "streaming_near_dup",
    # capped negative pool (r5): candidates are O(anchors * pool_cap),
    # so wall growth must track ANCHOR growth (linear here), not corpus²
    "contrastive_pairs",
    # cross-corpus containment (r5): collapse-first, so candidate volume
    # is bounded by DISTINCT texts on both sides
    "corpus_overlap_report",
    # per-fingerprint min-bucket accounting: one digest groupBy
    "novelty_curve",
    # r6 additions: span corruption is linear in tokens (explode +
    # rank + reassembly); ngram_diversity is |ns| explodes + one agg
    "span_corruption",
    "ngram_diversity",
    # Ω(pair list) by contract — disjoint replica vocabularies keep the
    # true pair set linear, so wall growth must stay ~linear here
    # (construct+collect timing includes the eager checkpoint pass)
    "dedup_threshold_curve",
    # r7 additions: suffix-array ops are linear in corpus tokens (the
    # doubling rounds shuffle integer triples; disjoint replica
    # vocabularies keep repeats within-replica, so spans grow
    # linearly); timing includes the eager dense-rank rounds at
    # construct.  DSIR is two gram scans + a broadcast-ratio join.
    "exact_substring_spans",
    "longest_repeated_substrings",
    "dsir_importance_weights",
    "dsir_resample",
    # r7 retrieval/curation additions.  remove_contaminated_spans is
    # linear like its sibling span ops (eval grams broadcast; disjoint
    # replica vocabularies keep matches within-replica).  The
    # perplexity filter is two gram scans + a broadcast-model join +
    # one global ntile (O(n log n) sort).  BM25 work is postings ×
    # matching queries — queries grow with the corpus here (every
    # ~101st doc) but disjoint vocabularies keep each query's term
    # probe inside its own replica, so candidate volume stays linear.
    # Hybrid RRF = BM25 + a fixed-query dense brute force + a per-query
    # fuse, so it tracks its BM25 constituent.
    "remove_contaminated_spans",
    "lm_perplexity_filter",
    "bm25_search",
    # (bm25_search_pruned is NOT in this list: the disjoint-vocabulary
    # upscale divides df/N by the factor, so the dial can't fire at
    # both scales here — it has its own zipf-corpus experiment below)
    "hybrid_retrieval_rrf",
    # r9 additions: all three are per-row maps fused into the scan
    # (rule signals / line rules / regexp chain) — linear by
    # construction, pinned here so a future expression-placement
    # regression (Catalyst traps 1-4) shows up as a ratio flag
    "gopher_quality",
    "c4_line_filter",
    "text_normalization",
    # r10 additions: quality_signals is the fused per-row signal map
    # (single scan, zero exchanges — linear by construction);
    # rarity_bins_by_lang adds one (doc, token) aggregate + a per-lang
    # percentile over the doc-grain table; nb_threshold_curve is the
    # NB scoring pass + a 1-row conditional aggregate
    "quality_signals",
    "rarity_bins_by_lang",
    "nb_threshold_curve",
    # containment's candidates come from prefix keys x the full
    # inverted index — linear on the disjoint-vocabulary upscale (its
    # replica-pathology behavior is the ngram_jaccard exact-pair
    # contract); the keep-one layer adds a window over the bounded
    # pair table
    "containment_pairs",
    "containment_dedup",
    # r10-session additions, all linear by construction on the
    # disjoint-vocabulary upscale: char_entropy is one (id, char)
    # aggregate; keyness is a vocab-bounded conditional aggregate;
    # topic_tags a broadcast dictionary join + bounded argmax;
    # domain_blocklist a scan-fused suffix test; rule attribution the
    # gopher per-row map + one aggregate; the packing curve one window
    # + a 5-wide fan-out.  image/audio near-dup kernels are linear
    # mapInPandas passes and replica docs hash to distinct
    # fingerprints (disjoint vocabularies -> disjoint digests), so the
    # Hamming block join stays linear; the persisted minhash probe
    # includes its build (index write + load + probe).
    "char_entropy",
    "keyness_terms",
    "topic_tags",
    "domain_blocklist",
    "gopher_rule_attribution",
    "packing_budget_curve",
    "image_near_dup",
    "audio_near_dup",
    "streaming_near_dup_persisted",
    # r11 (VERDICT r10 #3): the streaming quality monitor's state is
    # O(languages) (per-lang keep/drop counters via the batch-twin
    # aggregate), so wall growth must track the scan, never the state
    "streaming_quality_monitor",
    # r11 additions: paragraph dedup shuffles digests + two longs (one
    # min per digest, text only on reassembly); the NB reliability
    # table is the scoring pass + two bounded aggregates
    "paragraph_dedup",
    "nb_reliability",
    # per-source cap: one rank window on the source key, keys-only
    "cap_per_source",
    # r12 additions, all keys-only on the exchange: the registry is
    # the paragraph_dedup shape minus the text-reassembly shuffle
    # (digest + two longs end-to-end); the incremental twin adds one
    # digest anti-join; the windowed cap is one rank window on
    # (source, window_start); the two-phase cap replaces a hot
    # partition's sort with buckets× smaller ones (its skew behavior
    # has a dedicated hot_source experiment below)
    "paragraph_registry",
    "paragraph_dedup_incremental",
    "cap_per_source_windowed",
    "cap_per_source_skew",
    # r13 additions: corpus versioning ships ids + one md5-int56 long
    # per side on the full-outer exchange (text fingerprinted at the
    # scan) — linear by construction; the churn rollup replaces the
    # change rows with one conditional aggregate.  The streaming
    # paragraph-dedup sink is 4 bounded availableNow micro-batches
    # (per-batch registry read + digest anti-join) — linear in shard
    # rows, constant batch count, ~4 s of mtime-ordering sleeps in the
    # constant term.
    "corpus_diff",
    "corpus_churn",
    "paragraph_dedup_stream",
    # r13 late additions: the registry merge is digest-grain in,
    # digest-grain out (one (digest, long, long) exchange — linear in
    # registry rows); the index delete probe is the persisted-probe
    # shape plus a bounded tombstone anti-join and one vacuum rewrite
    # (construct includes the index build, like its persisted sibling)
    "paragraph_registry_merge",
    "minhash_index_delete_probe",
]
# pq_train collects the corpus (linear driver fan-in, vectorized int64
# numpy); pq_codes is a literal-codebook per-row map; pq_ann adds one
# posexplode + broadcast join + (query, vec) aggregate — all linear in
# corpus rows at fixed query count
EMB_10X = [
    "knn_bruteforce", "semantic_dedup", "ann_recall",
    "pq_codes", "pq_ann",
    # r10: the composition (coarse prune + ADC) and the truncation
    # sweep are both one-corpus-pass shapes at fixed query count
    "ivfpq_recall",
    "embedding_dim_truncation",
    # r10-session: int8 coarse scan + bounded rerank — one corpus pass
    # at fixed query count
    "knn_sq8_rerank",
]
PATHOLOGY = [
    "ngram_jaccard_pairs",
    "minhash_near_dup",
    "near_dup_pipeline",
    "dedup_corpus",
]
#: exact pair-listers are Ω(output); on the pathology corpus the output
#: itself is quadratic, so a big ratio is the contract, not a defect
OUTPUT_BOUND = {"ngram_jaccard_pairs"}
#: pathology queries whose OUTPUT stays linear (one row per survivor) —
#: these ARE ratio-flagged even on the replica corpus: since r5 the
#: component edges are rep pairs + member->rep stars, so a quadratic
#: ratio here would mean the linear-edge seam regressed
PATHOLOGY_LINEAR = {"dedup_corpus"}


def _copy(spark, src, dst, table):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table

    load_table(spark, src, table).write.mode("overwrite").parquet(
        os.path.join(dst, f"{table}.parquet")
    )


def _write(df, dst, table):
    df.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))


def _offset_union(df, factor, offsets):
    """Union ``factor`` replicas, adding ``i * offset`` to each keyed
    column — group sizes stay constant, cardinality scales."""
    parts = []
    for i in range(factor):
        p = df
        for col, off in offsets.items():
            p = p.withColumn(col, F.col(col) + F.lit(i * off))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_tpch_upscale(spark, src, dst, factor=5):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table

    mx = {}
    for t, k in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
    ]:
        mx[t] = load_table(spark, src, t).agg(F.max(k)).collect()[0][0] + 1
    for t in ("region", "nation"):
        _copy(spark, src, dst, t)
    _write(
        _offset_union(
            load_table(spark, src, "customer"), factor,
            {"c_custkey": mx["customer"]},
        ),
        dst, "customer",
    )
    _write(
        _offset_union(
            load_table(spark, src, "supplier"), factor,
            {"s_suppkey": mx["supplier"]},
        ),
        dst, "supplier",
    )
    _write(
        _offset_union(
            load_table(spark, src, "part"), factor,
            {"p_partkey": mx["part"]},
        ),
        dst, "part",
    )
    _write(
        _offset_union(
            load_table(spark, src, "orders"), factor,
            {"o_orderkey": mx["orders"], "o_custkey": mx["customer"]},
        ),
        dst, "orders",
    )
    _write(
        _offset_union(
            load_table(spark, src, "lineitem"), factor,
            {
                "l_orderkey": mx["orders"],
                "l_partkey": mx["part"],
                "l_suppkey": mx["supplier"],
            },
        ),
        dst, "lineitem",
    )
    for t in ("events", "documents", "embeddings"):
        _copy(spark, src, dst, t)


def build_events_upscale(spark, src, dst, factor=5):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import TABLES, load_table

    ev = load_table(spark, src, "events")
    mx_e = ev.agg(F.max("event_id")).collect()[0][0] + 1
    mx_u = ev.agg(F.max("user_id")).collect()[0][0] + 1
    _write(
        _offset_union(ev, factor, {"event_id": mx_e, "user_id": mx_u}),
        dst, "events",
    )
    for t in TABLES:
        if t != "events":
            _copy(spark, src, dst, t)


def build_docs_upscale(spark, src, dst, factor=10):
    """Disjoint replica vocabularies: every token gets a replica tag, so
    shingle spaces never collide across replicas and true pair counts
    grow linearly."""
    from youtube_podcast_data_pipeline_azure_spark.io.readers import TABLES, load_table

    d = load_table(spark, src, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(factor):
        parts.append(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * mx)).withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit(f"r{i}")),
                    ),
                    " ",
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write(out, dst, "documents")
    for t in TABLES:
        if t != "documents":
            _copy(spark, src, dst, t)


def build_emb_upscale(spark, src, dst, factor=10):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import TABLES, load_table

    e = load_table(spark, src, "embeddings")
    mx = e.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = [e]
    for i in range(1, factor):
        parts.append(e.withColumn("vec_id", F.col("vec_id") + F.lit(i * mx)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write(out, dst, "embeddings")
    for t in TABLES:
        if t != "embeddings":
            _copy(spark, src, dst, t)


def build_replica_pathology(spark, src, dst, copies=10):
    """10 near-identical copies per doc (one unique trailing token each):
    quadratic true near-dup pairs — the exact pair-lister worst case."""
    from youtube_podcast_data_pipeline_azure_spark.io.readers import TABLES, load_table

    d = load_table(spark, src, "documents")
    mx = d.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for j in range(copies):
        parts.append(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(j * mx)).withColumn(
                "text", F.concat(F.col("text"), F.lit(f" zrepl{j}tok"))
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write(out, dst, "documents")
    for t in TABLES:
        if t != "documents":
            _copy(spark, src, dst, t)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def time_queries(spark, qs, names, sf_dir, runs):
    # warm pass prices codegen/worker spawn once (bench.py lesson)
    for name in names:
        qs[name](spark, sf_dir).collect()
    out = {}
    for name in names:
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            ts.append(time.perf_counter() - t0)
        out[name] = round(_median(ts), 3)
    return out


def main() -> None:
    import __spark_entry__ as entrymod
    from youtube_podcast_data_pipeline_azure_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark(app_name="youtube_podcast_data_pipeline_azure_spark-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    work = tempfile.mkdtemp(prefix="bench_scale_")
    experiments: dict[str, dict] = {}
    try:
        plans = [
            ("tpch_5x", build_tpch_upscale, TPCH_5X + TPCH_5X_EXTRA, "5x rows", 5),
            ("events_5x", build_events_upscale, EVENTS_5X, "5x events", 5),
            ("docs_10x", build_docs_upscale, DOCS_10X, "10x docs", 10),
            ("emb_10x", build_emb_upscale, EMB_10X, "10x corpus", 10),
        ]
        for tag, builder, names, growth, factor in plans:
            dst = os.path.join(work, tag)
            os.makedirs(dst, exist_ok=True)
            builder(spark, sf_dir, dst)
            base = time_queries(spark, qs, names, sf_dir, runs)
            scaled = time_queries(spark, qs, names, dst, runs)
            for n in names:
                experiments[f"{tag}:{n}"] = {
                    "growth": growth,
                    "growth_factor": factor,
                    "base_sec": base[n],
                    "scaled_sec": scaled[n],
                    "ratio": round(scaled[n] / max(base[n], 1e-9), 2),
                }
            shutil.rmtree(dst, ignore_errors=True)

        # pathology: same corpus for all three near-dup surfaces; the
        # composed pipeline must stay near the MinHash curve, far from
        # the exact PPJoin blowup
        dst = os.path.join(work, "pathology")
        os.makedirs(dst, exist_ok=True)
        build_replica_pathology(spark, sf_dir, dst)
        base = time_queries(spark, qs, PATHOLOGY, sf_dir, runs)
        scaled = time_queries(spark, qs, PATHOLOGY, dst, runs)
        for n in PATHOLOGY:
            linear = n in PATHOLOGY_LINEAR
            experiments[f"replica_pathology:{n}"] = {
                "growth": "10 near-identical replicas/doc",
                "base_sec": base[n],
                "scaled_sec": scaled[n],
                "ratio": round(scaled[n] / max(base[n], 1e-9), 2),
                # pair output is quadratic here — except for the
                # keep-one surfaces, whose output (and, since the
                # linear-edge seam, work) stays linear
                "output_bound": not linear,
                **({"growth_factor": 10} if linear else {}),
            }
        # the point of the composition: candidate generation over unique
        # representatives must keep the pipeline's replica-skew BLOWUP
        # at-or-below raw MinHash's, and far below the exact PPJoin's.
        # Compare growth RATIOS, not absolute scaled times: the pipeline
        # carries a constant collapse+expand base cost, so the absolute
        # comparison flaps within run noise while the ratio ordering is
        # the actual scaling claim (and stable across r5 runs: 5.4-5.5x
        # vs 5.8-6.1x vs 54-55x).
        def _ratio(n):
            return scaled[n] / max(base[n], 1e-9)

        experiments["replica_pathology:ordering_ok"] = {
            "pipeline_ratio_le_minhash_ratio": _ratio("near_dup_pipeline")
            <= _ratio("minhash_near_dup") * 1.15,  # 15% noise band
            "minhash_ratio_ll_ppjoin_ratio": _ratio("minhash_near_dup") * 2
            < _ratio("ngram_jaccard_pairs"),
        }
        shutil.rmtree(dst, ignore_errors=True)

        # max_df prune (r8, VERDICT r7 #4): measured on a SYNTHETIC
        # ZIPF corpus (log-uniform term ids == Zipf s=1 frequencies,
        # deterministic content hash; 10k vocabulary, 60-token docs)
        # because the prune dials on df/N, which neither fixture shape
        # exercises — the 31-token fixture vocabulary is uniformly
        # stopword-grade, and the disjoint-vocabulary upscale divides
        # every df/N by the growth factor so no deterministic df
        # predicate can fire at both scales.  On a Zipf corpus the head
        # terms (df ≈ N) carry most of the candidate volume at
        # near-zero idf; the claim under test is that pruning them
        # makes BM25 faster at BOTH scales while staying deterministic.
        # Queries are SHORT (first 5 tokens of every 97th base doc —
        # keyword retrieval, not document-as-query): with 45-term
        # document queries the Zipf tail's aggregate df mass drowns the
        # head saving and the prune measured as a wash; with 5-term
        # queries the 1-2 head terms carry most of each query's Ω(df)
        # fan-out and pruning them wins at both scales (r8 measurement:
        # 2.34 vs 2.85 s base, 4.29 vs 5.08 s at 4x).
        import math as _math

        from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
            bm25_topk,
        )

        dst = os.path.join(work, "bm25_prune")
        os.makedirs(dst, exist_ok=True)
        _V, _LEN, _LNV = 10_000, 60, float(_math.log(10_000))

        def _zipf_docs(n):
            return spark.range(n).select(
                F.col("id").alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(_LEN)),
                        lambda i: F.concat(
                            F.lit("t"),
                            F.floor(
                                F.exp(
                                    (
                                        (
                                            F.pmod(
                                                F.xxhash64(F.col("doc_id"), i),
                                                F.lit(1_000_000),
                                            )
                                            + 0.5
                                        )
                                        / 1_000_000.0
                                    )
                                    * F.lit(_LNV)
                                )
                            ).cast("string"),
                        ),
                    ),
                    " ",
                ).alias("text"),
            )

        zipf_base, zipf_scaled = 20_000, 80_000
        for tag, n in (("base", zipf_base), ("scaled", zipf_scaled)):
            _zipf_docs(n).write.mode("overwrite").parquet(
                os.path.join(dst, f"{tag}.parquet")
            )

        from youtube_podcast_data_pipeline_azure_spark.functions.text import (
            tokenize as _tok,
        )

        def _bm25_seconds(tag: str, permille):
            docs = spark.read.parquet(os.path.join(dst, f"{tag}.parquet"))
            qset = docs.where(
                (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < zipf_base)
            ).select(
                F.col("doc_id").alias("query_id"),
                F.array_join(F.slice(_tok(F.col("text")), 1, 5), " ")
                .alias("text"),
            )
            ts = []
            for i in range(runs + 1):  # first pass warms
                t0 = time.perf_counter()
                bm25_topk(docs, qset, k=10, max_df_permille=permille).count()
                if i:
                    ts.append(time.perf_counter() - t0)
            return round(_median(ts), 3)

        for label, permille in (("unpruned", None), ("pruned_775", 775)):
            b = _bm25_seconds("base", permille)
            s = _bm25_seconds("scaled", permille)
            experiments[f"bm25_prune:{label}"] = {
                "growth": "4x zipf docs, fixed queries",
                "growth_factor": 4,
                "base_sec": b,
                "scaled_sec": s,
                "ratio": round(s / max(b, 1e-9), 2),
            }
        experiments["bm25_prune:speedup"] = {
            "pruned_beats_unpruned_at_base": (
                experiments["bm25_prune:pruned_775"]["base_sec"]
                < experiments["bm25_prune:unpruned"]["base_sec"]
            ),
            "pruned_beats_unpruned_at_4x": (
                experiments["bm25_prune:pruned_775"]["scaled_sec"]
                < experiments["bm25_prune:unpruned"]["scaled_sec"]
            ),
        }
        shutil.rmtree(dst, ignore_errors=True)

        # hot-prefix containment pathology (r11, VERDICT r10 #4):
        # every doc opens with the same boilerplate sentence, so those
        # shingles are corpus-hot (df = n).  Under the md5 digest
        # canonical order a hot digest lands in ~prefix_len/|sh| of
        # ALL prefixes -> candidate volume Ω(n²) even though the TRUE
        # output is EMPTY (each doc's unique tail keeps containment at
        # 0.4 << 0.8) — quadratic work with zero output, the exact
        # analog of the MinHash replica pathology.  The df-ascending
        # canonical order (the PPJoin frequency order, the default
        # since r11) pushes hot digests out of every prefix, so
        # candidates track the RARE tail and growth stays ~linear.
        # Both orders are lossless (the prefix theorem holds for any
        # global total order), so this is purely a work-shape contract.
        from youtube_podcast_data_pipeline_azure_spark.operators.dedup import (
            containment_pairs as _cpairs,
        )

        dst = os.path.join(work, "containment_hot")
        os.makedirs(dst, exist_ok=True)

        def _boiler_docs(n):
            return spark.range(n).select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit(
                        "terms of service apply to every page of this site "
                    ),
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(11)),
                            lambda i: F.concat(
                                F.lit("u"),
                                F.col("doc_id").cast("string"),
                                F.lit("_"),
                                i.cast("string"),
                            ),
                        ),
                        " ",
                    ),
                ).alias("text"),
            )

        cp_base_n, cp_scaled_n = 2000, 8000
        for tag, n in (("base", cp_base_n), ("scaled", cp_scaled_n)):
            _boiler_docs(n).write.mode("overwrite").parquet(
                os.path.join(dst, f"{tag}.parquet")
            )

        def _contain_seconds(tag: str, order: str) -> float:
            docs = spark.read.parquet(os.path.join(dst, f"{tag}.parquet"))
            ts = []
            for i in range(runs + 1):  # first pass warms
                t0 = time.perf_counter()
                n_out = _cpairs(
                    docs, threshold=0.8, prefix_order=order
                ).count()
                if i:
                    ts.append(time.perf_counter() - t0)
                assert n_out == 0, f"pathology output should be empty: {n_out}"
            return round(_median(ts), 3)

        cp_ratio = {}
        for label, order in (("digest_order", "digest"), ("df_order", "df")):
            b = _contain_seconds("base", order)
            s = _contain_seconds("scaled", order)
            cp_ratio[label] = s / max(b, 1e-9)
            experiments[f"containment_hot_prefix:{label}"] = {
                "growth": "4x docs, all sharing one boilerplate opener",
                "growth_factor": 4,
                "base_sec": b,
                "scaled_sec": s,
                "ratio": round(cp_ratio[label], 2),
                # digest order is Ω(hot_df²) BY CONTRACT on this corpus
                # (that's the pathology being demonstrated) — only the
                # df order carries the linearity claim
                **({"output_bound": True} if order == "digest" else {}),
            }
        experiments["containment_hot_prefix:mitigation_ok"] = {
            # the default order must scale ~linearly where the digest
            # order degrades quadratically (25% noise band on the
            # growth factor; digest order measured 7.3x wall here
            # as candidates grow 16x: 8M -> 128M)
            "df_order_ratio_le_growth": cp_ratio["df_order"] <= 4 * 1.25,
            "df_order_beats_digest_at_4x": (
                experiments["containment_hot_prefix:df_order"]["scaled_sec"]
                < experiments["containment_hot_prefix:digest_order"][
                    "scaled_sec"
                ]
            ),
        }
        shutil.rmtree(dst, ignore_errors=True)

        # hot-digest pathology for dedup_paragraphs (VERDICT r11 #5a):
        # ONE viral paragraph present in EVERY doc at 10x docs.  The
        # groupBy(_h).min(_k) has map-side partial aggregation, so the
        # hot digest reduces to one row per task before the exchange —
        # the claim under test is ~linear wall in doc count, not
        # Ω(hot_df) on a single reducer.
        from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
            cap_per_source as _cap,
            dedup_paragraphs as _dparas,
        )

        def _viral_docs(n):
            return spark.range(n).select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.array(F.lit("subscribe to our newsletter today")),
                    F.transform(
                        F.sequence(F.lit(1), F.lit(7)),
                        lambda i: F.concat(
                            F.lit("unique para "),
                            F.col("id").cast("string"),
                            F.lit(" #"),
                            i.cast("string"),
                        ),
                    ),
                ).alias("paras"),
            )

        def _dparas_seconds(n: int) -> float:
            docs = _viral_docs(n).localCheckpoint()
            ts = []
            for i in range(runs + 1):  # first pass warms
                t0 = time.perf_counter()
                removed = (
                    _dparas(docs)
                    .agg(F.sum("n_paras_removed").alias("r"))
                    .collect()[0]["r"]
                )
                if i:
                    ts.append(time.perf_counter() - t0)
                # every doc loses its viral copy except the canonical
                # first-occurrence holder; unique paras all survive
                assert removed == n - 1, f"viral dedup wrong: {removed}"
            return round(_median(ts), 3)

        vb = _dparas_seconds(20_000)
        vs = _dparas_seconds(200_000)
        experiments["viral_paragraph:dedup_paragraphs"] = {
            "growth": "10x docs, one paragraph shared by ALL docs",
            "growth_factor": 10,
            "base_sec": vb,
            "scaled_sec": vs,
            "ratio": round(vs / max(vb, 1e-9), 2),
        }

        # hot-source pathology for cap_per_source (VERDICT r11 #5b):
        # one source owns 90% of the corpus, so the rank window puts
        # 90% of rows on ONE partition's sort.  Rows on that exchange
        # are (id, source) only — the claim under test is ~n log n
        # wall in that partition, with the two-phase hash-bucket
        # pre-cap as the documented mitigation if this degrades.
        def _skew_docs(n):
            return spark.range(n).select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") % 10 < 9, F.lit("hot.example.com"))
                .otherwise(
                    F.concat(
                        F.lit("site"),
                        # id%10==9 here, so bucket on id//10 to spread
                        # the cold 10% over 100 distinct sources
                        ((F.col("id") / 10).cast("long") % 100).cast(
                            "string"
                        ),
                        F.lit(".example.com"),
                    )
                )
                .alias("source"),
            )

        def _cap_seconds(n: int) -> float:
            docs = _skew_docs(n).localCheckpoint()
            ts = []
            for i in range(runs + 1):
                t0 = time.perf_counter()
                kept = (
                    _cap(docs, cap=10)
                    .agg(F.sum(F.col("kept").cast("long")).alias("k"))
                    .collect()[0]["k"]
                )
                if i:
                    ts.append(time.perf_counter() - t0)
                # hot source keeps 10; each of the 100 cold sources
                # keeps 10 once it has >= 10 docs (true at both scales)
                assert kept == 10 * 101, f"cap kept wrong: {kept}"
            return round(_median(ts), 3)

        kb = _cap_seconds(100_000)
        ks = _cap_seconds(1_000_000)
        experiments["hot_source:cap_per_source"] = {
            "growth": "10x docs, one source owns 90%",
            "growth_factor": 10,
            "base_sec": kb,
            "scaled_sec": ks,
            "ratio": round(ks / max(kb, 1e-9), 2),
        }

        # A/B the skew-safe two-phase variant on the same corpus: its
        # bucket pre-cap bounds any single partition's sort at
        # buckets·cap rows per source (the cluster-memory claim), and
        # it must not cost materially more wall here than the
        # one-window form it replaces under skew
        from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
            cap_per_source_two_phase as _cap2,
        )

        def _cap2_seconds(n: int) -> float:
            docs = _skew_docs(n).localCheckpoint()
            ts = []
            for i in range(runs + 1):
                t0 = time.perf_counter()
                kept = (
                    _cap2(docs, cap=10, buckets=64)
                    .agg(F.sum(F.col("kept").cast("long")).alias("k"))
                    .collect()[0]["k"]
                )
                if i:
                    ts.append(time.perf_counter() - t0)
                assert kept == 10 * 101, f"two-phase kept wrong: {kept}"
            return round(_median(ts), 3)

        k2b = _cap2_seconds(100_000)
        k2s = _cap2_seconds(1_000_000)
        experiments["hot_source:cap_per_source_two_phase"] = {
            "growth": "10x docs, one source owns 90%",
            "growth_factor": 10,
            "base_sec": k2b,
            "scaled_sec": k2s,
            "ratio": round(k2s / max(k2b, 1e-9), 2),
        }

        # pathological graph: a pure chain — diameter = n, the case
        # where iteration-capped label propagation silently mislabels
        # (duplicate_clusters' fallback trigger, fixed r5).  Per-round
        # star-CC cost is O(|E|) and rounds are O(log² n), independent
        # of diameter, so 5x the chain must grow wall-clock ~linearly
        # in |E| (ratio <= growth_factor), NOT with the 5x-deeper
        # diameter label propagation would need.  The single-component
        # check doubles as the correctness probe for the fallback path.
        from youtube_podcast_data_pipeline_azure_spark.operators.graph import (
            connected_components_star,
        )

        def _chain_cc_seconds(n: int) -> float:
            nodes = spark.range(n).select(F.col("id").alias("doc_id"))
            pairs = spark.range(n - 1).select(
                F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
            )
            t0 = time.perf_counter()
            comp = connected_components_star(nodes, pairs)
            ncomp = comp.select("component").distinct().count()
            dt = time.perf_counter() - t0
            assert ncomp == 1, f"chain CC wrong: {ncomp} components"
            return dt

        base_n, scaled_n = 20_000, 100_000
        cb = _chain_cc_seconds(base_n)
        cs = _chain_cc_seconds(scaled_n)
        experiments["chain_cc:connected_components_star"] = {
            "growth": f"chain diameter {base_n} -> {scaled_n}",
            "growth_factor": scaled_n // base_n,
            "base_sec": round(cb, 3),
            "scaled_sec": round(cs, 3),
            "ratio": round(cs / max(cb, 1e-9), 2),
        }

        def _over(v):
            return (
                not v.get("output_bound")
                and "ratio" in v
                and v["ratio"] > v.get("growth_factor", 3)
            )

        # Recheck protocol (r10, native since r12 per VERDICT r11 #7):
        # in-batch 10x ratios move when the batch list grows — an
        # untouched query once went 5.5 -> 10.8 after three queries
        # joined its batch.  Every standard-plan flag gets an ISOLATED
        # re-measure (fresh corpus build, that query alone) before it
        # counts as a regression; `flagged` is the post-recheck list,
        # `flagged_in_batch` preserves the raw batch flags.
        flagged_in_batch = sorted(
            k for k, v in experiments.items() if _over(v)
        )
        rechecks: dict[str, dict] = {}
        plan_by_tag = {tag: (b, f) for tag, b, _, _, f in plans}
        for k in flagged_in_batch:
            tag, _, name = k.partition(":")
            if tag not in plan_by_tag:
                continue  # bespoke experiments carry their own contracts
            builder, factor = plan_by_tag[tag]
            dst = os.path.join(work, f"recheck_{tag}_{name}")
            os.makedirs(dst, exist_ok=True)
            builder(spark, sf_dir, dst)
            rb = time_queries(spark, qs, [name], sf_dir, runs)[name]
            rs = time_queries(spark, qs, [name], dst, runs)[name]
            rechecks[k] = {
                "isolated": True,
                "base_sec": rb,
                "scaled_sec": rs,
                "ratio": round(rs / max(rb, 1e-9), 2),
                "growth_factor": factor,
            }
            shutil.rmtree(dst, ignore_errors=True)
        flagged = sorted(
            k
            for k in flagged_in_batch
            if _over({**experiments[k], **rechecks.get(k, {})})
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "scaling_ratios",
                "sf_dir": sf_dir,
                "runs": runs,
                "experiments": experiments,
                "rechecks": rechecks,
                "flagged_in_batch": flagged_in_batch,
                "flagged_over_3x": flagged,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
