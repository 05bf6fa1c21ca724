"""Data-quality expectations: declarative checks evaluated in ONE scan.

The reference's only validation is "drop records with an ``error``
field" (reference silver_clean_comments.py:42-43) and null-on-error
casts (function_app.py stats parsing).  A 100 TB training-data pipeline
needs the general form: a set of declarative expectations (not-null,
uniqueness, range, set-membership, referential integrity, custom
predicate) evaluated against a table, producing a violation report and,
separately, a pass/fail row split.

Scale design: every row-local expectation compiles to a Spark boolean
Column, so ALL of them are checked in a single scan with zero
shuffles — the report aggregates ``count(NOT check)`` map-side.
Uniqueness and referential integrity are the only shuffling checks
(one groupBy / one broadcast-able anti-join each), and both ship keys
only.  Nothing here is a UDF; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named check.  ``predicate`` is a boolean Column that is True
    for PASSING rows (null predicate counts as failing)."""

    name: str
    predicate: Column


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null[{col}]", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"in_range[{col}]", F.col(col).between(F.lit(lo), F.lit(hi))
    )


def in_set(col: str, values: list) -> Expectation:
    return Expectation(f"in_set[{col}]", F.col(col).isin(values))


def matches(col: str, regex: str) -> Expectation:
    return Expectation(f"matches[{col}]", F.col(col).rlike(regex))


def satisfies(name: str, predicate: Column) -> Expectation:
    return Expectation(name, predicate)


def expectation_report(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all row-local expectations in one scan.

    Returns (expectation string, n_rows long, n_failed long,
    pass_pct long) — pass_pct as integer basis points (pct·100) so the
    report is bit-exact on any engine.  One job, zero shuffles before
    the final single-row aggregate (each check is a conditional count
    with map-side partial aggregation).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for e in expectations:
        aggs.append(
            F.sum(
                F.when(F.coalesce(e.predicate, F.lit(False)), 0).otherwise(1)
            ).alias(e.name)
        )
    row = df.agg(*aggs)
    pairs = []
    for e in expectations:
        pairs.append(
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.col("_n").alias("n_rows"),
                F.col(e.name).alias("n_failed"),
            )
        )
    return (
        row.select(F.explode(F.array(*pairs)).alias("r"))
        .select("r.expectation", "r.n_rows", "r.n_failed")
        # integer basis points via `div`: exact on any engine (DuckDB `//`)
        .withColumn(
            "pass_bp", F.expr("(n_rows - n_failed) * 10000 div n_rows")
        )
    )


def split_by_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Row split: (passing, failing-with-reasons).  The failing side
    carries ``failed_expectations`` (array of names) — the quarantine
    table of a production pipeline.  Same single-scan compilation."""
    checks = [
        F.when(
            ~F.coalesce(e.predicate, F.lit(False)), F.lit(e.name)
        )
        for e in expectations
    ]
    tagged = df.withColumn(
        "failed_expectations",
        F.filter(F.array(*checks), lambda x: x.isNotNull()),
    )
    passing = tagged.where(F.size("failed_expectations") == 0).drop(
        "failed_expectations"
    )
    failing = tagged.where(F.size("failed_expectations") > 0)
    return passing, failing


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key groups appearing more than once: (key cols..., n_dupes).
    One groupBy on the key columns only (projection pruned)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_dupes"))
        .where(F.col("n_dupes") > 1)
    )


def row_fingerprint(cols: list[str]) -> Column:
    """Deterministic per-row content hash: md5-int56 over the
    canonically-serialized columns (unit separator \\x1f, NULL
    sentinel) — cross-engine reproducible (see sketches.md5_int56)."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import md5_int56

    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols
    ]
    return md5_int56(F.concat_ws("\x1f", *parts))


def table_fingerprint(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-independent content fingerprint of a table slice: one row
    (n_rows, xor_fp, sum_low20).

    Used to validate migrations/replications without moving data: equal
    fingerprints on both sides ⇒ same multiset of rows (up to hash
    collisions).  XOR of per-row hashes is order-independent and can't
    overflow; because identical duplicate PAIRS cancel under XOR, the
    low-20-bit sum rides along as a multiplicity witness (≤ 2^20 per
    row ⇒ safe in int64 past a trillion rows).  One scan, map-side
    partial aggregation, a single-row result.
    """
    fp = row_fingerprint(cols)
    return df.select(fp.alias("_fp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_fp)").alias("xor_fp"),
        F.sum(F.col("_fp") % F.lit(1 << 20)).alias("sum_low20"),
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Row-level diff between two table versions keyed by ``key_cols``:
    (keys..., change_type ∈ {added, removed, changed}).

    Non-key columns are compared via :func:`row_fingerprint`, so the
    join carries keys + one long per side instead of full rows — at
    100 TB the shuffle is keys-only, and unchanged rows (the vast
    majority) drop before any wide materialization.
    """
    value_cols = [c for c in old.columns if c not in key_cols]
    o = old.select(*key_cols, row_fingerprint(value_cols).alias("_old_fp"))
    n = new.select(*key_cols, row_fingerprint(value_cols).alias("_new_fp"))
    joined = o.join(n, key_cols, "full_outer")
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("_old_fp").isNull(), F.lit("added"))
            .when(F.col("_new_fp").isNull(), F.lit("removed"))
            .when(F.col("_old_fp") != F.col("_new_fp"), F.lit("changed")),
        )
        .where(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def referential_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child keys with no parent (orphans): (key, n_orphans).  The
    anti-join side is keys-only; Spark broadcasts the parent key set
    when it is small, else AQE picks the strategy."""
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return (
        child.select(child_key)
        .join(parents, child_key, "left_anti")
        .groupBy(child_key)
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )


def functional_dependency_report(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency profiler: for each candidate FD
    ``determinant → dependent``, how many determinant values map to
    MORE than one distinct dependent value — the classic schema-
    discovery / normalization check (does `nation` really determine
    `region`?  is `source → lang` safe to denormalize on?).

    One aggregate per pair over (determinant) grain: the shuffle
    carries the two columns only, count-distinct runs as Spark's
    standard partial/final expansion, and the per-pair summaries
    (a handful of rows) union into one report.  Returns
    (determinant, dependent, n_keys, n_violating_keys, holds), one row
    per requested pair; ``holds`` iff no determinant value has 2+
    dependents.
    """
    reports = []
    for det, dep in pairs:
        per_key = df.groupBy(det).agg(
            F.countDistinct(dep).alias("_n_dep")
        )
        reports.append(
            per_key.agg(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count("*").cast("long").alias("n_keys"),
                F.sum(F.when(F.col("_n_dep") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating_keys"),
                (
                    F.sum(F.when(F.col("_n_dep") > 1, 1).otherwise(0)) == 0
                ).alias("holds"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def k_anonymity_report(
    df: DataFrame,
    quasi_identifiers: list[str],
    k_thresholds: tuple[int, ...] = (2, 5, 10),
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: for each
    candidate k, how many equivalence classes (distinct QI tuples) fall
    below k members and how many rows those classes expose — the
    release-gate check for any dataset carrying person-adjacent
    attributes (a row whose QI class has < k members is re-identifiable
    by joining the QI columns against an external table).

    One aggregate builds the class-size table (shuffle key = the QI
    tuple, map-side partial), then the per-k fan-out multiplies CLASS
    rows (bounded by distinct QI combinations, not table rows).  Emits
    a row per k even when nothing is at risk, so downstream gates can
    assert ``n_rows_at_risk == 0`` without an existence check.

    Returns (k, n_classes, n_classes_below_k, n_rows_at_risk,
    min_class_size), all bigint.
    """
    classes = df.groupBy(*quasi_identifiers).agg(
        F.count("*").cast("long").alias("class_size")
    )
    fanned = classes.select(
        "class_size",
        F.explode(
            F.array(*[F.lit(int(k)).cast("long") for k in sorted(k_thresholds)])
        ).alias("k"),
    )
    return fanned.groupBy("k").agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(F.col("class_size") < F.col("k"), 1).otherwise(0))
        .cast("long")
        .alias("n_classes_below_k"),
        F.sum(
            F.when(F.col("class_size") < F.col("k"), F.col("class_size"))
            .otherwise(0)
        )
        .cast("long")
        .alias("n_rows_at_risk"),
        F.min("class_size").cast("long").alias("min_class_size"),
    )


def ks_drift_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
    reference: str | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift between a reference
    group and every other group: ``ks_bp = max_v |ECDF_ref(v) −
    ECDF_g(v)|`` in basis points.

    The numeric-distribution companion to the embedding-space PSI
    report (`similarity.py:embedding_drift_report`): run it on
    ``n_chars`` (or token counts) per ``source`` to catch a feed whose
    length profile shifted — truncation bugs, boilerplate floods, a
    crawler that started returning error pages.  KS is
    distribution-free; at n_ref = n_g = 10k docs the 1% critical D is
    ~0.023 (230 bp).

    Exact integer arithmetic throughout: the ECDF difference is
    computed as ``|cum_ref·n_g − cum_g·n_ref|`` on bigints and divided
    once at the end with a single integer ``div``, so the statistic
    hash-matches any engine.  Overflow bound: ``D·10⁴ ≤ n_ref·n_g·10⁴``
    must fit int64 ⇒ exact below ~30M rows per group per pair; beyond
    that, pre-bucket the value column (the statistic is on a quantized
    measure anyway).  If ``reference`` is None the lexicographically
    first group is used (deterministic, resolved by a 1-row broadcast
    aggregate — no driver collect).

    Scale shape: one (group, value) count aggregate over the corpus
    (map-side combined, bounded by |groups|·|distinct values|);
    everything after — the reference cross-grid, the cumulative
    windows, the max — runs on that value-grain table, which for
    quantized measures (lengths, token counts) is tiny however large
    the corpus.  The per-group cumulative window partitions by group:
    ≤ |distinct values| rows per partition, never corpus rows.

    Null contract (ADVICE r7): rows with a NULL value or NULL group are
    EXCLUDED up front.  A NULL group could never match either side of
    the ref/other split (``_g == _ref`` and ``_g != _ref`` are both
    NULL-false, silently vanishing its rows), and NULL values order
    differently across engines (Spark windows sort NULL first, DuckDB
    defaults NULLS LAST) — the hash-exactness claim holds on the
    non-null subset, which the explicit filter makes the operator's
    actual input on every engine.

    Returns (group, n_ref, n_group, ks_bp), one row per non-reference
    group.
    """
    df = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    counts = df.groupBy(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_c"))
    # the single corpus-grain pass; everything below fans out over this
    # value-grain table 3 ways (ref tag, grid, totals) — checkpoint so
    # the corpus is scanned exactly once (multi-consumer subplan rule)
    counts = counts.localCheckpoint(eager=True)
    if reference is not None:
        tagged = counts.withColumn("_ref", F.lit(reference))
    else:
        refrow = counts.agg(F.min("_g").alias("_ref"))
        tagged = counts.crossJoin(F.broadcast(refrow))
    refc = tagged.where(F.col("_g") == F.col("_ref")).select(
        "_v", F.col("_c").alias("_cr")
    )
    others = tagged.where(F.col("_g") != F.col("_ref")).select(
        "_g", "_v", "_c"
    )
    groups = others.select("_g").distinct()
    # value axis per pair = ref values × groups ∪ each group's values
    grid = (
        refc.crossJoin(F.broadcast(groups))
        .select("_g", "_v", "_cr", F.lit(0).cast("long").alias("_cg"))
        .unionByName(
            others.select(
                "_g", "_v", F.lit(0).cast("long").alias("_cr"),
                F.col("_c").alias("_cg"),
            )
        )
        .groupBy("_g", "_v")
        .agg(F.sum("_cr").alias("cr"), F.sum("_cg").alias("cg"))
    )
    totals = grid.groupBy("_g").agg(
        F.sum("cr").alias("n_ref"), F.sum("cg").alias("n_group")
    )
    w = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = grid.select(
        "_g",
        F.sum("cr").over(w).alias("cum_r"),
        F.sum("cg").over(w).alias("cum_g"),
    )
    return (
        cums.join(F.broadcast(totals), "_g")
        .groupBy("_g")
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_group").alias("n_group"),
            F.max(
                F.abs(
                    F.col("cum_r") * F.col("n_group")
                    - F.col("cum_g") * F.col("n_ref")
                )
            ).alias("_d"),
        )
        .select(
            F.col("_g").alias("group"),
            "n_ref",
            "n_group",
            F.expr("_d * 10000 div (n_ref * n_group)").alias("ks_bp"),
        )
    )


def inclusion_dependency_report(
    child: DataFrame,
    parent: DataFrame,
    pairs: "list[tuple[str, str]]",
) -> DataFrame:
    """Inclusion-dependency (foreign-key-candidate) profiler: for each
    candidate ``child_col ⊆ parent_col``, how completely the child's
    DISTINCT values are contained in the parent's — the schema-
    discovery companion to :func:`functional_dependency_report` (is
    `events.user_id` really a key into `customer.c_custkey`?  which
    join column survived an upstream rename?).

    Per pair: distinct-project both sides (keys only on the shuffle,
    never payloads), LEFT ANTI join child-distinct against
    parent-distinct, and reduce to one row: distinct child values,
    how many have no parent match, and containment in basis points
    (``10000·(n_distinct − n_orphaned) div n_distinct``).  NULL child
    values are excluded on both engines (a NULL can't reference a
    key).  Returns (child_col, parent_col, n_distinct, n_orphaned,
    containment_bp, holds) — ``holds`` iff containment is total.
    """
    reports = []
    for ccol, pcol in pairs:
        c = child.select(F.col(ccol).alias("_v")).where(
            F.col("_v").isNotNull()
        ).distinct()
        p = parent.select(F.col(pcol).alias("_v")).where(
            F.col("_v").isNotNull()
        ).distinct()
        orphans = c.join(p, "_v", "left_anti")
        n_c = c.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(ccol).alias("child_col"),
            F.lit(pcol).alias("parent_col"),
            F.col("n").alias("n_distinct"),
        )
        n_o = orphans.agg(
            F.count(F.lit(1)).cast("long").alias("n_orphaned")
        )
        reports.append(
            n_c.crossJoin(F.broadcast(n_o)).select(
                "child_col",
                "parent_col",
                "n_distinct",
                "n_orphaned",
                F.expr(
                    "10000 * (n_distinct - n_orphaned) div n_distinct"
                ).alias("containment_bp"),
                (F.col("n_orphaned") == 0).alias("holds"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def conditional_entropy_report(
    df: DataFrame, pairs: "list[tuple[str, str]]"
) -> DataFrame:
    """Graded functional-dependency strength: the conditional entropy
    H(dependent | determinant) for each candidate pair — 0 exactly when
    the FD holds, and a calibrated how-far-off measure when it doesn't
    (the :func:`functional_dependency_report` verdict says only
    yes/no; schema discovery ranks candidates by THIS number).

    Decomposition ``H = (Σ_d c_d·ln c_d − Σ_{d,v} c_dv·ln c_dv) / N``
    over the (det, dep) count table, with every ln floor-quantized to
    integer micro-units BEFORE the count multiply (the char_entropy /
    lm_perplexity seam) and a final integer division — order-
    independent and SQL-replayable.  NULLs count as ordinary values
    (SQL GROUP BY semantics on both engines).

    Plan per pair: one (det, dep) count aggregate (shuffle bounded by
    distinct pairs, map-side combine); determinant totals derive from
    that table, never a second scan.  Returns (determinant, dependent,
    n_rows, n_keys, h_cond_micro, holds).
    """
    reports = []
    for det, dep in pairs:
        cdv = df.groupBy(det, dep).agg(
            F.count(F.lit(1)).cast("long").alias("_c")
        )
        rows = cdv.select(
            F.col(det).alias("_d"),
            "_c",
            (
                F.col("_c")
                * F.floor(
                    F.lit(1_000_000.0) * F.log(F.col("_c").cast("double"))
                ).cast("long")
            ).alias("_t2"),
        )
        per_d = rows.groupBy("_d").agg(
            F.sum("_c").cast("long").alias("_cd"),
            F.count(F.lit(1)).cast("long").alias("_nv"),
            F.sum("_t2").cast("long").alias("_s2"),
        )
        agg = per_d.agg(
            F.sum("_cd").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(
                F.col("_cd")
                * F.floor(
                    F.lit(1_000_000.0) * F.log(F.col("_cd").cast("double"))
                ).cast("long")
            )
            .cast("long")
            .alias("_s1"),
            F.sum("_s2").cast("long").alias("_s2t"),
            F.sum(F.when(F.col("_nv") > 1, 1).otherwise(0))
            .cast("long")
            .alias("_viol"),
        )
        reports.append(
            agg.select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_rows",
                "n_keys",
                F.expr("(_s1 - _s2t) div n_rows").alias("h_cond_micro"),
                (F.col("_viol") == 0).alias("holds"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def trimmed_mean_report(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str,
    trim_bp: int = 500,
) -> DataFrame:
    """Rank-trimmed per-group means — the outlier-robust metric a
    corpus dashboard should show next to the raw mean (one viral page
    or one parser glitch moves a raw mean; it cannot move a 5%-trimmed
    one).  Trimming is by RANK, not by value cut points: the lowest
    and highest ``k = floor(n·trim_bp/10000)`` rows per group drop,
    ranks tie-broken by (value, id) — fully integer-deterministic on
    both engines, where interpolated percentile CUTS would be
    ulp-sensitive as filter thresholds.

    One per-group rank window (single exchange on the group key), then
    one aggregate: per-row floor-to-cents, integer-sum division.
    Returns (group_col, n_rows, n_used, raw_mean_microcents,
    trimmed_mean_microcents).

    ``trim_bp`` must be < 5000: trimming half or more from EACH tail
    leaves ``n - 2k == 0`` kept rows for some group sizes, a zero
    divisor and a null trimmed mean (ADVICE r10).  With the bound,
    ``k = n*bp div 10000 <= (n*4999) div 10000 < n/2`` so at least one
    row always survives per group.
    """
    if not 0 <= int(trim_bp) < 5000:
        raise ValueError(
            f"trim_bp must be in [0, 5000) basis points, got {trim_bp}"
        )
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        F.floor(F.col(value_col) * 100).cast("long").alias("_cents"),
    )
    w = Window.partitionBy("_g").orderBy(
        F.col("_cents").asc(), F.col("_id").asc()
    )
    wn = Window.partitionBy("_g")
    ranked = base.select(
        "_g",
        "_cents",
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    k = F.expr(f"_n * {int(trim_bp)} div 10000")
    return (
        ranked.select(
            "_g",
            "_cents",
            "_n",
            ((F.col("_rk") > k) & (F.col("_rk") <= F.col("_n") - k)).alias(
                "_keep"
            ),
        )
        .groupBy("_g")
        .agg(
            F.max("_n").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_used"),
            F.expr("sum(_cents) * 10000 div count(*)").alias(
                "raw_mean_microcents"
            ),
            F.expr(
                "sum(CASE WHEN _keep THEN _cents ELSE 0 END) * 10000 "
                "div sum(CASE WHEN _keep THEN 1 ELSE 0 END)"
            ).alias("trimmed_mean_microcents"),
        )
        .select(
            F.col("_g").alias(group_col),
            "n_rows",
            "n_used",
            "raw_mean_microcents",
            "trimmed_mean_microcents",
        )
    )


def _corpus_fp_join(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
) -> DataFrame:
    """Shared fingerprint full-outer join for the corpus versioning
    operators: ships (id, source, one long) per side — text never
    shuffles, unchanged docs carry 3 scalar columns each."""
    vals = [source_col, text_col]
    o = old.select(
        F.col(id_col),
        F.col(source_col).alias("_src_o"),
        row_fingerprint(vals).alias("_fp_o"),
    )
    n = new.select(
        F.col(id_col),
        F.col(source_col).alias("_src_n"),
        row_fingerprint(vals).alias("_fp_n"),
    )
    return o.join(n, id_col, "full_outer")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-run corpus versioning for the curation loop (VERDICT r12
    #7): which documents were ADDED, REMOVED, or CHANGED between two
    curation runs — the doc-grain audit a continuously-re-curated
    training corpus needs before a new run is promoted (what did the
    new filters/dedup admit or evict, and did any standing doc's text
    mutate?).

    The machinery is :func:`snapshot_diff`'s, specialized to the
    corpus shape: content compared via :func:`row_fingerprint` over
    (source, text) so the full-outer join carries ids + one long per
    side (at 100 TB the shuffle is keys-only; text stays at the scan),
    with the reporting ``source`` re-attached from whichever run has
    the doc (the NEW run wins for changed docs, so a source move
    buckets under its destination).  Returns (id, source, change_type
    ∈ {added, removed, changed}); unchanged docs — the vast majority
    between adjacent runs — drop before any wide materialization.
    """
    j = _corpus_fp_join(old, new, id_col, text_col, source_col)
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("_fp_o").isNull(), F.lit("added"))
            .when(F.col("_fp_n").isNull(), F.lit("removed"))
            .when(F.col("_fp_o") != F.col("_fp_n"), F.lit("changed")),
        )
        .where(F.col("change_type").isNotNull())
        .select(
            id_col,
            F.coalesce(F.col("_src_n"), F.col("_src_o")).alias(source_col),
            "change_type",
        )
    )


def corpus_churn(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source churn report between two curation runs — the rollup
    a promotion gate reads (is any source being silently evicted or
    rewritten wholesale?): one row per source with run sizes, the four
    change counts, and an integer churn rate.

    Same keys-plus-fingerprint join as :func:`corpus_diff`, then ONE
    conditional aggregate over the coalesced source — no second scan,
    no pivot.  ``churn_permille`` is exact integer arithmetic
    (``(added+removed+changed)·1000 div distinct_ids``, with
    ``distinct_ids = n_old + n_added``), so the report is
    oracle-reproducible bit-for-bit.  Sources that changed between
    runs bucket the doc under the NEW source (matching
    :func:`corpus_diff`).
    """
    j = _corpus_fp_join(old, new, id_col, text_col, source_col)
    added = F.col("_fp_o").isNull()
    removed = F.col("_fp_n").isNull()
    changed = (
        F.col("_fp_o").isNotNull()
        & F.col("_fp_n").isNotNull()
        & (F.col("_fp_o") != F.col("_fp_n"))
    )

    def _n(cond) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return (
        j.groupBy(
            F.coalesce(F.col("_src_n"), F.col("_src_o")).alias(source_col)
        )
        .agg(
            F.count(F.col("_fp_o")).cast("long").alias("n_old"),
            F.count(F.col("_fp_n")).cast("long").alias("n_new"),
            _n(added).alias("n_added"),
            _n(removed).alias("n_removed"),
            _n(changed).alias("n_changed"),
            _n(~added & ~removed & ~changed).alias("n_stable"),
        )
        .withColumn(
            "churn_permille",
            F.expr(
                "(n_added + n_removed + n_changed) * 1000 "
                "div (n_old + n_added)"
            ),
        )
    )
