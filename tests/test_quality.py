"""Data-quality expectations: single-scan compilation, correct counts,
row split with reasons, key checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.operators import quality as Q


def _df(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", -5.0),
        (3, None, 50.0),
        (4, "c", 200.0),
        (4, "a", None),
    ]
    return spark.createDataFrame(rows, "id long, cat string, v double")


def test_report_counts_each_expectation(spark):
    exps = [
        Q.not_null("cat"),
        Q.in_range("v", 0, 100),
        Q.in_set("cat", ["a", "b"]),
        Q.satisfies("id_positive", F.col("id") > 0),
    ]
    rep = {
        r.expectation: r for r in Q.expectation_report(_df(spark), exps).collect()
    }
    assert all(r.n_rows == 5 for r in rep.values())
    assert rep["not_null[cat]"].n_failed == 1
    assert rep["in_range[v]"].n_failed == 3  # -5, 200, and null fail
    assert rep["in_set[cat]"].n_failed == 2  # 'c' and null
    assert rep["id_positive"].n_failed == 0
    assert rep["id_positive"].pass_bp == 10000
    assert rep["not_null[cat]"].pass_bp == 8000


def test_report_is_single_scan_no_join(spark):
    exps = [Q.not_null("cat"), Q.in_range("v", 0, 100)]
    plan = (
        Q.expectation_report(_df(spark), exps)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    # one global aggregate -> exactly one exchange (the single-row agg)
    assert plan.count("Exchange") == 1


def test_split_partitions_rows_and_names_reasons(spark):
    exps = [Q.not_null("cat"), Q.in_range("v", 0, 100)]
    passing, failing = Q.split_by_expectations(_df(spark), exps)
    assert passing.count() + failing.count() == 5
    reasons = {
        r.id: sorted(r.failed_expectations) for r in failing.collect()
    }
    assert reasons[2] == ["in_range[v]"]
    assert reasons[3] == ["not_null[cat]"]
    assert 1 not in reasons


def test_unique_violations(spark):
    v = Q.unique_violations(_df(spark), ["id"]).collect()
    assert [(r.id, r.n_dupes) for r in v] == [(4, 2)]


def test_referential_violations(spark):
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    orphans = Q.referential_violations(_df(spark), "id", parent, "k").collect()
    assert {(r.id, r.n_orphans) for r in orphans} == {(4, 2)}


def test_table_fingerprint_order_independent_and_sensitive(spark):
    df = _df(spark)
    cols = ["id", "cat"]
    a = Q.table_fingerprint(df, cols).collect()[0]
    b = Q.table_fingerprint(df.orderBy(F.desc("v")).repartition(7), cols).collect()[0]
    assert (a.n_rows, a.xor_fp, a.sum_low20) == (b.n_rows, b.xor_fp, b.sum_low20)
    # any single-cell change flips the fingerprint
    mutated = df.withColumn(
        "cat", F.when(F.col("id") == 1, F.lit("zz")).otherwise(F.col("cat"))
    )
    c = Q.table_fingerprint(mutated, cols).collect()[0]
    assert (c.xor_fp, c.sum_low20) != (a.xor_fp, a.sum_low20)


def test_table_fingerprint_sees_duplicate_multiplicity(spark):
    """XOR alone is blind to duplicate PAIRS; the low-bit sum witness
    must catch them."""
    df = spark.createDataFrame([(1, "a")], "id long, cat string")
    doubled = df.unionAll(df).unionAll(df.withColumnRenamed("id", "id"))
    once = Q.table_fingerprint(df, ["id", "cat"]).collect()[0]
    thrice = Q.table_fingerprint(doubled, ["id", "cat"]).collect()[0]
    assert once.xor_fp == thrice.xor_fp  # odd multiplicity: XOR equal
    assert once.n_rows != thrice.n_rows
    assert once.sum_low20 != thrice.sum_low20


def test_snapshot_diff_classifies_all_three(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (4, "d", 40)], "k long, s string, v long"
    )
    got = {(r.k, r.change_type) for r in Q.snapshot_diff(old, new, ["k"]).collect()}
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


def test_snapshot_diff_null_values_compare_stably(spark):
    """NULL sentinel: a null value is 'unchanged' vs null, 'changed' vs
    a real value."""
    old = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
    new = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
    got = {(r.k, r.change_type) for r in Q.snapshot_diff(old, new, ["k"]).collect()}
    assert got == {(2, "changed")}


def test_functional_dependency_report(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.quality import (
        functional_dependency_report,
    )

    df = spark.createDataFrame(
        [(1, "us", "a"), (2, "us", "a"), (3, "de", "b"), (4, "de", "c")],
        ["id", "country", "zone"],
    )
    rows = {
        (r["determinant"], r["dependent"]): r
        for r in functional_dependency_report(
            df, [("id", "country"), ("country", "zone"), ("zone", "country")]
        ).collect()
    }
    assert rows[("id", "country")]["holds"] is True
    assert rows[("id", "country")]["n_violating_keys"] == 0
    # country 'de' maps to two zones -> violated
    assert rows[("country", "zone")]["holds"] is False
    assert rows[("country", "zone")]["n_violating_keys"] == 1
    # every zone maps to one country -> holds
    assert rows[("zone", "country")]["holds"] is True


def test_join_cardinality_report_exact(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.skew import (
        join_cardinality_report,
    )
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (9,)], ["k"]
    )
    right = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["j"])
    row = join_cardinality_report(left, right, "k", "j").collect()[0]
    assert row["n_left"] == 5 and row["n_right"] == 4
    assert row["n_left_keys"] == 3 and row["n_right_keys"] == 3
    assert row["n_matched_keys"] == 2
    # exact: key 1 -> 3*2=6, key 2 -> 1*1=1
    assert row["inner_rows"] == 7
    assert row["inner_rows"] == left.join(right, left.k == right.j).count()
    assert row["max_key_fanout"] == 6

    disjoint = spark.createDataFrame([(100,)], ["j"])
    row2 = join_cardinality_report(left, disjoint, "k", "j").collect()[0]
    assert (row2["inner_rows"], row2["max_key_fanout"]) == (0, 0)


def test_k_anonymity_hand_counted(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.quality import (
        k_anonymity_report,
    )

    rows = (
        [("A", "X")] * 3 + [("A", "Y")] * 1 + [("B", "X")] * 5
    )
    df = spark.createDataFrame(rows, ["nation", "segment"])
    out = {
        r["k"]: r
        for r in k_anonymity_report(
            df, ["nation", "segment"], k_thresholds=(2, 5)
        ).collect()
    }
    assert out[2]["n_classes"] == 3
    assert out[2]["n_classes_below_k"] == 1  # the singleton class
    assert out[2]["n_rows_at_risk"] == 1
    assert out[2]["min_class_size"] == 1
    assert out[5]["n_classes_below_k"] == 2  # sizes 1 and 3
    assert out[5]["n_rows_at_risk"] == 4


def test_ks_drift_hand_computed(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.quality import (
        ks_drift_report,
    )

    rows = [("a", v) for v in (1, 2, 3, 4)]
    rows += [("b", v) for v in (3, 4, 5, 6)]   # ECDF gap peaks at 1/2
    rows += [("c", v) for v in (1, 2, 3, 4)]   # identical to ref -> 0
    df = spark.createDataFrame(rows, "src string, x int")
    rep = {
        r["group"]: r
        for r in ks_drift_report(df, value_col="x", group_col="src").collect()
    }
    assert set(rep) == {"b", "c"}          # 'a' is the lexicographic ref
    assert rep["b"]["ks_bp"] == 5000
    assert rep["b"]["n_ref"] == 4 and rep["b"]["n_group"] == 4
    assert rep["c"]["ks_bp"] == 0


def test_ks_drift_explicit_reference_and_unbalanced_sizes(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.quality import (
        ks_drift_report,
    )

    # ref 'z' has 2 rows {1, 3}; 'a' has 4 rows {2, 2, 2, 4}:
    # ECDF gaps at v=1: 1/2-0; v=2: 1/2-3/4=1/4; v=3: 1-3/4=1/4 -> KS=1/2
    rows = [("z", 1), ("z", 3), ("a", 2), ("a", 2), ("a", 2), ("a", 4)]
    df = spark.createDataFrame(rows, "src string, x int")
    rep = ks_drift_report(
        df, value_col="x", group_col="src", reference="z"
    ).collect()
    assert len(rep) == 1 and rep[0]["group"] == "a"
    assert rep[0]["n_ref"] == 2 and rep[0]["n_group"] == 4
    assert rep[0]["ks_bp"] == 5000


def test_ks_drift_null_rows_are_excluded(spark):
    """ADVICE r7: NULL value/group rows are dropped up front — a NULL
    group fails both sides of the ref/other split and NULL values order
    differently in Spark vs DuckDB windows.  The report over a corpus
    with planted NULLs must equal the report over the non-null subset."""
    from youtube_podcast_data_pipeline_azure_spark.operators.quality import (
        ks_drift_report,
    )

    clean = [("a", v) for v in (1, 2, 3, 4)] + [("b", v) for v in (3, 4, 5, 6)]
    dirty = clean + [(None, 1), ("a", None), (None, None), ("b", None)]
    df_clean = spark.createDataFrame(clean, "src string, x int")
    df_dirty = spark.createDataFrame(dirty, "src string, x int")

    def rows(df):
        return sorted(
            tuple(r)
            for r in ks_drift_report(df, value_col="x", group_col="src").collect()
        )

    got = rows(df_dirty)
    assert got == rows(df_clean)
    # and the counts prove the null rows never entered the ECDFs
    assert got[0][1] == 4 and got[0][2] == 4


def test_inclusion_dependency_report(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.quality import (
        inclusion_dependency_report,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None), (5, 10)],
        "id long, fk int",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk int")
    out = inclusion_dependency_report(child, parent, [("fk", "pk")]).collect()[0]
    # distinct non-null fks: {10, 20, 99} — 99 orphaned, nulls excluded
    assert out.n_distinct == 3 and out.n_orphaned == 1
    assert out.containment_bp == 6666 and not out.holds

    full = inclusion_dependency_report(
        child.where("fk in (10, 20)"), parent, [("fk", "pk")]
    ).collect()[0]
    assert full.holds and full.containment_bp == 10000


def test_conditional_entropy_fd_strength(spark):
    """H(dep|det) = 0 exactly when the FD holds; hand-computed
    quantized value for a known violation; agreement with the boolean
    functional_dependency_report verdict."""
    import math

    from youtube_podcast_data_pipeline_azure_spark.operators.quality import (
        conditional_entropy_report,
        functional_dependency_report,
    )

    rows = [
        (1, "a", "x"), (2, "a", "x"),          # a -> x (clean)
        (3, "b", "x"), (4, "b", "y"),          # b violates: x,y 50/50
        (5, "c", "z"),
    ]
    df = spark.createDataFrame(rows, "id long, det string, dep string")
    out = {
        (r.determinant, r.dependent): r
        for r in conditional_entropy_report(df, [("det", "dep"), ("dep", "det")]).collect()
    }
    r1 = out[("det", "dep")]
    Lq = lambda k: math.floor(1e6 * math.log(k))
    # s1: c_a=2, c_b=2, c_c=1 -> 2Lq(2)+2Lq(2)+1Lq(1); s2: counts 2,1,1,1
    expected = (2 * Lq(2) + 2 * Lq(2) - (2 * Lq(2))) // 5
    assert r1.n_rows == 5 and r1.n_keys == 3
    assert r1.h_cond_micro == expected and not r1.holds
    fd = {
        (r.determinant, r.dependent): r.holds
        for r in functional_dependency_report(df, [("det", "dep"), ("dep", "det")]).collect()
    }
    for k in out:
        assert out[k].holds == fd[k]
        assert (out[k].h_cond_micro == 0) == out[k].holds or out[k].h_cond_micro >= 0


def test_trimmed_mean_rank_semantics(spark):
    """k lowest and k highest rows drop per group; an extreme outlier
    moves the raw mean but not the trimmed one."""
    from youtube_podcast_data_pipeline_azure_spark.operators.quality import (
        trimmed_mean_report,
    )

    vals = [10.0] * 18 + [0.01, 9999.0]  # 20 rows, one huge outlier
    rows = [(i, "g", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, src string, v double")
    out = trimmed_mean_report(df, "v", "id", "src", trim_bp=500).collect()[0]
    # k = 20*500//10000 = 1: drop the 0.01 and the 9999.0
    assert out.n_rows == 20 and out.n_used == 18
    assert out.trimmed_mean_microcents == 10_000_000  # 10.00 in micro-cents
    assert out.raw_mean_microcents > out.trimmed_mean_microcents
    # stable under repartition
    again = trimmed_mean_report(
        df.repartition(5), "v", "id", "src", trim_bp=500
    ).collect()[0]
    assert tuple(again) == tuple(out)


def test_corpus_diff_and_churn(spark):
    """corpus_diff/corpus_churn (r13, VERDICT r12 #7): doc-grain
    added/removed/changed between two curation runs, and the per-source
    rollup with exact integer churn rates.  A source MOVE counts as
    'changed' and buckets under the NEW source in both outputs."""
    from youtube_podcast_data_pipeline_azure_spark.operators.quality import (
        corpus_churn,
        corpus_diff,
    )

    old = spark.createDataFrame(
        [
            (1, "web", "alpha"),
            (2, "web", "beta"),
            (3, "web", "gamma"),
            (4, "wiki", "delta"),
            (5, "wiki", "epsilon"),
        ],
        "doc_id long, source string, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "web", "alpha"),          # stable
            (2, "web", "beta EDITED"),    # changed (text)
            (4, "web", "delta"),          # changed (source move wiki->web)
            (5, "wiki", "epsilon"),       # stable
            (6, "wiki", "zeta"),          # added
        ],                                 # 3 removed from old
        "doc_id long, source string, text string",
    )
    diff = {
        r.doc_id: (r.source, r.change_type)
        for r in corpus_diff(old, new).collect()
    }
    assert diff == {
        2: ("web", "changed"),
        3: ("web", "removed"),
        4: ("web", "changed"),
        6: ("wiki", "added"),
    }
    churn = {r.source: r.asDict() for r in corpus_churn(old, new).collect()}
    web = churn["web"]
    # doc 4 buckets under web (its NEW source): n_old counts it here too
    assert (web["n_old"], web["n_new"]) == (4, 3)
    assert (web["n_added"], web["n_removed"], web["n_changed"]) == (0, 1, 2)
    assert web["n_stable"] == 1
    assert web["churn_permille"] == 3 * 1000 // 4
    wiki = churn["wiki"]
    assert (wiki["n_old"], wiki["n_new"]) == (1, 2)
    assert (wiki["n_added"], wiki["n_removed"], wiki["n_changed"]) == (1, 0, 0)
    assert wiki["n_stable"] == 1
    assert wiki["churn_permille"] == 1000 // 2
