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

from pyspark.sql import Column, DataFrame
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
