"""Pipeline observability: in-flight row/quality metrics without extra
passes.

Reference parity (A20, SURVEY.md §2.A): the reference prints
``Processed {i}/{len(items)}`` every 5 rows inside its enrichment loop
(``gold_sentiment_comments.py:85-86``).  A driver-side print is not a
data operator — but the *intent* (know how many rows a stage processed
and dropped, while it runs) is, and Spark has a first-class mechanism
for it: the ``Observation`` API attaches aggregate expressions to a
point IN the plan, accumulated task-side during the action that
consumes the DataFrame — zero extra scans, zero extra jobs, unlike a
separate ``.count()`` audit pass (which at 100 TB would double the
read).

:func:`observed` tags any DataFrame with named metric expressions;
:func:`run_with_metrics` executes the pipeline and returns the metrics
as a 1-row DataFrame — the engine's equivalent of the reference's
progress counter, but exact, distributed, and free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession


def observed(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate ``metrics`` to this point of the plan.

    The returned DataFrame is the same data; the Observation fills when
    the first action on it completes.  Metrics are computed inside the
    consuming job's tasks (an ``CollectMetrics`` plan node) — no second
    scan.
    """
    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


def run_with_metrics(
    spark: SparkSession,
    df: DataFrame,
    obs: Observation,
    action: str = "count",
) -> DataFrame:
    """Run ``action`` on ``df`` and return the observation's metrics as
    a 1-row DataFrame (sorted column order for a stable schema).

    The action's result is discarded — pipelines that need BOTH the
    action's result and the metrics should use
    :func:`collect_with_metrics`, which pays for exactly one action.
    Metrics are plain aggregates of the observed subplan, so they are
    deterministic and (for SQL-expressible metrics) oracle-checkable.
    """
    getattr(df, action)()
    got = obs.get
    cols = sorted(got)
    row = [tuple(got[c] for c in cols)]
    return spark.createDataFrame(row, cols)


def collect_with_metrics(
    spark: SparkSession,
    df: DataFrame,
    obs: Observation,
    action: str = "count",
):
    """Run ``action`` on ``df`` once and return
    ``(result, metrics_df)`` — the action's own result plus the
    observation as a 1-row DataFrame (sorted column order).

    This is the non-discarding twin of :func:`run_with_metrics`: the
    metrics ride along inside the SAME job (``CollectMetrics``
    accumulates task-side), so a pipeline that writes a sink or
    collects a result gets its row/quality counters for free instead
    of double-acting the plan.
    """
    result = getattr(df, action)()
    got = obs.get
    cols = sorted(got)
    row = [tuple(got[c] for c in cols)]
    return result, spark.createDataFrame(row, cols)
