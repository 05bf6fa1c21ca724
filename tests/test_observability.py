"""Observation-based pipeline metrics (operators/observability.py) —
the engine's A20: stage metrics accumulated during the consuming
action, not via a second scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
from youtube_podcast_data_pipeline_azure_spark.operators import observability


def test_observed_metrics_match_direct_aggregates(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    obs_df, obs = observability.observed(
        d,
        "m",
        {
            "rows_in": F.count(F.lit(1)),
            "total_chars": F.sum(F.length("text")),
        },
    )
    n = obs_df.count()
    got = obs.get
    assert got["rows_in"] == n
    direct = d.agg(F.sum(F.length("text"))).collect()[0][0]
    assert got["total_chars"] == direct


def test_observation_is_in_plan_not_a_second_scan(spark, sf_dir):
    """The metrics ride the consuming plan as a CollectMetrics node —
    no extra scan, no exchange introduced by observation itself."""
    d = load_table(spark, sf_dir, "documents")
    obs_df, obs = observability.observed(
        d, "m2", {"rows_in": F.count(F.lit(1))}
    )
    consumer = obs_df.where(F.length("text") > 10)
    plan = consumer._jdf.queryExecution().executedPlan().toString()
    assert plan.count("CollectMetrics") == 1
    assert plan.count("Scan ") == 1  # still exactly one table scan
    assert "Exchange" not in plan


def test_run_with_metrics_returns_one_row_df(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    obs_df, obs = observability.observed(
        d, "m3", {"b": F.count(F.lit(1)), "a": F.sum(F.lit(2))}
    )
    out = observability.run_with_metrics(spark, obs_df, obs)
    rows = out.collect()
    assert out.columns == ["a", "b"]  # stable sorted schema
    assert len(rows) == 1
    assert rows[0]["b"] == d.count()


def test_collect_with_metrics_returns_result_and_metrics(spark, sf_dir):
    """The non-discarding twin: one action yields BOTH the pipeline
    result and the observation — no double-acting the plan."""
    d = load_table(spark, sf_dir, "documents")
    obs_df, obs = observability.observed(
        d, "m4", {"rows_in": F.count(F.lit(1))}
    )
    kept = obs_df.where(F.length("text") > 10)
    result, metrics = observability.collect_with_metrics(
        spark, kept, obs, action="collect"
    )
    mrow = metrics.collect()[0]
    assert mrow["rows_in"] == d.count()  # metric point = pre-filter
    assert len(result) == d.where(F.length("text") > 10).count()
