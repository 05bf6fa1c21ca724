"""Property-based checks (hypothesis): random inputs vs brute-force
references for the operators with the subtlest invariants."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.operators import joins
from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
    heavy_hitters_exact,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    items=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=300),
    denom=st.sampled_from([3, 5, 8]),
    parts=st.integers(min_value=1, max_value=7),
)
def test_heavy_hitters_exact_equals_bruteforce(spark, items, denom, parts):
    df = spark.createDataFrame([(i,) for i in items], "item long").repartition(parts)
    got = {
        (r.item, r.n)
        for r in heavy_hitters_exact(df, "item", denom=denom, k=denom * 4).collect()
    }
    n = len(items)
    from collections import Counter

    want = {
        (i, c) for i, c in Counter(items).items() if c * denom > n
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)),
        min_size=1, max_size=40, unique=True,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)),
        min_size=0, max_size=40, unique=True,
    ),
)
def test_asof_nearest_equals_bruteforce(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, k, s) for i, (k, s) in enumerate(lefts)],
        "id long, k long, sec long",
    ).selectExpr("id", "k", "timestamp_seconds(sec) AS ts")
    right = spark.createDataFrame(
        [(k, s, f"tag{k}_{s}") for k, s in rights] or [(99, 0, "x")],
        "k long, sec long, tag string",
    ).selectExpr("k", "timestamp_seconds(sec) AS ts", "tag")
    got = {
        r.id: r.asof_tag
        for r in joins.asof_join_nearest(left, right, on=["k"]).collect()
    }
    rset = rights or [(99, 0)]
    for i, (k, s) in enumerate(lefts):
        cands = [(rs, f"tag{k}_{rs}") for rk, rs in rset if rk == k]
        if not cands:
            assert got[i] is None
            continue
        # nearest by |delta|; tie -> backward (smaller timestamp)
        best = min(cands, key=lambda c: (abs(c[0] - s), c[0] > s))
        assert got[i] == best[1], (i, k, s, cands)
