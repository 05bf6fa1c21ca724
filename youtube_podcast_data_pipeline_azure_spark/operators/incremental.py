"""Incremental aggregation: mergeable per-batch summaries.

The reference recomputes its KPIs from scratch every run
(final_kpis.py reads everything, recounts).  At 100 TB that's the
wrong shape: a daily pipeline should aggregate ONLY the new partition
and MERGE it into the running summary table.  That works exactly when
every measure is a mergeable (commutative-monoid) aggregate: count and
sum merge by sum, min by min, max by max — so the summary table stores
partials and `merge_summaries(prev, aggregate_batch(new))` equals the
full recomputation, bit for bit.  (avg is derived downstream as
sum/count; never store it — it doesn't merge.)

Scale notes: the incremental path touches one day of data plus a
key-grain summary (tiny); the merge is a union + one groupBy on the
summary grain.  The equivalence to full recomputation is what the
``incremental_agg`` oracle query checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure kind -> (batch aggregate fn, merge aggregate fn)
MERGEABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def aggregate_batch(
    batch: DataFrame, keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate one batch to the summary grain.  ``spec`` maps output
    column -> (kind, source column), kind ∈ MERGEABLE."""
    aggs = []
    for out, (kind, src) in spec.items():
        batch_fn, _ = MERGEABLE[kind]
        aggs.append(batch_fn(src).alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def merge_summaries(
    summaries: list[DataFrame], keys: list[str], spec: dict[str, tuple[str, str]]
) -> DataFrame:
    """Merge any number of partial summaries into one — union + one
    groupBy applying each measure's merge function.  Associative and
    order-independent, so daily partials can roll up to weeks/months
    the same way."""
    merged = summaries[0]
    for s in summaries[1:]:
        merged = merged.unionByName(s)
    aggs = []
    for out, (kind, _) in spec.items():
        _, merge_fn = MERGEABLE[kind]
        aggs.append(merge_fn(out).alias(out))
    return merged.groupBy(*keys).agg(*aggs)
