"""Registry-wide plan invariants, shared by tools/ sweeps and
tests/test_plans.py.

Current invariants:

1. **Canonicalizer-safe result schemas** — no top-level array/map
   column in any registered query result (the driver's pandas
   ``sort_values`` canonicalizer crashes on list cells; the r9
   ``pq_codes`` window miss).
2. **Bounded unpartitioned windows** — every ``Window`` node with an
   empty partitionSpec (Spark funnels ALL rows into one task for
   these) must consume a provably bounded input: an ``Aggregate`` or
   ``GlobalLimit`` below it, or a subtree whose only leaves are
   literal ``LocalRelation``/``OneRowRelation`` tables.  The engine's
   only unpartitioned windows run over n_buckets-row aggregates
   (DSIR gram-total shares, zipf rank tables); this invariant stops a
   future operator from putting ``Window.orderBy`` over an unbounded
   scan — the classic 100-TB single-task meltdown.
"""

from __future__ import annotations

import json


def result_schema_hazards(df) -> list[str]:
    """Top-level array/map columns in ``df``'s result schema."""
    from pyspark.sql.types import ArrayType, MapType

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]


_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation"}
_BOUNDING_NODES = {"Aggregate", "GlobalLimit"}


def unbounded_global_windows(df) -> list[str]:
    """Unpartitioned Window nodes whose input is not provably bounded.

    Walks the OPTIMIZED logical plan (post-pushdown, pre-physical) via
    ``toJSON`` — a flat pre-order list where each node carries
    ``num-children``, so every node's subtree is a contiguous span.
    Returns a description per violation; empty list = invariant holds.
    """
    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())

    def span_end(i: int) -> int:
        j = i + 1
        for _ in range(nodes[i]["num-children"]):
            j = span_end(j)
        return j

    def cls(n) -> str:
        return n["class"].rsplit(".", 1)[-1]

    out: list[str] = []
    for i, n in enumerate(nodes):
        if cls(n) != "Window" or n.get("partitionSpec"):
            continue
        sub = nodes[i + 1 : span_end(i)]
        if any(cls(m) in _BOUNDING_NODES for m in sub):
            continue
        leaves = [m for m in sub if m["num-children"] == 0]
        if leaves and all(cls(m) in _BOUNDED_LEAVES for m in leaves):
            continue
        out.append(
            "unpartitioned Window over unbounded input (leaves: "
            + ", ".join(sorted({cls(m) for m in leaves}))
            + ")"
        )
    return out
