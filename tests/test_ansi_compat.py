"""The driver harness runs queries on a DEFAULT SparkSession — in Spark
4 that means ANSI mode ON.  Every query must therefore be ANSI-clean:
no silent-overflow arithmetic, no throwing casts (use try_cast), no
integer division by zero.  This sweep runs the riskiest queries (hash
arithmetic, string casts, duration parsing, division) under ANSI."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

# The driver's correctness check covers the FIRST 50 registry entries
# (the rotation window) — sweep exactly those, plus the historically
# riskiest queries regardless of window position.
RISKY = [
    "minhash_near_dup",      # Kirsch-Mitzenmacher hash arithmetic
    "simhash_near_dup",      # bit shifting / masking
    "safe_cast_props",       # null-on-error casts
    "iso_duration_parse",    # regexp + try_cast
    "videos_bronze_to_silver",  # try_cast of unparsable stats
    "knn_bruteforce",        # cosine division
    "math_functions",        # mod / sqrt / floor
]
_WINDOW = list(entry.queries())[:50]
SWEEP = _WINDOW + [n for n in RISKY if n not in _WINDOW]


@pytest.mark.parametrize("name", SWEEP)
def test_query_is_ansi_clean(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = entry.queries()[name](spark, sf_dir).collect()
        assert rows is not None
    finally:
        # restore the pre-test value, not a hardcoded default
        spark.conf.set("spark.sql.ansi.enabled", prev)
