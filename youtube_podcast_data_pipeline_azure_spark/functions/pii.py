"""PII detection and redaction expressions.

A web-scale training corpus must be scrubbed of personally identifiable
information before pretraining.  The reference has no analog (its corpus
is public YouTube metadata); this pack is part of the engine's
training-data-pipeline surface (SURVEY.md §2.C): detect emails, phone
numbers, and IPv4 addresses with deterministic regexes, count them per
document, and rewrite the text with typed placeholders.

Everything is built-in `regexp_extract_all` / `regexp_replace` — JVM-side,
whole-stage-codegen, no Python in the hot path.  The patterns are chosen
to be valid in BOTH Java regex (Spark) and RE2 (DuckDB) — no
backreferences, no lookaround — so the SQL twins below are generated
from the same constants and can never drift.

At 100 TB: detection+redaction is a pure per-row map over the scan —
zero shuffles, filter-pushdown friendly; the only output wider than the
input is the redacted text itself, which is never larger than the
original plus placeholder slack.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: kind -> (pattern, placeholder).  Dict order is the redaction order:
#: emails first (their local parts may contain digits/dots that the
#: looser numeric patterns would otherwise nibble at), then IPv4 (dotted
#: digits), then phones (dashed digits — disjoint from IPv4 by
#: separator, so order between those two is immaterial but fixed).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "phone": (r"\b\d{3}-\d{4}\b", "[PHONE]"),
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind in the text (long)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0)).cast("long")


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its typed placeholder, in the fixed
    :data:`PII_PATTERNS` order."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, placeholder in PII_PATTERNS.values():
        c = F.regexp_replace(c, pattern, placeholder)
    return c


def pii_count_sql(col_sql: str, kind: str) -> str:
    """DuckDB twin of :func:`pii_count`, generated from the same pattern."""
    pattern, _ = PII_PATTERNS[kind]
    return f"cast(len(regexp_extract_all({col_sql}, '{pattern}')) AS bigint)"


def redact_pii_sql(col_sql: str) -> str:
    """DuckDB twin of :func:`redact_pii` (same patterns, same order;
    the 'g' flag matches Spark's replace-all default)."""
    expr = col_sql
    for pattern, placeholder in PII_PATTERNS.values():
        expr = f"regexp_replace({expr}, '{pattern}', '{placeholder}', 'g')"
    return expr
