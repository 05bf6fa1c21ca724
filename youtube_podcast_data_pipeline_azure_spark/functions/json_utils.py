"""JSON parsing with fallback defaults.

The reference parses LLM JSON output defensively: on malformed JSON it
substitutes a neutral record and stuffs the raw text (truncated to 200
chars) into ``summary`` (reference gold_sentiment_comments.py:46-50; a
real malformed-output row survives in
comments_with_sentiment.json:69-77).

Spark's ``from_json`` yields null on malformed input — composing it
with ``coalesce`` per field reproduces the reference's fallback exactly,
entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_json_with_fallback(
    col: Column | str,
    schema: T.StructType | str,
    defaults: dict[str, object] | None = None,
    raw_field: str | None = None,
    raw_truncate: int = 200,
) -> Column:
    """Parse a JSON string column into a struct, null fields -> defaults.

    ``defaults`` maps field name -> literal fallback value.  If
    ``raw_field`` is given, that struct field receives the *raw input
    string truncated to ``raw_truncate`` chars* whenever parsing failed
    — the reference's exact malformed-LLM-output behavior
    (gold_sentiment_comments.py:50: ``content[:200]``).
    """
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    # PERMISSIVE from_json yields a struct of nulls (not a null struct) on
    # malformed input, so failure is detected via the corrupt-record
    # column idiom: a schema-level _corrupt field that from_json fills
    # with the raw string exactly when parsing failed.
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    parsed = F.from_json(
        c, parse_schema, {"columnNameOfCorruptRecord": "_corrupt", "mode": "PERMISSIVE"}
    )
    failed = parsed.isNull() | parsed.getField("_corrupt").isNotNull()

    defaults = defaults or {}
    fields = []
    for f in schema.fields:
        val = parsed.getField(f.name)
        if f.name == raw_field:
            val = F.when(failed, F.substring(c, 1, raw_truncate)).otherwise(val)
        if f.name in defaults:
            val = F.coalesce(val, F.lit(defaults[f.name]).cast(f.dataType))
        fields.append(val.alias(f.name))
    return F.struct(*fields)


def flatten_struct(df: DataFrame, struct_col: str) -> DataFrame:
    """Splat a struct column's fields alongside the existing columns and
    drop the struct — the reference's enrich-and-merge ``{**c, **result}``
    (gold_sentiment_comments.py:76-82) as a projection."""
    others = [c for c in df.columns if c != struct_col]
    return df.select(*others, f"{struct_col}.*")
