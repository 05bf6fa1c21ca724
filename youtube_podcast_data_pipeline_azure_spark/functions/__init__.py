from youtube_podcast_data_pipeline_azure_spark.functions.durations import iso8601_duration_seconds
from youtube_podcast_data_pipeline_azure_spark.functions.json_utils import parse_json_with_fallback
from youtube_podcast_data_pipeline_azure_spark.functions.text import (
    clean_text,
    language_id,
    quality_score,
    rolling_fingerprint,
    token_count_bpe,
    tokenize,
    word_count,
)
from youtube_podcast_data_pipeline_azure_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "iso8601_duration_seconds",
    "parse_json_with_fallback",
    "clean_text",
    "language_id",
    "quality_score",
    "rolling_fingerprint",
    "token_count_bpe",
    "tokenize",
    "word_count",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
