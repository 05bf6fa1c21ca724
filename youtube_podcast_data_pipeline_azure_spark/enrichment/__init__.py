from youtube_podcast_data_pipeline_azure_spark.enrichment.classifier import (
    Classifier,
    DeterministicClassifier,
    OpenAICompatClassifier,
)
from youtube_podcast_data_pipeline_azure_spark.enrichment.enrich import (
    enrich_comments,
    enrich_videos,
)

__all__ = [
    "Classifier",
    "DeterministicClassifier",
    "OpenAICompatClassifier",
    "enrich_comments",
    "enrich_videos",
]
