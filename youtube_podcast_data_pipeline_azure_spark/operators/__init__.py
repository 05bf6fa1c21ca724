from youtube_podcast_data_pipeline_azure_spark.operators import (
    analytics,
    dedup,
    medallion,
    multimodal,
    sampling,
    similarity,
)

__all__ = [
    "analytics",
    "dedup",
    "medallion",
    "multimodal",
    "sampling",
    "similarity",
]
