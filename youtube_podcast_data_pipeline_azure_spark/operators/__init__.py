from youtube_podcast_data_pipeline_azure_spark.operators import (
    dedup,
    medallion,
    multimodal,
    sampling,
    similarity,
)

__all__ = ["dedup", "medallion", "multimodal", "sampling", "similarity"]
