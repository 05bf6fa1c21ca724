from youtube_podcast_data_pipeline_azure_spark.operators import dedup, medallion, multimodal, similarity

__all__ = ["dedup", "medallion", "multimodal", "similarity"]
