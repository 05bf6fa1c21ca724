from youtube_podcast_data_pipeline_azure_spark.io.readers import (
    load_table,
    load_tables,
    read_json_envelope,
    TABLES,
)
from youtube_podcast_data_pipeline_azure_spark.io.writers import write_partitioned

__all__ = [
    "load_table",
    "load_tables",
    "read_json_envelope",
    "write_partitioned",
    "TABLES",
]
