"""Spark 4 Python Data Source: the video feed as a first-class
``spark.read.format("youtube_videos")`` connector.

``io/rest.py`` implements the reference's ingestion choreography
(function_app.py:36-87) as driver-side fetch + ``mapInPandas``.  This
module exposes the same feed through the OTHER Spark-native custom
source surface — the Python Data Source API (SPARK-44076, new in
Spark 4) — so a user gets a real ``DataFrameReader`` entry point with
options, schema, and partition planning, instead of calling an
ingest function.

Connector anatomy (the shape any production REST/paged source takes):

* **Planning (driver)** — reads ONLY the id column of the simulated
  remote feed (metadata-sized, like the reference's step-2 playlist id
  scan), applies the ``max_results`` LIMIT pushdown at the source, and
  chunks ids into :class:`~pyspark.sql.datasource.InputPartition`\\ s of
  ``chunk`` ids (50 = the YouTube API's per-call detail cap).
* **Read (executors)** — each task "fetches details" for its chunk: a
  pyarrow read with an ``o_orderkey IN (...)`` filter (row-group
  predicate pushdown), conformed to the same BRONZE_VIDEO_ITEM rows
  ``io/rest.py`` produces.  One task per chunk, no driver fan-in.

The simulated feed derives rows from ``orders.parquet`` exactly like
the canned REST fixture, so the silver flatten downstream is
byte-comparable with the ``rest_ingest_videos`` oracle.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from youtube_podcast_data_pipeline_azure_spark.schemas import BRONZE_VIDEO_ITEM

#: per-detail-call id cap (public YouTube API limit, reference
#: function_app.py batches ids the same way).
DEFAULT_CHUNK = 50


def _video_row(r: dict) -> tuple:
    """Conform one simulated feed record to BRONZE_VIDEO_ITEM (same
    value logic as the canned REST fixture so oracles are shared)."""
    k, c = r["o_orderkey"], r["o_custkey"]
    return (
        f"vid{k}",
        (
            f"{r['o_orderpriority']} order {k}",
            r["o_orderdate"].strftime("%Y-%m-%d %H:%M:%S"),
            f"chan{c % 10}",
        ),
        (
            "N/A" if k % 97 == 0 else str(int(r["o_totalprice"])),
            None if k % 5 == 0 else str(k % 1000),
            str(c % 100),
        ),
        (f"PT{k % 60}M{c % 60}S",),
    )


class VideosReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.sf_dir = options["sf_dir"]
        self.max_results = int(options.get("max_results", 500))
        self.chunk = int(options.get("chunk", DEFAULT_CHUNK))

    def partitions(self) -> list[InputPartition]:
        # Driver-side id scan: single metadata-sized column, LIMIT
        # pushed into the source (lowest max_results keys).
        import pyarrow.parquet as pq

        keys = (
            pq.read_table(
                f"{self.sf_dir}/orders.parquet", columns=["o_orderkey"]
            )
            .column("o_orderkey")
            .to_pylist()
        )
        keys = sorted(keys)[: self.max_results]
        return [
            InputPartition(keys[i : i + self.chunk])
            for i in range(0, len(keys), self.chunk)
        ]

    def read(self, partition: InputPartition):
        # Executor-side detail fetch for this chunk only: pyarrow
        # filter -> row-group pruning on the simulated feed.
        import pyarrow.parquet as pq

        ids = partition.value
        rows = pq.read_table(
            f"{self.sf_dir}/orders.parquet",
            columns=[
                "o_orderkey",
                "o_custkey",
                "o_orderdate",
                "o_orderpriority",
                "o_totalprice",
            ],
            filters=[("o_orderkey", "in", ids)],
        ).to_pylist()
        rows.sort(key=lambda r: r["o_orderkey"])
        for r in rows:
            yield _video_row(r)


class VideosDataSource(DataSource):
    """``spark.read.format("youtube_videos").option("sf_dir", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "youtube_videos"

    def schema(self):
        return BRONZE_VIDEO_ITEM

    def reader(self, schema) -> VideosReader:
        return VideosReader(self.options)

    def streamReader(self, schema) -> "VideosStreamReader":
        return VideosStreamReader(self.options)


class VideosStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the same simulated feed: the streaming
    twin of the reference's TIMER-triggered ingestion
    (``function_app.py:36-44`` — a cron poll that fetches the next
    videos each run), expressed as a Spark 4 Python Data Source
    streaming reader.

    Offsets are ``{"index": n}`` positions into the sorted id list —
    JSON-checkpointable, so a restarted query resumes exactly where the
    checkpoint says.  ``latestOffset`` advances at most ``batch_ids``
    per trigger (the feed-poll page size); ``partitions`` re-chunks the
    (start, end) id range into the same ≤``chunk``-id executor tasks as
    the batch reader — detail fetch stays distributed and the driver
    only ever touches the metadata-sized id column.
    """

    def __init__(self, options: dict) -> None:
        self.sf_dir = options["sf_dir"]
        self.max_results = int(options.get("max_results", 500))
        self.batch_ids = int(options.get("batch_ids", 100))
        self.chunk = int(options.get("chunk", DEFAULT_CHUNK))
        import pyarrow.parquet as pq

        keys = (
            pq.read_table(
                f"{self.sf_dir}/orders.parquet", columns=["o_orderkey"]
            )
            .column("o_orderkey")
            .to_pylist()
        )
        self.keys = sorted(keys)[: self.max_results]
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # rate-limited poll: at most batch_ids new ids become visible
        # per trigger (the page size of the simulated feed poll)
        self._pos = min(self._pos + self.batch_ids, len(self.keys))
        return {"index": self._pos}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # restart healing: a fresh reader's rate limiter starts at 0,
        # but the checkpoint may hand us a later start — jump the poll
        # position forward so the next latestOffset() advances PAST the
        # checkpoint instead of replanning history (end <= start plans
        # an empty batch, never a negative range)
        self._pos = max(self._pos, start["index"])
        ids = self.keys[start["index"]:end["index"]]
        return [
            InputPartition(ids[i : i + self.chunk])
            for i in range(0, len(ids), self.chunk)
        ]

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        ids = partition.value
        rows = pq.read_table(
            f"{self.sf_dir}/orders.parquet",
            columns=[
                "o_orderkey",
                "o_custkey",
                "o_orderdate",
                "o_orderpriority",
                "o_totalprice",
            ],
            filters=[("o_orderkey", "in", ids)],
        ).to_pylist()
        rows.sort(key=lambda r: r["o_orderkey"])
        for r in rows:
            yield _video_row(r)

    def commit(self, end: dict) -> None:
        pass
