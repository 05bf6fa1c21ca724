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

* **Planning (driver)** — a genuinely bounded id scan of the simulated
  remote feed (like the reference's step-2 playlist id scan): the
  ``max_results`` LIMIT is pushed INTO the read — Arrow batches stream
  through a smallest-k buffer and row groups whose min-id statistic
  exceeds the current k-th smallest are skipped (``_lowest_keys``), so
  planning memory is O(max_results) however large the feed grows.  The
  surviving ids chunk into
  :class:`~pyspark.sql.datasource.InputPartition`\\ s of ``chunk`` ids
  (50 = the YouTube API's per-call detail cap).
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


def _lowest_keys(sf_dir: str, k: int, batch_rows: int = 65536) -> list[int]:
    """The lowest ``k`` feed ids, with BOUNDED driver memory — the real
    LIMIT pushdown for planning.

    Never materializes the id column: streams it row-group by
    row-group in Arrow batches, keeps only a running smallest-``k``
    buffer (``np.partition`` — O(batch + k) resident), and once the
    buffer is full SKIPS every remaining row group whose min statistic
    already exceeds the current k-th smallest (on an id-sorted feed
    file, that prunes the scan to ~``k`` rows of IO).  Driver planning
    cost is O(k) memory regardless of feed size.
    """
    import numpy as np
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/orders.parquet")
    meta = pf.metadata
    if meta.num_row_groups == 0 or k <= 0:
        return []
    cidx = next(
        i
        for i in range(meta.row_group(0).num_columns)
        if meta.row_group(0).column(i).path_in_schema == "o_orderkey"
    )
    best = np.empty(0, dtype="int64")
    kth: int | None = None  # current k-th smallest, once buffer is full
    for rg in range(meta.num_row_groups):
        stats = meta.row_group(rg).column(cidx).statistics
        if (
            kth is not None
            and stats is not None
            and stats.has_min_max
            and stats.min > kth
        ):
            continue
        for batch in pf.iter_batches(
            batch_size=batch_rows, row_groups=[rg], columns=["o_orderkey"]
        ):
            arr = batch.column(0).to_numpy(zero_copy_only=False)
            best = np.concatenate([best, arr.astype("int64", copy=False)])
            if len(best) >= k:
                best = np.partition(best, k - 1)[:k]
                kth = int(best.max())
    return sorted(int(x) for x in best)


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


def _vid_to_key(v) -> int | None:
    """``'vid<k>'`` → feed key ``k``; None for values no feed row can
    ever match (wrong prefix / non-numeric), which prune to nothing."""
    if isinstance(v, str) and v.startswith("vid") and v[3:].isdigit():
        return int(v[3:])
    return None


class VideosReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.sf_dir = options["sf_dir"]
        self.max_results = int(options.get("max_results", 500))
        self.chunk = int(options.get("chunk", DEFAULT_CHUNK))
        #: intersection of pushed id predicates, or None = unfiltered
        self.allowed_keys: set[int] | None = None

    def partitions(self) -> list[InputPartition]:
        # Driver-side planning scan: LIMIT pushed into the source —
        # bounded smallest-k streaming read with row-group stats
        # pruning, never the whole id column (see _lowest_keys).
        keys = _lowest_keys(self.sf_dir, self.max_results)
        if self.allowed_keys is not None:
            # pushed id predicates prune BEFORE chunking: fewer detail
            # calls, and an empty intersection plans zero partitions
            keys = [k for k in keys if k in self.allowed_keys]
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


class VideosPushdownReader(VideosReader):
    """Opt-in predicate-pushdown variant (``option("pushdown",
    "true")``): equality/membership predicates on the feed's natural
    key (``id``) are consumed at planning — exactly what a REST detail
    endpoint supports natively (the reference fetches videos BY ID,
    function_app.py:63-66) — so they prune partitions and never become
    a Spark Filter node; everything else is yielded back for Spark to
    evaluate post-scan.  Pushed sets intersect (the list is an AND);
    an empty intersection plans ZERO partitions, so a provably-empty
    scan never contacts the feed.

    A separate subclass, not a method on :class:`VideosReader`:
    Spark 4.1 refuses to initialize any reader that OVERRIDES
    ``pushFilters`` while ``spark.sql.python.filterPushdown.enabled``
    is false (the default), and the driver harness runs plain
    sessions — the default reader must keep working there.  Callers
    opting in must also arm that conf (runtime-settable).
    """

    def pushFilters(self, filters):
        from pyspark.sql.datasource import EqualTo, In

        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("id",):
                keys = {_vid_to_key(f.value)} - {None}
            elif isinstance(f, In) and f.attribute == ("id",):
                keys = {_vid_to_key(v) for v in f.value} - {None}
            else:
                yield f  # unsupported: Spark evaluates it post-scan
                continue
            self.allowed_keys = (
                keys
                if self.allowed_keys is None
                else self.allowed_keys & keys
            )


class VideosDataSource(DataSource):
    """``spark.read.format("youtube_videos").option("sf_dir", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "youtube_videos"

    def schema(self):
        return BRONZE_VIDEO_ITEM

    def reader(self, schema) -> VideosReader:
        if self.options.get("pushdown", "").lower() == "true":
            return VideosPushdownReader(self.options)
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
        # same bounded planning read as the batch reader: the stream's
        # id universe is the pushed-down LIMIT prefix, O(max_results)
        # driver memory, not the full feed id column
        self.keys = _lowest_keys(self.sf_dir, self.max_results)
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
