"""REST ingestion source: choreography, pushdowns, error containment.

Mirrors reference function_app.py behavior with zero network — the
CannedTransport records every request so the tests can assert that the
``part=`` projection and ``maxResults`` limit actually reached the
request parameters (the reference's pushdowns, function_app.py:49,58,
66,97-99)."""

from __future__ import annotations

import pytest

from youtube_podcast_data_pipeline_azure_spark.io import rest


def _video_fixture_transport():
    details = {
        f"v{i}": {
            "id": f"v{i}",
            "snippet": {
                "title": f"title {i}",
                "publishedAt": f"2024-01-{i + 1:02d} 00:00:00",
                "channelTitle": "chan",
            },
            "statistics": {
                "viewCount": str(100 * i),
                "likeCount": None if i % 2 else str(i),
                "commentCount": str(i),
            },
            "contentDetails": {"duration": f"PT{i}M0S"},
        }
        for i in range(120)
    }
    return rest.CannedTransport(
        routes={
            "channels": lambda p: {
                "items": [
                    {
                        "contentDetails": {
                            "relatedPlaylists": {"uploads": "UPLOADS"}
                        }
                    }
                ]
            },
            "playlistItems": lambda p: {
                "items": [
                    {"contentDetails": {"videoId": f"v{i}"}}
                    for i in range(int(p["maxResults"]))
                ]
            },
            "videos": lambda p: {
                "items": [details[v] for v in p["id"].split(",")]
            },
        }
    )


def test_video_ingest_choreography_and_pushdowns(spark):
    tr = _video_fixture_transport()
    src = rest.YouTubeSource(tr, api_key="k")
    df = rest.ingest_videos(spark, src, "CH", max_results=120)

    endpoints = [c[0] for c in tr.calls]
    # 3-step: channel -> playlist -> chunked details (120 ids = 3 chunks)
    assert endpoints == ["channels", "playlistItems", "videos", "videos", "videos"]

    by_ep = {ep: params for ep, params in tr.calls}
    # projection pushdown (reference function_app.py:49,57,66)
    assert by_ep["channels"]["part"] == "contentDetails"
    assert by_ep["playlistItems"]["part"] == "contentDetails"
    assert by_ep["videos"]["part"] == "snippet,statistics,contentDetails"
    # limit pushdown (reference function_app.py:58)
    assert by_ep["playlistItems"]["maxResults"] == 120
    # chunking respects the API's 50-id cap
    for ep, params in tr.calls:
        if ep == "videos":
            assert len(params["id"].split(",")) <= 50

    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 120
    assert rows["v3"].snippet.title == "title 3"
    assert rows["v3"].statistics.likeCount is None  # odd i -> null likes
    assert rows["v2"].statistics.viewCount == "200"
    assert rows["v2"].contentDetails.duration == "PT2M0S"


def test_comment_ingest_flatten_and_cap(spark):
    def threads(p):
        vid = p["videoId"]
        n = int(p["maxResults"])
        return {
            "items": [
                {
                    "snippet": {
                        "topLevelComment": {
                            "id": f"{vid}-c{i}",
                            "snippet": {
                                "authorDisplayName": f"a{i}",
                                "textDisplay": f"text {i}",
                                "likeCount": i,
                                "publishedAt": "2024-01-01 00:00:00",
                            },
                        }
                    }
                }
                for i in range(min(n, 7))
            ]
        }

    tr = rest.CannedTransport(routes={"commentThreads": threads})
    src = rest.YouTubeSource(tr, api_key="k")
    df = rest.ingest_comments(
        spark, src, ["a", "b"], max_comments_per_video=250
    )
    rows = df.collect()
    assert len(rows) == 14
    # the min(_, 100) cap reached the request (function_app.py:99)
    assert all(p["maxResults"] == 100 for ep, p in tr.calls)
    assert all(p["part"] == "snippet" for ep, p in tr.calls)
    assert all(p["textFormat"] == "plainText" for ep, p in tr.calls)
    one = {r.commentId: r for r in rows}["a-c3"]
    # flatten parity with function_app.py:131-138
    assert (one.videoId, one.author, one.text, one.likes) == (
        "a", "a3", "text 3", 3,
    )
    assert one.error is None


def test_comment_ingest_error_containment(spark):
    def threads(p):
        if p["videoId"] == "bad":
            raise RuntimeError("quotaExceeded")
        return {
            "items": [
                {
                    "snippet": {
                        "topLevelComment": {
                            "id": "ok-1",
                            "snippet": {
                                "authorDisplayName": "a",
                                "textDisplay": "t",
                                "likeCount": 1,
                                "publishedAt": "2024-01-01 00:00:00",
                            },
                        }
                    }
                }
            ]
        }

    tr = rest.CannedTransport(routes={"commentThreads": threads})
    src = rest.YouTubeSource(tr, api_key="k")
    rows = rest.ingest_comments(spark, src, ["good", "bad"]).collect()
    by_vid = {r.videoId: r for r in rows}
    assert by_vid["good"].error is None
    assert by_vid["good"].commentId == "ok-1"
    # one error record for the failed video, job did not abort
    assert by_vid["bad"].error == "RuntimeError"
    assert by_vid["bad"].commentId is None


def test_http_transport_pickles_without_session():
    import pickle

    tr = rest.HttpTransport(timeout=7)
    tr._session = object()  # unpicklable sentinel
    tr2 = pickle.loads(pickle.dumps(tr))
    assert tr2.timeout == 7 and tr2._session is None


def test_missing_fields_become_nulls(spark):
    """Defensive dict.get parity: absent snippet/statistics fields must
    land as nulls, not raise (reference silver_transform_videos.py:24-27)."""
    tr = rest.CannedTransport(
        routes={
            "channels": lambda p: {
                "items": [
                    {"contentDetails": {"relatedPlaylists": {"uploads": "U"}}}
                ]
            },
            "playlistItems": lambda p: {
                "items": [{"contentDetails": {"videoId": "x"}}]
            },
            "videos": lambda p: {"items": [{"id": "x", "snippet": {"title": "t"}}]},
        }
    )
    src = rest.YouTubeSource(tr, api_key="k")
    row = rest.ingest_videos(spark, src, "CH", max_results=1).collect()[0]
    assert row.id == "x" and row.snippet.title == "t"
    assert row.statistics.viewCount is None
    assert row.contentDetails.duration is None


# ---------------------------------------------------------------------------
# Spark 4 Python Data Source connector (io/pyds.py)
# ---------------------------------------------------------------------------


def test_python_datasource_partition_planning(sf_dir):
    from youtube_podcast_data_pipeline_azure_spark.io.pyds import VideosReader

    r = VideosReader({"sf_dir": sf_dir, "max_results": "120", "chunk": "50"})
    parts = r.partitions()
    # LIMIT pushdown at planning: 120 ids -> ceil(120/50) = 3 chunks
    assert [len(p.value) for p in parts] == [50, 50, 20]
    # chunks are disjoint, sorted, and cover the lowest keys
    all_ids = [k for p in parts for k in p.value]
    assert all_ids == sorted(all_ids) and len(set(all_ids)) == 120


def test_python_datasource_read_matches_rest_connector(spark, sf_dir):
    """Both connector surfaces must land byte-identical silver rows."""
    import __spark_entry__ as entry

    a = entry.q_python_datasource_videos(spark, sf_dir)
    b = entry.q_rest_ingest_videos(spark, sf_dir)
    assert a.columns == b.columns
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_python_datasource_respects_max_results(spark, sf_dir):
    from youtube_podcast_data_pipeline_azure_spark.io.pyds import VideosDataSource

    spark.dataSource.register(VideosDataSource)
    n = (
        spark.read.format("youtube_videos")
        .option("sf_dir", sf_dir)
        .option("max_results", "7")
        .load()
        .count()
    )
    assert n == 7


def test_pyds_stream_equals_batch_any_batch_size(spark, sf_dir):
    """The streaming reader must land exactly the batch reader's rows
    regardless of the per-trigger id page size (odd size forces a
    ragged final micro-batch)."""
    import time

    from youtube_podcast_data_pipeline_azure_spark.io.pyds import VideosDataSource

    spark.dataSource.register(VideosDataSource)
    stream = (
        spark.readStream.format("youtube_videos")
        .option("sf_dir", sf_dir)
        .option("max_results", "500")
        .option("batch_ids", "37")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_parity")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.table("pyds_parity").count() >= 500:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    batch = (
        spark.read.format("youtube_videos")
        .option("sf_dir", sf_dir)
        .option("max_results", "500")
        .load()
    )
    a = sorted(map(tuple, spark.table("pyds_parity").collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(a) == 500
    assert a == b


def test_pyds_stream_reader_offsets_and_restart_healing(sf_dir):
    """Offset arithmetic without a Spark session: rate-limited
    latestOffset pages, ragged tail, and the restart case where the
    checkpoint start is AHEAD of a fresh reader's rate limiter (must
    plan an empty batch and jump the poll position forward, never a
    negative range)."""
    from youtube_podcast_data_pipeline_azure_spark.io.pyds import VideosStreamReader

    r = VideosStreamReader(
        {"sf_dir": sf_dir, "max_results": "250", "batch_ids": "100"}
    )
    assert r.initialOffset() == {"index": 0}
    assert r.latestOffset() == {"index": 100}
    assert r.latestOffset() == {"index": 200}
    assert r.latestOffset() == {"index": 250}   # ragged tail, then clamps
    assert r.latestOffset() == {"index": 250}
    parts = r.partitions({"index": 0}, {"index": 100})
    assert [len(p.value) for p in parts] == [50, 50]

    # fresh reader (simulated restart) with a checkpoint ahead of it
    r2 = VideosStreamReader(
        {"sf_dir": sf_dir, "max_results": "250", "batch_ids": "100"}
    )
    assert r2.latestOffset() == {"index": 100}  # trails the checkpoint
    assert r2.partitions({"index": 200}, {"index": 100}) == []  # heals, no negative range
    assert r2.latestOffset() == {"index": 250}  # jumped past the checkpoint


# ---------------------------------------------------------------------------
# gold_export Python Data Source WRITER (two-phase commit)
# ---------------------------------------------------------------------------


def _export_write(spark, tmp_path, rows, mode="append", parts=3):
    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        GoldExportDataSource,
    )

    spark.dataSource.register(GoldExportDataSource)
    df = spark.createDataFrame(rows, "k long, v string")
    df.repartition(parts).write.format("gold_export").option(
        "path", str(tmp_path)
    ).mode(mode).save()
    return df.schema


def test_export_sink_roundtrip_and_manifest(spark, tmp_path):
    import json
    import os

    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        MANIFEST,
        read_export,
    )

    rows = [(i, f"v{i}") for i in range(20)]
    schema = _export_write(spark, tmp_path, rows)
    with open(os.path.join(str(tmp_path), MANIFEST)) as fh:
        manifest = json.load(fh)
    assert manifest["total_rows"] == 20
    assert sum(f["rows"] for f in manifest["files"]) == 20
    # no staged leftovers; every manifest file exists under final name
    names = os.listdir(str(tmp_path))
    assert not [n for n in names if n.startswith("_staged-")]
    got = sorted(
        (r["k"], r["v"])
        for r in read_export(spark, str(tmp_path), schema).collect()
    )
    assert got == rows


def test_export_sink_ignores_orphaned_staged_files(spark, tmp_path):
    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        read_export,
    )

    schema = _export_write(spark, tmp_path, [(1, "a")])
    # a torn write from a dead job must stay invisible to readers
    (tmp_path / "_staged-dead-deadbeef.jsonl").write_text(
        '{"k": 99, "v": "ghost"}\n'
    )
    got = [tuple(r) for r in read_export(spark, str(tmp_path), schema).collect()]
    assert got == [(1, "a")]


def test_export_sink_overwrite_supersedes_previous_manifest(spark, tmp_path):
    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        read_export,
    )

    _export_write(spark, tmp_path, [(i, "old") for i in range(30)])
    # fewer tasks than the previous job: part-00001/2 must be removed
    schema = _export_write(
        spark, tmp_path, [(1, "new")], mode="overwrite", parts=1
    )
    got = [tuple(r) for r in read_export(spark, str(tmp_path), schema).collect()]
    assert got == [(1, "new")]
    import os

    # superseded part files physically removed after the new manifest
    parts = [n for n in os.listdir(str(tmp_path)) if n.startswith("part-")]
    assert len(parts) == 1


def test_export_sink_append_preserves_previous_rows(spark, tmp_path):
    """mode('append') is a real append: the new manifest lists the
    previous generation's files plus the new ones, nothing is deleted."""
    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        read_export,
    )

    _export_write(spark, tmp_path, [(1, "a"), (2, "b")], parts=2)
    schema = _export_write(spark, tmp_path, [(3, "c")], parts=1)
    got = sorted(
        (r["k"], r["v"])
        for r in read_export(spark, str(tmp_path), schema).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_export_sink_overwrite_never_reuses_old_filenames(spark, tmp_path):
    """Final part names are commit-unique, so an overwrite cannot
    mutate any file the still-live old manifest lists (no torn reads
    for a reader that resolved the old manifest before the swap)."""
    import json
    import os

    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        MANIFEST,
        read_export,
    )

    _export_write(spark, tmp_path, [(i, "old") for i in range(10)], parts=3)
    with open(os.path.join(str(tmp_path), MANIFEST)) as fh:
        old_names = {f["name"] for f in json.load(fh)["files"]}
    schema = _export_write(
        spark, tmp_path, [(1, "new")], mode="overwrite", parts=2
    )
    with open(os.path.join(str(tmp_path), MANIFEST)) as fh:
        new_names = {f["name"] for f in json.load(fh)["files"]}
    assert not (old_names & new_names)
    got = [tuple(r) for r in read_export(spark, str(tmp_path), schema).collect()]
    assert got == [(1, "new")]


def test_export_sink_crash_before_manifest_swap_keeps_old_export(
    spark, tmp_path, monkeypatch
):
    """A reader holding the old manifest reads consistent OLD rows even
    if an overwrite crashes after renaming its parts but before the
    manifest swap — and the next successful overwrite GCs the orphans."""
    import json
    import os

    from youtube_podcast_data_pipeline_azure_spark.io import export_sink
    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        MANIFEST,
        ExportCommit,
        GoldExportWriter,
        read_export,
    )

    old_rows = [(i, "old") for i in range(6)]
    schema = _export_write(spark, tmp_path, old_rows, parts=2)
    with open(os.path.join(str(tmp_path), MANIFEST)) as fh:
        old_manifest = json.load(fh)

    # stage a new generation by hand, then crash the manifest swap
    w = GoldExportWriter({"path": str(tmp_path)}, spark.createDataFrame(
        [(9, "new")], "k long, v string"
    ).schema, overwrite=True)
    staged = "_staged-0-crashme.jsonl"
    (tmp_path / staged).write_text('{"k": 9, "v": "new"}\n')
    real_replace = os.replace

    def exploding_replace(src, dst):
        if dst.endswith(MANIFEST):
            raise OSError("simulated crash at the commit point")
        return real_replace(src, dst)

    monkeypatch.setattr(export_sink.os, "replace", exploding_replace)
    try:
        w.commit([ExportCommit(staged=staged, rows=1)])
    except OSError:
        pass
    monkeypatch.setattr(export_sink.os, "replace", real_replace)

    # the old manifest is untouched and every file it lists still holds
    # old-generation bytes: a reader mid-crash sees the old export
    with open(os.path.join(str(tmp_path), MANIFEST)) as fh:
        assert json.load(fh) == old_manifest
    got = sorted(
        (r["k"], r["v"])
        for r in read_export(spark, str(tmp_path), schema).collect()
    )
    assert got == old_rows

    # the next successful overwrite removes the crashed commit's orphans
    _export_write(spark, tmp_path, [(1, "v3")], mode="overwrite", parts=1)
    parts = [n for n in os.listdir(str(tmp_path)) if n.startswith("part-")]
    assert len(parts) == 1


def test_export_sink_crash_mid_renames_then_replay_publishes_once(
    spark, tmp_path, monkeypatch
):
    """Failure injection at the OTHER commit window (VERDICT r10 #6):
    the driver dies after renaming SOME parts of the new generation but
    before the rest (and long before the manifest swap).  Readers must
    keep seeing exactly the old export; replaying the batch must
    publish the new rows exactly once and GC the crashed attempt's
    orphan parts."""
    import json
    import os

    from youtube_podcast_data_pipeline_azure_spark.io import export_sink
    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        MANIFEST,
        ExportCommit,
        GoldExportWriter,
        read_export,
    )

    old_rows = [(i, "old") for i in range(4)]
    schema = _export_write(spark, tmp_path, old_rows, parts=2)
    with open(os.path.join(str(tmp_path), MANIFEST)) as fh:
        old_manifest = json.load(fh)

    # stage three parts of the new generation by hand, then crash the
    # SECOND part rename (one part renamed, two still staged)
    msgs = []
    for i in range(3):
        name = f"_staged-{i}-crashmid.jsonl"
        (tmp_path / name).write_text(json.dumps({"k": 100 + i, "v": "new"}) + "\n")
        msgs.append(ExportCommit(staged=name, rows=1))
    w = GoldExportWriter({"path": str(tmp_path)}, spark.createDataFrame(
        [(0, "x")], "k long, v string"
    ).schema, overwrite=True)
    real_replace = os.replace
    calls = {"n": 0}

    def crash_on_second_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash mid-renames")
        return real_replace(src, dst)

    monkeypatch.setattr(export_sink.os, "replace", crash_on_second_rename)
    with pytest.raises(OSError):
        w.commit(msgs)
    monkeypatch.setattr(export_sink.os, "replace", real_replace)

    # old manifest intact; reader sees exactly the old rows (the one
    # renamed orphan part and the leftover staged files are invisible)
    with open(os.path.join(str(tmp_path), MANIFEST)) as fh:
        assert json.load(fh) == old_manifest
    got = sorted(
        (r["k"], r["v"])
        for r in read_export(spark, str(tmp_path), schema).collect()
    )
    assert got == old_rows

    # replay the whole batch (what a retried job does): rows publish
    # exactly once and the crashed attempt's orphan part is GC'd
    new_rows = [(100, "new"), (101, "new"), (102, "new")]
    schema = _export_write(spark, tmp_path, new_rows, mode="overwrite", parts=3)
    got = sorted(
        (r["k"], r["v"])
        for r in read_export(spark, str(tmp_path), schema).collect()
    )
    assert got == new_rows
    with open(os.path.join(str(tmp_path), MANIFEST)) as fh:
        listed = {f["name"] for f in json.load(fh)["files"]}
    on_disk = {
        n for n in os.listdir(str(tmp_path)) if n.startswith("part-")
    }
    assert on_disk == listed  # no orphan parts survive the replay


def test_stream_export_crash_before_batch_manifest_then_replay(
    spark, tmp_path, monkeypatch
):
    """Streaming failure injection (VERDICT r10 #6): the writer dies
    AFTER renaming a batch's parts but BEFORE that batch's manifest
    lands — the checkpoint will replay the batch.  Mid-crash readers
    must not see the half-committed batch; the replay must make its
    rows visible exactly once (the replayed renames overwrite the
    crashed attempt's identically-named parts, so nothing doubles)."""
    import json
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from youtube_podcast_data_pipeline_azure_spark.io import export_sink
    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        ExportCommit,
        GoldExportStreamWriter,
        read_stream_export,
    )

    schema = StructType([StructField("k", LongType())])
    w = GoldExportStreamWriter({"path": str(tmp_path)}, schema)

    def stage(val, tag):
        name = f"_staged-0-{tag}.jsonl"
        (tmp_path / name).write_text(json.dumps({"k": val}) + "\n")
        return ExportCommit(staged=name, rows=1)

    w.commit([stage(1, "b0")], batchId=0)

    # batch 1: parts rename fine, the manifest write crashes
    real_replace = os.replace

    def crash_on_manifest(src, dst):
        if "_MANIFEST-1.json" in dst:
            raise OSError("simulated crash before batch manifest")
        return real_replace(src, dst)

    monkeypatch.setattr(export_sink.os, "replace", crash_on_manifest)
    with pytest.raises(OSError):
        w.commit([stage(2, "b1-attempt1")], batchId=1)
    monkeypatch.setattr(export_sink.os, "replace", real_replace)

    # mid-crash: batch 1 invisible (its part file exists but no
    # manifest lists it), batch 0 intact
    got = sorted(
        r["k"]
        for r in read_stream_export(spark, str(tmp_path), schema).collect()
    )
    assert got == [1]

    # checkpoint replays batch 1: same part names, rows land ONCE
    w.commit([stage(2, "b1-attempt2")], batchId=1)
    got = sorted(
        r["k"]
        for r in read_stream_export(spark, str(tmp_path), schema).collect()
    )
    assert got == [1, 2]
    # every on-disk part is listed by exactly one manifest, and the
    # crashed attempt's stray manifest tmp was GC'd by the re-commit
    import re

    listed = []
    for name in os.listdir(str(tmp_path)):
        if re.fullmatch(r"_MANIFEST-\d+\.json", name):
            with open(os.path.join(str(tmp_path), name)) as fh:
                listed += [f["name"] for f in json.load(fh)["files"]]
    parts = [n for n in os.listdir(str(tmp_path)) if n.startswith("part-")]
    assert sorted(listed) == sorted(parts)
    assert len(listed) == len(set(listed))
    assert not [
        n for n in os.listdir(str(tmp_path)) if n.endswith(".tmp")
    ]


def test_export_sink_abort_removes_staged(tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        ExportCommit,
        GoldExportWriter,
    )

    schema = StructType([StructField("k", LongType())])
    w = GoldExportWriter({"path": str(tmp_path)}, schema, overwrite=False)
    staged = tmp_path / "_staged-0-feed.jsonl"
    staged.write_text('{"k": 1}\n')
    w.abort([ExportCommit(staged=staged.name, rows=1), None])
    assert not staged.exists()


def test_stream_export_idempotent_batch_commit(spark, tmp_path):
    import json

    from pyspark.sql.types import LongType, StructField, StructType

    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        ExportCommit,
        GoldExportStreamWriter,
        read_stream_export,
    )

    schema = StructType([StructField("k", LongType())])
    w = GoldExportStreamWriter({"path": str(tmp_path)}, schema)

    def stage(val):
        name = f"_staged-0-{val}.jsonl"
        (tmp_path / name).write_text(json.dumps({"k": val}) + "\n")
        return ExportCommit(staged=name, rows=1)

    w.commit([stage(1)], batchId=0)
    w.commit([stage(2)], batchId=1)
    # restart replay of batch 0: manifest exists -> staged rows DISCARDED
    w.commit([stage(99)], batchId=0)
    got = sorted(
        r["k"]
        for r in read_stream_export(spark, str(tmp_path), schema).collect()
    )
    assert got == [1, 2]  # no duplicate, no ghost 99
    import os

    assert not [
        n for n in os.listdir(str(tmp_path)) if n.startswith("_staged-")
    ]


def test_stream_export_abort_keeps_committed_batches(spark, tmp_path):
    import json

    from pyspark.sql.types import LongType, StructField, StructType

    from youtube_podcast_data_pipeline_azure_spark.io.export_sink import (
        ExportCommit,
        GoldExportStreamWriter,
        read_stream_export,
    )

    schema = StructType([StructField("k", LongType())])
    w = GoldExportStreamWriter({"path": str(tmp_path)}, schema)
    name = "_staged-0-ok.jsonl"
    (tmp_path / name).write_text(json.dumps({"k": 1}) + "\n")
    w.commit([ExportCommit(staged=name, rows=1)], batchId=0)
    bad = "_staged-0-bad.jsonl"
    (tmp_path / bad).write_text(json.dumps({"k": 2}) + "\n")
    w.abort([ExportCommit(staged=bad, rows=1), None], batchId=1)
    got = [
        r["k"]
        for r in read_stream_export(spark, str(tmp_path), schema).collect()
    ]
    assert got == [1]
    assert not (tmp_path / bad).exists()


# ---------------------------------------------------------------------------
# Python Data Source predicate pushdown (Spark 4.1 Filter API)
# ---------------------------------------------------------------------------


def test_pyds_pushdown_prunes_partitions_at_planning(sf_dir):
    from pyspark.sql.datasource import EqualTo, In

    from youtube_podcast_data_pipeline_azure_spark.io.pyds import (
        VideosPushdownReader,
    )

    r = VideosPushdownReader({"sf_dir": sf_dir, "max_results": "500"})
    rest = list(
        r.pushFilters(
            [
                In(("id",), ("vid1", "vid2", "vid999999999", "nope")),
                EqualTo(("title",), "x"),  # unsupported column
            ]
        )
    )
    # unsupported filter handed back to Spark; id filter fully consumed
    assert rest == [EqualTo(("title",), "x")]
    # only feed-resident matching ids planned (ghost + unparseable drop)
    assert [p.value for p in r.partitions()] == [[1, 2]]
    # AND-intersection with a second pushed filter
    list(r.pushFilters([EqualTo(("id",), "vid2")]))
    assert [p.value for p in r.partitions()] == [[2]]
    # empty intersection: zero partitions, feed never contacted
    list(r.pushFilters([EqualTo(("id",), "vid1")]))
    assert r.partitions() == []


def test_pyds_pushdown_plan_carries_no_filter_node(spark, sf_dir):
    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.io.pyds import (
        VideosDataSource,
    )

    spark.dataSource.register(VideosDataSource)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (
            spark.read.format("youtube_videos")
            .option("sf_dir", sf_dir)
            .option("max_results", "500")
            .option("pushdown", "true")
            .load()
            .where(F.col("id").isin(["vid1", "vid2", "vid3"]))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the predicate was consumed by the source: no Filter node
        assert "\n" + "+- *(1) Filter" not in plan and "Filter id#" not in plan
        assert sorted(r["id"] for r in df.select("id").collect()) == [
            "vid1",
            "vid2",
            "vid3",
        ]
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def test_pyds_default_reader_works_without_pushdown_conf(spark, sf_dir):
    """The default reader must NOT implement pushFilters: Spark refuses
    to initialize readers that override it while the (default-off)
    pushdown conf is disabled, and the driver harness runs plain
    sessions."""
    from youtube_podcast_data_pipeline_azure_spark.io.pyds import (
        VideosDataSource,
        VideosReader,
    )

    assert "pushFilters" not in VideosReader.__dict__
    spark.dataSource.register(VideosDataSource)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    try:
        n = (
            spark.read.format("youtube_videos")
            .option("sf_dir", sf_dir)
            .option("max_results", "120")
            .load()
            .count()
        )
        assert n == 120
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)
