"""Multimodal plumbing: binary payload columns through mapInPandas.
Decode kernels are stubs (no codecs in this container) — what's tested
is the real Spark-side contract: schemas, batching, 1-in/N-out shapes."""

from __future__ import annotations

import pytest

from youtube_podcast_data_pipeline_azure_spark import schemas
from youtube_podcast_data_pipeline_azure_spark.operators import multimodal


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG fake", 640, 480, None, "2026-01-01"),
        (2, "audio", "audio/wav", b"RIFF fake", None, None, 5_000, "2026-01-01"),
        (3, "video", "video/mp4", b"\x00mp4 fake", 1280, 720, 3_500, "2026-01-01"),
        (4, "image", "image/png", None, 1, 1, None, "2026-01-02"),
    ]
    return spark.createDataFrame(rows, schemas.MEDIA_ASSETS)


def test_feature_extraction_deterministic(assets):
    out1 = {r["asset_id"]: r for r in multimodal.extract_features(assets).collect()}
    out2 = {r["asset_id"]: r for r in multimodal.extract_features(assets).collect()}
    assert set(out1) == {1, 2, 3, 4}
    for k in out1:
        assert out1[k]["sha256"] == out2[k]["sha256"]
        assert out1[k]["feature"] == out2[k]["feature"]
        assert len(out1[k]["feature"]) == 8
    assert out1[1]["n_bytes"] == 9
    assert out1[4]["n_bytes"] == 0  # null payload handled


def test_frame_sampling_explodes_by_duration(assets):
    frames = multimodal.sample_frames(assets, every_ms=1000).collect()
    # only asset 3 is video, 3500ms -> frames at 0,1000,2000,3000
    assert {r["asset_id"] for r in frames} == {3}
    assert sorted(r["frame_ms"] for r in frames) == [0, 1000, 2000, 3000]
    assert all(len(r["frame"]) == 32 for r in frames)  # sha256 stub payload


def test_resize_is_a_clear_stub(assets):
    with pytest.raises(Exception) as exc_info:
        multimodal.resize_images(assets).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )
