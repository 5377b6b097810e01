"""Multimodal plumbing (real image path, stubbed audio/video) + streaming
ingest smoke (SURVEY.md §2.10 analog)."""

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from od_database_spark.datagen import images as im
from od_database_spark.operators import multimodal as M
from od_database_spark.streaming import ingest as streaming_ingest


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(6):
        image_id = f"img_{i:04d}"
        r = im.make_image_row(image_id)
        rows.append((image_id, "image", bytearray(r["bytes"]), {"fmt": r["fmt"]}))
    rows.append(("aud_0001", "audio", bytearray(b"\x01\x02\x03"), {"codec": "wav"}))
    rows.append(("vid_0001", "video", bytearray(b"\x04\x05\x06"), {"codec": "mp4"}))
    return spark.createDataFrame(rows, M.MEDIA).cache()


def test_image_features_real_decode(media):
    feats = {r["media_id"]: r for r in M.decode_image_features(media).collect()}
    assert len(feats) == 6
    for i in range(6):
        image_id = f"img_{i:04d}"
        w, h = im.dims_for(image_id)
        assert (feats[image_id]["w"], feats[image_id]["h"]) == (w, h)
        assert 0 <= feats[image_id]["mean_r"] <= 255


def test_resize_roundtrip(media):
    out = M.resize_images(media, 16, 16).collect()
    assert len(out) == 6
    px = im.decode_png(bytes(out[0]["payload"]))
    assert px.shape == (16, 16, 3)


def test_audio_stub_raises_by_default(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        M.extract_audio_features(media).collect()


def test_audio_fake_is_deterministic(media):
    a = M.extract_audio_features(media, decode_stub="fake").collect()
    b = M.extract_audio_features(media, decode_stub="fake").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a[0]["sample_rate"] in (8000, 16000, 24000, 32000, 40000)


def test_video_frame_sampling_shape(media):
    frames = M.sample_video_frames(media, every_n=10, decode_stub="fake").collect()
    assert len(frames) >= 3  # row-expanding: multiple frames per video
    assert all(r["frame_idx"] % 10 == 0 for r in frames)


def test_streaming_ingest_available_now(spark):
    tmp = tempfile.mkdtemp(prefix="oddb_stream_")
    try:
        lines = [
            json.dumps({"name": "a.mp4", "path": "x", "size": 10, "mtime": 1500000000}),
            json.dumps({"name": "b.txt", "path": "", "size": 20, "mtime": 1500000001}),
        ]
        with open(f"{tmp}/7_tok123.NDJSON", "w") as f:
            f.write("\n".join(lines))
        stream = streaming_ingest.stream_crawl_results(spark, tmp)
        got = []

        def sink(batch_df, epoch_id):
            got.extend(batch_df.collect())

        streaming_ingest.run_available_now(stream, sink, f"{tmp}/_ckpt")
        assert len(got) == 2
        by_name = {r["name"]: r for r in got}
        assert by_name["a"]["ext"] == "mp4"
        assert all(r["website_id"] == 7 for r in got)  # from the filename contract
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
