"""Real odv frame-container path: container round trip + frame sampling."""

import numpy as np
import pytest

from od_database_spark.datagen import images as im
from od_database_spark.datagen import video as vid
from od_database_spark.operators import multimodal as M


def test_container_roundtrip_bit_exact():
    for mid in ("vid_0001", "vid_beef"):
        data = vid.encode_video(mid)
        assert vid.frame_count(data) == vid.n_frames_for(mid)
        for idx, px in vid.decode_frames(data):
            np.testing.assert_array_equal(px, vid.frame_pixels(mid, idx))


def test_sample_video_frames_real(spark):
    ids = [f"vid_{i:04d}" for i in range(4)]
    rows = [
        (r["media_id"], r["modality"], bytearray(r["payload"]), r["meta"])
        for r in (vid.make_video_row(i) for i in ids)
    ]
    media = spark.createDataFrame(rows, M.MEDIA)
    got = M.sample_video_frames(media, every_n=4).collect()
    by_vid = {}
    for r in got:
        by_vid.setdefault(r["media_id"], []).append(r)
    for mid in ids:
        n = vid.n_frames_for(mid)
        expect_idx = list(range(0, n, 4))
        rows_v = sorted(by_vid[mid], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows_v] == expect_idx
        for r in rows_v:
            assert r["frame_phash"] == im.phash64(vid.frame_pixels(mid, r["frame_idx"]))


def test_compressed_video_still_raises(spark):
    from pyspark.sql.utils import PythonException

    media = spark.createDataFrame(
        [("vid_mp4", "video", bytearray(b"\x00"), {"fmt": "mp4"})], M.MEDIA
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        M.sample_video_frames(media).collect()
