"""Real WAV audio path: pure-numpy RIFF/PCM codec + extract_audio_features."""

import numpy as np

from od_database_spark.datagen import audio as au
from od_database_spark.operators import multimodal as M


def test_wav_roundtrip_bit_exact():
    for mid in ("aud_0001", "aud_ffff", "aud_x"):
        rate = au.rate_for(mid)
        samples = au.samples_for(mid)
        rate2, got = au.decode_wav(au.encode_wav(samples, rate))
        assert rate2 == rate
        assert np.array_equal(got, samples)


def test_wav_header_fields():
    data = au.encode_wav(np.zeros(5, dtype=np.int16), 16000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    rate, samples = au.decode_wav(data)
    assert rate == 16000 and len(samples) == 5


def test_extract_audio_features_real(spark):
    ids = [f"aud_{i:04d}" for i in range(8)]
    rows = [
        (r["media_id"], r["modality"], bytearray(r["payload"]), r["meta"])
        for r in (au.make_audio_row(i) for i in ids)
    ]
    media = spark.createDataFrame(rows, M.MEDIA)
    feats = {r["media_id"]: r for r in M.extract_audio_features(media).collect()}
    assert set(feats) == set(ids)
    for mid in ids:
        samples = au.samples_for(mid)
        assert feats[mid]["sample_rate"] == au.rate_for(mid)
        assert feats[mid]["n_samples"] == len(samples)
        assert abs(feats[mid]["rms"] - round(au.rms_of(samples), 6)) < 1e-9


def test_mixed_wav_and_unknown_fmt_raises(spark):
    r = au.make_audio_row("aud_mix")
    rows = [
        (r["media_id"], "audio", bytearray(r["payload"]), r["meta"]),
        ("aud_mp3", "audio", bytearray(b"\x00\x01"), {"fmt": "mp3"}),
    ]
    media = spark.createDataFrame(rows, M.MEDIA)
    import pytest
    from pyspark.sql.utils import PythonException

    with pytest.raises(PythonException, match="NotImplementedError"):
        M.extract_audio_features(media).collect()
    # fake mode still processes the compressed row, real rows stay real
    got = {x["media_id"]: x for x in
           M.extract_audio_features(media, decode_stub="fake").collect()}
    assert got["aud_mix"]["sample_rate"] == au.rate_for("aud_mix")
