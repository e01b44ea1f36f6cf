"""REAL multimodal decode paths (operators/multimodal.py): PCM WAV and
binary PPM/PGM decode with stdlib+numpy, nearest-neighbor resize, and
the Arrow-batched audio/image feature stages — verified against known
signal/image ground truth, no codec library involved."""

from __future__ import annotations

import math

import numpy as np
import pytest

from regpulse_lakehouse_spark.operators import multimodal as MM


def test_wav_roundtrip_known_sine():
    import io
    import wave

    sr, freq = 8000, 440
    t = np.arange(sr) / sr  # 1 second
    pcm = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    wav = MM._decode_wav(buf.getvalue())
    assert wav.shape == (sr, 1)
    # amplitude 0.5 sine → rms = 0.5/√2
    assert abs(float(np.sqrt((wav**2).mean())) - 0.5 / math.sqrt(2)) < 1e-3
    assert abs(float(np.abs(wav).max()) - 0.5) < 1e-3


def test_pnm_decode_and_resize():
    w_, h_ = 16, 8
    img = np.zeros((h_, w_, 3), dtype=np.uint8)
    img[..., 0] = np.arange(w_) * 17  # red gradient across x
    payload = b"P6\n# c\n16 8\n255\n" + img.tobytes()
    back = MM._decode_pnm(payload)
    assert back.shape == (h_, w_, 3)
    assert (back == img).all()
    small = MM.resize_nearest(back, 4, 4)
    assert small.shape == (4, 4, 3)
    # nearest-neighbor picks source col 0,4,8,12 → red 0,68,136,204
    assert small[0, :, 0].tolist() == [0, 68, 136, 204]
    gray = MM._decode_pnm(b"P5\n2 2\n255\n" + bytes([0, 64, 128, 255]))
    assert gray.tolist() == [[0, 64], [128, 255]]


def test_decode_real_dispatch():
    with pytest.raises(NotImplementedError, match="png"):
        MM.decode_real(b"\x89PNG", {"format": "png"})
    with pytest.raises(ValueError, match="magic"):
        MM._decode_pnm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM unsupported


def test_audio_features_stage(spark):
    media = MM.synthetic_real_media(spark, 12)
    rows = {r["media_id"]: r for r in MM.audio_features(media).collect()}
    assert len(rows) == 6  # the wav half of the fixture
    for r in rows.values():
        assert r["n_channels"] == 1 and r["n_samples"] == 2000
        assert abs(r["rms"] - 0.5 / math.sqrt(2)) < 2e-3
        assert 0.0 < r["zero_crossing_rate"] < 1.0
    # zcr tracks frequency: clip 0 is 220 Hz, clip 2 is 660 Hz
    assert rows["real-0002"]["zero_crossing_rate"] > rows["real-0000"]["zero_crossing_rate"]


def test_image_stats_stage(spark):
    media = MM.synthetic_real_media(spark, 12)
    rows = {r["media_id"]: r for r in MM.image_stats(media, thumb=4).collect()}
    assert len(rows) == 6  # the ppm half
    r = rows["real-0001"]
    assert (r["width"], r["height"]) == (33, 25)
    assert len(r["thumbnail"]) == 16
    assert all(0.0 <= v <= 1.0 for v in r["thumbnail"])
    # red rises with x, green with y → gray thumbnail increases along
    # rows and columns
    tn = np.array(r["thumbnail"]).reshape(4, 4)
    assert tn[0, 3] > tn[0, 0] and tn[3, 0] > tn[0, 0]


def test_binary_column_pruned_from_stats_plan(spark, tmp_path):
    # column pruning is a property of the parquet scan (a LocalTableScan
    # of an in-memory fixture always carries every column)
    path = str(tmp_path / "media")
    MM.synthetic_media(spark, 6).write.parquet(path)
    media = spark.read.parquet(path)
    plan = MM.frame_sample_plan(media)._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "payload" not in read_schema  # metadata-only plan never reads bytes
