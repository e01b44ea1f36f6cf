"""FLAC codec (operators/flac.py): exact integer roundtrips across
subframe modes / stereo decorrelations / bit depths, hand-built LPC /
escaped-residual / wasted-bits streams the encoder doesn't emit, and
the Spark audio_features dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from regpulse_lakehouse_spark.operators import flac as FL


def _sig(n=5000, seed=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (3000 * np.sin(t / 30.0) + rng.integers(-50, 50, n)).astype(np.int64)


@pytest.mark.parametrize("mode", ["fixed", "verbatim"])
@pytest.mark.parametrize("blocksize", [256, 4096])
def test_mono_roundtrip_exact(mode, blocksize):
    mono = _sig()
    dec = FL.decode_flac(FL.encode_flac(mono, blocksize=blocksize, mode=mode))
    assert np.array_equal(np.round(dec[:, 0] * 32768).astype(np.int64), mono)


@pytest.mark.parametrize("mid_side", [False, True])
def test_stereo_roundtrip_exact(mid_side):
    mono = _sig()
    st = np.stack([mono, (mono * 0.7).astype(np.int64) + 11], axis=1)
    dec = FL.decode_flac(FL.encode_flac(st, blocksize=512, mid_side=mid_side))
    assert np.array_equal(np.round(dec * 32768).astype(np.int64), st)


def test_8_and_24_bit():
    rng = np.random.default_rng(2)
    small = rng.integers(-120, 120, 700).astype(np.int64)
    d8 = FL.decode_flac(FL.encode_flac(small, bps=8, blocksize=256))
    assert np.array_equal(np.round(d8[:, 0] * 128).astype(np.int64), small)
    wide = rng.integers(-(1 << 22), 1 << 22, 700).astype(np.int64)
    d24 = FL.decode_flac(FL.encode_flac(wide, bps=24, blocksize=256))
    assert np.array_equal(np.round(d24[:, 0] * (1 << 23)).astype(np.int64), wide)


def test_fixed_predictor_actually_compresses():
    mono = _sig(8000)
    fixed = len(FL.encode_flac(mono, mode="fixed"))
    verb = len(FL.encode_flac(mono, mode="verbatim"))
    assert fixed < 0.7 * verb


def test_constant_subframe_path():
    flat = np.full(1000, 321, dtype=np.int64)
    enc = FL.encode_flac(flat, blocksize=500)
    assert len(enc) < 120  # constant subframes are a few bytes each
    dec = FL.decode_flac(enc)
    assert np.array_equal(np.round(dec[:, 0] * 32768).astype(np.int64), flat)


def _hand_frame(streaminfo_samples, bps, build_subframes):
    """Minimal stream: STREAMINFO + ONE fixed-numbering frame whose
    subframe bits come from ``build_subframes(writer)``."""
    import struct

    out = bytearray(b"fLaC")
    si = FL._MSBWriter()
    si.put(streaminfo_samples, 16)
    si.put(streaminfo_samples, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(16000, 20)
    si.put(0, 3)  # mono
    si.put(bps - 1, 5)
    si.put(streaminfo_samples, 36)
    body = si.bytes() + b"\x00" * 18
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    wr = FL._MSBWriter()
    wr.put(0x3FFE, 14)
    wr.put(0, 2)
    wr.put(7, 4)   # 16-bit blocksize at end
    wr.put(0, 4)
    wr.put(0, 4)   # 1 channel
    wr.put(0, 4)   # sample size from STREAMINFO + reserved
    wr.put(0, 8)   # frame number 0
    wr.put(streaminfo_samples - 1, 16)
    wr.put(0, 8)   # crc8
    build_subframes(wr)
    wr.align()
    wr.put(0, 16)
    return bytes(out + wr.bytes())


def test_lpc_subframe_hand_built():
    """LPC order 2 with coefficients [2, -1] and shift 0 equals the
    FIXED order-2 predictor — a decoder-only path our encoder never
    emits, pinned against the independently computed expansion."""
    warm = [100, 110]
    resid = [3, -2, 5, 0, -1, 4]
    n = len(warm) + len(resid)

    def build(wr):
        wr.put(0, 1)
        wr.put(32 + (2 - 1), 6)  # LPC, order 2
        wr.put(0, 1)             # no wasted bits
        for v in warm:
            wr.put(v & 0xFFFF, 16)
        wr.put(5 - 1, 4)         # coefficient precision 5
        wr.put(0, 5)             # shift 0
        wr.put(2 & 0x1F, 5)      # coef 2
        wr.put(-1 & 0x1F, 5)     # coef -1
        wr.put(0, 2)             # rice method 0
        wr.put(0, 4)             # partition order 0
        wr.put(2, 4)             # rice param
        for v in resid:
            FL._rice_write(wr.bits, v, 2)

    dec = FL.decode_flac(_hand_frame(n, 16, build))
    got = np.round(dec[:, 0] * 32768).astype(np.int64)
    want = list(warm)
    for r in resid:
        want.append(r + 2 * want[-1] - want[-2])
    assert np.array_equal(got, np.asarray(want))


def test_escaped_residuals_and_wasted_bits():
    """The escape-coded raw-residual partition and the wasted-bits
    shift — two more decoder-only paths, hand-built."""
    vals = [8, 16, -24, 32, 40, -8]  # all share 3 trailing zero bits
    shifted = [v >> 3 for v in vals]
    n = len(vals)

    def build(wr):
        wr.put(0, 1)
        wr.put(8 + 0, 6)  # FIXED order 0: residuals are the samples
        wr.put(1, 1)      # wasted bits follow
        wr.put(1, 3)      # unary 3 → wasted = 3 (two 0s then a 1)
        # (unary for k: k zeros then 1 → for wasted=3: 0,0,1)
        wr.put(0, 2)      # rice method 0
        wr.put(0, 4)      # partition order 0
        wr.put(0xF, 4)    # ESCAPE
        wr.put(9, 5)      # raw 9-bit residuals
        for v in shifted:
            wr.put(v & 0x1FF, 9)

    # fix the unary encoding: 3 wasted bits = '001' — wr.put(1, 3) wrote 001
    dec = FL.decode_flac(_hand_frame(n, 16, build))
    got = np.round(dec[:, 0] * 32768).astype(np.int64)
    assert np.array_equal(got, np.asarray(vals))


def test_rejects_are_loud():
    with pytest.raises(ValueError, match="fLaC magic"):
        FL.decode_flac(b"RIFFxxxx")
    mono = _sig(100)
    enc = bytearray(FL.encode_flac(mono, blocksize=100))
    enc[44] ^= 0xFF  # first frame's sync code
    with pytest.raises(ValueError, match="frame sync lost"):
        FL.decode_flac(bytes(enc))


def test_audio_features_dispatches_flac(spark):
    from pyspark.sql import functions as F

    from regpulse_lakehouse_spark.operators import multimodal as M

    mono = _sig(4000)
    flac = FL.encode_flac(mono, blocksize=1024)
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(mono.astype("<i2").tobytes())
    rows = [
        ("a_wav", bytearray(buf.getvalue()), ("audio", "wav", None, None, 1000, None)),
        ("a_flac", bytearray(flac), ("audio", "flac", None, None, 1000, None)),
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in M.audio_features(df).collect()}
    assert out["a_flac"]["n_samples"] == 4000
    # SAME samples through both containers → identical features
    assert abs(out["a_flac"]["rms"] - out["a_wav"]["rms"]) < 1e-6
    assert abs(out["a_flac"]["peak"] - out["a_wav"]["peak"]) < 1e-6


def test_audio_fingerprint_properties():
    """Amplitude invariance (gradient signs), noise robustness, and
    separation from unrelated content — the perceptual contract."""
    import numpy as np

    from regpulse_lakehouse_spark.operators import multimodal as M

    rng = np.random.default_rng(5)
    t = np.arange(16000)
    clip = np.sin(t / 20.0) + 0.5 * np.sin(t / 7.0) + 0.2 * np.sin(t / 3.0)
    noisy = clip + rng.normal(0, 0.02, len(t))
    other = rng.normal(0, 1, len(t))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h0 = M.audio_fingerprint64(clip)
    assert ham(h0, M.audio_fingerprint64(noisy)) <= 6
    assert ham(h0, M.audio_fingerprint64(clip * 3.5)) == 0
    assert ham(h0, M.audio_fingerprint64(other)) > 18
    with pytest.raises(ValueError, match="too short"):
        M.audio_fingerprint64(np.zeros(10))


def test_audio_near_dup_pairs_cross_container(spark):
    """The same recording shipped as WAV and as FLAC pairs up through
    the Spark stage — container-blind near-dup, like the image
    PNG-vs-JPEG case; an unrelated clip stays unpaired."""
    import io
    import wave

    import numpy as np

    from regpulse_lakehouse_spark.operators import multimodal as M

    rng = np.random.default_rng(6)
    t = np.arange(12000)
    sig = (8000 * (np.sin(t / 25.0) + 0.4 * np.sin(t / 9.0))).astype(np.int64)
    other = rng.integers(-20000, 20000, len(t)).astype(np.int64)

    def wav_bytes(s):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(s.astype("<i2").tobytes())
        return buf.getvalue()

    rows = [
        ("as_wav", bytearray(wav_bytes(sig)), ("audio", "wav", None, None, 750, None)),
        ("as_flac", bytearray(FL.encode_flac(sig)), ("audio", "flac", None, None, 750, None)),
        ("noise", bytearray(wav_bytes(other)), ("audio", "wav", None, None, 750, None)),
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    pairs = {tuple(sorted((r["a"], r["b"])))
             for r in M.audio_near_dup_pairs(df, max_hamming=4).collect()}
    assert ("as_flac", "as_wav") in pairs
    assert not any("noise" in p for p in pairs)
