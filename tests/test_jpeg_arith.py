"""Arithmetic-coded JPEG (operators/jpeg_arith.py): raw QM-coder
roundtrips (including forced carry/0xFF-stacking paths), the
sequential-DCT statistical models, and full-codec differentials
against the Huffman path — both encoders share the DCT/quantization
pipeline, so identical pixels prove the entropy layer alone."""

from __future__ import annotations

import random

import numpy as np
import pytest

from regpulse_lakehouse_spark.operators.jpeg import decode_jpeg, encode_jpeg
from regpulse_lakehouse_spark.operators.jpeg_arith import (
    FIXED_BIN,
    QM_STATES,
    QMDecoder,
    QMEncoder,
    encode_jpeg_arithmetic,
    encode_jpeg_progressive_arithmetic,
)


def test_qm_state_table_invariants():
    """Table D.3 structural checks: 113 adaptive states + the fixed
    bin; all transitions in range; the fixed bin is a true fixpoint;
    SWITCH only on states whose Qe is near 0.5 (the MPS-sense flip is
    only meaningful where LPS/MPS are near-equiprobable)."""
    assert len(QM_STATES) == 114
    for i, (qe, nm, nl, sw) in enumerate(QM_STATES):
        assert 0 < qe < 0x8000
        assert 0 <= nm < len(QM_STATES) and 0 <= nl < len(QM_STATES)
        assert sw in (0, 1)
        if sw:
            assert qe > 0x5000, f"switch on low-Qe state {i}"
    qe, nm, nl, _ = QM_STATES[FIXED_BIN]
    assert (nm, nl) == (FIXED_BIN, FIXED_BIN)  # never adapts


@pytest.mark.parametrize("seed", range(12))
def test_qm_coder_roundtrip_fuzz(seed):
    """Encoder→decoder identity on random decision sequences across
    shared adaptive contexts, sweeping bias so the state machine
    walks deep into the table and the carry/stacking byteout paths
    all fire."""
    rng = random.Random(seed)
    n = rng.choice([1, 2, 37, 500, 5000])
    bias = rng.choice([0.5, 0.85, 0.97, 0.03])
    bits = [1 if rng.random() < bias else 0 for _ in range(n)]
    ctxs = [rng.randrange(6) for _ in range(n)]
    enc = QMEncoder()
    st_e = bytearray(6)
    for b, c in zip(bits, ctxs):
        enc.encode(st_e, c, b)
    data = enc.flush()
    dec = QMDecoder(data + b"\xff\xd9", 0)
    st_d = bytearray(6)
    assert [dec.decode(st_d, c) for c in ctxs] == bits
    assert st_d == st_e  # state machines marched in lockstep


def test_qm_coder_stuffs_ff_and_decoder_unstuffs():
    """A heavily-MPS-biased stream drives C toward all-ones windows;
    any produced 0xFF must be followed by a stuffed 0x00 and the
    segment must contain no marker (0xFF followed by non-zero)."""
    enc = QMEncoder()
    st = bytearray(1)
    rng = random.Random(99)
    bits = [1 if rng.random() < 0.995 else 0 for _ in range(20000)]
    for b in bits:
        enc.encode(st, 0, b)
    data = enc.flush()
    i = 0
    saw_ff = False
    while i < len(data):
        if data[i] == 0xFF:
            saw_ff = True
            assert i + 1 < len(data) and data[i + 1] == 0x00
            i += 2
        else:
            i += 1
    assert saw_ff, "fixture failed to exercise the 0xFF stuffing path"
    dec = QMDecoder(data + b"\xff\xd9", 0)
    st_d = bytearray(1)
    assert [dec.decode(st_d, 0) for _ in bits] == bits


def test_qm_decoder_zero_fills_past_marker():
    """Hitting a marker mid-renormalization is legal — the decoder
    must feed zero bits, not raise or mis-read the marker bytes."""
    enc = QMEncoder()
    st = bytearray(1)
    bits = [1, 0, 1, 1, 0, 1, 0, 0, 1, 1]
    for b in bits:
        enc.encode(st, 0, b)
    data = enc.flush()
    # truncate the flush tail: decoder leans on zero-fill for the rest
    dec = QMDecoder(data[: max(2, len(data) - 1)] + b"\xff\xd9", 0)
    st_d = bytearray(1)
    out = [dec.decode(st_d, 0) for _ in bits]
    # the first symbols must survive truncation (the tail may not)
    assert out[: len(bits) // 2] == bits[: len(bits) // 2]


@pytest.mark.parametrize(
    "desc,shape,kwargs",
    [
        ("gray", (24, 24), {}),
        ("gray_odd", (21, 13), {}),
        ("rgb_444", (17, 19, 3), {}),
        ("rgb_420", (33, 34, 3), {"subsample": True}),
        ("gray_restart", (40, 40), {"restart_interval": 3}),
        ("rgb_420_restart", (32, 48, 3), {"subsample": True, "restart_interval": 2}),
    ],
)
def test_arithmetic_decodes_equal_huffman(desc, shape, kwargs):
    """SOF9 and SOF0 encodings of the same image share the quantized
    coefficient stream and _finish_planes, so their decodes must be
    byte-identical — isolating the QM entropy layer as the only
    variable under test."""
    rng = np.random.default_rng(hash(desc) % 2**32)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    a = decode_jpeg(encode_jpeg_arithmetic(img, quality=85, **kwargs))
    h = decode_jpeg(encode_jpeg(img, quality=85, **kwargs))
    assert np.array_equal(a, h)


def test_arithmetic_12bit_decodes_equal_huffman():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 4096, (16, 24)).astype(np.uint16)
    a = decode_jpeg(encode_jpeg_arithmetic(img, quality=90, precision=12))
    h = decode_jpeg(encode_jpeg(img, quality=90, precision=12))
    assert a.dtype == np.uint16 and np.array_equal(a, h)


def test_arithmetic_smooth_image_close_to_source():
    """Beyond the differential: on a smooth gradient at high quality
    the decode must be close to the SOURCE, catching any systematic
    bias the Huffman-equality test could share."""
    y, x = np.mgrid[0:32, 0:32]
    img = ((y * 3 + x * 5) % 200 + 20).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_arithmetic(img, quality=95))
    assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 12


def test_arithmetic_beats_huffman_size_on_natural_image():
    """The QM-coder's adaptive contexts should out-compress the fixed
    Annex-K Huffman tables on smooth content — a behavioral check
    that the statistics model is actually conditioning (a broken
    model would still roundtrip, but not compress)."""
    y, x = np.mgrid[0:64, 0:64]
    img = (128 + 60 * np.sin(x / 9.0) * np.cos(y / 11.0)).astype(np.uint8)
    ar = len(encode_jpeg_arithmetic(img, quality=85))
    hu = len(encode_jpeg(img, quality=85))
    assert ar < hu, f"arithmetic {ar} >= huffman {hu}"


@pytest.mark.parametrize(
    "desc,shape,kwargs",
    [
        ("p_gray", (24, 24), {}),
        ("p_rgb_444", (17, 19, 3), {}),
        ("p_rgb_420", (33, 34, 3), {"subsample": True}),
    ],
)
def test_progressive_arithmetic_decodes_equal_baseline(desc, shape, kwargs):
    """SOF10 (progressive arithmetic) runs the full Annex G scan
    script — DC first/refine, AC bands at three successive-
    approximation levels — and must land byte-identical to the
    baseline Huffman decode of the same image."""
    rng = np.random.default_rng(hash(desc) % 2**32)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    pa = decode_jpeg(encode_jpeg_progressive_arithmetic(img, quality=85, **kwargs))
    h = decode_jpeg(encode_jpeg(img, quality=85, **kwargs))
    assert np.array_equal(pa, h)


def test_progressive_arithmetic_equals_progressive_huffman():
    """SOF10 and SOF2 share _progressive_coef_grids AND the scan
    script, so their decodes must agree exactly — isolating the
    progressive QM statistical models as the only difference."""
    from regpulse_lakehouse_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (32, 28, 3), dtype=np.uint8)
    pa = decode_jpeg(encode_jpeg_progressive_arithmetic(img, quality=80))
    ph = decode_jpeg(encode_jpeg_progressive(img, quality=80))
    assert np.array_equal(pa, ph)


def test_sof11_lossless_still_rejected():
    img = np.zeros((8, 8), dtype=np.uint8)
    payload = bytearray(encode_jpeg_arithmetic(img))
    i = payload.find(b"\xff\xc9")
    payload[i + 1] = 0xC3
    with pytest.raises(ValueError, match="lossless"):
        decode_jpeg(bytes(payload))


def test_dac_segment_parsed_not_required():
    """The encoder writes an explicit DAC; stripping it must still
    decode (spec defaults L=0, U=1, Kx=5 are what the encoder used)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    payload = encode_jpeg_arithmetic(img, quality=85)
    i = payload.find(b"\xff\xcc")
    assert i > 0
    seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
    stripped = payload[:i] + payload[i + 2 + seglen :]
    assert np.array_equal(decode_jpeg(stripped), decode_jpeg(payload))
