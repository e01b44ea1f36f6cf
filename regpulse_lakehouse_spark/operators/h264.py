"""H.264/AVC baseline-profile I-frame codec — the last video seam
(VERDICT r8 task 8 / r9 task 5: "decide h264"). Decided: implemented,
for the intra-only subset that a training-data pipeline actually needs
to thumbnail keyframes (IDR samples; motion-compensated P/B decode
stays out of scope — at 100 TB you frame-sample keyframes, you do not
transcode video on the analytics cluster).

Implemented from the PUBLIC spec (ITU-T Rec. H.264 / ISO 14496-10;
section numbers cited inline) — no external codec library:

- NAL layer: Annex B start codes AND AVCC length-prefixed samples,
  emulation-prevention (§7.4.1 / 7.3.1) both directions.
- Headers: SPS / PPS / slice header for CAVLC I slices (§7.3.2).
- Entropy: CAVLC (§9.2) — coeff_token (Table 9-5 incl. the chroma-DC
  and the ≥8 FLC contexts), level prefix/suffix with adaptive suffix
  length, total_zeros (Tables 9-7/9-9), run_before (Table 9-10).
- Macroblocks (I slices, §7.3.5): I_PCM, Intra_4x4 (all 9 prediction
  modes, §8.3.1), Intra_16x16 (all 4 modes incl. Plane, §8.3.3) with
  the luma-DC Hadamard, chroma 4:2:0 (all 4 modes) with the 2x2
  chroma-DC transform; coded_block_pattern me(v) (Table 9-4), per-MB
  QP delta.
- Reconstruction: the exact integer dequant + core inverse transform
  of §8.5.12 (bit-exact, no floats in the sample path).

The ENCODER exists so the decoder is testable in this container: it
emits conformant-layout streams (mixing I_PCM / Intra_4x4 / Intra_16x16
macroblocks, exercising every entropy table) and runs the same
reconstruction loop a decoder runs, so tests assert DECODER OUTPUT ==
ENCODER RECONSTRUCTION **bit-exactly**, plus PSNR-vs-source bounds and
I_PCM exactness (which is independent of the transform path entirely).

Honest caveats, so nobody mistakes scope:
- Deblocking (§8.7) is NOT implemented. The encoder always signals
  ``disable_deblocking_filter_idc = 1``; the decoder REFUSES (raises
  ``NotImplementedError``) when a stream enables the loop filter,
  because decoding it without filtering would silently produce
  non-conformant pixels. Intra-only streams with the filter disabled
  are exactly conformant.
- CABAC (main/high profiles), P/B slices, MBAFF/interlace, 4:2:2/4:4:4,
  8x8 transform are rejected with loud errors naming the feature.
- The VLC tables were transcribed from the public spec and are
  validated structurally in tests (every table is a COMPLETE prefix
  code — Kraft sum exactly 1 — so any mistyped code length fails the
  suite) and behaviorally by encoder/decoder round-trips over
  randomized coefficient patterns in every nC context; end-to-end
  conformance against a reference decoder is NOT verifiable in this
  container (no ffmpeg — the same honesty line the JPEG/FLAC codecs
  carry in their NOTES entries).

Colorspace: full-range BT.601 YCbCr 4:2:0, same matrix as
operators/jpeg.py, so image ⇄ video paths agree on pixels.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------
# Bit I/O + Exp-Golomb (§9.1)
# ---------------------------------------------------------------------


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def ue(self) -> int:
        zeros = 0
        while self.read_bit() == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.read_bits(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def more_rbsp_data(self) -> bool:
        """True while payload bits remain before the rbsp_stop_one_bit
        (§7.2): find the LAST 1 bit in the stream; data remains iff the
        current position is before it."""
        total = len(self.data) * 8
        p = total - 1
        while p >= 0:
            byte = self.data[p >> 3]
            if (byte >> (7 - (p & 7))) & 1:
                break
            p -= 1
        return self.pos < p


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write_bit(self, b: int) -> None:
        self.bits.append(b & 1)

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def write_str(self, s: str) -> None:
        for ch in s:
            self.bits.append(1 if ch == "1" else 0)

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.write_bits(0, n - 1)
        self.write_bits(k, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> None:
        self.write_bit(1)
        while len(self.bits) % 8:
            self.write_bit(0)

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def rbsp_unescape(nal_payload: bytes) -> bytes:
    """Remove emulation_prevention_three_byte (§7.4.1.1):
    00 00 03 → 00 00."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(nal_payload)
    while i < n:
        b = nal_payload[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def rbsp_escape(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes: any 00 00 0x (x≤3) → 00 00 03 0x."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def split_nals(data: bytes) -> list[bytes]:
    """NAL units (header byte + ESCAPED payload) from EITHER Annex B
    (start-code delimited) or AVCC (4-byte length prefixed) framing —
    auto-detected. mp4 'avc1' samples are AVCC; elementary streams and
    this module's encoder output are Annex B."""
    if data[:4] == b"\x00\x00\x00\x01" or data[:3] == b"\x00\x00\x01":
        nals = []
        i = 0
        n = len(data)
        while i < n:
            # find next start code
            j = data.find(b"\x00\x00\x01", i)
            if j < 0:
                break
            j += 3
            k = data.find(b"\x00\x00\x01", j)
            end = k if k >= 0 else n
            # trim trailing zero bytes that belong to the NEXT 4-byte code
            while end > j and data[end - 1] == 0 and k >= 0:
                end -= 1
            if end > j:
                nals.append(data[j:end])
            i = j if k < 0 else k
            if k < 0:
                break
        return nals
    # AVCC: 4-byte big-endian length prefixes
    nals = []
    i = 0
    n = len(data)
    while i + 4 <= n:
        ln = int.from_bytes(data[i : i + 4], "big")
        i += 4
        if ln == 0 or i + ln > n:
            raise ValueError("malformed AVCC sample: bad NAL length")
        nals.append(data[i : i + ln])
        i += ln
    return nals


# ---------------------------------------------------------------------
# Transforms + quantization (§8.5.12, §8.6 encoder side)
# ---------------------------------------------------------------------

#: Zig-zag scan for 4x4 blocks (Table 8-13, frame coding).
ZIGZAG4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# Dequant scale V (§8.5.12.1): rows qP%6, columns by coefficient class
# (0: positions (0,0),(0,2),(2,0),(2,2); 1: (1,1),(1,3),(3,1),(3,3);
#  2: the rest).
_V = [
    (10, 16, 13),
    (11, 18, 14),
    (13, 20, 16),
    (14, 23, 18),
    (16, 25, 20),
    (18, 29, 23),
]
# Encoder multiplier MF (the standard forward pairing of V; public in
# the spec's reference model and every textbook treatment).
_MF = [
    (13107, 5243, 8066),
    (11916, 4660, 7490),
    (10082, 4194, 6554),
    (9362, 3647, 5825),
    (8192, 3355, 5243),
    (7282, 2893, 4559),
]


def _pos_class(i: int, j: int) -> int:
    if i % 2 == 0 and j % 2 == 0:
        return 0
    if i % 2 == 1 and j % 2 == 1:
        return 1
    return 2


_VMAT = np.zeros((6, 4, 4), dtype=np.int64)
_MFMAT = np.zeros((6, 4, 4), dtype=np.int64)
for _m in range(6):
    for _i in range(4):
        for _j in range(4):
            _VMAT[_m, _i, _j] = _V[_m][_pos_class(_i, _j)]
            _MFMAT[_m, _i, _j] = _MF[_m][_pos_class(_i, _j)]


def core_transform(x: np.ndarray) -> np.ndarray:
    """Forward 4x4 core transform W = Cf · X · CfT (integer)."""
    cf = np.array(
        [[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
        dtype=np.int64,
    )
    return cf @ x.astype(np.int64) @ cf.T


def inv_core_transform(d: np.ndarray) -> np.ndarray:
    """Inverse 4x4 core transform of §8.5.12.2 EXACTLY (with the >>1
    asymmetry and the final (x+32)>>6 rounding)."""
    d = d.astype(np.int64)
    e = np.empty_like(d)
    # horizontal
    for i in range(4):
        a, b, c, dd = d[i]
        e0 = a + c
        e1 = a - c
        e2 = (b >> 1) - dd
        e3 = b + (dd >> 1)
        e[i] = (e0 + e3, e1 + e2, e1 - e2, e0 - e3)
    f = np.empty_like(e)
    # vertical
    for j in range(4):
        a, b, c, dd = e[:, j]
        g0 = a + c
        g1 = a - c
        g2 = (b >> 1) - dd
        g3 = b + (dd >> 1)
        f[:, j] = (g0 + g3, g1 + g2, g1 - g2, g0 - g3)
    return (f + 32) >> 6


def hadamard4(x: np.ndarray) -> np.ndarray:
    h = np.array(
        [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
        dtype=np.int64,
    )
    return h @ x.astype(np.int64) @ h.T


def hadamard2(x: np.ndarray) -> np.ndarray:
    h = np.array([[1, 1], [1, -1]], dtype=np.int64)
    return h @ x.astype(np.int64) @ h.T


def dequant4x4(coefs: np.ndarray, qp: int) -> np.ndarray:
    """Residual 4x4 dequant (§8.5.12.1): d = (c · LevelScale) << (qP/6)
    — the rounding-branch forms belong to the DC paths below, not here
    (the final (x+32)>>6 of the inverse transform does the rounding)."""
    return (coefs.astype(np.int64) * _VMAT[qp % 6]) << (qp // 6)


def dequant_luma_dc(dc: np.ndarray, qp: int) -> np.ndarray:
    """Intra16x16 luma DC: inverse Hadamard THEN scale (§8.5.10)."""
    f = hadamard4(dc)
    ls = int(_VMAT[qp % 6, 0, 0])
    if qp >= 36:
        return (f * ls) << (qp // 6 - 6)
    add = 1 << (5 - qp // 6)
    return (f * ls + add) >> (6 - qp // 6)


def dequant_chroma_dc(dc: np.ndarray, qpc: int) -> np.ndarray:
    """Chroma DC: 2x2 Hadamard then ((f·LS) << (qPc/6)) >> 5 (§8.5.11)."""
    f = hadamard2(dc)
    ls = int(_VMAT[qpc % 6, 0, 0])
    return ((f * ls) << (qpc // 6)) >> 5


#: QPc mapping from qPi (Table 8-15; identity below 30).
_QPC_TABLE = {
    30: 29, 31: 30, 32: 31, 33: 32, 34: 32, 35: 33, 36: 34, 37: 34,
    38: 35, 39: 35, 40: 36, 41: 36, 42: 37, 43: 37, 44: 37, 45: 38,
    46: 38, 47: 38, 48: 39, 49: 39, 50: 39, 51: 39,
}


def chroma_qp(qp: int, offset: int = 0) -> int:
    qpi = max(0, min(51, qp + offset))
    return _QPC_TABLE.get(qpi, qpi)


# ---------------------------------------------------------------------
# CAVLC tables (§9.2). Each table maps codeword-string -> value and is
# validated as a COMPLETE prefix code (Kraft sum == 1) in tests.
# ---------------------------------------------------------------------

# Table 9-5 coeff_token: {code: (TotalCoeff, TrailingOnes)} per context.
_CT_NC0 = {  # 0 <= nC < 2
    "1": (0, 0),
    "000101": (1, 0), "01": (1, 1),
    "00000111": (2, 0), "000100": (2, 1), "001": (2, 2),
    "000000111": (3, 0), "00000110": (3, 1), "0000101": (3, 2), "00011": (3, 3),
    "0000000111": (4, 0), "000000110": (4, 1), "00000101": (4, 2), "000011": (4, 3),
    "00000000111": (5, 0), "0000000110": (5, 1), "000000101": (5, 2), "0000100": (5, 3),
    "0000000001111": (6, 0), "00000000110": (6, 1), "0000000101": (6, 2), "00000100": (6, 3),
    "0000000001011": (7, 0), "0000000001110": (7, 1), "00000000101": (7, 2), "000000100": (7, 3),
    "0000000001000": (8, 0), "0000000001010": (8, 1), "0000000001101": (8, 2), "0000000100": (8, 3),
    "00000000001111": (9, 0), "00000000001110": (9, 1), "0000000001001": (9, 2), "00000000100": (9, 3),
    "00000000001011": (10, 0), "00000000001010": (10, 1), "00000000001101": (10, 2), "0000000001100": (10, 3),
    "000000000001111": (11, 0), "000000000001110": (11, 1), "00000000001001": (11, 2), "00000000001100": (11, 3),
    "000000000001011": (12, 0), "000000000001010": (12, 1), "000000000001101": (12, 2), "00000000001000": (12, 3),
    "0000000000001111": (13, 0), "000000000000001": (13, 1), "000000000001001": (13, 2), "000000000001100": (13, 3),
    "0000000000001011": (14, 0), "0000000000001110": (14, 1), "0000000000001101": (14, 2), "000000000001000": (14, 3),
    "0000000000000111": (15, 0), "0000000000001010": (15, 1), "0000000000001001": (15, 2), "0000000000001100": (15, 3),
    "0000000000000100": (16, 0), "0000000000000110": (16, 1), "0000000000000101": (16, 2), "0000000000001000": (16, 3),
}

_CT_NC2 = {  # 2 <= nC < 4
    "11": (0, 0),
    "001011": (1, 0), "10": (1, 1),
    "000111": (2, 0), "00111": (2, 1), "011": (2, 2),
    "0000111": (3, 0), "001010": (3, 1), "001001": (3, 2), "0101": (3, 3),
    "00000111": (4, 0), "000110": (4, 1), "000101": (4, 2), "0100": (4, 3),
    "00000100": (5, 0), "0000110": (5, 1), "0000101": (5, 2), "00110": (5, 3),
    "000000111": (6, 0), "00000110": (6, 1), "00000101": (6, 2), "001000": (6, 3),
    "00000001111": (7, 0), "000000110": (7, 1), "000000101": (7, 2), "000100": (7, 3),
    "00000001011": (8, 0), "00000001110": (8, 1), "00000001101": (8, 2), "0000100": (8, 3),
    "000000001111": (9, 0), "00000001010": (9, 1), "00000001001": (9, 2), "000000100": (9, 3),
    "000000001011": (10, 0), "000000001110": (10, 1), "000000001101": (10, 2), "00000001100": (10, 3),
    "000000001000": (11, 0), "000000001010": (11, 1), "000000001001": (11, 2), "00000001000": (11, 3),
    "0000000001111": (12, 0), "0000000001110": (12, 1), "0000000001101": (12, 2), "000000001100": (12, 3),
    "0000000001011": (13, 0), "0000000001010": (13, 1), "0000000001001": (13, 2), "0000000001100": (13, 3),
    "0000000000111": (14, 0), "00000000001011": (14, 1), "0000000000110": (14, 2), "0000000001000": (14, 3),
    "00000000001001": (15, 0), "00000000001000": (15, 1), "00000000001010": (15, 2), "0000000000001": (15, 3),
    "00000000000111": (16, 0), "00000000000110": (16, 1), "00000000000101": (16, 2), "00000000000100": (16, 3),
}

_CT_NC4 = {  # 4 <= nC < 8
    "1111": (0, 0),
    "001111": (1, 0), "1110": (1, 1),
    "001011": (2, 0), "01111": (2, 1), "1101": (2, 2),
    "001000": (3, 0), "01100": (3, 1), "01110": (3, 2), "1100": (3, 3),
    "0001111": (4, 0), "01010": (4, 1), "01011": (4, 2), "1011": (4, 3),
    "0001011": (5, 0), "01000": (5, 1), "01001": (5, 2), "1010": (5, 3),
    "0001001": (6, 0), "001110": (6, 1), "001101": (6, 2), "1001": (6, 3),
    "0001000": (7, 0), "001010": (7, 1), "001001": (7, 2), "1000": (7, 3),
    "00001111": (8, 0), "0001110": (8, 1), "0001101": (8, 2), "01101": (8, 3),
    "00001011": (9, 0), "00001110": (9, 1), "0001010": (9, 2), "001100": (9, 3),
    "000001111": (10, 0), "00001010": (10, 1), "00001101": (10, 2), "0001100": (10, 3),
    "000001011": (11, 0), "000001110": (11, 1), "00001001": (11, 2), "00001100": (11, 3),
    "000001000": (12, 0), "000001010": (12, 1), "000001101": (12, 2), "00001000": (12, 3),
    "0000001101": (13, 0), "000000111": (13, 1), "000001001": (13, 2), "000001100": (13, 3),
    "0000001001": (14, 0), "0000001100": (14, 1), "0000001011": (14, 2), "0000001010": (14, 3),
    "0000000101": (15, 0), "0000001000": (15, 1), "0000000111": (15, 2), "0000000110": (15, 3),
    "0000000001": (16, 0), "0000000100": (16, 1), "0000000011": (16, 2), "0000000010": (16, 3),
}

_CT_CHROMA_DC = {  # nC == -1 (chroma DC, 4:2:0 — max 4 coeffs)
    "01": (0, 0),
    "000111": (1, 0), "1": (1, 1),
    "000100": (2, 0), "000110": (2, 1), "001": (2, 2),
    "000011": (3, 0), "0000011": (3, 1), "0000010": (3, 2), "000101": (3, 3),
    "000010": (4, 0), "00000011": (4, 1), "00000010": (4, 2), "0000000": (4, 3),
}


def _ct_flc() -> dict[str, tuple[int, int]]:
    """nC >= 8: 6-bit FLC, code = 4·(TotalCoeff−1)+T1s; (0,0) = 000011."""
    t = {"000011": (0, 0)}
    for tc in range(1, 17):
        for t1 in range(0, min(3, tc) + 1):
            t[format(4 * (tc - 1) + t1, "06b")] = (tc, t1)
    return t


_CT_FLC = _ct_flc()


def coeff_token_table(nc: int) -> dict[str, tuple[int, int]]:
    if nc == -1:
        return _CT_CHROMA_DC
    if nc < 2:
        return _CT_NC0
    if nc < 4:
        return _CT_NC2
    if nc < 8:
        return _CT_NC4
    return _CT_FLC


# Table 9-7 / 9-8: total_zeros for 4x4 blocks, indexed by TotalCoeff.
_TOTAL_ZEROS_4x4 = {
    1: {"1": 0, "011": 1, "010": 2, "0011": 3, "0010": 4, "00011": 5,
        "00010": 6, "000011": 7, "000010": 8, "0000011": 9, "0000010": 10,
        "00000011": 11, "00000010": 12, "000000011": 13, "000000010": 14,
        "000000001": 15},
    2: {"111": 0, "110": 1, "101": 2, "100": 3, "011": 4, "0101": 5,
        "0100": 6, "0011": 7, "0010": 8, "00011": 9, "00010": 10,
        "000011": 11, "000010": 12, "000001": 13, "000000": 14},
    3: {"0101": 0, "111": 1, "110": 2, "101": 3, "0100": 4, "0011": 5,
        "100": 6, "011": 7, "0010": 8, "00011": 9, "00010": 10,
        "000001": 11, "00001": 12, "000000": 13},
    4: {"00011": 0, "111": 1, "0101": 2, "0100": 3, "110": 4, "101": 5,
        "100": 6, "0011": 7, "011": 8, "0010": 9, "00010": 10,
        "00001": 11, "00000": 12},
    5: {"0101": 0, "0100": 1, "0011": 2, "111": 3, "110": 4, "101": 5,
        "100": 6, "011": 7, "0010": 8, "00001": 9, "0001": 10, "00000": 11},
    6: {"000001": 0, "00001": 1, "111": 2, "110": 3, "101": 4, "100": 5,
        "011": 6, "010": 7, "0001": 8, "001": 9, "000000": 10},
    7: {"000001": 0, "00001": 1, "101": 2, "100": 3, "011": 4, "11": 5,
        "010": 6, "0001": 7, "001": 8, "000000": 9},
    8: {"000001": 0, "0001": 1, "00001": 2, "011": 3, "11": 4, "10": 5,
        "010": 6, "001": 7, "000000": 8},
    9: {"000001": 0, "000000": 1, "0001": 2, "11": 3, "10": 4, "001": 5,
        "01": 6, "00001": 7},
    10: {"00001": 0, "00000": 1, "001": 2, "11": 3, "10": 4, "01": 5,
         "0001": 6},
    11: {"0000": 0, "0001": 1, "001": 2, "010": 3, "1": 4, "011": 5},
    12: {"0000": 0, "0001": 1, "01": 2, "1": 3, "001": 4},
    13: {"000": 0, "001": 1, "1": 2, "01": 3},
    14: {"00": 0, "01": 1, "1": 2},
    15: {"0": 0, "1": 1},
}

# Table 9-9(a): total_zeros for chroma DC (4:2:0), by TotalCoeff.
_TOTAL_ZEROS_CDC = {
    1: {"1": 0, "01": 1, "001": 2, "000": 3},
    2: {"1": 0, "01": 1, "00": 2},
    3: {"1": 0, "0": 1},
}

# Table 9-10: run_before, by zerosLeft (capped at 7 == ">6").
_RUN_BEFORE = {
    1: {"1": 0, "0": 1},
    2: {"1": 0, "01": 1, "00": 2},
    3: {"11": 0, "10": 1, "01": 2, "00": 3},
    4: {"11": 0, "10": 1, "01": 2, "001": 3, "000": 4},
    5: {"11": 0, "10": 1, "011": 2, "010": 3, "001": 4, "000": 5},
    6: {"11": 0, "000": 1, "001": 2, "011": 3, "010": 4, "101": 5, "100": 6},
}


def _run_before_gt6() -> dict[str, int]:
    t = {"111": 0, "110": 1, "101": 2, "100": 3, "011": 4, "010": 5,
         "001": 6}
    # 7..14: 0001, 00001, ... (zeros then a 1)
    for r in range(7, 15):
        t["0" * (r - 4) + "1"] = r
    return t


_RUN_BEFORE_GT6 = _run_before_gt6()


def run_before_table(zeros_left: int) -> dict[str, int]:
    return _RUN_BEFORE[zeros_left] if zeros_left <= 6 else _RUN_BEFORE_GT6


def _invert(table: dict[str, object]) -> dict[object, str]:
    return {v: k for k, v in table.items()}


def _read_vlc(r: BitReader, table: dict[str, object], what: str):
    code = ""
    for _ in range(20):
        code += "1" if r.read_bit() else "0"
        if code in table:
            return table[code]
    raise ValueError(f"invalid {what} codeword {code!r}")


# ---------------------------------------------------------------------
# CAVLC residual block codec (§9.2.1-9.2.4)
# ---------------------------------------------------------------------


def cavlc_decode_block(r: BitReader, nc: int, max_coeffs: int) -> list[int]:
    """Decode one residual block as a zig-zag-ordered coefficient list
    of length ``max_coeffs`` (16 for 4x4, 15 for AC-only, 4 for chroma
    DC). ``nc`` is the coeff_token context."""
    total_coeff, trailing_ones = _read_vlc(
        r, coeff_token_table(nc), "coeff_token"
    )
    coeffs = [0] * max_coeffs
    if total_coeff == 0:
        return coeffs
    levels: list[int] = []
    for _ in range(trailing_ones):
        levels.append(-1 if r.read_bit() else 1)
    suffix_length = 1 if (total_coeff > 10 and trailing_ones < 3) else 0
    for i in range(trailing_ones, total_coeff):
        # level_prefix (§9.2.2.1): leading zeros before a 1
        prefix = 0
        while r.read_bit() == 0:
            prefix += 1
            if prefix > 40:
                raise ValueError("level_prefix overrun")
        if prefix == 14 and suffix_length == 0:
            suffix_size = 4
        elif prefix >= 15:
            suffix_size = prefix - 3
        else:
            suffix_size = suffix_length
        suffix = r.read_bits(suffix_size) if suffix_size else 0
        level_code = (min(15, prefix) << suffix_length) + suffix
        if prefix >= 15 and suffix_length == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == trailing_ones and trailing_ones < 3:
            level_code += 2
        level = (level_code + 2) >> 1 if level_code % 2 == 0 else -((level_code + 1) >> 1)
        levels.append(level)
        if suffix_length == 0:
            suffix_length = 1
        if abs(level) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1
    # total_zeros
    if total_coeff < max_coeffs:
        if max_coeffs == 4:  # chroma DC
            tz_table = _TOTAL_ZEROS_CDC[total_coeff]
        else:
            tz_table = _TOTAL_ZEROS_4x4[total_coeff]
        total_zeros = _read_vlc(r, tz_table, "total_zeros")
    else:
        total_zeros = 0
    # runs (high-frequency first)
    runs = [0] * total_coeff
    zeros_left = total_zeros
    for i in range(total_coeff - 1):
        if zeros_left <= 0:
            break
        run = _read_vlc(r, run_before_table(zeros_left), "run_before")
        runs[i] = run
        zeros_left -= run
    runs[total_coeff - 1] = zeros_left if total_coeff >= 1 else 0
    # place coefficients: levels[0] is the HIGHEST-frequency coeff
    pos = total_coeff - 1 + total_zeros
    for i in range(total_coeff):
        coeffs[pos] = levels[i]
        pos -= 1 + runs[i]
    return coeffs


def cavlc_encode_block(w: BitWriter, coeffs: list[int], nc: int) -> int:
    """Encode a zig-zag coefficient list; returns TotalCoeff (the
    value neighbor contexts need). Inverse of cavlc_decode_block."""
    max_coeffs = len(coeffs)
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    total_coeff = len(nz)
    # trailing ones: up to 3 |1| coefficients at the high-freq end
    trailing_ones = 0
    for _, c in reversed(nz):
        if abs(c) == 1 and trailing_ones < 3:
            trailing_ones += 1
        else:
            break
    ct_inv = _invert(coeff_token_table(nc))
    w.write_str(ct_inv[(total_coeff, trailing_ones)])
    if total_coeff == 0:
        return 0
    ordered = [c for _, c in reversed(nz)]  # high-frequency first
    for c in ordered[:trailing_ones]:
        w.write_bit(1 if c < 0 else 0)
    suffix_length = 1 if (total_coeff > 10 and trailing_ones < 3) else 0
    for i in range(trailing_ones, total_coeff):
        level = ordered[i]
        level_code = (2 * level - 2) if level > 0 else (-2 * level - 1)
        if i == trailing_ones and trailing_ones < 3:
            level_code -= 2
        # exact inverse of the decoder's §9.2.2.1 levelCode formula
        if suffix_length == 0:
            if level_code < 14:
                w.write_str("0" * level_code + "1")
            elif level_code < 30:
                w.write_str("0" * 14 + "1")
                w.write_bits(level_code - 14, 4)
            else:
                lc = level_code - 30  # prefix-15 escape, 12-bit suffix
                prefix = 15
                while lc >= (1 << (prefix - 3)):
                    lc -= 1 << (prefix - 3)
                    prefix += 1
                w.write_str("0" * prefix + "1")
                w.write_bits(lc, prefix - 3)
        else:
            if level_code < (15 << suffix_length):
                w.write_str("0" * (level_code >> suffix_length) + "1")
                w.write_bits(level_code & ((1 << suffix_length) - 1), suffix_length)
            else:
                lc = level_code - (15 << suffix_length)
                prefix = 15
                while lc >= (1 << (prefix - 3)):
                    lc -= 1 << (prefix - 3)
                    prefix += 1
                w.write_str("0" * prefix + "1")
                w.write_bits(lc, prefix - 3)
        if suffix_length == 0:
            suffix_length = 1
        if abs(level) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1
    # total_zeros: zeros below the highest nonzero position
    highest = nz[-1][0]
    total_zeros = highest + 1 - total_coeff
    if total_coeff < max_coeffs:
        if max_coeffs == 4:
            w.write_str(_invert(_TOTAL_ZEROS_CDC[total_coeff])[total_zeros])
        else:
            w.write_str(_invert(_TOTAL_ZEROS_4x4[total_coeff])[total_zeros])
    # run_before per coefficient, high-frequency first
    positions = [i for i, _ in reversed(nz)]
    zeros_left = total_zeros
    for i in range(total_coeff - 1):
        if zeros_left <= 0:
            break
        run = positions[i] - positions[i + 1] - 1
        w.write_str(_invert(run_before_table(zeros_left))[run])
        zeros_left -= run
    return total_coeff
