"""Arithmetic-coded JPEG (T.81 Annex D QM-coder + Annex F sequential
DCT statistical models): decode SOF9 streams and encode them for
fixtures/round-trips, sharing the DCT/quantization/reconstruction
plumbing with operators/jpeg.py so the entropy layer is the ONLY
difference from the Huffman path.

Scope: sequential DCT (SOF9, interleaved scans) AND progressive DCT
(SOF10 — Annex G spectral selection + successive approximation over
the QM-coder), grayscale/RGB, 4:4:4 and 4:2:0, 8- and 12-bit
precision (sequential), restart intervals, DAC conditioning (L/U for
DC, Kx for AC; defaults 0/1/5 per F.1.4.4.1.2). CMYK and
non-interleaved sequential arithmetic scans are rejected loudly —
the documented remainder.

The QM-coder is implemented from the spec's flowchart procedures
(CODEMPS/CODELPS/RENORME/BYTEOUT with carry stacking; DECODE/
LPS-vs-MPS conditional exchange/RENORMD/BYTEIN with 0xFF00
unstuffing and zero-fill past markers) with the probability
estimation state machine of Table D.3. Verification posture: the
encoder/decoder pair is fuzz-roundtripped at the raw-coder level
(including forced carry/0xFF-stacking paths) and the full codec is
differential-tested against the Huffman path on identical quantized
coefficients; no arithmetic-capable third-party decoder exists in
this container to pin cross-implementation interop, so Table D.3 and
the register alignment follow the published standard text and are
flagged for a known-answer pin if a reference bitstream lands.

Reference parity: the reference repo (a TypeScript monorepo) has no
image codecs; this extends the multimodal decode surface
(operators/multimodal.py) the same way the progressive/12-bit paths
did."""

from __future__ import annotations

import struct

import numpy as np

# (Qe, NMPS, NLPS, SWITCH) — T.81 Table D.3 probability estimation
# state machine; index 113 is the non-adaptive "fixed" 0.5 bin used
# for AC sign decisions (F.1.4.3.1), which never leaves its state.
QM_STATES = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # fixed ~0.5 bin: never adapts
]

FIXED_BIN = 113

# statistics-area sizes per T.81 Tables F.4/F.5 (rounded up): DC uses
# 20 S-contexts + X1..X15 at 20..34 + magnitude bins at +14; AC uses a
# (SE,S0,SP) triplet per k at 3*(k-1), X2.. chains at 189 (low k) /
# 217 (high k), magnitude bins at +14.
DC_STAT_BINS = 64
AC_STAT_BINS = 256
AC_HIGH_X = 217
AC_LOW_X = 189


class QMEncoder:
    """T.81 Annex D encoder registers: A (range), C (code, window
    emitted at bit 19), CT (shift countdown, init 11), with the
    carry-stacking byte output of D.1.6 — a produced 0xFF is held on
    a stack until the next non-0xFF window byte resolves whether a
    carry turns it into 0x00, and every OUTPUT 0xFF is followed by a
    stuffed 0x00 so the segment stays marker-free."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.held: int | None = None
        self.stack = 0
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:  # carry resolves the stack: FF+1 wraps to 00
            if self.held is not None:
                self._emit(self.held + 1)
            for _ in range(self.stack):
                self._emit(0x00)
            self.stack = 0
            self.held = t & 0xFF
        elif t == 0xFF:
            self.stack += 1  # future carry could still flip it
        else:
            if self.held is not None:
                self._emit(self.held)
            for _ in range(self.stack):
                self._emit(0xFF)
            self.stack = 0
            self.held = t
        self.c &= 0x7FFFF
        self.ct = 8

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        """Code one binary decision under context st[i] (low 7 bits =
        Table D.3 index, top bit = current MPS sense). LPS occupies
        the bottom Qe of the interval, MPS the top, with conditional
        exchange when the MPS sub-interval shrinks below Qe."""
        s = st[i]
        idx, mps = s & 0x7F, s >> 7
        qe, nm, nl, sw = QM_STATES[idx]
        self.a -= qe
        if bit == mps:
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe  # exchange: MPS takes the bottom slot
            else:
                self.c += qe
            st[i] = (mps << 7) | nm
            self._renorm()
        else:
            if self.a < qe:
                self.c += qe  # exchange: LPS takes the top slot
            else:
                self.a = qe
            if sw:
                mps ^= 1
            st[i] = (mps << 7) | nl
            self._renorm()

    def flush(self) -> bytes:
        """D.1.8: set C to the largest value with trailing zeros that
        still lies in the final interval, push the remaining window
        bytes out, and drain the held/stacked bytes."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self.held is not None:
            self._emit(self.held)
        for _ in range(self.stack):
            self._emit(0xFF)
        self.held, self.stack = None, 0
        return bytes(self.out)


class QMDecoder:
    """T.81 F.2.2 decoder in bit-feed form: CHIGH tracks the code
    value at the SAME scale as the encoder's A register (init
    0x10000), consuming one stream bit per renormalization shift —
    the byte/CT register juggling of the spec's software conventions
    collapses to this once C is kept interval-aligned. The byte
    feeder unstuffs 0xFF00 and feeds zero bytes once a marker is
    reached (legal mid-segment in arithmetic coding — the decoder
    finishes the MCU set on synthetic zeros)."""

    def __init__(self, payload: bytes, pos: int) -> None:
        self.payload = payload
        self.pos = pos
        self.exhausted = False
        self.bitbuf = 0
        self.bitcnt = 0
        # CHIGH = the first 16 stream bits: the code value at the
        # encoder's initial scale (A spans [0, 0x10000) — bit 16 of
        # the code point is always 0, so 16 bits suffice)
        self.chigh = (self._next_byte() << 8) | self._next_byte()
        self.a = 0x10000

    def _next_byte(self) -> int:
        p, pos = self.payload, self.pos
        if self.exhausted or pos >= len(p):
            self.exhausted = True
            return 0
        b = p[pos]
        if b == 0xFF:
            if pos + 1 < len(p) and p[pos + 1] == 0x00:
                self.pos = pos + 2  # stuffed data byte 0xFF
                return 0xFF
            self.exhausted = True  # marker: zero-fill from here on
            return 0
        self.pos = pos + 1
        return b

    def _next_bit(self) -> int:
        if self.bitcnt == 0:
            self.bitbuf = self._next_byte()
            self.bitcnt = 8
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.chigh = (self.chigh << 1) | self._next_bit()

    def decode(self, st: bytearray, i: int) -> int:
        s = st[i]
        idx, mps = s & 0x7F, s >> 7
        qe, nm, nl, sw = QM_STATES[idx]
        self.a -= qe
        if self.chigh < qe:
            # bottom (LPS-sized) slot — MPS under conditional exchange
            if self.a < qe:
                d = mps
                st[i] = (mps << 7) | nm
            else:
                d = mps ^ 1
                if sw:
                    mps ^= 1
                st[i] = (mps << 7) | nl
            self.a = qe
            self._renorm()
        else:
            self.chigh -= qe
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = mps ^ 1
                if sw:
                    mps ^= 1
                st[i] = (mps << 7) | nl
            else:
                d = mps
                st[i] = (mps << 7) | nm
            self._renorm()
        return d

    def seek_marker(self) -> int:
        """Position of the next marker 0xFF (skipping stuffed 0xFF00
        pairs) at or after the read cursor — where RSTn/EOI must sit
        once the current interval's data is done."""
        p, j = self.payload, self.pos
        while j < len(p):
            if p[j] == 0xFF:
                if j + 1 < len(p) and p[j + 1] == 0x00:
                    j += 2
                    continue
                return j
            j += 1
        return j


class _Stats:
    """Per-table statistics areas + per-component DC conditioning
    state; reset() returns everything to the initial state (all
    contexts at index 0, MPS 0) as restart markers require."""

    def __init__(self, n_comps: int) -> None:
        self.dc: dict[int, bytearray] = {}
        self.ac: dict[int, bytearray] = {}
        self.fixed = bytearray([FIXED_BIN])
        self.n_comps = n_comps
        self.reset()

    def reset(self) -> None:
        for t in range(4):
            self.dc[t] = bytearray(DC_STAT_BINS)
            self.ac[t] = bytearray(AC_STAT_BINS)
        self.dc_ctx = [0] * self.n_comps
        self.last_dc = [0] * self.n_comps


def _decode_dc(dec: QMDecoder, stats: _Stats, tbl: int, ci: int,
               cond: tuple[int, int]) -> int:
    """One DC difference per F.2.4.1: zero/sign/log2-magnitude
    decision tree conditioned on the previous difference's class."""
    low, up = cond
    st = stats.dc[tbl]
    i = stats.dc_ctx[ci]
    if dec.decode(st, i) == 0:
        stats.dc_ctx[ci] = 0
        return 0
    sign = dec.decode(st, i + 1)
    m = dec.decode(st, i + 2 + sign)
    xi = i + 2 + sign
    if m:
        xi = 20  # X1
        while dec.decode(st, xi):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic JPEG: DC magnitude overflow")
            xi += 1
    # conditioning class for the NEXT block (F.1.4.4.1.2)
    if m < (1 << low) >> 1:
        stats.dc_ctx[ci] = 0
    elif m > (1 << up) >> 1:
        stats.dc_ctx[ci] = 12 + sign * 4
    else:
        stats.dc_ctx[ci] = 4 + sign * 4
    v = m
    mi = xi + 14
    while m := m >> 1:
        if dec.decode(st, mi):
            v |= m
    v += 1
    return -v if sign else v


def _decode_ac(dec: QMDecoder, stats: _Stats, tbl: int, kx: int,
               block: np.ndarray, ss: int = 1, se: int = 63,
               al: int = 0) -> None:
    """AC coefficients [ss, se] in zigzag order per F.2.4.2: per-k
    (EOB, zero, magnitude) triplets, sign on the fixed bin, X-chains
    split at Kx. ``al`` is the successive-approximation point
    transform of a progressive first scan (G.2.3 uses the sequential
    model on the shifted values)."""
    st = stats.ac[tbl]
    k = ss
    while k <= se:
        i = 3 * (k - 1)
        if dec.decode(st, i):
            return  # EOB
        while dec.decode(st, i + 1) == 0:
            k += 1
            i += 3
            if k > se:
                raise ValueError("arithmetic JPEG: AC run past end of block")
        sign = dec.decode(stats.fixed, 0)
        i += 2
        m = dec.decode(st, i)
        mi = i
        if m and dec.decode(st, i):
            m = 2
            mi = AC_LOW_X if k <= kx else AC_HIGH_X
            while dec.decode(st, mi):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arithmetic JPEG: AC magnitude overflow")
                mi += 1
        v = m
        mi += 14
        while m := m >> 1:
            if dec.decode(st, mi):
                v |= m
        v += 1
        block[k] = (-v << al) if sign else (v << al)
        k += 1


def _encode_dc(enc: QMEncoder, stats: _Stats, tbl: int, ci: int,
               cond: tuple[int, int], diff: int) -> None:
    low, up = cond
    st = stats.dc[tbl]
    i = stats.dc_ctx[ci]
    if diff == 0:
        enc.encode(st, i, 0)
        stats.dc_ctx[ci] = 0
        return
    enc.encode(st, i, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, i + 1, sign)
    v = -diff if sign else diff
    v -= 1
    xi = i + 2 + sign
    m = 0
    if v:
        enc.encode(st, xi, 1)
        m = 1
        v2 = v
        xi = 20
        while v2 := v2 >> 1:
            enc.encode(st, xi, 1)
            m <<= 1
            xi += 1
    enc.encode(st, xi, 0)
    if m < (1 << low) >> 1:
        stats.dc_ctx[ci] = 0
    elif m > (1 << up) >> 1:
        stats.dc_ctx[ci] = 12 + sign * 4
    else:
        stats.dc_ctx[ci] = 4 + sign * 4
    mi = xi + 14
    while m := m >> 1:
        enc.encode(st, mi, 1 if m & v else 0)


def _encode_ac(enc: QMEncoder, stats: _Stats, tbl: int, kx: int,
               zz: np.ndarray, ss: int = 1, se: int = 63,
               al: int = 0) -> None:
    st = stats.ac[tbl]

    def pt(k: int) -> int:  # point transform: |v| >> al, sign kept
        v = int(zz[k])
        return -((-v) >> al) if v < 0 else v >> al

    ke = se
    while ke >= ss and pt(ke) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        i = 3 * (k - 1)
        enc.encode(st, i, 0)  # not EOB
        while (v := pt(k)) == 0:
            enc.encode(st, i + 1, 0)
            k += 1
            i += 3
        enc.encode(st, i + 1, 1)
        sign = 1 if v < 0 else 0
        enc.encode(stats.fixed, 0, sign)
        if sign:
            v = -v
        v -= 1
        i += 2
        m = 0
        mi = i
        if v:
            enc.encode(st, i, 1)
            m = 1
            v2 = v
            if v2 := v2 >> 1:
                enc.encode(st, i, 1)
                m = 2
                mi = AC_LOW_X if k <= kx else AC_HIGH_X
                while v2 := v2 >> 1:
                    enc.encode(st, mi, 1)
                    m <<= 1
                    mi += 1
        enc.encode(st, mi, 0)
        mi += 14
        while m := m >> 1:
            enc.encode(st, mi, 1 if m & v else 0)
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _dac_cond(dac: dict | None, sel: dict, comps: list[dict]):
    """(dc_cond per table, ac_kx per table) with the F.1.4.4.1.2 /
    F.1.4.4.2 defaults L=0, U=1, Kx=5 when no DAC segment set them."""
    dac = dac or {}
    dc_cond, ac_kx = {}, {}
    for c in comps:
        dt, at = sel[c["id"]]
        dc_cond[dt] = dac.get(("dc", dt), (0, 1))
        ac_kx[at] = dac.get(("ac", at), 5)
    return dc_cond, ac_kx


def decode_scan_arith(payload, start, frame, sel, qtabs, dac, dri):
    """Interleaved sequential arithmetic scan — the SOF9 counterpart
    of jpeg._decode_scan, sharing _finish_planes so decodes are
    bit-comparable with the Huffman path."""
    from .jpeg import ZIGZAG, _finish_planes, idct2

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    shift = float(1 << (frame.get("prec", 8) - 1))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    dc_cond, ac_kx = _dac_cond(dac, sel, comps)
    stats = _Stats(len(comps))
    dec = QMDecoder(payload, start)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                # restart: statistics, conditioning AND the coder
                # itself restart from scratch after the RSTn marker
                mpos = dec.seek_marker()
                if not (
                    mpos + 1 < len(payload)
                    and payload[mpos] == 0xFF
                    and 0xD0 <= payload[mpos + 1] <= 0xD7
                ):
                    raise ValueError("arithmetic JPEG: expected RSTn marker")
                dec = QMDecoder(payload, mpos + 2)
                stats.reset()
            for ci, c in enumerate(comps):
                dc_t, ac_t = sel[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        stats.last_dc[ci] += _decode_dc(
                            dec, stats, dc_t, ci, dc_cond[dc_t]
                        )
                        zz[0] = stats.last_dc[ci]
                        _decode_ac(dec, stats, ac_t, ac_kx[ac_t], zz)
                        deq = np.zeros(64, dtype=np.int64)
                        deq[ZIGZAG] = zz
                        pix = idct2(deq.reshape(8, 8) * qtabs[c["tq"]])
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix + shift
            mcu_count += 1
    return _finish_planes(planes, comps, hmax, vmax, h, w,
                          prec=frame.get("prec", 8),
                          adobe=frame.get("adobe"))


def encode_jpeg_arithmetic(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """SOF9 encoder for fixtures/round-trips: identical plane/DCT/
    quantization pipeline to jpeg.encode_jpeg (so the quantized
    coefficient stream is byte-for-byte the same), arithmetic entropy
    layer, DAC segment carrying the default conditioning explicitly.
    Grayscale or RGB, 4:4:4 / 4:2:0, 8/12-bit, restart intervals."""
    from .jpeg import QTAB_CHROMA, QTAB_LUMA, ZIGZAG, _scale_qtab, dct2

    gray = img.ndim == 2
    if img.ndim == 3 and img.shape[2] == 4:
        raise ValueError("arithmetic CMYK encoding unsupported")
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    center = float(1 << (precision - 1))
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        subsample = False
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + center,
            0.5 * r - 0.418688 * g - 0.081312 * b + center,
        ]
    q_l = _scale_qtab(QTAB_LUMA, quality)
    q_c = _scale_qtab(QTAB_CHROMA, quality)
    qts = [q_l] if gray else [q_l, q_c, q_c]
    tab_ids = [0] + [1] * (len(planes) - 1)
    cond = {("dc", 0): (0, 1), ("dc", 1): (0, 1), ("ac", 0): 5, ("ac", 1): 5}

    stats = _Stats(len(planes))
    enc = QMEncoder()
    scan = bytearray()
    mcu_count = 0
    rst_idx = 0

    def emit_block(p: np.ndarray, by: int, bx: int, ci: int) -> None:
        tq = tab_ids[ci]
        block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - center
        coeffs = np.round(dct2(block) / qts[min(ci, len(qts) - 1)]).astype(np.int64)
        zz = coeffs.ravel()[ZIGZAG]
        diff = int(zz[0]) - stats.last_dc[ci]
        stats.last_dc[ci] = int(zz[0])
        _encode_dc(enc, stats, tq, ci, cond[("dc", tq)], diff)
        _encode_ac(enc, stats, tq, cond[("ac", tq)], zz)

    def end_mcu(total_mcus: int) -> None:
        nonlocal mcu_count, rst_idx, enc
        mcu_count += 1
        if (
            restart_interval
            and mcu_count % restart_interval == 0
            and mcu_count < total_mcus
        ):
            scan.extend(enc.flush())
            scan.extend((0xFF, 0xD0 + rst_idx % 8))
            rst_idx += 1
            enc = QMEncoder()
            stats.reset()

    if not subsample:
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        total_mcus = (ph // 8) * (pw // 8)
        padded = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]
        for by in range(ph // 8):
            for bx in range(pw // 8):
                for ci, p in enumerate(padded):
                    emit_block(p, by, bx, ci)
                end_mcu(total_mcus)
    else:
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        total_mcus = (ph // 16) * (pw // 16)
        yp = np.pad(planes[0], ((0, ph - h), (0, pw - w)), mode="edge")
        chroma = []
        for p in planes[1:]:
            p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            chroma.append(
                (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0
            )
        for my in range(ph // 16):
            for mx in range(pw // 16):
                for by in range(2):
                    for bx in range(2):
                        emit_block(yp, my * 2 + by, mx * 2 + bx, 0)
                emit_block(chroma[0], my, mx, 1)
                emit_block(chroma[1], my, mx, 2)
                end_mcu(total_mcus)
    scan.extend(enc.flush())

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, tab: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(int(v) for v in tab.ravel()[ZIGZAG])) \
            if precision == 8 else seg(
                0xDB,
                bytes([0x10 | tq])
                + b"".join(
                    struct.pack(">H", int(v)) for v in tab.ravel()[ZIGZAG]
                ),
            )

    nc = len(planes)
    luma_hv = 0x22 if subsample else 0x11
    sof_comps = b"".join(
        bytes([cid, luma_hv if cid == 1 else 0x11, tab_ids[cid - 1]])
        for cid in range(1, nc + 1)
    )
    sof = seg(
        0xC9, bytes([precision]) + struct.pack(">HH", h, w) + bytes([nc]) + sof_comps
    )
    # DAC: DC tables carry (U<<4)|L, AC tables carry Kx (B.2.4.3)
    dac_body = bytearray()
    for t in sorted({tab_ids[i] for i in range(nc)}):
        low, up = cond[("dc", t)]
        dac_body += bytes([t, (up << 4) | low])
        dac_body += bytes([0x10 | t, cond[("ac", t)]])
    out = b"\xff\xd8" + dqt(0, q_l)
    if nc > 1:
        out += dqt(1, q_c)
    out += seg(0xCC, bytes(dac_body)) + sof
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos_comps = b"".join(
        bytes([cid, (tab_ids[cid - 1] << 4) | tab_ids[cid - 1]])
        for cid in range(1, nc + 1)
    )
    out += seg(0xDA, bytes([nc]) + sos_comps + bytes([0, 63, 0]))
    return out + bytes(scan) + b"\xff\xd9"


# --- progressive arithmetic (SOF10, T.81 Annex G with the QM-coder) ---------


def _decode_ac_refine(dec: QMDecoder, stats: _Stats, tbl: int,
                      block: np.ndarray, ss: int, se: int, al: int) -> None:
    """AC successive-approximation refinement (G.2.3 Decode_AC_refine):
    per-k EOB decisions only beyond the previous stage's end-of-block,
    correction bits at SP for already-nonzero coefficients, newly
    nonzero ones via S0 + fixed-bin sign at magnitude ±1<<al."""
    st = stats.ac[tbl]
    p1, m1 = 1 << al, -1 << al
    kex = se
    while kex >= ss and block[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        i = 3 * (k - 1)
        if k > kex and dec.decode(st, i):
            return  # EOB
        while True:
            if block[k]:
                if dec.decode(st, i + 2):
                    block[k] += m1 if block[k] < 0 else p1
                break
            if dec.decode(st, i + 1):
                block[k] = m1 if dec.decode(stats.fixed, 0) else p1
                break
            k += 1
            i += 3
            if k > se:
                raise ValueError("arithmetic JPEG: AC refine past end of band")
        k += 1


def _encode_ac_refine(enc: QMEncoder, stats: _Stats, tbl: int,
                      zz: np.ndarray, ss: int, se: int, al: int) -> None:
    st = stats.ac[tbl]

    def cur(k: int) -> int:  # value visible after this scan
        v = int(zz[k])
        return -((-v) >> al) if v < 0 else v >> al

    def prev(k: int) -> int:  # value visible before this scan
        v = int(zz[k])
        return -((-v) >> (al + 1)) if v < 0 else v >> (al + 1)

    ke = se
    while ke >= ss and cur(ke) == 0:
        ke -= 1
    kex = se
    while kex >= ss and prev(kex) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        i = 3 * (k - 1)
        if k > kex:
            enc.encode(st, i, 0)  # not EOB yet
        while True:
            if prev(k):
                enc.encode(st, i + 2, abs(cur(k)) & 1)
                break
            if (c := cur(k)):
                enc.encode(st, i + 1, 1)
                enc.encode(stats.fixed, 0, 1 if c < 0 else 0)
                break
            enc.encode(st, i + 1, 0)
            k += 1
            i += 3
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def decode_progressive_arith(payload, frame, qtabs, scans, dac):
    """SOF10 decoder: the scan structure of jpeg._decode_progressive
    with QM entropy — statistics, conditioning and the coder restart
    fresh at every scan (and at every RSTn), coefficients accumulate
    across scans, and the shared reconstruction tail keeps decodes
    bit-comparable with every other path."""
    from .jpeg import _comp_grids, _reconstruct_coef_grids

    comps = frame["comps"]
    hmax, vmax, mcus_x, mcus_y, bw, bh, tbw, tbh = _comp_grids(frame)
    coef = [
        np.zeros((bh[ci], bw[ci], 64), dtype=np.int64)
        for ci in range(len(comps))
    ]
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    dac = dac or {}

    for scan in scans:
        sidx = [by_id[cid] for cid in scan["order"]]
        dri = scan["dri"]
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        stats = _Stats(len(comps))
        dec = QMDecoder(payload, scan["start"])
        units = 0

        def maybe_restart():
            nonlocal dec, units
            if dri and units and units % dri == 0:
                mpos = dec.seek_marker()
                if not (
                    mpos + 1 < len(payload)
                    and payload[mpos] == 0xFF
                    and 0xD0 <= payload[mpos + 1] <= 0xD7
                ):
                    raise ValueError("arithmetic JPEG: expected RSTn marker")
                dec = QMDecoder(payload, mpos + 2)
                stats.reset()

        if ss == 0:  # DC scan
            if se != 0:
                raise ValueError("DC scan with Se != 0")

            def dc_block(ci, by_, bx_):
                block = coef[ci][by_, bx_]
                if ah == 0:
                    dc_t = scan["sel"][comps[ci]["id"]][0]
                    cond = dac.get(("dc", dc_t), (0, 1))
                    stats.last_dc[ci] += _decode_dc(dec, stats, dc_t, ci, cond)
                    block[0] = stats.last_dc[ci] << al
                else:  # refinement: one fixed-bin bit (G.2.2)
                    if dec.decode(stats.fixed, 0):
                        block[0] |= 1 << al

            if len(sidx) > 1:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        maybe_restart()
                        for ci in sidx:
                            c = comps[ci]
                            for y2 in range(c["v"]):
                                for x2 in range(c["h"]):
                                    dc_block(ci, my * c["v"] + y2,
                                             mx * c["h"] + x2)
                        units += 1
            else:
                ci = sidx[0]
                for by_ in range(tbh[ci]):
                    for bx_ in range(tbw[ci]):
                        maybe_restart()
                        dc_block(ci, by_, bx_)
                        units += 1
        else:  # AC scan: single component, true grid, raster
            if len(sidx) != 1:
                raise ValueError("interleaved AC scan is not legal in progressive")
            ci = sidx[0]
            ac_t = scan["sel"][comps[ci]["id"]][1]
            kx = dac.get(("ac", ac_t), 5)
            for by_ in range(tbh[ci]):
                for bx_ in range(tbw[ci]):
                    maybe_restart()
                    block = coef[ci][by_, bx_]
                    if ah == 0:
                        _decode_ac(dec, stats, ac_t, kx, block, ss, se, al)
                    else:
                        _decode_ac_refine(dec, stats, ac_t, block, ss, se, al)
                    units += 1
    return _reconstruct_coef_grids(coef, frame, qtabs, bh, bw, hmax, vmax)


def encode_jpeg_progressive_arithmetic(
    img: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """SOF10 encoder for fixtures/round-trips: the SAME scan script as
    jpeg.encode_jpeg_progressive (spectral selection + two successive-
    approximation descents) over the shared _progressive_coef_grids,
    with QM entropy per scan — so SOF10, SOF2, SOF9 and SOF0 decodes
    of the same image are all byte-identical."""
    from .jpeg import ZIGZAG, _comp_grids, _progressive_coef_grids

    frame, comps, coefs, q_l, q_c = _progressive_coef_grids(
        img, quality, subsample
    )
    nc = len(comps)
    hmax, vmax, mcus_x, mcus_y, bw, bh, tbw, tbh = _comp_grids(frame)
    cond = {("dc", 0): (0, 1), ("dc", 1): (0, 1), ("ac", 0): 5, ("ac", 1): 5}

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos_header(comp_list, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_list)])
        for ci in comp_list:
            t = 0 if ci == 0 else 1
            body += bytes([comps[ci]["id"], (t << 4) | t])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    scans = bytearray()

    def dc_scan(ah, al):
        stats = _Stats(nc)
        enc = QMEncoder()
        order = []
        if nc > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, c in enumerate(comps):
                        for y2 in range(c["v"]):
                            for x2 in range(c["h"]):
                                order.append(
                                    (ci, my * c["v"] + y2, mx * c["h"] + x2)
                                )
        else:
            order = [
                (0, by_, bx_)
                for by_ in range(tbh[0])
                for bx_ in range(tbw[0])
            ]
        for ci, by_, bx_ in order:
            dc = int(coefs[ci][by_, bx_, 0])
            t = 0 if ci == 0 else 1
            if ah == 0:
                v = dc >> al  # arithmetic shift per A.4.1
                diff = v - stats.last_dc[ci]
                stats.last_dc[ci] = v
                _encode_dc(enc, stats, t, ci, cond[("dc", t)], diff)
            else:
                enc.encode(stats.fixed, 0, (dc >> al) & 1)
        scans.extend(sos_header(list(range(nc)), 0, 0, ah, al))
        scans.extend(enc.flush())

    def ac_scan(ci, ss, se, ah, al):
        stats = _Stats(nc)
        enc = QMEncoder()
        t = 0 if ci == 0 else 1
        for by_ in range(tbh[ci]):
            for bx_ in range(tbw[ci]):
                zz = coefs[ci][by_, bx_]
                if ah == 0:
                    _encode_ac(enc, stats, t, cond[("ac", t)], zz, ss, se, al)
                else:
                    _encode_ac_refine(enc, stats, t, zz, ss, se, al)
        scans.extend(sos_header([ci], ss, se, ah, al))
        scans.extend(enc.flush())

    # same scan script as the Huffman progressive encoder
    dc_scan(0, 1)
    ac_scan(0, 1, 5, 0, 2)
    ac_scan(0, 6, 63, 0, 2)
    for ci in range(1, nc):
        ac_scan(ci, 1, 63, 0, 0)
    dc_scan(1, 0)
    ac_scan(0, 1, 5, 2, 1)
    ac_scan(0, 6, 63, 2, 1)
    ac_scan(0, 1, 5, 1, 0)
    ac_scan(0, 6, 63, 1, 0)

    def dqt(tq: int, tab: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(int(v) for v in tab.ravel()[ZIGZAG]))

    sof_comps = b"".join(
        bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]]) for c in comps
    )
    sof = seg(
        0xCA,
        bytes([8]) + struct.pack(">HH", frame["h"], frame["w"])
        + bytes([nc]) + sof_comps,
    )
    dac_body = bytearray()
    for t in range(min(nc, 2)):
        low, up = cond[("dc", t)]
        dac_body += bytes([t, (up << 4) | low])
        dac_body += bytes([0x10 | t, cond[("ac", t)]])
    out = b"\xff\xd8" + dqt(0, q_l)
    if nc > 1:
        out += dqt(1, q_c)
    out += seg(0xCC, bytes(dac_body)) + sof
    return out + bytes(scans) + b"\xff\xd9"
