"""FLAC decode — the lossless audio format speech corpora actually
ship (stdlib + numpy, same posture as the image codecs: RFC 9639 /
the xiph spec is public math).

Decoder scope: STREAMINFO + metadata-block walk, frames with CRC-8
headers, all four channel assignments (independent, left/side,
right/side, mid/side), subframe types CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (any order, quantized coefficients), wasted bits,
Rice-coded residuals with partitioning and the escaped-raw fallback,
8/16/24-bit samples, UTF-8-coded frame numbers. Output matches
_decode_wav: (n_samples, n_channels) float32 in [-1, 1]. Variable
blocksize streams and 32-bit samples are rejected loudly.

The encoder exists for fixtures/round-trips (constant, verbatim and
fixed-predictor subframes with single-partition Rice residuals,
independent or mid/side stereo) — lossless, so
decode(encode(x)) == x EXACTLY at integer level, property-tested."""

from __future__ import annotations

import struct

import numpy as np


class _MSBReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # bit position

    def read(self, n: int) -> int:
        v = 0
        d, p = self.data, self.pos
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        d, p = self.data, self.pos
        q = 0
        while not (d[p >> 3] >> (7 - (p & 7))) & 1:
            q += 1
            p += 1
        self.pos = p + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _rice_read(rd: _MSBReader, param: int) -> int:
    q = rd.unary()
    u = (q << param) | rd.read(param) if param else q
    return (u >> 1) ^ -(u & 1)  # zigzag


def _rice_write(bits: list[int], v: int, param: int) -> None:
    u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
    q = u >> param
    bits.extend([0] * q + [1])
    for i in range(param - 1, -1, -1):
        bits.append((u >> i) & 1)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_number(rd: _MSBReader) -> int:
    b0 = rd.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (rd.read(8) & 0x3F)
    return v


_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}


def decode_flac(payload: bytes) -> np.ndarray:
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: missing fLaC magic")
    pos = 4
    info = None
    while True:
        hdr = payload[pos : pos + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            rd = _MSBReader(body)
            rd.read(16)  # min blocksize
            rd.read(16)  # max blocksize
            rd.read(24)
            rd.read(24)
            rate = rd.read(20)
            ch = rd.read(3) + 1
            bps = rd.read(5) + 1
            total = rd.read(36)
            info = (rate, ch, bps, total)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, n_ch, bps, total = info
    if bps not in (8, 16, 24):
        raise ValueError(f"FLAC {bps}-bit samples unsupported (8/16/24)")
    out = [[] for _ in range(n_ch)]
    got = 0
    while got < total:
        rd = _MSBReader(payload, pos * 8)
        if rd.read(14) != 0x3FFE:
            raise ValueError(f"FLAC frame sync lost at byte {pos}")
        rd.read(1)  # reserved
        rd.read(1)  # blocking strategy (fixed or variable numbering)
        bs_code = rd.read(4)
        sr_code = rd.read(4)
        ch_code = rd.read(4)
        rd.read(3)  # sample size code (STREAMINFO's value is used)
        rd.read(1)  # reserved
        _utf8_number(rd)
        if bs_code == 6:
            blocksize = rd.read(8) + 1
        elif bs_code == 7:
            blocksize = rd.read(16) + 1
        elif bs_code in _BLOCKSIZES:
            blocksize = _BLOCKSIZES[bs_code]
        else:
            raise ValueError(f"FLAC bad blocksize code {bs_code}")
        if sr_code == 12:
            rd.read(8)
        elif sr_code in (13, 14):
            rd.read(16)
        rd.read(8)  # CRC-8 (not verified — corruption surfaces as sync loss)
        if ch_code < 8:
            n_sub = ch_code + 1
            mode = "indep"
        elif ch_code == 8:
            n_sub, mode = 2, "ls"
        elif ch_code == 9:
            n_sub, mode = 2, "rs"
        elif ch_code == 10:
            n_sub, mode = 2, "ms"
        else:
            raise ValueError(f"FLAC bad channel assignment {ch_code}")
        if (mode == "indep" and n_sub != n_ch) or (mode != "indep" and n_ch != 2):
            raise ValueError("FLAC channel assignment disagrees with STREAMINFO")
        subs = []
        for s in range(n_sub):
            # side channels carry one extra bit
            extra = 1 if (
                (mode == "ls" and s == 1)
                or (mode == "rs" and s == 0)
                or (mode == "ms" and s == 1)
            ) else 0
            subs.append(_subframe(rd, blocksize, bps + extra))
        rd.align()
        rd.read(16)  # frame CRC-16
        pos = (rd.pos + 7) // 8
        if mode == "indep":
            chans = subs
        elif mode == "ls":
            left, side = subs
            chans = [left, [left[i] - side[i] for i in range(blocksize)]]
        elif mode == "rs":
            side, right = subs
            chans = [[right[i] + side[i] for i in range(blocksize)], right]
        else:  # ms
            mid, side = subs
            chans = [[], []]
            for i in range(blocksize):
                m, sd = mid[i], side[i]
                l = ((m << 1) | (sd & 1)) + sd
                chans[0].append(l >> 1)
                chans[1].append((l >> 1) - sd)
        take = min(blocksize, total - got)
        for c in range(n_ch):
            out[c].extend(chans[c][:take])
        got += take
    scale = float(1 << (bps - 1))
    arr = np.asarray(out, dtype=np.float32).T / scale
    return arr


def _subframe(rd: _MSBReader, n: int, bps: int) -> list[int]:
    if rd.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = rd.read(6)
    wasted = 0
    if rd.read(1):
        wasted = rd.unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        v = rd.read_signed(eff)
        out = [v] * n
    elif t == 1:  # VERBATIM
        out = [rd.read_signed(eff) for _ in range(n)]
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        warm = [rd.read_signed(eff) for _ in range(order)]
        resid = _residuals(rd, n, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out.append(resid[i - order] + pred)
    elif t >= 32:  # LPC, order t-31
        order = t - 31
        warm = [rd.read_signed(eff) for _ in range(order)]
        prec = rd.read(4) + 1
        shift = rd.read_signed(5)
        coefs = [rd.read_signed(prec) for _ in range(order)]
        resid = _residuals(rd, n, order)
        out = list(warm)
        for i in range(order, n):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(resid[i - order] + pred)
    else:
        raise ValueError(f"FLAC reserved subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _residuals(rd: _MSBReader, n: int, order: int) -> list[int]:
    method = rd.read(2)
    if method not in (0, 1):
        raise ValueError(f"FLAC reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = rd.read(4)
    nparts = 1 << porder
    out = []
    for p in range(nparts):
        cnt = (n >> porder) - (order if p == 0 else 0)
        param = rd.read(pbits)
        if param == escape:
            raw = rd.read(5)
            out.extend(rd.read_signed(raw) if raw else 0 for _ in range(cnt))
        else:
            out.extend(_rice_read(rd, param) for _ in range(cnt))
    return out


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bps: int = 16,
    blocksize: int = 4096,
    mode: str = "fixed",
    mid_side: bool = False,
) -> bytes:
    """Fixture encoder: (n, ch) int array → FLAC with ``mode`` ∈
    {'constant-or-fixed' via 'fixed', 'verbatim'} subframes,
    single-partition Rice residuals, optional mid/side stereo. The
    stream is spec-shaped (sync codes, UTF-8 frame numbers, CRC bytes
    present though zero-filled — the decoder treats CRCs as opaque)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    s = samples.astype(np.int64)
    bits: list[int] = []

    def put(v: int, w: int) -> None:
        for i in range(w - 1, -1, -1):
            bits.append((v >> i) & 1)

    out = bytearray(b"fLaC")
    si = _MSBWriter()
    si.put(blocksize, 16)
    si.put(blocksize, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(sample_rate, 20)
    si.put(ch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n, 36)
    body = si.bytes() + b"\x00" * 18  # md5 zeroed (decoder ignores)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    frame_no = 0
    i0 = 0
    while i0 < n:
        blk = s[i0 : i0 + blocksize]
        bn = blk.shape[0]
        wr = _MSBWriter()
        wr.put(0x3FFE, 14)
        wr.put(0, 1)
        wr.put(0, 1)  # fixed-blocksize numbering
        wr.put(7, 4)  # blocksize: 16-bit at end of header
        wr.put(0, 4)  # sample rate: from STREAMINFO
        if mid_side and ch == 2:
            wr.put(10, 4)
        else:
            wr.put(ch - 1, 4)
        wr.put(0, 3)  # sample size from STREAMINFO
        wr.put(0, 1)
        # UTF-8 frame number (single byte for < 128)
        if frame_no < 0x80:
            wr.put(frame_no, 8)
        else:
            wr.put(0xC0 | (frame_no >> 6), 8)
            wr.put(0x80 | (frame_no & 0x3F), 8)
        wr.put(bn - 1, 16)
        wr.put(0, 8)  # CRC-8 placeholder
        if mid_side and ch == 2:
            l, r = blk[:, 0], blk[:, 1]
            mid = (l + r) >> 1
            side = l - r
            _enc_subframe(wr, mid, bn, bps, mode)
            _enc_subframe(wr, side, bn, bps + 1, mode)
        else:
            for c in range(ch):
                _enc_subframe(wr, blk[:, c], bn, bps, mode)
        wr.align()
        wr.put(0, 16)  # CRC-16 placeholder
        out += wr.bytes()
        frame_no += 1
        i0 += bn
    return bytes(out)


class _MSBWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, v: int, w: int) -> None:
        for i in range(w - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _best_rice(res: list[int]) -> int:
    best, best_len = 0, None
    for p in range(15):
        ln = sum((((v << 1) if v >= 0 else ((-v) << 1) - 1) >> p) + 1 + p for v in res)
        if best_len is None or ln < best_len:
            best, best_len = p, ln
    return best


def _enc_subframe(wr: _MSBWriter, vals, n: int, bps: int, mode: str) -> None:
    vals = [int(v) for v in vals]
    wr.put(0, 1)
    if len(set(vals)) == 1 and mode != "verbatim":
        wr.put(0, 6)
        wr.put(0, 1)
        wr.put(vals[0] & ((1 << bps) - 1), bps)
        return
    if mode == "verbatim":
        wr.put(1, 6)
        wr.put(0, 1)
        for v in vals:
            wr.put(v & ((1 << bps) - 1), bps)
        return
    # FIXED order 2, single Rice partition
    order = min(2, n - 1) if n > 1 else 0
    wr.put(8 + order, 6)
    wr.put(0, 1)
    for v in vals[:order]:
        wr.put(v & ((1 << bps) - 1), bps)
    coefs = _FIXED_COEFS[order]
    res = [
        vals[i] - sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, n)
    ]
    param = _best_rice(res)
    wr.put(0, 2)  # 4-bit rice method
    wr.put(0, 4)  # partition order 0
    wr.put(param, 4)
    for v in res:
        _rice_write(wr.bits, v, param)
