"""BMP and TIFF decode — the scanned-document raster formats
(stdlib + numpy, same posture as PNG/GIF/JPEG in multimodal.py /
jpeg.py: the formats are public structs + public compression).

BMP: BITMAPINFOHEADER, 1/4/8-bit palette and 24/32-bit BGR(A),
bottom-up and top-down rows, BI_RGB and BI_RLE8. TIFF: baseline
strip-organized files — II/MM byte orders, 8- and 16-bit
gray/RGB (16-bit in the file's byte order, predictor differencing
modulo 2^16), 8-bit palette and 1-bit bilevel, compressions
none/PackBits/LZW (MSB-first with the early-change width bump — NOT
the GIF variant)/Deflate, horizontal-differencing predictor 2.
Tiled, planar and CCITT G3/G4 files are rejected loudly — the
documented remainder.

Encoders exist for fixtures/round-trips (including a TIFF-LZW
compressor so the decoder is exercised against independently
generated streams at every compression)."""

from __future__ import annotations

import struct

import numpy as np


# --- BMP --------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: missing BM signature")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError(f"BMP core-header variant unsupported (size {hdr_size})")
    w, h_raw = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (comp,) = struct.unpack("<I", payload[30:34])
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ValueError(f"BMP bad dimensions {w}x{h_raw}")
    if comp not in (0, 1):
        raise ValueError(f"BMP compression {comp} unsupported (BI_RGB/BI_RLE8 only)")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"BMP {bpp}-bit unsupported")
    if comp == 1 and bpp != 8:
        raise ValueError("BI_RLE8 requires 8-bit")
    # palette (BGRX quads) sits between header and pixel data
    pal = None
    if bpp <= 8:
        (ncol,) = struct.unpack("<I", payload[46:50])
        ncol = ncol or (1 << bpp)
        pstart = 14 + hdr_size
        raw = np.frombuffer(payload[pstart : pstart + 4 * ncol], dtype=np.uint8)
        pal = raw.reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB
    if comp == 1:
        idx = _bmp_rle8(payload[data_off:], w, h)
    else:
        stride = ((w * bpp + 31) // 32) * 4
        rows = np.frombuffer(
            payload[data_off : data_off + stride * h], dtype=np.uint8
        ).reshape(h, stride)
        if bpp == 1:
            bits = np.unpackbits(rows, axis=1)[:, :w]
            idx = bits
        elif bpp == 4:
            hi = rows >> 4
            lo = rows & 0xF
            inter = np.empty((h, rows.shape[1] * 2), dtype=np.uint8)
            inter[:, 0::2] = hi
            inter[:, 1::2] = lo
            idx = inter[:, :w]
        elif bpp == 8:
            idx = rows[:, :w]
        else:
            nb = bpp // 8
            px = rows[:, : w * nb].reshape(h, w, nb)
            img = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB
            return img[::1] if top_down else img[::-1]
    img = pal[idx]
    return img if top_down else img[::-1]


def _bmp_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    out = np.zeros((h, w), dtype=np.uint8)
    r = c = i = 0
    while i + 1 < len(data):
        n, v = data[i], data[i + 1]
        i += 2
        if n:
            out[r, c : c + n] = v
            c += n
        elif v == 0:  # end of line
            r += 1
            c = 0
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            c += data[i]
            r += data[i + 1]
            i += 2
        else:  # absolute run, word-aligned
            out[r, c : c + v] = np.frombuffer(data[i : i + v], dtype=np.uint8)
            c += v
            i += v + (v & 1)
    return out


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit BI_RGB for (h, w, 3); 8-bit gray-palette for (h, w)."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        bpp, pal = 8, b"".join(bytes((i, i, i, 0)) for i in range(256))
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = img
        pix = rows[::-1].tobytes()
    else:
        bpp, pal = 24, b""
        stride = ((w * 3) + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[:, :, [2, 1, 0]].reshape(h, w * 3)
        pix = rows[::-1].tobytes()
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pix), 2835, 2835,
                      256 if bpp == 8 else 0, 0)
    return hdr + dib + pal + pix


# --- TIFF -------------------------------------------------------------------

_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 273: "strip_offsets", 277: "spp",
    278: "rows_per_strip", 279: "strip_counts", 317: "predictor",
    320: "colormap", 322: "tile_width", 284: "planar",
}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _tiff_ifd_at(payload: bytes, off: int, bo: str) -> tuple[dict, int]:
    """One IFD at ``off`` → (named tags, next-IFD offset) — the
    next-IFD pointer after the entry array chains multi-page files."""
    (n,) = struct.unpack(bo + "H", payload[off : off + 2])
    tags: dict = {}
    for k in range(n):
        e = off + 2 + 12 * k
        tag, typ, cnt = struct.unpack(bo + "HHI", payload[e : e + 8])
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = payload[e + 8 : e + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", payload[e + 8 : e + 12])
            raw = payload[voff : voff + size]
        if typ == 3:
            vals = list(struct.unpack(bo + f"{cnt}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{cnt}I", raw))
        elif typ == 1:
            vals = list(raw)
        else:
            vals = [raw]
        name = _TIFF_TAGS.get(tag)
        if name:
            tags[name] = vals
    tail = off + 2 + 12 * n
    (nxt,) = struct.unpack(bo + "I", payload[tail : tail + 4])
    return tags, nxt


def _tiff_ifd(payload: bytes, bo: str) -> dict:
    (off,) = struct.unpack(bo + "I", payload[4:8])
    return _tiff_ifd_at(payload, off, bo)[0]


def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF LZW (spec §13): MSB-first codes, table starts at 258
    entries (256 literals + Clear 256 + EOI 257), width bumps ONE CODE
    EARLY (at table sizes 511/1023/2047 — the 'early change' that
    distinguishes TIFF from GIF LZW)."""
    out = bytearray()
    table: list[bytes] = []
    buf = cnt = 0
    width = 9
    prev: bytes | None = None
    pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while cnt < width and pos < len(data):
            buf = (buf << 8) | data[pos]
            pos += 1
            cnt += 8
        if cnt < width:
            break
        code = (buf >> (cnt - width)) & ((1 << width) - 1)
        cnt -= width
        if code == 257:  # EOI
            break
        if code == 256:
            reset()
            continue
        if prev is None:
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("TIFF LZW: code beyond table")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) + 1 >= (1 << width) and width < 12:  # early change
            width += 1
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    out_bits: list[tuple[int, int]] = []
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    out_bits.append((256, width))  # leading Clear
    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        out_bits.append((table[run], width))
        table[cand] = nxt
        nxt += 1
        if nxt + 1 > (1 << width) and width < 12:  # early change
            width += 1
        if nxt == 4094:
            out_bits.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        run = bytes([byte])
    if run:
        out_bits.append((table[run], width))
    out_bits.append((257, width))  # EOI
    buf = cnt = 0
    out = bytearray()
    for code, wd in out_bits:
        buf = (buf << wd) | code
        cnt += wd
        while cnt >= 8:
            out.append((buf >> (cnt - 8)) & 0xFF)
            cnt -= 8
    if cnt:
        out.append((buf << (8 - cnt)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        # find a run
        j = i
        while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 identical bytes
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
        else:  # literal stretch until next run of >=3
            k = i
            while (
                k < len(data)
                and k - i < 128
                and not (
                    k + 2 < len(data) and data[k] == data[k + 1] == data[k + 2]
                )
            ):
                k += 1
            out.append(k - i - 1)
            out += data[i:k]
            i = k
    return bytes(out)


def _tiff_byte_order(payload: bytes) -> str:
    order = payload[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: missing II/MM byte order")
    if struct.unpack(bo + "H", payload[2:4])[0] != 42:
        raise ValueError("not a TIFF: bad magic")
    return bo


def decode_tiff(payload: bytes) -> np.ndarray:
    """First page (IFD0) of a TIFF — see decode_tiff_pages for the
    multi-page (scanned-document) chain."""
    bo = _tiff_byte_order(payload)
    return _decode_tiff_page(payload, _tiff_ifd(payload, bo), bo)


def decode_tiff_pages(payload: bytes, limit: int | None = None) -> list[np.ndarray]:
    """Every page of a multi-page TIFF by following the next-IFD
    chain — the scanned-document layout (one page per IFD). ``limit``
    bounds runaway chains; a cycle raises rather than looping."""
    bo = _tiff_byte_order(payload)
    (off,) = struct.unpack(bo + "I", payload[4:8])
    out = []
    seen = set()
    while off:
        if off in seen:
            raise ValueError("TIFF IFD chain cycles")
        seen.add(off)
        t, off = _tiff_ifd_at(payload, off, bo)
        out.append(_decode_tiff_page(payload, t, bo))
        if limit is not None and len(out) >= limit:
            break
    return out


def tiff_page_count(payload: bytes) -> int:
    bo = _tiff_byte_order(payload)
    (off,) = struct.unpack(bo + "I", payload[4:8])
    n = 0
    seen = set()
    while off and off not in seen:
        seen.add(off)
        _, off = _tiff_ifd_at(payload, off, bo)
        n += 1
    return n


def _decode_tiff_page(payload: bytes, t: dict, bo: str) -> np.ndarray:
    import zlib

    if "tile_width" in t:
        raise ValueError("tiled TIFF unsupported (strip-organized only)")
    if t.get("planar", [1])[0] != 1:
        raise ValueError("planar-configuration-2 TIFF unsupported")
    w, h = t["width"][0], t["height"][0]
    spp = t.get("spp", [1])[0]
    bits = t.get("bits", [1])
    comp = t.get("compression", [1])[0]
    photo = t.get("photometric", [1])[0]
    if any(b not in (1, 8, 16) for b in bits):
        raise ValueError(f"TIFF {bits}-bit samples unsupported (1/8/16 only)")
    bit = bits[0]
    if bit == 1 and spp != 1:
        raise ValueError("1-bit TIFF must be single-sample")
    offsets = t["strip_offsets"]
    counts = t.get("strip_counts", [len(payload) - offsets[0]])
    raw = bytearray()
    for off, n in zip(offsets, counts):
        chunk = payload[off : off + n]
        if comp == 1:
            raw += chunk
        elif comp == 5:
            raw += _tiff_lzw_decode(chunk)
        elif comp in (8, 32946):
            raw += zlib.decompress(chunk)
        elif comp == 32773:
            raw += _packbits_decode(chunk)
        else:
            raise ValueError(
                f"TIFF compression {comp} unsupported "
                "(none/LZW/Deflate/PackBits only — no CCITT G3/G4)"
            )
    if bit == 1:
        stride = (w + 7) // 8
        rows = np.frombuffer(bytes(raw[: stride * h]), dtype=np.uint8).reshape(
            h, stride
        )
        img = np.unpackbits(rows, axis=1)[:, :w] * np.uint8(255)
        if photo == 0:  # white-is-zero
            img = np.uint8(255) - img
        return img
    if bit == 16:
        # samples in the FILE's byte order; predictor 2 differences
        # whole 16-bit samples (TIFF 6.0 §14) modulo 2^16
        dt = "<u2" if bo == "<" else ">u2"
        arr = np.frombuffer(bytes(raw[: h * w * spp * 2]), dtype=dt).reshape(
            h, w, spp
        )
        if t.get("predictor", [1])[0] == 2:
            arr = (np.cumsum(arr.astype(np.int64), axis=1) & 0xFFFF).astype(
                np.uint16
            )
        else:
            arr = arr.astype(np.uint16)
        if photo == 0 and spp == 1:
            return np.uint16(65535) - arr[:, :, 0]
        if spp == 1:
            return arr[:, :, 0].copy()
        if spp in (3, 4):
            return arr[:, :, :3].copy()
        raise ValueError(f"TIFF samples-per-pixel {spp} unsupported")
    arr = np.frombuffer(bytes(raw[: h * w * spp]), dtype=np.uint8).reshape(
        h, w, spp
    )
    if t.get("predictor", [1])[0] == 2:
        arr = np.cumsum(arr.astype(np.int64), axis=1).astype(np.uint8)
    if photo == 3:  # palette: colormap is 3 * 2^bits 16-bit values
        cm = t["colormap"]
        n = len(cm) // 3
        pal = (np.asarray(cm, dtype=np.uint32).reshape(3, n).T >> 8).astype(np.uint8)
        return pal[arr[:, :, 0]]
    if spp == 1:
        img = arr[:, :, 0]
        return np.uint8(255) - img if photo == 0 else img
    if spp in (3, 4):
        return arr[:, :, :3].copy()
    raise ValueError(f"TIFF samples-per-pixel {spp} unsupported")


def encode_tiff(img: np.ndarray, compression: int = 1, predictor: int = 1) -> bytes:
    """Little-endian baseline TIFF for fixtures: (h, w) gray or
    (h, w, 3) RGB, uint8 or uint16 samples (16-bit from the dtype),
    one strip, compression 1/5/8/32773, optional horizontal-
    differencing predictor 2."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    wide = img.dtype == np.uint16
    nbits = 16 if wide else 8
    arr = img.reshape(h, w, spp)
    if predictor == 2:
        d = arr.astype(np.int64)
        d = np.concatenate([d[:, :1], np.diff(d, axis=1)], axis=1)
        arr = (d & ((1 << nbits) - 1)).astype(np.uint16 if wide else np.uint8)
    raw = arr.astype("<u2").tobytes() if wide else arr.astype(np.uint8).tobytes()
    if compression == 1:
        data = raw
    elif compression == 5:
        data = _tiff_lzw_encode(raw)
    elif compression == 8:
        import zlib

        data = zlib.compress(raw)
    elif compression == 32773:
        data = _packbits_encode(raw)
    else:
        raise ValueError(f"encoder compression {compression} unsupported")

    entries = []

    def tag(tg, typ, vals):
        entries.append((tg, typ, vals))

    data_off = 8  # placeholder; strips follow the IFD, computed below
    tag(256, 3, [w])
    tag(257, 3, [h])
    tag(258, 3, [nbits] * spp)
    tag(259, 3, [compression])
    tag(262, 3, [2 if spp == 3 else 1])
    tag(273, 4, [0])  # fixed up below
    tag(277, 3, [spp])
    tag(278, 3, [h])
    tag(279, 4, [len(data)])
    if predictor == 2:
        tag(317, 3, [predictor])
    entries.sort()
    n = len(entries)
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * n + 4
    extra = bytearray()
    body = bytearray()
    strip_off = None
    for tg, typ, vals in entries:
        cnt = len(vals)
        sz = _TYPE_SIZE[typ] * cnt
        fmt = {3: "H", 4: "I"}[typ]
        packed = struct.pack(f"<{cnt}{fmt}", *vals)
        if tg == 273:
            strip_off = ifd_off + 2 + 12 * entries.index((tg, typ, vals)) + 8
        if sz <= 4:
            val_field = packed.ljust(4, b"\x00")
        else:
            val_field = struct.pack("<I", extra_off + len(extra))
            extra += packed
        body += struct.pack("<HHI", tg, typ, cnt) + val_field
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n) + body + struct.pack("<I", 0) + extra
    # fix the strip offset now that the layout is known
    data_off = len(out)
    out[strip_off : strip_off + 4] = struct.pack("<I", data_off)
    out += data
    return bytes(out)


# --- EXIF -------------------------------------------------------------------

_EXIF_NAMES = {
    271: "make", 272: "model", 274: "orientation", 306: "datetime",
    36867: "datetime_original", 33434: "exposure_time", 34855: "iso",
    272 + 0: "model",
}
_EXIF_POINTER = 34665  # ExifIFD sub-directory


def _ifd_entries(blob: bytes, off: int, bo: str) -> dict[int, object]:
    """Generic IFD reader over a TIFF-structured blob (offsets are
    blob-relative — exactly how EXIF embeds in a JPEG APP1): returns
    {tag: value} with ASCII NUL-stripped, SHORT/LONG as ints, and
    RATIONAL as a (num, den) tuple."""
    (n,) = struct.unpack(bo + "H", blob[off : off + 2])
    out: dict[int, object] = {}
    for k in range(n):
        e = off + 2 + 12 * k
        tag, typ, cnt = struct.unpack(bo + "HHI", blob[e : e + 8])
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = blob[e + 8 : e + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", blob[e + 8 : e + 12])
            raw = blob[voff : voff + size]
        if typ == 2:
            out[tag] = raw.split(b"\x00")[0].decode("ascii", "replace")
        elif typ == 3:
            out[tag] = struct.unpack(bo + "H", raw[:2])[0]
        elif typ == 4:
            out[tag] = struct.unpack(bo + "I", raw[:4])[0]
        elif typ == 5:
            num, den = struct.unpack(bo + "II", raw[:8])
            out[tag] = (num, den)
    return out


def exif_tags(payload: bytes) -> dict[str, object]:
    """EXIF metadata from a JPEG (APP1 'Exif\\0\\0' segment) or a TIFF
    file: make/model/orientation/datetime from IFD0 plus
    datetime_original/exposure_time/iso from the Exif sub-IFD.
    Returns {} when no EXIF is present — curation code treats
    metadata as optional, never load-bearing."""
    blob = None
    if payload[:2] == b"\xff\xd8":  # JPEG: walk segments for APP1
        i = 2
        while i + 4 <= len(payload) and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if marker == 0xE1 and payload[i + 4 : i + 10] == b"Exif\x00\x00":
                blob = payload[i + 10 : i + 2 + seglen]
                break
            if marker == 0xDA:
                break
            i += 2 + seglen
    elif payload[:2] in (b"II", b"MM"):
        blob = payload
    if blob is None or len(blob) < 8:
        return {}
    bo = "<" if blob[:2] == b"II" else ">"
    if struct.unpack(bo + "H", blob[2:4])[0] != 42:
        return {}
    (ifd0,) = struct.unpack(bo + "I", blob[4:8])
    tags = _ifd_entries(blob, ifd0, bo)
    if _EXIF_POINTER in tags:
        tags.update(_ifd_entries(blob, int(tags[_EXIF_POINTER]), bo))
    return {
        name: tags[tag] for tag, name in _EXIF_NAMES.items() if tag in tags
    }


def apply_exif_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Normalize pixels to orientation 1 per the EXIF spec's eight
    cases (rotations/flips are views — no copy until needed)."""
    o = int(orientation or 1)
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1]
    if o == 5:
        return np.rot90(img[:, ::-1], 1, axes=(0, 1))
    if o == 6:
        return np.rot90(img, 3, axes=(0, 1))
    if o == 7:
        return np.rot90(img[:, ::-1], 3, axes=(0, 1))
    if o == 8:
        return np.rot90(img, 1, axes=(0, 1))
    return img


def encode_exif_blob(
    make: str = "", model: str = "", orientation: int = 1,
    datetime_original: str = "",
) -> bytes:
    """Little-endian EXIF TIFF blob for fixtures: IFD0 with
    make/model/orientation + Exif sub-IFD with DateTimeOriginal."""
    def entry(tag, typ, cnt, val4):
        return struct.pack("<HHI", tag, typ, cnt) + val4

    strings = bytearray()
    deferred: list[tuple[int, bytes]] = []

    def ascii_entry(tag, s):
        data = s.encode("ascii") + b"\x00"
        if len(data) <= 4:
            return entry(tag, 2, len(data), data.ljust(4, b"\x00"))
        deferred.append((len(strings), data))
        ph = entry(tag, 2, len(data), struct.pack("<I", 0xDEAD0000 + len(strings)))
        strings.extend(data)
        return ph

    ifd0_entries = [
        ascii_entry(271, make),
        ascii_entry(272, model),
        entry(274, 3, 1, struct.pack("<HH", orientation, 0)),
        entry(_EXIF_POINTER, 4, 1, struct.pack("<I", 0)),  # fixed below
    ]
    exif_entries = [ascii_entry(36867, datetime_original)]
    header = b"II*\x00" + struct.pack("<I", 8)
    ifd0 = struct.pack("<H", len(ifd0_entries)) + b"".join(ifd0_entries) + b"\x00" * 4
    exif_off = 8 + len(ifd0)
    sub = struct.pack("<H", len(exif_entries)) + b"".join(exif_entries) + b"\x00" * 4
    str_base = exif_off + len(sub)
    b = bytearray(header + ifd0 + sub + bytes(strings))
    # resolve the Exif pointer + deferred string offsets
    # pointer fixup: find the 34665 entry inside IFD0
    n0 = len(ifd0_entries)
    for k in range(n0):
        e = 8 + 2 + 12 * k
        tag = struct.unpack("<H", b[e : e + 2])[0]
        if tag == _EXIF_POINTER:
            b[e + 8 : e + 12] = struct.pack("<I", exif_off)
        val = struct.unpack("<I", b[e + 8 : e + 12])[0]
        if val & 0xFFFF0000 == 0xDEAD0000:
            b[e + 8 : e + 12] = struct.pack("<I", str_base + (val & 0xFFFF))
    for k in range(len(exif_entries)):
        e = exif_off + 2 + 12 * k
        val = struct.unpack("<I", b[e + 8 : e + 12])[0]
        if val & 0xFFFF0000 == 0xDEAD0000:
            b[e + 8 : e + 12] = struct.pack("<I", str_base + (val & 0xFFFF))
    return bytes(b)


def wrap_jpeg_with_exif(jpeg: bytes, exif_blob: bytes) -> bytes:
    """Insert an APP1 Exif segment right after SOI."""
    seg = b"Exif\x00\x00" + exif_blob
    app1 = b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg
    return jpeg[:2] + app1 + jpeg[2:]


def encode_tiff_multipage(imgs: list[np.ndarray], compression: int = 1) -> bytes:
    """Multi-page fixture encoder (uint8 grayscale pages, compression
    1/32773): one IFD per page chained through next-IFD pointers —
    the scanned-document layout decode_tiff_pages consumes."""
    if not imgs:
        raise ValueError("need at least one page")
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    prev_ptr = 4  # header's IFD0 pointer
    for img in imgs:
        if img.ndim != 2 or img.dtype != np.uint8:
            raise ValueError("multipage fixture encoder takes uint8 grayscale pages")
        h, w = img.shape
        raw = img.tobytes()
        data = raw if compression == 1 else _packbits_encode(raw)
        if compression not in (1, 32773):
            raise ValueError(f"multipage encoder compression {compression} unsupported")
        ifd_off = len(out)
        struct.pack_into("<I", out, prev_ptr, ifd_off)
        entries = [
            (256, 3, w), (257, 3, h), (258, 3, 8), (259, 3, compression),
            (262, 3, 1), (273, 4, 0), (277, 3, 1), (278, 3, h),
            (279, 4, len(data)),
        ]
        n = len(entries)
        data_off = ifd_off + 2 + 12 * n + 4
        body = struct.pack("<H", n)
        for tg, typ, val in entries:
            if tg == 273:
                val = data_off
            fmt = {3: "H", 4: "I"}[typ]
            body += struct.pack("<HHI", tg, typ, 1) + struct.pack(
                f"<{fmt}", val
            ).ljust(4, b"\x00")
        prev_ptr = ifd_off + 2 + 12 * n
        out += body + b"\x00\x00\x00\x00" + data
    return bytes(out)
