"""HTML / document connectors — SURVEY.md §2.1 S9/S10 over fetched
payloads.

The reference fetches pages politely (connectors/fetcher.ts — network
effects are a declared non-goal here, SURVEY §2.1 S11) and then
*parses*: articles out of HTML (connectors/eu_news.ts) and raw text
out of .docx/.pdf attachments (connectors/globalautoregs.ts:94-120,
mammoth / pdf-parse). These stages own the data effects and are what
an offline 100 TB pipeline replays over a crawl archive, so they are
the Spark surface:

- :func:`parse_articles` — the cheerio extraction chain as one
  codegen'd projection (functions/html.py column expressions).
- :func:`article_links` — per-page link lists exploded to a corpus
  link table with the reference's filters applied.
- :class:`DocTextExtractor` — the mammoth/pdf-parse stage:
  Arrow-batched ``mapInPandas`` over (url, payload binary) with
  per-extension dispatch, and REAL stdlib decoders (since r5/r8;
  this paragraph previously described the long-replaced r1 fake):
  .docx via zipfile + a real xml.etree WordprocessingML walk (r15:
  runs/tabs/breaks/tables, mammoth extractRawText output shape,
  golden fixtures tests/fixtures/docx_*.docx), .pdf via linear
  stream scan + zlib inflate + BT..ET show-string harvest with
  ToUnicode CMap resolution, including RC4 / AES-128 / AES-256
  per-object decryption for standard-security-handler files
  (sources/pdfcrypto.py). The documented remainder: CID fonts
  without a ToUnicode map, and wrong-password files — both return
  text=None rather than raising. Subclasses may swap in
  library-backed decoders where available.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F, types as T

from ..functions import html as H

CONTENT_CAP = 4000  # eu_news.ts:80 content.slice(0, 4000)


def parse_articles(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, html) → NewsDocument rows (eu_news.ts:55-83): title
    fallback chain, article-paragraph main text with description
    fallback, 4000-char content cap, date-truncated published; pages
    with no resolvable title are dropped (fetchArticle returns null)."""
    html = F.col(html_col)
    title = H.html_title(html)
    desc = H.html_description(html)
    body = H.article_text(html)
    content = F.when(body != "", body).otherwise(F.coalesce(desc, F.lit("")))
    return (
        pages.select(
            F.col(url_col).alias("url"),
            title.alias("title"),
            F.substring(content, 1, CONTENT_CAP).alias("content"),
            H.html_published(html).alias("published_date"),
        )
        .filter(F.col("title").isNotNull())
    )


def article_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page link lists → one (page_url, link) row per distinct
    usable href (eu_news.ts:15-30: fragments/mailto:/javascript:
    dropped, root-relative absolutized). The per-site path filters
    (eu_news.ts:33-41) are data, not engine: apply them as ordinary
    ``.filter(col("link").contains(...))`` predicates downstream."""
    links = H.extract_links(F.col(html_col), F.col(url_col))
    return (
        pages.select(F.col(url_col).alias("page_url"), F.explode(F.array_distinct(links)).alias("link"))
        .dropDuplicates(["page_url", "link"])
    )


DOC_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),  # docx | pdf | unsupported
        T.StructField("text", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


# PDF standard security handler padding string (PDF spec §7.6.3.3,
# Algorithm 2 — a public constant).
_PDF_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (public algorithm) — used by the PDF standard
    security handler for /V 1-2 encryption."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for b in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(b ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


def _pdf_encryption_key(
    payload: bytes, password: bytes | str = b""
) -> tuple[bytes, str] | None:
    """(file key, method) for the STANDARD security handler. /V 1-4
    derive per PDF spec §7.6.3.3 Algorithm 2: MD5(pad(user password) ‖
    /O ‖ P as LE int32 ‖ ID[0]), with the 50-round MD5 hardening for
    /R ≥ 3, then VALIDATE against /U (Algorithm 4 for /R 2, 5 for
    /R ≥ 3) so a wrong password fails loudly instead of yielding
    garbled text. /V 5 (AES-256, ISO 32000-2) validates the user
    password against /U's hash + validation salt (SHA-256 for /R 5,
    the Algorithm 2.B iterated hash for /R 6), then unwraps the
    32-byte file key from /UE with the key-salt-derived intermediate
    key (Algorithm 8a), cross-checked against /Perms when present.
    Method is 'rc4' (/V 1-2), 'aes' (/V 4 AESV2), or 'aes256' (/V 5).
    ``password`` (r11) is tried as the USER password first and, when
    /U rejects it, as the OWNER password (Algorithm 3 inverse: the
    owner key RC4-decrypts /O back into the padded user password) —
    so either password opens /V 1-4 files; default empty covers the
    common owner-locked case. /V 5 (r12) likewise tries the password
    as user then owner — the owner branch validates against /O and
    unwraps the file key from /OE (Algorithm 2.A with the 48-byte /U
    as trailing hash data). Returns None when the file
    is not encrypted; raises ValueError for handlers beyond that
    subset so callers fail loudly, not garbled."""
    import re

    if isinstance(password, str):
        password = password.encode("latin-1", "replace")

    enc_ref = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", payload)
    if not enc_ref:
        return None
    n, g = int(enc_ref.group(1)), int(enc_ref.group(2))
    obj = re.search(
        rb"(?<![0-9])" + str(n).encode() + rb"\s+" + str(g).encode()
        + rb"\s+obj(.*?)endobj",
        payload,
        re.S,
    )
    if not obj:
        raise ValueError("encrypted PDF: /Encrypt object not found")
    d = obj.group(1)
    if b"/Standard" not in d:
        raise ValueError("encrypted PDF: only the Standard security handler is supported")
    rev = re.search(rb"/R\s+(\d+)", d)
    ver = re.search(rb"/V\s+(\d+)", d)
    r = int(rev.group(1)) if rev else 2
    v = int(ver.group(1)) if ver else 1
    if v in (1, 2) and r in (2, 3):
        method = "rc4"
    elif v == 4 and r == 4 and b"/AESV2" in d:
        method = "aes"
    elif v == 5 and r in (5, 6):
        return _pdf_v5_file_key(d, r, password), "aes256"
    else:
        raise ValueError(
            "encrypted PDF: RC4 (/V 1-2), AESV2 (/V 4) and AES-256 "
            f"(/V 5) supported, got /V {v} /R {r}"
        )
    length = re.search(rb"/Length\s+(\d+)", d)
    nbytes = (int(length.group(1)) // 8) if length else (16 if method == "aes" else 5)
    o_hex = re.search(rb"/O\s*<([0-9A-Fa-f\s]+)>", d)
    if not o_hex:
        raise ValueError("encrypted PDF: non-hex /O entries unsupported")
    o_entry = bytes.fromhex(o_hex.group(1).decode().replace(" ", "").replace("\n", ""))
    p_m = re.search(rb"/P\s+(-?\d+)", d)
    p = int(p_m.group(1)) if p_m else -1
    id_m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", payload)
    id0 = bytes.fromhex(id_m.group(1).decode()) if id_m else b""
    def derive_and_validate(user_pw: bytes) -> tuple[bytes, str] | None:
        out = _pdf_v14_file_key(
            user_pw, d, o_entry, p, id0, r, nbytes, method
        )
        return out

    got = derive_and_validate(password)
    if got is not None:
        return got
    # r11: treat the supplied password as the OWNER password (spec
    # §7.6.3.4 Algorithm 3 inverse): RC4-decrypt /O with the
    # owner-key to recover the padded user password, then derive
    # normally. Only attempted when the user-password path failed.
    ok = hashlib.md5((password + _PDF_PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            ok = hashlib.md5(ok[:nbytes]).digest()
    okey = ok[: (nbytes if r >= 3 else 5)]
    if r == 2:
        user_pad = _rc4(okey, o_entry[:32])
    else:
        user_pad = o_entry[:32]
        for i in range(19, -1, -1):
            user_pad = _rc4(bytes(b ^ i for b in okey), user_pad)
    got = derive_and_validate(user_pad)
    if got is not None:
        return got
    raise ValueError(
        "encrypted PDF: wrong user password (/U validation failed; "
        "owner-password recovery also failed)"
    )


def _pdf_v14_file_key(
    password: bytes, d: bytes, o_entry: bytes, p: int, id0: bytes,
    r: int, nbytes: int, method: str,
) -> tuple[bytes, str] | None:
    """Algorithm 2 file key for a (possibly already padded) user
    password, validated against /U (Algorithm 4 for /R 2, 5 for
    /R >= 3). Returns None when /U is present and rejects the
    password; with no /U entry the derived key is trusted (the
    pre-r11 behavior for the common owner-locked fixtures)."""
    import re

    padded = (password + _PDF_PAD)[:32]
    md5_input = padded + o_entry[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    # Algorithm 2 step (f): /R >= 4 with /EncryptMetadata false appends
    # 0xFFFFFFFF to the hash input — omitting it derives a wrong file
    # key and yields silently garbled text instead of a loud failure.
    if r >= 4 and re.search(rb"/EncryptMetadata\s+false", d):
        md5_input += b"\xff\xff\xff\xff"
    h = hashlib.md5(md5_input).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:nbytes]).digest()
    file_key = h[: (nbytes if r >= 3 else 5)]
    # Algorithm 4 (/R 2) / 5 (/R >= 3): validate the password against
    # /U when present — a wrong password must fail loudly
    u_hex = re.search(rb"/U\s*<([0-9A-Fa-f\s]+)>", d)
    if u_hex:
        u_entry = bytes.fromhex(
            u_hex.group(1).decode().replace(" ", "").replace("\n", "")
        )
        if r == 2:
            ok = _rc4(file_key, _PDF_PAD) == u_entry[:32]
        else:
            uh = hashlib.md5(_PDF_PAD + id0).digest()
            u = _rc4(file_key, uh)
            for i in range(1, 20):
                u = _rc4(bytes(b ^ i for b in file_key), u)
            ok = u[:16] == u_entry[:16]
        if not ok:
            return None
    return file_key, method


def _pdf_v5_file_key(d: bytes, r: int, password: bytes = b"") -> bytes:
    """32-byte /V 5 file key for the given password, tried as USER
    first, then OWNER (ISO 32000-2 §7.6.4.4.8-12 / Algorithm 2.A; r11
    widened from empty-only, r12 added the owner path). /U and /O are
    each 48 bytes: hash[32] ‖ validation salt[8] ‖ key salt[8].
    User path: Hash(pwd ‖ vsalt) must equal U[0:32] — SHA-256 for
    /R 5 (the Adobe AESV3 extension), the Algorithm 2.B iterated hash
    for /R 6 — then Hash(pwd ‖ ksalt) AES-256-CBC-decrypts /UE (zero
    IV, no padding) into the file key. Owner path: identical but every
    hash appends the full 48-byte /U as trailing data and /OE is
    unwrapped instead. Either way /V 5 uses the file key DIRECTLY for
    every object (no per-object MD5 derivation). When /Perms is
    present its decryption must yield 'adb' at bytes 9-11 — a free
    integrity check on the unwrapped key."""
    import re

    from .pdfcrypto import aes_cbc_decrypt_raw, aes_decrypt_block, pdf2_hardened_hash

    def _hex48(name: bytes, nbytes: int) -> bytes:
        m = re.search(name + rb"\s*<([0-9A-Fa-f\s]+)>", d)
        if not m:
            raise ValueError(
                f"encrypted PDF: /V 5 needs a hex {name.decode()} entry"
            )
        raw = bytes.fromhex(m.group(1).decode().replace(" ", "").replace("\n", ""))
        if len(raw) < nbytes:
            raise ValueError(
                f"encrypted PDF: {name.decode()} must be ≥{nbytes} bytes"
            )
        return raw

    u = _hex48(rb"/U", 48)
    vsalt, ksalt = u[32:40], u[40:48]
    if r == 6:
        valid = pdf2_hardened_hash(password, vsalt)
    else:
        valid = hashlib.sha256(password + vsalt).digest()
    if valid == u[:32]:
        ue = _hex48(rb"/UE", 32)
        inter = (
            pdf2_hardened_hash(password, ksalt)
            if r == 6
            else hashlib.sha256(password + ksalt).digest()
        )
        file_key = aes_cbc_decrypt_raw(inter, b"\x00" * 16, ue[:32])
    else:
        # r12: OWNER-password path (ISO 32000-2 §7.6.4.4.9/.12,
        # Algorithm 2.A steps b/d): /O is hash[32] ‖ validation
        # salt[8] ‖ key salt[8] like /U, but every owner hash appends
        # the FULL 48-byte /U string as trailing udata; the
        # key-salt-derived intermediate key unwraps /OE into the same
        # 32-byte file key /UE would yield. Only attempted after /U
        # rejects, so a wrong password still fails loudly below.
        try:
            o = _hex48(rb"/O", 48)
            oe = _hex48(rb"/OE", 32)
        except ValueError:
            raise ValueError(
                "encrypted PDF: wrong user password (/U validation failed; "
                "no /O//OE entries for an owner-password attempt)"
            ) from None
        ovsalt, oksalt = o[32:40], o[40:48]
        if r == 6:
            ovalid = pdf2_hardened_hash(password, ovsalt, u[:48])
        else:
            ovalid = hashlib.sha256(password + ovsalt + u[:48]).digest()
        if ovalid != o[:32]:
            raise ValueError(
                "encrypted PDF: wrong password (/U and /O validation both failed)"
            )
        ointer = (
            pdf2_hardened_hash(password, oksalt, u[:48])
            if r == 6
            else hashlib.sha256(password + oksalt + u[:48]).digest()
        )
        file_key = aes_cbc_decrypt_raw(ointer, b"\x00" * 16, oe[:32])
    perms_m = re.search(rb"/Perms\s*<([0-9A-Fa-f\s]+)>", d)
    if perms_m:
        perms = bytes.fromhex(
            perms_m.group(1).decode().replace(" ", "").replace("\n", "")
        )
        if len(perms) >= 16 and aes_decrypt_block(file_key, perms[:16])[9:12] != b"adb":
            raise ValueError(
                "encrypted PDF: /Perms integrity check failed on the unwrapped key"
            )
    return file_key


def _pdf_object_key(file_key: bytes, num: int, gen: int, method: str = "rc4") -> bytes:
    """Per-object key (spec §7.6.2 Algorithm 1): MD5(key ‖ objnum low
    3 bytes LE ‖ gennum low 2 bytes LE ‖ 'sAlT' for AESV2), truncated
    to key+5 ≤ 16. /V 5 ('aes256') uses the file key directly — the
    per-object derivation was dropped in ISO 32000-2 §7.6.3.3."""
    if method == "aes256":
        return file_key
    salt = b"sAlT" if method == "aes" else b""
    h = hashlib.md5(
        file_key
        + num.to_bytes(4, "little")[:3]
        + gen.to_bytes(4, "little")[:2]
        + salt
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _pdf_tounicode_cmap(data: bytes) -> dict[int, str]:
    """Parse a ToUnicode CMap stream (PDF spec §9.10.3 / Adobe CMap
    spec): ``bfchar`` pairs map a glyph code to UTF-16BE text;
    ``bfrange`` maps a contiguous code range either to consecutive
    values from a base or to an explicit array. Returns
    {code: unicode_text}. Codes are the ints of the source hex (CID
    fonts use 2-byte codes; the int form is length-agnostic)."""
    import re

    cmap: dict[int, str] = {}

    def _dst(tok: bytes) -> str:
        return bytes.fromhex(tok.decode()).decode("utf-16-be", "replace")

    for sec in re.findall(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", sec):
            cmap[int(src, 16)] = _dst(dst)
    for sec in re.findall(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for m in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
            sec,
        ):
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            dst = m.group(3)
            if dst.startswith(b"["):
                for off, d in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", dst)):
                    if lo + off <= hi:
                        cmap[lo + off] = _dst(d)
            else:
                base_hex = dst[1:-1]
                nbytes = len(base_hex) // 2
                base = int(base_hex, 16)
                for off in range(hi - lo + 1):
                    cmap[lo + off] = (
                        (base + off).to_bytes(nbytes, "big").decode("utf-16-be", "replace")
                    )
    return cmap


def _pdf_hex_string(
    block: bytes, i: int, cmap: dict[int, str] | None = None
) -> tuple[str | None, int]:
    """Parse one hex string ``<...>`` starting at ``i`` (PDF spec
    §7.3.4.3): hex digits with interleaved whitespace, odd final digit
    padded with 0. ``<<`` (dictionary open) is not a string — returns
    (None, position past it). UTF-16BE payloads (FE FF BOM) decode as
    such; with a ToUnicode ``cmap`` the bytes are 2-byte glyph codes
    mapped through it (CID-keyed fonts); other bytes decode
    byte-per-char like literal strings."""
    if block[i + 1 : i + 2] == b"<":  # dictionary, not a string
        return None, i + 2
    j = i + 1
    digits: list[int] = []
    while j < len(block) and block[j : j + 1] != b">":
        c = block[j]
        if 0x30 <= c <= 0x39:
            digits.append(c - 0x30)
        elif 0x41 <= c <= 0x46:
            digits.append(c - 0x41 + 10)
        elif 0x61 <= c <= 0x66:
            digits.append(c - 0x61 + 10)
        elif c in (0x20, 0x0A, 0x0D, 0x09, 0x0C, 0x00):
            pass  # whitespace between digits is legal
        else:
            # not a hex string after all: hand the offending character
            # back to the caller unconsumed — it may be the '(' of a
            # literal string that must still be extracted (j > i+start
            # always, so the outer scan still makes progress)
            return None, j
        j += 1
    if len(digits) % 2:
        digits.append(0)  # spec: odd count behaves as if padded with 0
    raw = bytes(digits[k] * 16 + digits[k + 1] for k in range(0, len(digits), 2))
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be"), j + 1
        except UnicodeDecodeError:
            return None, j + 1
    if cmap and len(raw) % 2 == 0:
        # CID-keyed font: try the bytes as 2-byte glyph codes through
        # the file's ToUnicode CMap; adopt the mapping only if it
        # actually hits (a hex string of a simple font keeps the
        # byte-per-char path below)
        codes = [int.from_bytes(raw[k : k + 2], "big") for k in range(0, len(raw), 2)]
        if any(c in cmap for c in codes):
            return "".join(cmap.get(c, "") for c in codes), j + 1
    return "".join(chr(b) for b in raw), j + 1


def _pdf_literal_string(block: bytes, i: int) -> tuple[str, int]:
    """Parse one literal string ``(...)`` starting at ``i`` (PDF spec
    §7.3.4.2): escape sequences (\\n \\r \\t \\b \\f \\( \\) \\\\ and
    octal \\ddd) and balanced unescaped parentheses. Returns (text,
    position past the closing paren)."""
    esc_map = {0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x62: "\b", 0x66: "\f"}
    depth, i = 1, i + 1
    buf: list[str] = []
    while i < len(block) and depth:
        c = block[i]
        if c == 0x5C and i + 1 < len(block):  # backslash
            nxt = block[i + 1]
            if 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                oct_digits = []
                while j < len(block) and len(oct_digits) < 3 and 0x30 <= block[j] <= 0x37:
                    oct_digits.append(block[j] - 0x30)
                    j += 1
                code = 0
                for d in oct_digits:
                    code = code * 8 + d
                buf.append(chr(code))
                i = j
            else:
                buf.append(esc_map.get(nxt, chr(nxt)))
                i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        buf.append(chr(c))
        i += 1
    return "".join(buf), i


#: TJ kern threshold (thousandths of a text-space em): a negative
#: adjustment this large is an inter-word gap, not letter kerning —
#: pdf.js uses the same order of magnitude for its word heuristic
_TJ_WORD_GAP = 180
_PDF_DELIMS = b"()<>[]{}/% \t\r\n\x0c\x00"


def _pdf_text_ops(data: bytes, cmap: dict[int, str] | None = None) -> list[str]:
    """Interpret the TEXT OPERATORS of a decoded content stream and
    return the reconstructed lines — the pdf-parse behavior the
    reference pipes attachments through (globalautoregs.ts:94-120),
    not a bare string harvest:

    - ``Tj`` / the ``'`` and ``\"`` show operators draw their string
      operand (the quotes move to the next line first, spec Table 107);
    - ``TJ`` draws its array: strings concatenate, and a negative
      kern beyond ``_TJ_WORD_GAP`` thousandths of an em inserts the
      inter-word space the generator removed (spec §9.4.3);
    - ``Td``/``TD`` with a vertical move, ``T*``, and a ``Tm`` that
      changes the y translation start a new line;
    - strings parse per §7.3.4: literal escapes/nesting, hex byte
      pairs, UTF-16BE when BOM'd, 2-byte CID glyph codes through the
      merged ToUnicode ``cmap``.

    Only BT..ET blocks are interpreted, so stream data that merely
    LOOKS parenthesized (paths, inline images) stays out. Separate
    show ops on one line join with a single space (glyph-exact x
    advances are not tracked — the harvest target is text content,
    not layout)."""
    lines: list[str] = []
    pos = 0
    while True:
        bt = data.find(b"BT", pos)
        if bt < 0:
            break
        et = data.find(b"ET", bt + 2)
        if et < 0:
            et = len(data)
        block = data[bt + 2 : et]
        cur: list[str] = []  # show-op outputs on the current line

        def newline():
            if cur:
                lines.append(" ".join(cur))
                cur.clear()

        stack: list[tuple[str, object]] = []  # ('s', text) | ('n', float)
        array: list[tuple[str, object]] | None = None
        last_tm_y: float | None = None
        i = 0
        while i < len(block):
            c = block[i : i + 1]
            if c in b" \t\r\n\x0c\x00":
                i += 1
                continue
            if c == b"%":  # comment to end of line
                j = block.find(b"\n", i)
                i = len(block) if j < 0 else j + 1
                continue
            if c == b"(":
                s, i = _pdf_literal_string(block, i)
                (array if array is not None else stack).append(("s", s))
                continue
            if c == b"<":
                if block[i + 1 : i + 2] == b"<":  # dictionary (BDC props)
                    j = block.find(b">>", i + 2)
                    i = len(block) if j < 0 else j + 2
                    continue
                s, i2 = _pdf_hex_string(block, i, cmap)
                if s is not None:
                    (array if array is not None else stack).append(("s", s))
                i = i2 if i2 > i else i + 1
                continue
            if c == b"[":
                array = []
                i += 1
                continue
            if c == b"]":
                stack.append(("a", array or []))
                array = None
                i += 1
                continue
            if c == b"/":  # name object: operand we don't interpret
                j = i + 1
                while j < len(block) and block[j : j + 1] not in _PDF_DELIMS:
                    j += 1
                i = j
                continue
            if c in b"+-.0123456789":
                j = i + 1
                while j < len(block) and block[j : j + 1] in b"+-.0123456789eE":
                    j += 1
                try:
                    val = float(block[i:j])
                except ValueError:
                    val = 0.0
                (array if array is not None else stack).append(("n", val))
                i = j
                continue
            # operator token: letters, * and the ' / " show shorthands
            j = i
            while j < len(block) and block[j : j + 1] not in _PDF_DELIMS:
                j += 1
            op = block[i : max(j, i + 1)]
            i = max(j, i + 1)

            def _last_string():
                for kind, v in reversed(stack):
                    if kind == "s":
                        return v
                return None

            if op == b"Tj":
                s = _last_string()
                if s:
                    cur.append(s)
            elif op in (b"'", b'"'):
                newline()
                s = _last_string()
                if s:
                    cur.append(s)
            elif op == b"TJ":
                items = stack[-1][1] if stack and stack[-1][0] == "a" else []
                buf: list[str] = []
                for kind, v in items:  # type: ignore[union-attr]
                    if kind == "s":
                        buf.append(v)
                    elif kind == "n" and v < -_TJ_WORD_GAP:
                        buf.append(" ")
                piece = "".join(buf)
                if piece:
                    cur.append(piece)
            elif op in (b"Td", b"TD"):
                nums = [v for kind, v in stack if kind == "n"]
                if nums and nums[-1] != 0:  # ty: vertical move = new line
                    newline()
            elif op == b"T*":
                newline()
            elif op == b"Tm":
                nums = [v for kind, v in stack if kind == "n"]
                ty = nums[-1] if nums else None
                if last_tm_y is not None and ty != last_tm_y:
                    newline()
                last_tm_y = ty
            stack.clear()
        newline()
        pos = et + 2
    return lines


class DocTextExtractor:
    """S10: attachment text extraction in the connector's shape
    (globalautoregs.ts:110-120: dispatch on extension, mammoth for
    .docx, pdf-parse for .pdf) — REAL stdlib decoders since round 5:

    - ``.docx`` is a zip container (stdlib ``zipfile``); text runs live
      in ``word/document.xml`` as ``<w:t>`` elements grouped into
      ``<w:p>`` paragraphs — no library needed, same move that made
      PNG/WAV real.
    - ``.pdf``: stream objects are scanned linearly (xref tables are
      unnecessary for text harvest), FlateDecode payloads inflate with
      stdlib ``zlib``, and literal strings inside BT..ET text blocks
      are extracted with full escape/nesting handling; hex show-strings
      ``<...>`` decode too since round 6 (byte pairs, UTF-16BE when
      BOM'd), and since round 8 CID-keyed fonts resolve through their
      ToUnicode CMap streams (bfchar/bfrange parsed, glyph codes mapped
      to Unicode; maps from all fonts are merged — exact unless two
      fonts assign the same code differently). This covers the dominant
      machine-generated subset. Encrypted PDFs (standard security
      handler with an empty user password — the common owner-locked
      case) decrypt per-object since round 8: RC4 for /V 1-2 /R 2-3,
      AES-128-CBC for /V 4 AESV2 (Algorithm 2 file key + per-object
      MD5 keys with the AES salt, spec §7.6), and AES-256-CBC for
      /V 5 /R 5-6 (ISO 32000-2: /U-validated empty user password,
      file key unwrapped from /UE — SHA-256 for /R 5, the Algorithm
      2.B iterated hash for /R 6, /Perms cross-check; the AES core is
      sources/pdfcrypto.py, pinned to FIPS-197 known-answer vectors).
      CID fonts WITHOUT a ToUnicode map (unmappable by design) and
      user-password-locked PDFs return None — the documented
      remainder of the seam.

    Undecodable payloads return text=None rather than raising: one
    corrupt attachment must not kill a 100 TB connector pass.
    Subclasses can still override either decoder with library-backed
    bodies."""

    def __init__(self, pdf_password: bytes | str = b""):
        # r11: USER password for password-locked PDFs (default empty =
        # the owner-locked case; a wrong password fails loudly inside
        # _pdf_encryption_key and the extractor returns None)
        self.pdf_password = pdf_password

    def _decode_docx(self, payload: bytes) -> str | None:
        """Real WordprocessingML decode (r15 — replaces the r5 regex
        harvest): parse ``word/document.xml`` with stdlib
        ``xml.etree`` and mirror mammoth ``extractRawText``'s output
        shape (the reference's extractor, globalautoregs.ts:110-116):

        - every ``w:p`` paragraph — body-level AND inside table cells
          (``w:tbl``/``w:tc`` — Word stores cell content as ordinary
          paragraphs) — becomes one text line, document order;
        - inside a paragraph: ``w:t`` runs concatenate (Word splits
          text mid-word across runs on any formatting/proofing
          boundary — concatenation, not joining, is load-bearing),
          ``w:tab`` → TAB, ``w:br``/``w:cr`` → newline;
        - field instructions (``w:instrText``) and tracked-change
          deletions (``w:delText``) are NOT text, and never harvested
          (the old regex only matched w:t so this holds by the same
          explicit-allowlist move);
        - paragraphs join with a blank line between them — mammoth's
          raw-text paragraph separator ("\\n\\n").

        XML entity/CDATA/attribute handling comes free from the real
        parser (the regex version hand-replaced five entities and
        missed numeric character references)."""
        import io
        import xml.etree.ElementTree as ET
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as z:
                root = ET.fromstring(z.read("word/document.xml"))
        except Exception:
            return None

        def local(tag) -> str:
            return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""

        def harvest(el, parts: list) -> None:
            # inline content of ONE paragraph; nested w:p subtrees
            # (text boxes) are their own paragraphs via the outer iter
            for child in el:
                ln = local(child.tag)
                if ln == "p":
                    continue
                if ln == "t":
                    parts.append(child.text or "")
                elif ln == "tab":
                    parts.append("\t")
                elif ln in ("br", "cr"):
                    parts.append("\n")
                elif ln in ("instrText", "delText"):
                    continue
                else:
                    harvest(child, parts)

        paras = []
        for p in root.iter():
            if local(p.tag) != "p":
                continue
            parts: list = []
            harvest(p, parts)
            text = "".join(parts)
            if text:
                paras.append(text)
        return "\n\n".join(paras) if paras else None

    def _decode_pdf(self, payload: bytes) -> str | None:
        import re
        import zlib

        if not payload.startswith(b"%PDF"):
            return None
        # two passes: first inflate every stream and merge the ToUnicode
        # CMaps (CID-keyed fonts ship glyph-code → Unicode maps as their
        # own streams), then harvest show-strings with the merged map.
        # Per-font resolution would need resource-dict chasing; the
        # merged map is exact unless two fonts assign the SAME code to
        # different characters — the documented simplification.
        try:
            enc = _pdf_encryption_key(
                payload, getattr(self, "pdf_password", b"")
            )
        except ValueError:
            return None  # wrong password / beyond the handler subset
        file_key, method = enc if enc is not None else (None, None)
        streams: list[bytes] = []
        cmap: dict[int, str] = {}
        if file_key is None:
            raw_streams = [
                (None, m.group(1))
                for m in re.finditer(
                    rb"stream\r?\n(.*?)\r?\nendstream", payload, flags=re.S
                )
            ]
        else:
            # encrypted: streams need their OWNING object's number/gen
            # for the per-object RC4 key, so scan object-scoped
            raw_streams = []
            for m in re.finditer(
                rb"(?<![0-9])(\d+)\s+(\d+)\s+obj(.*?)endobj", payload, flags=re.S
            ):
                body = m.group(3)
                sm = re.search(rb"stream\r?\n(.*?)\r?\nendstream", body, flags=re.S)
                if sm:
                    raw_streams.append(
                        ((int(m.group(1)), int(m.group(2))), sm.group(1))
                    )
        for objref, data in raw_streams:
            if file_key is not None and objref is not None:
                obj_key = _pdf_object_key(file_key, *objref, method=method)
                if method in ("aes", "aes256"):
                    from .pdfcrypto import aes_cbc_decrypt

                    try:
                        data = aes_cbc_decrypt(obj_key, data)
                    except ValueError:
                        continue  # malformed encrypted stream: skip it
                else:
                    data = _rc4(obj_key, data)
            try:
                data = zlib.decompress(data)
            except Exception:
                pass  # plain (uncompressed) content stream
            if b"beginbfchar" in data or b"beginbfrange" in data:
                cmap.update(_pdf_tounicode_cmap(data))
            else:
                streams.append(data)
        texts: list[str] = []
        for data in streams:
            texts.extend(_pdf_text_ops(data, cmap or None))
        return "\n".join(texts) if texts else None

    def extract(self, docs: DataFrame, url_col: str = "url", payload_col: str = "payload") -> DataFrame:
        decode_docx, decode_pdf = self._decode_docx, self._decode_pdf

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf_batch in batches:
                if not len(pdf_batch):
                    continue
                out = []
                for url, payload in zip(pdf_batch[url_col], pdf_batch[payload_col]):
                    low = (url or "").lower()
                    raw = bytes(payload) if payload is not None else b""
                    if low.endswith(".docx"):
                        kind, text = "docx", decode_docx(raw)
                    elif low.endswith(".pdf"):
                        kind, text = "pdf", decode_pdf(raw)
                    else:
                        kind, text = "unsupported", None
                    out.append((url, kind, text, len(raw)))
                yield pd.DataFrame(out, columns=["url", "kind", "text", "n_bytes"])

        return docs.select(url_col, payload_col).mapInPandas(gen, schema=DOC_TEXT_SCHEMA)


def pdf_images(
    payload: bytes, password: bytes | str = b""
) -> list[tuple[dict, "object"]]:
    """Embedded raster images from a PDF — the OCR-pipeline input:
    scanned PDFs carry their pages as image XObjects (/Subtype /Image),
    usually /DCTDecode (a complete JPEG — decoded by operators/jpeg)
    or /FlateDecode (raw samples reshaped by /Width /Height
    /ColorSpace /BitsPerComponent). Returns [(info, ndarray)] where
    info carries width/height/filter/colorspace. /CCITTFaxDecode
    decodes through the shared T.4/T.6 cores (operators/rasters): /K < 0
    (pure G4 — the scanned-page default), /K = 0 (G3 1-D), /K > 0 (G3
    mixed 2-D), each honoring /EncodedByteAlign and /BlackIs1. The one
    remaining unsupported image filter, JPXDecode, is returned with
    ``image=None`` and its info intact so callers can count what they
    are missing.
    Encrypted PDFs decrypt through the same standard-handler chain as
    text extraction."""
    import re
    import zlib

    import numpy as np

    from ..operators.jpeg import decode_jpeg

    if not payload.startswith(b"%PDF"):
        return []
    try:
        enc = _pdf_encryption_key(payload, password)
    except ValueError:
        return []
    file_key, method = enc if enc is not None else (None, None)
    out: list[tuple[dict, object]] = []
    for m in re.finditer(
        rb"(?<![0-9])(\d+)\s+(\d+)\s+obj(.*?)endobj", payload, flags=re.S
    ):
        body = m.group(3)
        sm = re.search(rb"stream\r?\n(.*?)\r?\nendstream", body, flags=re.S)
        if sm is None:
            continue
        head = body[: sm.start()]
        if b"/Subtype" not in head or b"/Image" not in head:
            continue
        data = sm.group(1)
        if file_key is not None:
            obj_key = _pdf_object_key(
                file_key, int(m.group(1)), int(m.group(2)), method=method
            )
            if method in ("aes", "aes256"):
                from .pdfcrypto import aes_cbc_decrypt

                try:
                    data = aes_cbc_decrypt(obj_key, data)
                except ValueError:
                    data = None  # malformed encrypted stream: info survives
            else:
                data = _rc4(obj_key, data)

        def tag(name, default=None):
            mm = re.search(rb"/" + name + rb"\s+(\d+)", head)
            return int(mm.group(1)) if mm else default

        info = {
            "width": tag(b"Width"),
            "height": tag(b"Height"),
            "bits": tag(b"BitsPerComponent", 8),
            "colorspace": (
                "rgb" if b"/DeviceRGB" in head
                else "gray" if b"/DeviceGray" in head else None
            ),
            "filter": (
                "dct" if b"/DCTDecode" in head
                else "flate" if b"/FlateDecode" in head
                else "ccitt" if b"/CCITTFaxDecode" in head
                else "none" if b"/Filter" not in head else "other"
            ),
        }
        img = None
        try:
            if data is None:
                pass  # decrypt failed above: keep info, no pixels
            elif info["filter"] == "dct":
                img = decode_jpeg(data)
            elif info["filter"] == "ccitt":
                # r11: scanned-PDF pages are usually /CCITTFaxDecode
                # image XObjects — /K < 0 = pure G4 (T.6), /K = 0 =
                # 1-D G3, /K > 0 = mixed 2-D G3 (EOL-tagged rows), all
                # via the shared raw cores from operators/rasters,
                # honoring /EncodedByteAlign and /BlackIs1.
                from ..operators.rasters import (
                    decode_ccitt_g3, decode_ccitt_g4,
                )

                km = re.search(rb"/K\s+(-?\d+)", head)
                k = int(km.group(1)) if km else 0
                ba = bool(re.search(rb"/EncodedByteAlign\s+true", head))
                cols = tag(b"Columns", 1728)
                rows = tag(b"Rows", info["height"])
                if k < 0:
                    black = decode_ccitt_g4(data, cols, rows, byte_align=ba)
                else:
                    black = decode_ccitt_g3(
                        data, cols, rows, two_d=k > 0, byte_align=ba
                    )
                img = np.where(black, 0, 255).astype(np.uint8)
                if re.search(rb"/BlackIs1\s+true", head):
                    img = np.uint8(255) - img
            elif info["filter"] in ("flate", "none") and info["bits"] == 8:
                raw = zlib.decompress(data) if info["filter"] == "flate" else data
                ch = 3 if info["colorspace"] == "rgb" else 1
                h, w = info["height"], info["width"]
                arr = np.frombuffer(raw[: h * w * ch], dtype=np.uint8)
                img = arr.reshape((h, w, ch) if ch == 3 else (h, w))
        except Exception:
            img = None  # corrupt embed: info survives, pixels don't
        out.append((info, img))
    return out
