"""AES core (sources/pdfcrypto.py) pinned to the FIPS-197 Appendix C
known-answer vectors — an INDEPENDENT check of the generated S-box,
key expansion, and both cipher directions (not a self-roundtrip)."""

from __future__ import annotations

import pytest

from regpulse_lakehouse_spark.sources import pdfcrypto as P

_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_VECTORS = [
    ("000102030405060708090a0b0c0d0e0f", "69c4e0d86a7b0430d8cdb78070b4c55a"),
    ("000102030405060708090a0b0c0d0e0f1011121314151617", "dda97ca4864cdfe06eaf70a0ec0d7191"),
    (
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f",
        "8ea2b7ca516745bfeafc49904b496089",
    ),
]


@pytest.mark.parametrize("key_hex,ct_hex", _VECTORS)
def test_fips197_appendix_c_known_answers(key_hex, ct_hex):
    key = bytes.fromhex(key_hex)
    assert P.aes_encrypt_block(key, _PT).hex() == ct_hex
    assert P.aes_decrypt_block(key, bytes.fromhex(ct_hex)) == _PT


def test_generated_sbox_is_the_standard_one():
    # spot-pin against published S-box entries
    assert P.SBOX[0x00] == 0x63
    assert P.SBOX[0x01] == 0x7C
    assert P.SBOX[0x53] == 0xED
    assert P.SBOX[0xFF] == 0x16
    assert len(set(P.SBOX)) == 256
    assert all(P.INV_SBOX[P.SBOX[a]] == a for a in range(256))


def test_cbc_roundtrip_and_padding():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    iv = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 100):
        msg = bytes((i * 7 + 3) & 0xFF for i in range(n))
        assert P.aes_cbc_decrypt(key, P.aes_cbc_encrypt(key, iv, msg)) == msg
    with pytest.raises(ValueError, match="IV"):
        P.aes_cbc_decrypt(key, b"short")
