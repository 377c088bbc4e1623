"""UTF-8 codec conformance: vectorized decoder vs Python's semantics and
the reference's exact invalid-input behaviour (one INVALID per bad byte,
overlong/surrogate/range rejection — utf8.cpp:37-74)."""

import numpy as np
import pytest

from youtokentome_tpu.models.state import INVALID_UNICODE
from youtokentome_tpu.ops.utf8 import (
    decode_utf8_bytes,
    encode_utf8_array,
    str_to_codepoints,
)


def ref_decode(data: bytes):
    """Scalar reimplementation of the reference iteration for testing."""

    def check_cp(x):
        return x < 0xD800 or (0xDFFF < x < 0x110000)

    out = []
    i = 0
    n = len(data)
    while i < n:
        b0 = data[i]
        if b0 < 0x80:
            out.append(b0)
            i += 1
            continue
        cp = None
        ln = 1
        if (b0 & 0xE0) == 0xC0 and i + 1 < n and (data[i + 1] & 0xC0) == 0x80:
            v = ((b0 & 0x1F) << 6) | (data[i + 1] & 0x3F)
            if v >= 0x80 and check_cp(v):
                cp, ln = v, 2
        elif (
            (b0 & 0xF0) == 0xE0
            and i + 2 < n
            and (data[i + 1] & 0xC0) == 0x80
            and (data[i + 2] & 0xC0) == 0x80
        ):
            v = ((b0 & 0x0F) << 12) | ((data[i + 1] & 0x3F) << 6) | (data[i + 2] & 0x3F)
            if v >= 0x800 and check_cp(v):
                cp, ln = v, 3
        elif (
            (b0 & 0xF8) == 0xF0
            and i + 3 < n
            and (data[i + 1] & 0xC0) == 0x80
            and (data[i + 2] & 0xC0) == 0x80
            and (data[i + 3] & 0xC0) == 0x80
        ):
            v = (
                ((b0 & 0x07) << 18)
                | ((data[i + 1] & 0x3F) << 12)
                | ((data[i + 2] & 0x3F) << 6)
                | (data[i + 3] & 0x3F)
            )
            if v >= 0x10000 and check_cp(v):
                cp, ln = v, 4
        out.append(cp if cp is not None else INVALID_UNICODE)
        i += ln
    return np.array(out, dtype=np.uint32)


VALID_TEXTS = [
    "hello world",
    "привет мир",
    "日本語のテキスト",
    "emoji 🎉🎊 mixed ascii",
    "▁meta▁symbol",
    "",
    "a",
    "éèê",  # 2-byte chars
    "퟿",  # around the surrogate gap
    "\U0010ffff max codepoint",
]

INVALID_BYTES = [
    b"\x80",  # lone continuation
    b"\xc0\xaf",  # overlong 2-byte
    b"\xe0\x80\xaf",  # overlong 3-byte
    b"\xf0\x80\x80\xaf",  # overlong 4-byte
    b"\xed\xa0\x80",  # surrogate D800
    b"\xf4\x90\x80\x80",  # > U+10FFFF
    b"\xc2",  # truncated at end
    b"\xe1\x80",  # truncated 3-byte
    b"\xff\xfe",  # bad lead bytes
    b"abc\x80\x80def",
    b"a\xc2\xe1\x80\x41",
    b"\xf0\x9f\x8e",  # truncated emoji
]


@pytest.mark.parametrize("text", VALID_TEXTS)
def test_valid_roundtrip(text):
    data = text.encode("utf-8")
    cps = decode_utf8_bytes(data)
    expected = np.array([ord(c) for c in text], dtype=np.uint32)
    np.testing.assert_array_equal(cps, expected)
    assert encode_utf8_array(cps) == data


@pytest.mark.parametrize("data", INVALID_BYTES)
def test_invalid_matches_reference_iteration(data):
    np.testing.assert_array_equal(decode_utf8_bytes(data), ref_decode(data))


def test_random_bytes_match_reference_iteration():
    rng = np.random.default_rng(0)
    for _ in range(50):
        data = rng.integers(0, 256, size=rng.integers(1, 400), dtype=np.uint8).tobytes()
        np.testing.assert_array_equal(decode_utf8_bytes(data), ref_decode(data))


def test_random_valid_text_roundtrip():
    rng = np.random.default_rng(1)
    alphabet = [chr(c) for c in [97, 98, 1072, 0x65E5, 0x1F600, 0x2581, 32, 10]]
    for _ in range(20):
        text = "".join(rng.choice(alphabet) for _ in range(200))
        data = text.encode("utf-8")
        np.testing.assert_array_equal(
            decode_utf8_bytes(data), str_to_codepoints(text)
        )


def test_keep_invalid_false_drops():
    out = decode_utf8_bytes(b"a\x80b", keep_invalid=False)
    np.testing.assert_array_equal(out, np.array([97, 98], dtype=np.uint32))
