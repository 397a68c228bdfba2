"""Native runtime (C inflate + checksums) vs the zlib oracle and the
Python reference decoder."""
import zlib

import numpy as np
import pytest

from zzflate_tpu import native
from zzflate_tpu.models import inflate as py_inflate

pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="no C compiler available"
)


def _corpus(n=50000, seed=1):
    rng = np.random.default_rng(seed)
    text = (b"native decoder exercising text " * 4000)[: n // 2]
    rnd = rng.integers(0, 256, size=n // 4, dtype=np.uint8).tobytes()
    return text + rnd + b"\x00" * (n - len(text) - len(rnd))


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_native_decodes_zlib(level):
    data = _corpus(seed=level)
    blob = zlib.compress(data, level)
    out, endbit = native.inflate_raw(blob, bitpos=16)
    assert out == data


@pytest.mark.parametrize(
    "strategy", [zlib.Z_FILTERED, zlib.Z_HUFFMAN_ONLY, zlib.Z_RLE, zlib.Z_FIXED]
)
def test_native_decodes_strategies(strategy):
    data = _corpus(seed=strategy + 20)
    c = zlib.compressobj(6, zlib.DEFLATED, -15, 8, strategy)
    blob = c.compress(data) + c.flush()
    out, _ = native.inflate_raw(blob)
    assert out == data


def test_native_dictionary():
    dictionary = b"preset dictionary body " * 200
    data = b"preset dictionary body with suffix " * 100
    c = zlib.compressobj(6, zlib.DEFLATED, -15, 8, zlib.Z_DEFAULT_STRATEGY,
                         zdict=dictionary)
    blob = c.compress(data) + c.flush()
    out, _ = native.inflate_raw(blob, dictionary=dictionary)
    assert out == data


def test_native_matches_python_endbit():
    data = _corpus(seed=9)
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    blob = c.compress(data) + c.flush()
    out_n, end_n = native.inflate_raw(blob)
    out_p, end_p = py_inflate.inflate_raw(blob)
    assert out_n == out_p == data
    assert end_n == end_p


def test_native_rejects_corruption():
    data = _corpus(seed=10)
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    blob = bytearray(c.compress(data) + c.flush())
    blob[10] ^= 0x55
    try:
        out, _ = native.inflate_raw(bytes(blob))
        assert out != data  # decoded to garbage rather than crashing
    except ValueError:
        pass  # detected explicitly: also fine


def test_native_truncated_input():
    data = _corpus(seed=11)
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    blob = (c.compress(data) + c.flush())[:40]
    with pytest.raises(ValueError):
        native.inflate_raw(blob)


def test_native_checksums_match_zlib():
    data = _corpus(seed=12)
    assert native.adler32(data) == zlib.adler32(data)
    assert native.crc32(data) == zlib.crc32(data)
    # incremental
    a = native.adler32(data[5000:], native.adler32(data[:5000]))
    assert a == zlib.adler32(data)
    c = native.crc32(data[5000:], native.crc32(data[:5000]))
    assert c == zlib.crc32(data)


def test_native_overlapped_copy_rle():
    data = b"\xab" * 100000
    blob = zlib.compress(data, 6)
    out, _ = native.inflate_raw(blob, bitpos=16)
    assert out == data


def test_native_empty():
    blob = zlib.compress(b"", 6)
    out, _ = native.inflate_raw(blob, bitpos=16)
    assert out == b""
