"""Golden + randomized tests for the parallel checksum kernels.

Oracle: python stdlib zlib (same C implementation the reference benches
against). Golden vectors from SURVEY.md A.6.
"""
import zlib

import numpy as np
import pytest

from zzflate_tpu.ops import checksums as cs


def test_adler32_goldens():
    assert int(cs.adler32(np.frombuffer(b"", np.uint8))) == 1
    assert int(cs.adler32(np.frombuffer(b"abc", np.uint8))) == 0x024D0127


def test_crc32_golden():
    assert int(cs.crc32(np.frombuffer(b"abc", np.uint8))) == 0x352441C2


@pytest.mark.parametrize("n", [0, 1, 2, 255, 1023, 1024, 1025, 70000])
def test_adler32_random(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    assert int(cs.adler32(data)) == zlib.adler32(data.tobytes())


@pytest.mark.parametrize("n", [0, 1, 2, 255, 1023, 1024, 1025, 70000])
def test_crc32_random(n):
    rng = np.random.default_rng(n + 1)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    assert int(cs.crc32(data)) == zlib.crc32(data.tobytes())


def test_adler32_valid_length_masking():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=5000, dtype=np.uint8)
    got = int(cs.adler32(data, length=3000))
    assert got == zlib.adler32(data[:3000].tobytes())


def test_crc32_valid_length_masking():
    rng = np.random.default_rng(8)
    data = rng.integers(0, 256, size=5000, dtype=np.uint8)
    got = int(cs.crc32(data, length=3000))
    assert got == zlib.crc32(data[:3000].tobytes())


def test_host_combines():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, size=10000, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, size=33333, dtype=np.uint8).tobytes()
    assert cs.crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b)) == zlib.crc32(a + b)
    assert cs.adler32_combine(
        zlib.adler32(a), zlib.adler32(b), len(b)
    ) == zlib.adler32(a + b)


def test_crc32_shift_is_zero_extension():
    # Shifting a raw state by n bytes == feeding n zero bytes.
    a = b"hello world"
    raw = zlib.crc32(a) ^ 0xFFFFFFFF
    shifted = cs.crc32_shift(raw, 5)
    assert shifted ^ 0xFFFFFFFF == zlib.crc32(a + b"\x00" * 5)
