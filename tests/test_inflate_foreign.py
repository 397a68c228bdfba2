"""Device decode of foreign (unindexed) streams via the host anchor
pre-scan (SURVEY.md C17: the reference inflate takes ANY stream;
round-3 verdict item #5).

The native scanner walks the bitstream once recording block starts and
every-T-th token position; the device anchor-walk kernel then decodes
all intervals in parallel — same machinery as indexed streams, no 'ZZ'
index required.
"""
from __future__ import annotations

import gzip
import zlib

import numpy as np
import pytest

import zzflate_tpu as zf
from zzflate_tpu import native
from zzflate_tpu.models import inflate_tpu

pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="native scanner unavailable"
)


@pytest.fixture(scope="module")
def mixed():
    text = (open("/usr/include/zlib.h", "rb").read() * 6)[: 1 << 19]
    rnd = np.random.default_rng(3).integers(
        0, 256, 1 << 15, dtype=np.uint8
    ).tobytes()
    return text + rnd + text[:50000]


def test_scan_anchors_counts(mixed):
    z = zlib.compress(mixed, 6)
    blocks, anchors, total_out, end_bit = native.scan_anchors(z[2:-4], 256)
    assert total_out == len(mixed)
    assert end_bit <= len(z[2:-4]) * 8
    assert (np.diff(blocks[:, 2]) >= 0).all()
    # anchors are strictly increasing in bit position
    if len(anchors) > 1:
        assert (np.diff(anchors[:, 0]) > 0).all()


@pytest.mark.parametrize("level", [1, 6, 9])
def test_foreign_zlib_levels(mixed, level):
    z = zlib.compress(mixed, level)
    assert inflate_tpu.decompress_foreign(z, format="zlib") == mixed


def test_foreign_gzip_and_raw(mixed):
    g = gzip.compress(mixed, 6)
    assert inflate_tpu.decompress_foreign(g, format="gzip") == mixed
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = c.compress(mixed) + c.flush()
    assert inflate_tpu.decompress_foreign(raw, format="raw") == mixed


def test_foreign_via_public_api(mixed):
    g = gzip.compress(mixed, 4)
    assert zf.decompress(g, format="gzip", engine="tpu") == mixed
    z = zlib.compress(mixed, 7)
    assert zf.decompress(z, format="zlib", engine="tpu") == mixed


def test_foreign_strategies(mixed):
    # zlib strategies produce fixed/rle-shaped streams; all must decode.
    for strat in (zlib.Z_FIXED, zlib.Z_RLE, zlib.Z_FILTERED):
        c = zlib.compressobj(6, zlib.DEFLATED, 15, 8, strat)
        z = c.compress(mixed[: 1 << 17]) + c.flush()
        assert (
            inflate_tpu.decompress_foreign(z, format="zlib")
            == mixed[: 1 << 17]
        )


def test_foreign_all_stored_falls_back():
    rnd = np.random.default_rng(0).integers(
        0, 256, 1 << 16, dtype=np.uint8
    ).tobytes()
    z = zlib.compress(rnd, 0)
    # all-stored: decompress_foreign declines (native path wins) but the
    # public API still round-trips
    assert inflate_tpu.decompress_foreign(z, format="zlib") is None
    assert zf.decompress(z, format="zlib", engine="tpu") == rnd


def test_foreign_corrupt_crc_raises(mixed):
    g = bytearray(gzip.compress(mixed, 6))
    g[-5] ^= 0xFF  # flip a CRC byte
    with pytest.raises(ValueError):
        inflate_tpu.decompress_foreign(bytes(g), format="gzip")


def test_foreign_multimember_and_device_residency(mixed):
    import zlib as _z

    a = mixed[: 1 << 17]
    b = mixed[1 << 17 : 1 << 18]
    two = gzip.compress(a, 6) + gzip.compress(b, 5)
    # First member decodes on device; the tail member is appended via
    # the host path (RFC 1952 multi-member contract).
    assert inflate_tpu.decompress_foreign(two, format="gzip") == a + b
    # Device-resident return (the data-loading path).
    one = gzip.compress(a, 6)
    arr, n = inflate_tpu.decompress_foreign(one, format="gzip",
                                            to_device=True)
    assert n == len(a)
    assert bytes(bytearray(np.asarray(arr[:n]))) == a
    # Trailing junk after a zlib stream is ignored (stdlib contract).
    z = _z.compress(a, 6)
    assert inflate_tpu.decompress_foreign(z + b"XX", format="zlib") == a
