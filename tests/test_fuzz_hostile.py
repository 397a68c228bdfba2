"""Hostile-surface fuzz (SURVEY.md section 4.4, VERDICT round-1 #9).

Three attack surfaces:
  * truncation: every public decode entry point must raise ValueError (or
    return the documented need-more-input signal) on any prefix of a valid
    stream — never hang, crash with a non-ValueError, or read OOB;
  * lying 'ZZ' FEXTRA indexes: decompress_indexed drives device scatters
    from index-supplied offsets, so corrupted/malicious indexes must raise
    or produce wrong-but-bounded output, never crash;
  * corrupt container headers: parse_gzip_header / parse_zlib_header on
    mutated bytes raise ValueError only.
"""
import struct
import zlib

import numpy as np
import pytest

import zzflate_tpu as zf
from zzflate_tpu.utils import containers

CHUNK = 4096

_DATA = (
    b"hostile fuzz corpus: " + bytes(range(256)) * 8
    + open("/usr/include/zlib.h", "rb").read()[:20000]
)


def _try_decode(blob, fmt):
    """Decode must either succeed or raise ValueError; anything else fails."""
    try:
        zf.decompress(blob, format=fmt)
    except ValueError:
        pass


@pytest.mark.parametrize("fmt", ["zlib", "gzip", "raw"])
def test_truncation_sweep(fmt):
    out = zf.compress(_DATA, level=6, format=fmt, chunk_bytes=CHUNK)
    # Every truncation point in the container regions + a stride through
    # the body (full sweep is O(n) native decodes — sample it).
    points = set(range(0, min(64, len(out))))
    points |= set(range(len(out) - 40, len(out)))
    points |= set(range(64, len(out) - 40, 97))
    for cut in sorted(points):
        if 0 <= cut < len(out):
            _try_decode(out[:cut], fmt)


def test_truncation_sweep_indexed_tpu():
    out = zf.compress(
        _DATA, level=6, format="gzip", chunk_bytes=CHUNK, indexed=True
    )
    for cut in list(range(0, 80, 7)) + list(range(80, len(out), 131)):
        try:
            zf.decompress(out[:cut], format="gzip", engine="tpu")
        except ValueError:
            pass


def _mutate_index(blob: bytes, rng) -> bytes:
    """Flip bytes inside the FEXTRA region only (the index attack surface)."""
    xlen = struct.unpack("<H", blob[10:12])[0]
    lo, hi = 12, 12 + xlen
    b = bytearray(blob)
    for _ in range(int(rng.integers(1, 6))):
        i = int(rng.integers(lo, hi))
        b[i] ^= int(rng.integers(1, 256))
    return bytes(b)


@pytest.mark.parametrize("seed", range(20))
def test_lying_zz_index_never_crashes(seed):
    rng = np.random.default_rng(500 + seed)
    out = zf.compress(
        _DATA, level=6, format="gzip", chunk_bytes=CHUNK, indexed=True
    )
    bad = _mutate_index(out, rng)
    try:
        got = zf.decompress(bad, format="gzip", engine="tpu")
        # Wrong output is acceptable ONLY if the stream still checksums
        # (i.e. the mutation didn't change decode semantics).
    except ValueError:
        pass


@pytest.mark.parametrize("seed", range(20))
def test_adversarial_zz_index_fields(seed):
    """Targeted lies: oversized nblocks/seg_bytes/bit_off/out_off values."""
    rng = np.random.default_rng(900 + seed)
    out = zf.compress(
        _DATA[:30000], level=6, format="gzip", chunk_bytes=CHUNK, indexed=True
    )
    parsed = containers.parse_gzip_index(out)
    assert parsed is not None
    header_len, chunk_bytes, _t, chunks = parsed
    body = out[header_len:]

    # Rebuild the header with corrupted index entries.
    lies = []
    for seg_bytes, blocks, anchors in chunks:
        kind = int(rng.integers(0, 6))
        if kind == 0:
            seg_bytes = int(rng.integers(0, 1 << 31))
        new_blocks = []
        for bit_off, out_off in blocks:
            if kind == 1:
                bit_off = int(rng.integers(0, 1 << 31))
            elif kind == 2:
                out_off = int(rng.integers(0, 1 << 31))
            new_blocks.append((bit_off, out_off))
        if kind == 3 and new_blocks:
            new_blocks = new_blocks * int(rng.integers(2, 5))
        new_anchors = [
            (
                int(rng.integers(0, 1 << 31)) if kind == 5 else a,
                int(rng.integers(0, 1 << 31)) if kind == 5 else o,
            )
            for a, o in anchors
        ]
        lies.append((seg_bytes, new_blocks, new_anchors))
    if int(rng.integers(0, 2)):
        chunk_bytes = int(rng.integers(0, 1 << 20))
    try:
        hdr = containers.gzip_header_indexed(chunk_bytes, lies)
    except ValueError:
        return  # index too large to serialize — fine
    bad = hdr + body
    try:
        zf.decompress(bad, format="gzip", engine="tpu")
    except (ValueError, ZeroDivisionError):
        pass


_GZ_SMALL = zf.compress(b"x" * 500, level=1, format="gzip",
                        chunk_bytes=CHUNK)
_ZL_SMALL = zf.compress(b"x" * 500, level=1, format="zlib",
                        chunk_bytes=CHUNK)


@pytest.mark.parametrize("seed", range(30))
def test_corrupt_container_headers(seed):
    rng = np.random.default_rng(700 + seed)
    gz, zl = _GZ_SMALL, _ZL_SMALL
    for blob, parser in ((gz, containers.parse_gzip_header),
                         (zl, containers.parse_zlib_header)):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, min(20, len(b))))
            b[i] ^= int(rng.integers(1, 256))
        try:
            parser(bytes(b))
        except ValueError:
            pass


@pytest.mark.parametrize("seed", range(10))
def test_corrupt_streams_raise_valueerror_only(seed):
    """Public decompress: random body corruption raises ValueError only
    (struct.error / struct leaks are bugs), or returns wrong bytes for
    non-checksummed raw streams."""
    rng = np.random.default_rng(800 + seed)
    for fmt in ("zlib", "gzip"):
        blob = bytearray(zf.compress(_DATA[:20000], level=6, format=fmt))
        for _ in range(6):
            i = int(rng.integers(0, len(blob)))
            blob[i] ^= int(rng.integers(1, 256))
        _try_decode(bytes(blob), fmt)
