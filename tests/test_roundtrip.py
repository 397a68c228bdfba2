"""End-to-end round-trip tests: every output must decode via system zlib
(the reference's own verification contract, SURVEY.md section 4.1) and via
our own inflate.

chunk_bytes is kept at 4096 throughout so the whole file shares one
compiled encode graph per level.
"""
import os
import zlib

import numpy as np
import pytest

import zzflate_tpu as zf

CHUNK = 4096


def _mixed_data(n: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    text = (b"the quick brown fox jumps over the lazy dog. " * 400)[: n // 2]
    rnd = rng.integers(0, 256, size=n - len(text), dtype=np.uint8).tobytes()
    return text + rnd


def _check(data: bytes, level: int, fmt: str) -> bytes:
    out = zf.compress(data, level=level, format=fmt, chunk_bytes=CHUNK)
    if fmt == "zlib":
        assert zlib.decompress(out) == data
    elif fmt == "gzip":
        assert zlib.decompress(out, wbits=31) == data
    else:
        assert zlib.decompress(out, wbits=-15) == data
    assert zf.decompress(out, format=fmt) == data
    return out


@pytest.mark.parametrize("fmt", ["zlib", "gzip", "raw"])
@pytest.mark.parametrize("level", [0, 1, 6])
def test_formats_levels(fmt, level):
    data = _mixed_data(20000, seed=level)
    _check(data, level, fmt)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"x",
        b"\x00" * 100_000,
        b"abc" * 5,
        bytes(range(256)) * 4,
    ],
    ids=["empty", "one", "zeros100k", "tiny-repeat", "alphabet"],
)
def test_corner_inputs(data):
    _check(data, 6, "zlib")


def test_incompressible_hits_stored_fallback():
    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, size=30000, dtype=np.uint8).tobytes()
    out = _check(data, 6, "zlib")
    # Random data must not expand beyond stored-block + container overhead.
    assert len(out) <= len(data) + 5 * (len(data) // 65535 + 2) + 32


def test_stored_len_straddle():
    # 70000 zeros at level 0 forces two stored blocks (LEN limit 65535).
    data = b"\x07" * 70000
    out = zf.compress(data, level=0, format="zlib", chunk_bytes=CHUNK)
    assert zlib.decompress(out) == data


def test_preset_dictionary_zlib():
    dictionary = b"the quick brown fox jumps over the lazy dog. " * 50
    data = b"the quick brown fox jumps over the lazy dog! " * 40
    out = zf.compress(
        data, level=6, format="zlib", dictionary=dictionary, chunk_bytes=CHUNK
    )
    d = zlib.decompressobj(zdict=dictionary)
    assert d.decompress(out) == data
    assert zf.decompress(out, format="zlib", dictionary=dictionary) == data
    # The dictionary must actually help vs no-dictionary.
    out_nodict = zf.compress(data, level=6, format="zlib", chunk_bytes=CHUNK)
    assert len(out) < len(out_nodict)


def test_chunk_boundaries_use_halo():
    # Repetitive data spanning many chunks: back-references across chunk
    # boundaries (via the halo dictionary) must keep the ratio high.
    data = (b"0123456789abcdef" * 37)[:592] * 40  # ~23 KiB, period 592
    out = _check(data, 6, "zlib")
    assert len(out) < len(data) // 20


def test_level9_better_or_equal_level1():
    data = _mixed_data(40000, seed=7)
    o1 = zf.compress(data, level=1, format="raw", chunk_bytes=CHUNK)
    o9 = zf.compress(data, level=9, format="raw", chunk_bytes=CHUNK)
    assert zlib.decompress(o9, wbits=-15) == data
    assert len(o9) <= len(o1)


def test_compress_bound():
    for n in (0, 1, 100, 65535, 70000):
        data = os.urandom(min(n, 70000))
        out = zf.compress(data, level=6, format="gzip", chunk_bytes=CHUNK)
        assert len(out) <= zf.compress_bound(len(data), "gzip")


def test_compact_fetch_byte_identical(monkeypatch):
    """ZZFLATE_COMPACT_FETCH concatenates used words on device and fetches
    exact sizes; the stitched stream must be byte-identical to the padded
    per-chunk fetch path (api.finish reads the same word prefixes)."""
    from zzflate_tpu import encode_pipeline as api

    data = _mixed_data(60000, seed=11)
    monkeypatch.setattr(api, "_COMPACT", False)
    ref = zf.compress(data, level=6, format="gzip", chunk_bytes=CHUNK)
    monkeypatch.setattr(api, "_COMPACT", True)
    got = zf.compress(data, level=6, format="gzip", chunk_bytes=CHUNK)
    assert got == ref
    assert zlib.decompress(got, wbits=31) == data
    # final-chunk (no sync-flush) and indexed (anchor arrays) variants
    gi = zf.compress(data, level=6, format="gzip", chunk_bytes=CHUNK,
                     indexed=True)
    assert zlib.decompress(gi, wbits=31) == data


def test_compact_fetch_skips_stored_chunks(monkeypatch):
    """Compact emit zeroes word_cnt for incompressible chunks (their
    Huffman words are never fetched; the host stitcher takes the stored
    fallback) — output must stay byte-identical to the padded path,
    including the boundary chunks around the incompressible region and a
    final incompressible chunk (different keep threshold: no sync-flush
    marker)."""
    from zzflate_tpu import encode_pipeline as api

    rng = np.random.default_rng(77)
    noise = rng.integers(0, 256, size=3 * CHUNK, dtype=np.uint8).tobytes()
    for data in (
        (b"compressible text " * 400)[: CHUNK + 123] + noise
        + (b"more text after the stored region " * 300)[:CHUNK],
        b"leading text " * 200 + noise,  # incompressible FINAL chunk
    ):
        monkeypatch.setattr(api, "_COMPACT", False)
        ref = zf.compress(data, level=6, format="gzip", chunk_bytes=CHUNK)
        monkeypatch.setattr(api, "_COMPACT", True)
        got = zf.compress(data, level=6, format="gzip", chunk_bytes=CHUNK)
        assert got == ref
        assert zlib.decompress(got, wbits=31) == data
        gi = zf.compress(data, level=6, format="gzip", chunk_bytes=CHUNK,
                         indexed=True)
        assert zlib.decompress(gi, wbits=31) == data
        assert zf.decompress(gi, format="gzip", engine="tpu") == data
