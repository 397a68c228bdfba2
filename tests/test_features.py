"""API-parity features: strategies, windowBits, deflateParams-style
re-tuning, multi-member gzip (SURVEY.md C20/C18/L5 contracts)."""
import zlib

import numpy as np
import pytest

import zzflate_tpu as zf
import zzflate_tpu.stream as zs

CHUNK = 4096


def _data(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    text = (b"strategy feature test body " * 1000)[: n // 2]
    rnd = rng.integers(0, 256, size=n - len(text), dtype=np.uint8).tobytes()
    return text + rnd


@pytest.mark.parametrize(
    "strategy",
    [zf.STRATEGY_DEFAULT, zf.STRATEGY_FILTERED, zf.STRATEGY_HUFFMAN_ONLY,
     zf.STRATEGY_RLE, zf.STRATEGY_FIXED],
)
def test_strategies_roundtrip(strategy):
    data = _data(seed=strategy)
    out = zf.compress(data, level=6, format="zlib", chunk_bytes=CHUNK,
                      strategy=strategy)
    assert zlib.decompress(out) == data


def test_rle_strategy_compresses_runs():
    data = b"a" * 5000 + b"b" * 5000
    out = zf.compress(data, level=6, format="zlib", chunk_bytes=CHUNK,
                      strategy=zf.STRATEGY_RLE)
    assert zlib.decompress(out) == data
    assert len(out) < 200


def test_huffman_only_has_no_matches():
    # Highly repetitive data stays large without LZ matches.
    data = b"abcd" * 2500
    out_h = zf.compress(data, level=6, format="raw", chunk_bytes=CHUNK,
                        strategy=zf.STRATEGY_HUFFMAN_ONLY)
    out_d = zf.compress(data, level=6, format="raw", chunk_bytes=CHUNK)
    assert zlib.decompress(out_h, wbits=-15) == data
    assert len(out_h) > 5 * len(out_d)


@pytest.mark.parametrize("bits", [9, 12, 15])
def test_window_bits_respected(bits):
    # Period > 2^bits: matches beyond the window are illegal; decode with
    # a zlib window of exactly that size must succeed.
    period = (1 << bits) + 100
    rng = np.random.default_rng(bits)
    base = rng.integers(0, 256, size=period, dtype=np.uint8).tobytes()
    data = base * 3
    out = zf.compress(data, level=6, format="zlib", chunk_bytes=1 << 17,
                      window_bits=bits)
    d = zlib.decompressobj(wbits=bits)
    assert d.decompress(out) + d.flush() == data


def test_set_params_mid_stream():
    c = zs.Compressor(level=1, format="zlib", chunk_bytes=CHUNK)
    out = c.compress(b"first part " * 300)
    out += c.set_params(level=9, strategy=zf.STRATEGY_DEFAULT)
    out += c.compress(b"second part " * 300)
    out += c.flush(zs.Z_FINISH)
    assert zlib.decompress(out) == b"first part " * 300 + b"second part " * 300


def test_multi_member_gzip_decode():
    a, b = b"member one " * 200, b"member two " * 300
    blob = zf.compress(a, level=6, format="gzip", chunk_bytes=CHUNK)
    blob += zf.compress(b, level=6, format="gzip", chunk_bytes=CHUNK)
    assert zf.decompress(blob, format="gzip") == a + b
    # gzip CLI/zlib agree on concatenation semantics
    import gzip as _gz

    assert _gz.decompress(blob) == a + b


def test_zlib_header_cinfo_tracks_window_bits():
    out = zf.compress(b"x" * 100, level=6, format="zlib", chunk_bytes=CHUNK,
                      window_bits=10)
    assert out[0] == ((10 - 8) << 4) | 8
    assert (out[0] * 256 + out[1]) % 31 == 0


def test_seekable_random_access():
    """seekable=True resets the window per chunk (flagged in the 'ZZ'
    index); decompress_range reads any byte range touching only the
    covering chunks, and the stream stays a valid gzip member."""
    import numpy as np

    import zzflate_tpu as zf
    from zzflate_tpu.utils import containers

    text = open("/usr/include/zlib.h", "rb").read()[:40000]
    rng = np.random.default_rng(9)
    data = text + rng.integers(0, 256, 8000, dtype=np.uint8).tobytes()
    out = zf.compress(data, level=6, format="gzip", chunk_bytes=4096,
                      indexed=True, seekable=True)
    assert zlib.decompress(out, wbits=31) == data
    flags = containers.gzip_index_flags(out)
    assert flags is not None and flags & containers.ZZ_FLAG_SEEKABLE
    for off, ln in [(0, 64), (4091, 10), (20000, 15000), (47990, 10),
                    (0, len(data)), (5, 0)]:
        assert zf.decompress_range(out, off, ln) == data[off : off + ln]
    with pytest.raises(ValueError):
        zf.decompress_range(out, len(data) - 4, 10)
    # halo-indexed stream: range reads still correct via prefix decode
    out2 = zf.compress(data, level=6, format="gzip", chunk_bytes=4096,
                       indexed=True)
    assert not (containers.gzip_index_flags(out2) or 0) & 1
    assert zf.decompress_range(out2, 30000, 9000) == data[30000:39000]


def test_range_and_indexed_edges():
    """Round-4 edge hardening: the unindexed decompress_range fallback
    bounds-checks like the indexed path, and indexed level 0 is
    rejected instead of silently dropping the index."""
    data = open("/usr/include/zlib.h", "rb").read()[:20000]
    plain = zf.compress(data, level=6, format="gzip", chunk_bytes=4096)
    assert zf.decompress_range(plain, 100, 50) == data[100:150]
    with pytest.raises(ValueError):
        zf.decompress_range(plain, len(data) - 4, 10)
    with pytest.raises(ValueError):
        zf.compress(data, level=0, format="gzip", indexed=True)
