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
