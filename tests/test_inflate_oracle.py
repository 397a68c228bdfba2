"""Our inflate must decode anything zlib/gzip/libdeflate produce
(cross-product oracle, SURVEY.md section 4.1/4.4)."""
import ctypes
import ctypes.util
import gzip
import io
import zlib

import numpy as np
import pytest

from zzflate_tpu.models import inflate


def _corpus(n=30000, seed=3):
    rng = np.random.default_rng(seed)
    text = (b"<item key='v'>some text body</item>\n" * 2000)[: n // 2]
    rnd = rng.integers(0, 256, size=n // 4, dtype=np.uint8).tobytes()
    zeros = b"\x00" * (n - len(text) - len(rnd))
    return text + rnd + zeros


@pytest.mark.parametrize("level", list(range(0, 10)))
def test_decode_zlib_all_levels(level):
    data = _corpus()
    assert inflate.decompress(zlib.compress(data, level)) == data


@pytest.mark.parametrize(
    "strategy",
    [zlib.Z_DEFAULT_STRATEGY, zlib.Z_FILTERED, zlib.Z_HUFFMAN_ONLY,
     zlib.Z_RLE, zlib.Z_FIXED],
)
def test_decode_zlib_all_strategies(strategy):
    data = _corpus(seed=strategy + 10)
    c = zlib.compressobj(6, zlib.DEFLATED, 15, 8, strategy)
    blob = c.compress(data) + c.flush()
    assert inflate.decompress(blob) == data


def test_decode_gzip_module():
    data = _corpus(seed=5)
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", filename="name.txt") as f:
        f.write(data)
    assert inflate.decompress(buf.getvalue(), format="gzip") == data


def test_decode_raw_and_window_bits():
    data = _corpus(seed=6)
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    blob = c.compress(data) + c.flush()
    assert inflate.decompress(blob, format="raw") == data


def test_decode_sync_flush_stream():
    data1, data2 = _corpus(seed=7), _corpus(seed=8)
    c = zlib.compressobj(6)
    blob = (
        c.compress(data1)
        + c.flush(zlib.Z_FULL_FLUSH)
        + c.compress(data2)
        + c.flush()
    )
    assert inflate.decompress(blob) == data1 + data2


def test_decode_dictionary_stream():
    dictionary = b"common preamble text " * 100
    data = b"common preamble text with a twist " * 50
    c = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_DEFAULT_STRATEGY,
                         zdict=dictionary)
    blob = c.compress(data) + c.flush()
    assert inflate.decompress(blob, dictionary=dictionary) == data
    with pytest.raises(ValueError):
        inflate.decompress(blob)  # missing dictionary must be detected


def test_decode_libdeflate_if_present():
    lib = None
    for name in ("libdeflate.so.0", "libdeflate.so"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        pytest.skip("libdeflate not available")
    lib.libdeflate_alloc_compressor.restype = ctypes.c_void_p
    lib.libdeflate_zlib_compress.restype = ctypes.c_size_t
    lib.libdeflate_zlib_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    data = _corpus(seed=9)
    comp = lib.libdeflate_alloc_compressor(6)
    outbuf = ctypes.create_string_buffer(len(data) + 1024)
    n = lib.libdeflate_zlib_compress(comp, data, len(data), outbuf, len(outbuf))
    assert n > 0
    assert inflate.decompress(outbuf.raw[:n]) == data


def test_checksum_verification_rejects_corruption():
    data = _corpus(seed=11)
    blob = bytearray(zlib.compress(data, 6))
    blob[-1] ^= 0xFF  # corrupt the adler trailer
    with pytest.raises(ValueError):
        inflate.decompress(bytes(blob))


def test_rejects_bad_stored_nlen():
    # stored block with LEN/NLEN mismatch
    blob = bytes([0x01, 0x05, 0x00, 0x00, 0x00]) + b"hello"
    with pytest.raises(ValueError):
        inflate.inflate_raw(blob)
