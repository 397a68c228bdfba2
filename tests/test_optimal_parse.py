"""Level-9 cost-aware (shortest-bit-path) parse: validity + ratio gates."""
import zlib

import numpy as np
import pytest

import zzflate_tpu as zf
from zzflate_tpu import native


def test_l9_beats_zlib9_on_homogeneous_text():
    data = open("/usr/include/zlib.h", "rb").read() * 6
    out = zf.compress(data, level=9, format="zlib")
    assert zlib.decompress(out) == data
    z9 = len(zlib.compress(data, 9))
    assert len(out) < z9, f"L9 DP should beat zlib-9: {len(out)} vs {z9}"


def test_l9_no_worse_than_l6():
    data = open("/usr/include/zlib.h", "rb").read() * 2
    o9 = zf.compress(data, level=9, format="zlib")
    o6 = zf.compress(data, level=6, format="zlib")
    assert zlib.decompress(o9) == data
    assert len(o9) <= len(o6)


def test_dp_tokens_are_valid_matches():
    # The DP may choose SHORTER lengths than the matcher found; every
    # emitted (len, dist) must still be a real match in the bytes.
    if native.lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    data = rng.choice(np.frombuffer(b"abcdef", np.uint8), size=4096).tobytes()
    out = zf.compress(data, level=9, format="zlib", chunk_bytes=4096)
    assert zlib.decompress(out) == data


def test_dp_respects_window_bits():
    data = open("/usr/include/zlib.h", "rb").read()
    out = zf.compress(data, level=9, window_bits=9)
    # decodable with a 512-byte window: distances must be bounded
    assert zlib.decompressobj(wbits=9).decompress(out) == data
