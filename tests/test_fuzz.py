"""Property/fuzz round-trips (SURVEY.md section 4.4): random content mixes
x sizes x formats must always round-trip through the zlib oracle and our
own decoders. Shapes are chosen to reuse the same compiled graphs."""
import zlib

import numpy as np
import pytest

import zzflate_tpu as zf

CHUNK = 4096


def _gen(rng, n):
    """Random mix of run/text/random/periodic spans."""
    out = bytearray()
    while len(out) < n:
        kind = rng.integers(0, 4)
        ln = int(rng.integers(1, 3000))
        if kind == 0:
            out += bytes([int(rng.integers(0, 256))]) * ln
        elif kind == 1:
            words = [b"alpha ", b"beta ", b"gamma ", b"delta-", b"\n"]
            out += b"".join(
                words[int(rng.integers(0, len(words)))]
                for _ in range(ln // 5 + 1)
            )[:ln]
        elif kind == 2:
            out += rng.integers(0, 256, size=ln, dtype=np.uint8).tobytes()
        else:
            period = rng.integers(1, 40)
            pat = rng.integers(0, 256, size=period, dtype=np.uint8).tobytes()
            out += (pat * (ln // period + 1))[:ln]
    return bytes(out[:n])


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 30000))
    data = _gen(rng, n)
    level = [1, 6][seed % 2]
    fmt = ["zlib", "gzip", "raw"][seed % 3]
    out = zf.compress(data, level=level, format=fmt, chunk_bytes=CHUNK)
    wbits = {"zlib": 15, "gzip": 31, "raw": -15}[fmt]
    assert zlib.decompress(out, wbits=wbits) == data
    assert zf.decompress(out, format=fmt) == data


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_valid_foreign_streams(seed):
    """Our inflate must decode any valid zlib stream (random settings)."""
    rng = np.random.default_rng(100 + seed)
    data = _gen(rng, int(rng.integers(1, 50000)))
    level = int(rng.integers(0, 10))
    memlevel = int(rng.integers(1, 10))
    strategy = int(rng.integers(0, 5))
    c = zlib.compressobj(level, zlib.DEFLATED, 15, memlevel, strategy)
    blob = c.compress(data) + c.flush()
    assert zf.decompress(blob) == data


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_corrupt_streams_never_crash(seed):
    """Corrupted streams raise ValueError or decode to a wrong payload —
    never crash the process or loop forever."""
    rng = np.random.default_rng(200 + seed)
    data = _gen(rng, 5000)
    blob = bytearray(zlib.compress(data, 6))
    for _ in range(8):
        i = int(rng.integers(2, len(blob)))
        blob[i] ^= int(rng.integers(1, 256))
    try:
        zf.decompress(bytes(blob))
    except (ValueError, IndexError):
        pass
