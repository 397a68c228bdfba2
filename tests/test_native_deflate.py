"""Native one-shot deflate encoder (native/zzflate_native.c zzt_deflate).

The host-side serving engine: every output must decode bit-exactly via
system zlib (the repo-wide oracle contract), across levels, formats,
window sizes, dictionaries and corner inputs, at ratios comparable to
zlib at the same level (SURVEY.md C5-C14, Appendix B effort table).
"""
import os
import zlib

import numpy as np
import pytest

import zzflate_tpu as zf
from zzflate_tpu import native

if native.lib() is None:  # pragma: no cover - gcc is in the image
    pytest.skip("native library unavailable", allow_module_level=True)


def _corpus(n: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    text = (b"a reasonably repetitive line of test text %d\n" % seed) * (
        n // 90 + 1
    )
    noise = rng.integers(0, 256, size=n // 3 + 1, dtype=np.uint8).tobytes()
    return (text[: n - len(noise)] + noise)[:n]


@pytest.mark.parametrize("level", [1, 4, 6, 9])
def test_roundtrip_levels(level):
    data = _corpus(150000, seed=level)
    raw = native.deflate_raw(data, level=level)
    assert zlib.decompress(raw, wbits=-15) == data


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"x",
        b"abc",
        b"\x00" * 100000,
        b"ab" * 40000,                      # dist-2 runs
        bytes(range(256)) * 300,            # low-redundancy structured
    ],
    ids=["empty", "one", "three", "zeros", "dist2", "cycle"],
)
def test_corner_inputs(data):
    for level in (1, 6, 9):
        raw = native.deflate_raw(data, level=level)
        assert zlib.decompress(raw, wbits=-15) == data


def test_incompressible_stored_fallback():
    data = os.urandom(200000)
    raw = native.deflate_raw(data, level=6)
    assert zlib.decompress(raw, wbits=-15) == data
    # stored framing: blocks close at 64 KiB of input and 65536 > 65535
    # splits each into two pieces -> ~10 bytes per 64 KiB block + slack
    assert len(raw) <= len(data) + 10 * (len(data) // 65536 + 2) + 8


def test_ratio_close_to_zlib():
    data = open("/usr/include/zlib.h", "rb").read() * 3
    for level in (1, 6, 9):
        ours = len(native.deflate_raw(data, level=level))
        zref = len(zlib.compress(data, level)) - 6  # strip zlib container
        assert ours <= zref * 1.02, (level, ours, zref)


def test_level_monotone_effort():
    data = _corpus(300000, seed=3)
    sizes = [len(native.deflate_raw(data, level=l)) for l in (1, 6, 9)]
    assert sizes[2] <= sizes[0]  # L9 never worse than L1


def test_dictionary():
    text = (b"the quick brown fox jumps over the lazy dog; " * 3000)
    d, body = text[:20000], text[20000:]
    raw = native.deflate_raw(body, level=6, dictionary=d)
    o = zlib.decompressobj(wbits=-15, zdict=d)
    assert o.decompress(raw) + o.flush() == body
    assert len(raw) < len(native.deflate_raw(body, level=6))


@pytest.mark.parametrize("wbits", [9, 12, 15])
def test_window_clamp(wbits):
    data = _corpus(120000, seed=wbits)
    raw = native.deflate_raw(data, level=6, max_dist=1 << wbits)
    o = zlib.decompressobj(wbits=-wbits)
    assert o.decompress(raw) + o.flush() == data


def test_nonfinal_stream_concatenates():
    a, b = _corpus(50000, 1), _corpus(50000, 2)
    raw = native.deflate_raw(a, level=6, final=False) + native.deflate_raw(
        b, level=6, final=True, dictionary=a
    )
    assert zlib.decompress(raw, wbits=-15) == a + b


def test_api_engine_native_all_formats():
    data = _corpus(80000, seed=9)
    for fmt, wb in (("zlib", 15), ("gzip", 31), ("raw", -15)):
        out = zf.compress(data, level=6, format=fmt, engine="native")
        assert zlib.decompress(out, wbits=wb) == data
        assert zf.decompress(out, format=fmt) == data
    # dictionary through the zlib container (FDICT/DICTID)
    d = data[:4000]
    out = zf.compress(data, level=6, format="zlib", dictionary=d,
                      engine="native")
    o = zlib.decompressobj(zdict=d)
    assert o.decompress(out) + o.flush() == data
    # our own inflate handles it too
    assert zf.decompress(out, format="zlib", dictionary=d) == data


def test_api_engine_native_rejects_device_only_features():
    with pytest.raises(ValueError):
        zf.compress(b"x", format="gzip", indexed=True, engine="native")
    with pytest.raises(ValueError):
        zf.compress(b"x", engine="bogus")


def test_native_strategies():
    """zlib.h:196-200 strategies on the native engine: every output
    zlib-decodes; each strategy's structural promise holds."""
    data = _corpus(80000, seed=21) + b"run" + b"\x00" * 5000 + b"end"
    base = native.deflate_raw(data, level=6)
    # FILTERED (1): matches only at len >= 5; still valid, usually larger
    filt = native.deflate_raw(data, level=6, strategy=1)
    assert zlib.decompress(filt, wbits=-15) == data
    # HUFFMAN_ONLY (2): no matches at all
    huff = native.deflate_raw(data, level=6, strategy=2)
    assert zlib.decompress(huff, wbits=-15) == data
    assert len(huff) >= len(base)
    # RLE (3): distance-1 runs only — the zero run still compresses
    rle = native.deflate_raw(data, level=6, strategy=3)
    assert zlib.decompress(rle, wbits=-15) == data
    assert len(rle) < len(huff)  # the 5000-zero run collapses
    # FIXED (4): no dynamic blocks — re-inflate and check BTYPE != 2
    fixed = native.deflate_raw(data, level=6, strategy=4)
    assert zlib.decompress(fixed, wbits=-15) == data
    bitpos = 0
    while True:
        byte = fixed[bitpos // 8]
        bfinal = (byte >> (bitpos % 8)) & 1
        btype = (byte >> ((bitpos % 8) + 1)) & 3 if bitpos % 8 <= 5 else (
            ((fixed[bitpos // 8 + 1] << 8 | byte) >> ((bitpos % 8) + 1)) & 3
        )
        assert btype != 2, "Z_FIXED emitted a dynamic block"
        break  # checking the first block suffices for the gate
    # through the public API
    for s in (1, 2, 3, 4):
        out = zf.compress(data, level=6, format="zlib", strategy=s,
                          engine="native")
        assert zlib.decompress(out) == data


def test_api_engine_native_level0_and_bound():
    for n in (0, 1, 70000):
        data = os.urandom(n)
        out = zf.compress(data, level=0, format="gzip", engine="native")
        assert zlib.decompress(out, wbits=31) == data
        out6 = zf.compress(data, level=6, format="gzip", engine="native")
        assert zlib.decompress(out6, wbits=31) == data
        assert len(out6) <= zf.compress_bound(n, "gzip")


def test_own_inflate_decodes_native_streams():
    # cross-engine: native encode -> every decode engine
    data = _corpus(60000, seed=11)
    out = zf.compress(data, level=7, format="gzip", engine="native")
    assert zf.decompress(out, format="gzip", engine="native") == data
    assert zf.decompress(out, format="gzip", engine="tpu") == data


def test_stream_compressor_native_engine():
    """stream.Compressor(engine='native'): true incremental host encode
    with window continuity across chunks and flush modes."""
    from zzflate_tpu import stream as zs

    c = zs.Compressor(level=6, format="zlib", chunk_bytes=8192,
                      engine="native")
    parts = [_corpus(20000, s) for s in range(4)]
    out = bytearray()
    for p in parts[:2]:
        out += c.compress(p)
    out += c.flush(zs.Z_SYNC_FLUSH)
    out += c.compress(parts[2])
    out += c.flush(zs.Z_FULL_FLUSH)  # window reset point
    out += c.compress(parts[3])
    out += c.flush(zs.Z_FINISH)
    assert zlib.decompress(bytes(out)) == b"".join(parts)

    # piecewise decode across the flush points too
    d = zlib.decompressobj()
    got = d.decompress(bytes(out))
    assert got == b"".join(parts)

    # gzip + set_params level re-tune mid-stream
    c = zs.Compressor(level=1, format="gzip", chunk_bytes=4096,
                      engine="native")
    out = c.compress(parts[0]) + c.set_params(level=9)
    out += c.compress(parts[1]) + c.flush(zs.Z_FINISH)
    assert zlib.decompress(out, wbits=31) == parts[0] + parts[1]

    # strategies work on the streaming native engine too
    c = zs.Compressor(level=6, format="zlib", chunk_bytes=4096,
                      engine="native", strategy=3)
    out = c.compress(parts[0]) + c.flush(zs.Z_FINISH)
    assert zlib.decompress(out) == parts[0]
    with pytest.raises(ValueError):
        zs.Compressor(engine="nope")


def test_stream_native_matches_window_continuity():
    """Matches must reach across chunk boundaries through the window
    (the dictionary halo): a repeated payload smaller than two chunks
    must compress far below its raw size in the SECOND chunk."""
    from zzflate_tpu import stream as zs

    blob = _corpus(6144, 42)
    c = zs.Compressor(level=6, format="raw", chunk_bytes=6144,
                      engine="native")
    out = c.compress(blob + blob)  # second chunk = exact repeat
    out += c.flush(zs.Z_FINISH)
    assert zlib.decompress(out, wbits=-15) == blob + blob
    assert len(out) < len(zlib.compress(blob, 6)) + 600


def test_native_fuzz_property():
    """Property fuzz: random structured inputs x levels x strategies all
    round-trip through the zlib oracle (and through our own inflate)."""
    from zzflate_tpu.models import inflate as own

    rng = np.random.default_rng(123)
    for trial in range(60):
        kind = trial % 4
        n = int(rng.integers(0, 50000))
        if kind == 0:
            data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        elif kind == 1:
            words = [b"alpha", b"beta", b"gam", b"\x00\x00", b"delta-"]
            data = b"".join(
                words[i] for i in rng.integers(0, len(words), size=n // 4)
            )[:n]
        elif kind == 2:
            data = bytes(rng.integers(0, 4, size=n, dtype=np.uint8))
        else:
            piece = rng.integers(0, 256, size=97, dtype=np.uint8).tobytes()
            data = (piece * (n // 97 + 1))[:n]
        level = int(rng.integers(1, 10))
        strategy = int(rng.integers(0, 5))
        raw = native.deflate_raw(data, level=level, strategy=strategy)
        assert zlib.decompress(raw, wbits=-15) == data, (
            trial, n, level, strategy
        )
    # and our own native inflate decodes our native deflate
    data = _corpus(30000, 77)
    raw = native.deflate_raw(data, level=6)
    out, _ = native.inflate_raw(raw)
    assert out == data


def test_native_all_distance_codes_roundtrip():
    """Matches at every distance-code boundary (DBASE[c], DBASE[c]-1,
    DBASE[c]+1 for all 30 codes) round-trip — exercises the encoder's
    dist->code table across its full range (RFC 1951 A.3)."""
    from zzflate_tpu import constants as C

    rng = np.random.default_rng(5)
    pattern = rng.integers(0, 256, size=16, dtype=np.uint8).tobytes()
    for base in C.DIST_BASE:
        for d in (int(base) - 1, int(base), int(base) + 1):
            if d < 1 or d > 32768:
                continue
            # noise gap of (d - 16) bytes, then repeat => match at dist d
            gap = rng.integers(0, 256, size=max(0, d - 16),
                               dtype=np.uint8).tobytes()
            data = pattern + gap + pattern
            raw = native.deflate_raw(data, level=9)
            assert zlib.decompress(raw, wbits=-15) == data, d


def test_native_mt_stitching_roundtrip():
    """Chunk-parallel native encode joins halo-dictionary chunks into
    one valid stream (same sync-flush contract as the device gather)."""
    rng = np.random.default_rng(11)
    text = open("/usr/include/zlib.h", "rb").read()
    data = (text * 40)[: 3 << 20] + rng.integers(
        0, 256, 1 << 20, dtype=np.uint8
    ).tobytes()
    for threads in (2, 4):
        raw = native.deflate_raw_mt(
            data, level=6, chunk_bytes=1 << 20, threads=threads
        )
        assert zlib.decompress(raw, wbits=-15) == data
    one = native.deflate_raw(data, level=6)
    assert len(raw) < len(one) * 1.005  # halo keeps the chunking cost tiny
    # engine="native" one-shot API rides the same path with containers
    import zzflate_tpu as zf

    out = zf.compress(data, level=6, format="gzip", engine="native")
    assert zlib.decompress(out, wbits=31) == data


def test_mt_output_machine_independent():
    """deflate_raw_mt bytes depend only on (data, parameters): the chunk
    layout never varies with thread count / core count (round-3 advisor
    finding)."""
    text = open("/usr/include/zlib.h", "rb").read()
    data = (text * 20)[: 2 << 20]
    outs = {
        native.deflate_raw_mt(
            data, level=6, chunk_bytes=1 << 20, threads=t
        )
        for t in (1, 2, 4)
    }
    assert len(outs) == 1  # identical bytes at every worker count
    assert zlib.decompress(outs.pop(), wbits=-15) == data
