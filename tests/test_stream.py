"""Streaming API tests: flush-mode semantics per the deflate(strm, flush)
contract (SURVEY.md C18)."""
import zlib

import zzflate_tpu.stream as zs

CHUNK = 4096


def test_incremental_roundtrip():
    c = zs.Compressor(level=6, format="zlib", chunk_bytes=CHUNK)
    pieces = [b"hello world " * 300, b"more data " * 500, b"tail"]
    blob = b"".join(c.compress(p) for p in pieces) + c.flush(zs.Z_FINISH)
    assert zlib.decompress(blob) == b"".join(pieces)


def test_sync_flush_yields_decodable_prefix():
    c = zs.Compressor(level=6, format="zlib", chunk_bytes=CHUNK)
    part1 = b"first part " * 200
    out = c.compress(part1) + c.flush(zs.Z_SYNC_FLUSH)
    # After a sync flush the emitted bytes decode to everything written.
    d = zlib.decompressobj()
    assert d.decompress(out) == part1
    part2 = b"second part " * 200
    out2 = c.compress(part2) + c.flush(zs.Z_FINISH)
    assert d.decompress(out2) == part2


def test_full_flush_resets_window():
    c = zs.Compressor(level=6, format="raw", chunk_bytes=CHUNK)
    a = b"abcdefgh" * 100
    blob_a = c.compress(a) + c.flush(zs.Z_FULL_FLUSH)
    blob_b = c.compress(a) + c.flush(zs.Z_FINISH)
    # Decoding may restart at the full-flush point with no history.
    d = zlib.decompressobj(wbits=-15)
    tail = d.decompress(blob_b)
    assert tail == a
    full = zlib.decompressobj(wbits=-15)
    assert full.decompress(blob_a + blob_b) == a + a


def test_gzip_stream():
    c = zs.Compressor(level=6, format="gzip", chunk_bytes=CHUNK)
    data = b"gzip streaming test " * 400
    blob = c.compress(data) + c.flush(zs.Z_FINISH)
    assert zlib.decompress(blob, wbits=31) == data


def test_stream_with_dictionary():
    dictionary = b"shared context " * 100
    c = zs.Compressor(
        level=6, format="zlib", dictionary=dictionary, chunk_bytes=CHUNK
    )
    data = b"shared context plus payload " * 100
    blob = c.compress(data) + c.flush(zs.Z_FINISH)
    d = zlib.decompressobj(zdict=dictionary)
    assert d.decompress(blob) == data


def test_decompressor_incremental():
    data = b"incremental inflate " * 500
    blob = zlib.compress(data, 6)
    d = zs.Decompressor()
    out = b""
    for i in range(0, len(blob), 97):
        out += d.decompress(blob[i : i + 97])
    out += d.flush()
    assert out == data


def test_finish_twice_raises():
    import pytest

    c = zs.Compressor(level=1, format="raw", chunk_bytes=CHUNK)
    c.flush(zs.Z_FINISH)
    with pytest.raises(ValueError):
        c.compress(b"x")


def test_decompressor_truncated_inside_trailer():
    # Input split a few bytes before the end lands mid-trailer; the
    # decompressor must buffer (not crash with struct.error), and eof
    # only flips once the trailer verified.
    import zzflate_tpu as zf

    data = b"trailer straddling feed " * 400
    for fmt in ("zlib", "gzip"):
        blob = zf.compress(data, level=6, format=fmt)
        for cut in (1, 2, 3, 5):
            d = zs.Decompressor(format=fmt)
            out = d.decompress(blob[:-cut])
            assert not d.eof
            out += d.decompress(blob[-cut:])
            assert out == data
            assert d.eof


def test_decompressor_incremental_partial_output():
    # Output must appear BEFORE the stream completes (block-granular
    # incremental decode), in O(n) total across calls.
    # Barely-compressible data so zlib emits many small blocks (its
    # symbol buffer fills every ~16K tokens) — block boundaries are what
    # incremental decode emits at.
    import numpy as np

    rng = np.random.default_rng(7)
    data = rng.integers(32, 127, size=400_000, dtype=np.uint8).tobytes()
    blob = zlib.compress(data, 6)
    d = zs.Decompressor()
    piece = 4096
    got = []
    early_output = False
    for i in range(0, len(blob), piece):
        out = d.decompress(blob[i : i + piece])
        got.append(out)
        if out and i + piece < len(blob):
            early_output = True
    assert b"".join(got) + d.flush() == data
    assert early_output, "no output before the final piece"
    assert d.eof


def test_decompressor_corruption_raises_at_bad_block():
    import pytest

    data = b"corruption detected early " * 2000
    blob = bytearray(zlib.compress(data, 6))
    blob[2] |= 0x06  # force BTYPE=3 in the first block header
    d = zs.Decompressor()
    with pytest.raises(ValueError):
        # Error must surface on the FIRST piece containing the bad block,
        # not at end-of-stream.
        d.decompress(bytes(blob[:256]))


def test_decompressor_unused_data():
    data = b"stream then trailing garbage " * 100
    blob = zlib.compress(data, 6) + b"TRAILING-GARBAGE"
    d = zs.Decompressor()
    out = d.decompress(blob)
    assert out == data
    assert d.eof
    assert d.unused_data == b"TRAILING-GARBAGE"


def test_decompressor_gzip_multimember_incremental():
    a = b"member one " * 500
    b = b"member two " * 300
    blob = zlib.compress(a, 6, wbits=31) + zlib.compress(b, 6, wbits=31)
    d = zs.Decompressor(format="gzip")
    out = bytearray()
    for i in range(0, len(blob), 37):
        out += d.decompress(blob[i : i + 37])
    out += d.flush()
    assert bytes(out) == a + b
    assert d.eof


def test_decompressor_max_length():
    data = b"max-length windowed reads " * 500
    blob = zlib.compress(data, 6)
    d = zs.Decompressor()
    out = bytearray()
    chunk = d.decompress(blob, max_length=100)
    assert len(chunk) == 100
    out += chunk
    while not (d.eof and len(out) == len(data)):
        chunk = d.decompress(b"", max_length=1000)
        assert len(chunk) <= 1000
        if not chunk:
            break
        out += chunk
    assert bytes(out) == data


def test_decompressor_zlib_preset_dictionary():
    dictionary = b"the quick brown fox jumps over the lazy dog " * 20
    data = b"the quick brown fox says hello to the lazy dog " * 50
    comp = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_DEFAULT_STRATEGY,
                            dictionary)
    blob = comp.compress(data) + comp.flush()
    d = zs.Decompressor(format="zlib", dictionary=dictionary)
    out = d.decompress(blob[:40]) + d.decompress(blob[40:]) + d.flush()
    assert out == data
    assert d.eof


def test_decompressor_linear_time_large_stream():
    # 10 MB stream in 64 KiB pieces: completed blocks never re-decode, so
    # this must run in seconds, not minutes (the quadratic-retry trap).
    import time

    data = (b"linear time guarantee %08d " % 12345) * 350000  # ~10.1 MB
    blob = zlib.compress(data, 6)
    d = zs.Decompressor()
    out = bytearray()
    t0 = time.perf_counter()
    for i in range(0, len(blob), 65536):
        out += d.decompress(blob[i : i + 65536])
    out += d.flush()
    dt = time.perf_counter() - t0
    assert bytes(out) == data
    assert d.eof
    assert dt < 30.0, f"incremental decode took {dt:.1f}s — quadratic?"


def test_z_block_flush_stops_mid_byte_and_stream_stays_valid():
    # Z_BLOCK (zlib.h:170-173): emit up to the current block boundary with
    # no empty stored block and no byte alignment; later output joins at
    # bit granularity and the final stream zlib-decodes bit-exactly.
    # Whether a given payload's boundary lands mid-byte depends on the
    # exact encoder bit counts (any matcher tweak can shift it onto a
    # byte boundary), so sweep payload lengths and require the mid-byte
    # case to occur at least once — every variant must round-trip.
    p2 = b"and a second span arriving much later " * 150
    tails = []
    for extra in range(8):
        c = zs.Compressor(level=6, format="zlib", chunk_bytes=CHUNK)
        p1 = b"the first span of text, quite compressible " * 120
        p1 += b"#" * extra
        out = c.compress(p1) + c.flush(zs.Z_BLOCK)
        assert c._tail_n or out
        tails.append(c._tail_n)
        out += c.compress(p2) + c.flush(zs.Z_FINISH)
        assert zlib.decompress(out) == p1 + p2
    assert any(tails)  # the mid-byte state actually occurred


def test_z_block_then_sync_flush_realigns():
    c = zs.Compressor(level=6, format="zlib", chunk_bytes=CHUNK)
    p1 = b"alpha beta gamma delta " * 100
    out = c.compress(p1) + c.flush(zs.Z_BLOCK)
    out += c.flush(zs.Z_SYNC_FLUSH)  # realigns with an empty stored block
    assert c._tail_n == 0
    d = zlib.decompressobj()
    assert d.decompress(out) == p1
    p2 = b"epsilon zeta " * 90
    out2 = c.compress(p2) + c.flush(zs.Z_FINISH)
    assert d.decompress(out2) == p2


def test_z_block_repeated_and_chunk_crossing():
    # Multiple Z_BLOCK epochs, including a full chunk arriving mid-byte
    # (exercises the raw re-encode + realign path in compress()).
    c = zs.Compressor(level=6, format="gzip", chunk_bytes=CHUNK)
    parts = [
        b"x" * 100,
        b"piece two " * 700,          # > chunk_bytes while mid-byte
        b"three",
        b"four " * 1000,
    ]
    out = bytearray()
    for p in parts:
        out += c.compress(p)
        out += c.flush(zs.Z_BLOCK)
    out += c.flush(zs.Z_FINISH)
    import gzip as _gz

    assert _gz.decompress(bytes(out)) == b"".join(parts)


def test_z_block_level0_realigns_to_stored():
    c = zs.Compressor(level=0, format="zlib", chunk_bytes=CHUNK)
    p = b"stored bytes " * 50
    out = c.compress(p) + c.flush(zs.Z_BLOCK) + c.flush(zs.Z_FINISH)
    assert zlib.decompress(out) == p


def test_mem_level_roundtrip_and_validation():
    import pytest

    import zzflate_tpu as zf

    data = open("/usr/include/zlib.h", "rb").read()[:200000]
    for ml in (1, 8, 9):
        blob = zf.compress(data, level=6, mem_level=ml, chunk_bytes=65536)
        assert zlib.decompress(blob) == data
    c = zs.Compressor(level=6, mem_level=1, chunk_bytes=CHUNK)
    blob = c.compress(data[:20000]) + c.flush(zs.Z_FINISH)
    assert zlib.decompress(blob) == data[:20000]
    with pytest.raises(ValueError):
        zf.compress(b"x", mem_level=0)
    with pytest.raises(ValueError):
        zf.compress(b"x", mem_level=10)
