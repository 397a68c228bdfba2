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
