"""The zlib_compat facade must be a drop-in for common stdlib zlib usage."""
import zlib

import pytest

import zzflate_tpu.zlib_compat as zc

DATA = open("/usr/include/zlib.h", "rb").read()[:150000]


def test_one_shot_matches_stdlib_contract():
    out = zc.compress(DATA, 6)
    assert zlib.decompress(out) == DATA           # stdlib decodes ours
    assert zc.decompress(zlib.compress(DATA, 6)) == DATA  # we decode stdlib


def test_wbits_variants():
    raw = zc.compress(DATA, 6, wbits=-15)
    assert zlib.decompress(raw, wbits=-15) == DATA
    gz = zc.compress(DATA, 6, wbits=31)
    assert zlib.decompress(gz, wbits=31) == DATA
    # auto-detect (+32) on decompress, both containers
    assert zc.decompress(gz, wbits=47) == DATA
    assert zc.decompress(zc.compress(DATA, 6), wbits=47) == DATA
    with pytest.raises(zc.error):
        zc.compress(b"x", 6, wbits=0)


def test_compressobj_stream_and_flush_modes():
    co = zc.compressobj(6)
    blob = co.compress(DATA[:60000])
    blob += co.flush(zc.Z_SYNC_FLUSH)
    blob += co.compress(DATA[60000:])
    blob += co.flush()
    assert zlib.decompress(blob) == DATA


def test_decompressobj_incremental_and_unused_data():
    blob = zlib.compress(DATA, 6) + b"TRAILING"
    do = zc.decompressobj()
    out = do.decompress(blob[:977])
    out += do.decompress(blob[977:])
    out += do.flush()
    assert out == DATA
    assert do.eof
    assert do.unused_data == b"TRAILING"


def test_zdict_both_directions():
    zdict = DATA[:4096]
    co = zc.compressobj(6, zc.DEFLATED, 15, 8, zc.Z_DEFAULT_STRATEGY, zdict)
    blob = co.compress(DATA[4096:30000]) + co.flush()
    ref = zlib.decompressobj(zdict=zdict)
    assert ref.decompress(blob) + ref.flush() == DATA[4096:30000]
    do = zc.decompressobj(zdict=zdict)
    stdblob_c = zlib.compressobj(6, zlib.DEFLATED, 15, 8,
                                 zlib.Z_DEFAULT_STRATEGY, zdict)
    stdblob = stdblob_c.compress(DATA[4096:30000]) + stdblob_c.flush()
    assert do.decompress(stdblob) + do.flush() == DATA[4096:30000]


def test_checksums_reexported():
    assert zc.crc32(b"abc") == zlib.crc32(b"abc")
    assert zc.adler32(b"abc") == zlib.adler32(b"abc")


def test_corrupt_raises_error():
    blob = bytearray(zc.compress(DATA[:20000], 6))
    blob[30] ^= 0xFF
    with pytest.raises(zc.error):
        zc.decompress(bytes(blob))


def test_compressobj_copy_diverges():
    """copy() clones the full deflate state (zlib.h:630 deflateCopy):
    the clone and the original can finish with different suffixes and
    both decode correctly."""
    a = zc.compressobj(level=6, engine="native")
    head = b"shared prefix " * 3000
    out0 = a.compress(head)
    b = a.copy()
    outa = out0 + a.compress(b"suffix-A" * 500) + a.flush()
    outb = out0 + b.compress(b"suffix-B" * 900) + b.flush()
    import zlib as _z
    assert _z.decompress(outa) == head + b"suffix-A" * 500
    assert _z.decompress(outb) == head + b"suffix-B" * 900


def test_decompressobj_copy_diverges():
    import zlib as _z
    data = bytes(range(256)) * 500
    blob = _z.compress(data, 6)
    d = zc.decompressobj()
    first = d.decompress(blob[: len(blob) // 2])
    d2 = d.copy()
    rest1 = d.decompress(blob[len(blob) // 2 :])
    rest2 = d2.decompress(blob[len(blob) // 2 :])
    assert first + rest1 == data
    assert first + rest2 == data
    assert d.eof and d2.eof
