"""gzip_compat must interoperate with stdlib gzip in both directions."""
import gzip as std_gzip
import io
import os

import numpy as np
import pytest

import zzflate_tpu.gzip_compat as gz


def test_oneshot_roundtrip_and_interop():
    data = b"the quick brown fox " * 4000
    blob = gz.compress(data, 6)
    assert std_gzip.decompress(blob) == data          # stdlib decodes ours
    assert gz.decompress(std_gzip.compress(data, 6)) == data  # we decode stdlib
    assert gz.decompress(blob) == data


def test_gzipfile_write_then_stdlib_read(tmp_path):
    p = tmp_path / "x.gz"
    data = bytes(np.random.default_rng(0).integers(0, 256, 300000,
                                                   dtype=np.uint8))
    with gz.open(p, "wb", compresslevel=6) as f:
        for i in range(0, len(data), 70001):
            f.write(data[i : i + 70001])
    with std_gzip.open(p, "rb") as f:
        assert f.read() == data


def test_gzipfile_read_stdlib_stream(tmp_path):
    p = tmp_path / "y.gz"
    data = open("/usr/include/zlib.h", "rb").read()
    with std_gzip.open(p, "wb") as f:
        f.write(data)
    with gz.open(p, "rb") as f:
        got = bytearray()
        while True:
            piece = f.read(12345)
            if not piece:
                break
            got += piece
    assert bytes(got) == data


def test_multimember_and_text_mode(tmp_path):
    p = tmp_path / "m.gz"
    with open(p, "wb") as f:
        f.write(std_gzip.compress(b"hello ") + std_gzip.compress(b"world"))
    with gz.open(p, "rb") as f:
        assert f.read() == b"hello world"
    q = tmp_path / "t.gz"
    with gz.open(q, "wt", encoding="utf-8") as f:
        f.write("line one\nline two\n")
    with std_gzip.open(q, "rt", encoding="utf-8") as f:
        assert f.read() == "line one\nline two\n"


def test_truncated_raises_badgzipfile():
    blob = gz.compress(b"payload " * 1000)
    with pytest.raises(gz.BadGzipFile):
        gz.decompress(blob[: len(blob) - 5])
    with pytest.raises(gz.BadGzipFile):
        gz.decompress(b"\x1f\x8bnot really a gzip stream at all....")


def test_mtime_written_and_stdlib_matches():
    import struct
    import time as _time

    # Explicit mtime lands in the header MTIME field (RFC 1952), like
    # stdlib gzip.compress(..., mtime=N).
    b = gz.compress(b"payload" * 50, mtime=1234567890)
    assert struct.unpack("<I", b[4:8])[0] == 1234567890
    assert std_gzip.decompress(b) == b"payload" * 50
    # mtime=None means "now" (stdlib contract).
    t0 = int(_time.time())
    b2 = gz.compress(b"x", mtime=None)
    assert t0 <= struct.unpack("<I", b2[4:8])[0] <= t0 + 5
    # Default module-level API stays reproducible (mtime in api.compress
    # is 0) — only the gzip facade mirrors stdlib's timestamping.


def test_empty_file_reads_empty():
    # EOF before any member is normal end-of-stream (stdlib returns
    # b''), not a truncated stream.
    f = io.BytesIO(b"")
    with gz.GzipFile(fileobj=f, mode="rb") as g:
        assert g.read() == b""
