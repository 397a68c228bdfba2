"""Drop-in facade matching the stdlib `gzip` module surface (SURVEY.md L6).

`import zzflate_tpu.gzip_compat as gzip` keeps gzip-module code working
with this codec underneath: `compress`/`decompress` one-shots, `open`,
and a file-object `GzipFile` (read + write modes) built on the streaming
engine (stream.Compressor / stream.Decompressor). Multi-member streams
decode across members per RFC 1952, matching stdlib behavior.

engine="native" (default here) runs the host C encoder — file-sized
writes are the latency-sensitive serving case; pass engine="tpu" for the
device pipeline on large archives.
"""
from __future__ import annotations

import builtins
import io
import os

from zzflate_tpu import stream as _stream

__all__ = [
    "BadGzipFile", "GzipFile", "open", "compress", "decompress",
]


class BadGzipFile(OSError):
    """Mirror of gzip.BadGzipFile."""


def _mtime_field(mtime) -> int:
    """stdlib contract: None -> current time, else the given seconds."""
    if mtime is None:
        import time

        return int(time.time())
    return int(mtime)


def compress(data, compresslevel: int = 9, *, mtime=None,
             engine: str = "native") -> bytes:
    c = _stream.Compressor(
        level=compresslevel, format="gzip", engine=engine,
        mtime=_mtime_field(mtime),
    )
    return c.compress(bytes(data)) + c.flush(_stream.Z_FINISH)


def decompress(data) -> bytes:
    d = _stream.Decompressor(format="gzip")
    try:
        out = d.decompress(bytes(data))
        out += d.flush()
    except ValueError as e:
        raise BadGzipFile(str(e)) from e
    if not d.eof:
        raise BadGzipFile("compressed stream ended prematurely")
    return out


class GzipFile(io.RawIOBase):
    """File object over a gzip stream (subset of gzip.GzipFile).

    Supports 'rb' (incremental decode via stream.Decompressor) and
    'wb'/'ab'/'xb' (incremental encode via stream.Compressor).
    """

    def __init__(self, filename=None, mode: str | None = None,
                 compresslevel: int = 9, fileobj=None, mtime=None,
                 engine: str = "native"):
        mode = mode or "rb"
        if "t" in mode or "U" in mode:
            raise ValueError(f"Invalid mode: {mode!r}")
        if "b" not in mode:
            mode += "b"
        self._own_fp = fileobj is None
        if fileobj is None:
            if filename is None:
                raise ValueError("either filename or fileobj required")
            fileobj = builtins.open(filename, mode)
        self._fp = fileobj
        self.name = filename or getattr(fileobj, "name", "")
        self._reading = "r" in mode
        self._closed = False
        if self._reading:
            self._dec = _stream.Decompressor(format="gzip")
            self._pending = bytearray()
            self._eof = False
            self._any_input = False
        else:
            self._comp = _stream.Compressor(
                level=compresslevel, format="gzip", engine=engine,
                mtime=_mtime_field(mtime),
            )

    # -- write side ---------------------------------------------------------

    def write(self, data) -> int:
        if self._reading:
            raise OSError("write() on read-only GzipFile")
        if self._closed:
            raise ValueError("I/O operation on closed file")
        self._fp.write(self._comp.compress(bytes(data)))
        return len(data)

    def flush(self) -> None:
        if not self._reading and not self._closed:
            self._fp.write(self._comp.flush(_stream.Z_SYNC_FLUSH))
            self._fp.flush()

    # -- read side ----------------------------------------------------------

    def _fill(self, want: int) -> None:
        while not self._eof and len(self._pending) < want:
            raw = self._fp.read(65536)
            try:
                if raw:
                    self._any_input = True
                    self._pending += self._dec.decompress(raw)
                else:
                    if not self._any_input:
                        # A zero-byte file is EOF before any member —
                        # normal end-of-stream (stdlib returns b''),
                        # not a truncated stream.
                        self._eof = True
                        break
                    self._pending += self._dec.flush()
                    if not self._dec.eof:
                        raise BadGzipFile(
                            "compressed stream ended prematurely"
                        )
                    self._eof = True
            except ValueError as e:
                raise BadGzipFile(str(e)) from e

    def read(self, size: int = -1) -> bytes:
        if not self._reading:
            raise OSError("read() on write-only GzipFile")
        if size is None or size < 0:
            self._fill(1 << 62)
            out = bytes(self._pending)
            self._pending.clear()
            return out
        self._fill(size)
        out = bytes(self._pending[:size])
        del self._pending[:size]
        return out

    def readable(self) -> bool:
        return self._reading

    def writable(self) -> bool:
        return not self._reading

    def close(self) -> None:
        if self._closed:
            return
        try:
            if not self._reading:
                self._fp.write(self._comp.flush(_stream.Z_FINISH))
        finally:
            self._closed = True
            if self._own_fp:
                self._fp.close()
        super().close()


def open(filename, mode: str = "rb", compresslevel: int = 9,
         encoding=None, errors=None, newline=None, engine: str = "native"):
    """gzip.open subset: binary modes return a GzipFile; text modes wrap
    it in a TextIOWrapper (stdlib contract)."""
    if "t" in mode:
        binary = GzipFile(
            filename, mode.replace("t", "b"), compresslevel, engine=engine
        )
        return io.TextIOWrapper(binary, encoding, errors, newline)
    if encoding or errors or newline:
        raise ValueError("encoding args invalid for binary mode")
    return GzipFile(filename, mode, compresslevel, engine=engine)
