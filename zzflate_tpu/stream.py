"""Streaming compress/decompress with zlib-style flush modes (SURVEY.md C18).

Mirrors the deflate(strm, flush) contract (zlib.h:250):
- Z_NO_FLUSH buffers input and emits whole chunks as they fill;
- Z_SYNC_FLUSH closes the current block and byte-aligns with an empty
  stored block (00 00 FF FF after alignment);
- Z_FULL_FLUSH additionally resets the window so decoding can restart;
- Z_FINISH closes the stream (BFINAL block + container trailer).

Every internal chunk boundary is sync-flush framed, which is exactly what
makes the multi-chip ordered-gather stitching legal (SURVEY.md section 3.2).
"""
from __future__ import annotations

import zlib as _zlib

from zzflate_tpu import config as cfg_mod
from zzflate_tpu.api import _encode_segments
from zzflate_tpu.config import CodecConfig
from zzflate_tpu.models import inflate
from zzflate_tpu.utils import containers

Z_NO_FLUSH = 0
Z_SYNC_FLUSH = 2
Z_FULL_FLUSH = 3
Z_FINISH = 4


class Compressor:
    """Incremental deflate encoder producing zlib/gzip/raw output."""

    def __init__(
        self,
        level: int = 6,
        format: str = "zlib",
        dictionary: bytes | None = None,
        chunk_bytes: int = cfg_mod.DEFAULT_CHUNK_BYTES,
        strategy: int = cfg_mod.STRATEGY_DEFAULT,
    ):
        self.config = CodecConfig(
            level=level, format=format, chunk_bytes=chunk_bytes, strategy=strategy
        )
        if dictionary is not None and format == "gzip":
            raise ValueError("gzip streams cannot carry a preset dictionary")
        self._dictionary = dictionary
        self._window: bytes = (dictionary or b"")[-32768:]
        self._buf = bytearray()
        self._header_sent = False
        self._finished = False
        self._isize = 0
        self._adler = _zlib.adler32(b"")
        self._crc = _zlib.crc32(b"")

    # -- internals ---------------------------------------------------------

    def _header(self) -> bytes:
        fmt = self.config.format
        if fmt == "raw":
            return b""
        if fmt == "zlib":
            dictid = (
                _zlib.adler32(self._dictionary)
                if self._dictionary is not None
                else None
            )
            return containers.zlib_header(self.config.level, dictid)
        return containers.gzip_header()

    def _encode(self, payload: bytes, final: bool) -> bytes:
        """Encode `payload` as sync-flush-framed segments using the current
        window as halo; updates the window."""
        if self.config.level == 0:
            segs = containers.stored_segment(payload, final=final)
            if not final:
                segs += b""  # stored blocks are already byte-aligned
            out = segs
        else:
            out = b"".join(
                _encode_segments(
                    payload,
                    self.config,
                    self._window or None,
                    stream_final=final,
                )["segments"]
            )
        self._window = (self._window + payload)[-32768:]
        return out

    # -- public API ---------------------------------------------------------

    def compress(self, data: bytes) -> bytes:
        if self._finished:
            raise ValueError("stream already finished")
        data = bytes(data)
        self._isize += len(data)
        self._adler = _zlib.adler32(data, self._adler)
        self._crc = _zlib.crc32(data, self._crc)
        self._buf += data
        out = bytearray()
        if not self._header_sent:
            out += self._header()
            self._header_sent = True
        cb = self.config.chunk_bytes
        while len(self._buf) >= cb:
            chunk = bytes(self._buf[:cb])
            del self._buf[:cb]
            seg = self._encode(chunk, final=False)
            # _encode_segments ends the last block unframed when final=False?
            # No: final=False framing (sync flush) is handled inside; the
            # non-final path always sync-flush frames every chunk.
            out += seg
        return bytes(out)

    def set_params(
        self, level: int | None = None, strategy: int | None = None
    ) -> bytes:
        """Re-tune compression mid-stream (the deflateParams contract,
        zlib.h:705): pending input is flushed with the OLD parameters at a
        sync-flush point, then later input uses the new ones."""
        out = self.flush(Z_SYNC_FLUSH)
        self.config = CodecConfig(
            level=self.config.level if level is None else level,
            format=self.config.format,
            chunk_bytes=self.config.chunk_bytes,
            strategy=self.config.strategy if strategy is None else strategy,
        )
        return out

    def flush(self, mode: int = Z_SYNC_FLUSH) -> bytes:
        if self._finished:
            raise ValueError("stream already finished")
        out = bytearray()
        if not self._header_sent:
            out += self._header()
            self._header_sent = True
        pending = bytes(self._buf)
        self._buf.clear()
        if mode == Z_FINISH:
            out += self._encode(pending, final=True)
            fmt = self.config.format
            if fmt == "zlib":
                out += containers.zlib_trailer(self._adler)
            elif fmt == "gzip":
                out += containers.gzip_trailer(self._crc, self._isize)
            self._finished = True
        elif mode in (Z_SYNC_FLUSH, Z_FULL_FLUSH):
            out += self._encode(pending, final=False)
            if mode == Z_FULL_FLUSH:
                self._window = b""  # decode may restart here
        elif mode == Z_NO_FLUSH:
            self._buf += pending
        else:
            raise ValueError(f"unknown flush mode {mode}")
        return bytes(out)


class Decompressor:
    """Incremental inflate wrapper.

    v0 semantics: input may arrive in arbitrary pieces; decoded output is
    produced as soon as the underlying stream is complete (flush()/eof).
    """

    def __init__(self, format: str = "zlib", dictionary: bytes | None = None):
        self.format = format
        self.dictionary = dictionary
        self._buf = bytearray()
        self.eof = False

    def decompress(self, data: bytes) -> bytes:
        self._buf += data
        try:
            out = inflate.decompress(
                bytes(self._buf), format=self.format, dictionary=self.dictionary
            )
        except (ValueError, IndexError, KeyError):
            return b""  # incomplete input; wait for more
        self.eof = True
        return out

    def flush(self) -> bytes:
        if not self.eof and self._buf:
            return self.decompress(b"")
        return b""
