"""Public one-shot API: compress / decompress (SURVEY.md L6).

Shape of the API follows the whole-buffer model (libdeflate.h:71-137 is the
contract template; zlib.h:1229 compress2 the classic one): bytes in, bytes
out, with level/format/dictionary options. The streaming API lives in
zzflate_tpu.stream; the multi-device pipeline in zzflate_tpu.parallel.
"""
from __future__ import annotations

import zlib as _zlib

import numpy as np

from zzflate_tpu import config as cfg_mod
from zzflate_tpu.config import CodecConfig
from zzflate_tpu.models import deflate_encoder, inflate
from zzflate_tpu.utils import containers

_WINDOW = 32768


def compress_bound(n: int, format: str = "zlib") -> int:
    """Worst-case compressed size (stored fallback bound), zlib.h:760 shape."""
    overhead = {"raw": 0, "zlib": 2 + 4 + 4, "gzip": 10 + 8}[format]
    return n + 5 * (n // 65535 + 1) + 2 + overhead


def _encode_segments(
    data: bytes,
    config: CodecConfig,
    dictionary: bytes | None,
) -> list[bytes]:
    """Deflate payload as byte-aligned per-chunk segments (sync-flush framed).

    Every chunk after the first uses the previous chunk's 32 KiB tail as its
    halo dictionary (SURVEY.md section 5.7 sequence-parallel scheme).
    """
    import jax.numpy as jnp

    chunk_bytes = config.chunk_bytes
    n = len(data)
    nchunks = max(1, -(-n // chunk_bytes))
    out_words = deflate_encoder.output_words_bound(chunk_bytes)
    params = config.params
    huffman_only = config.strategy == cfg_mod.STRATEGY_HUFFMAN_ONLY
    fixed_only = config.strategy == cfg_mod.STRATEGY_FIXED

    segments: list[bytes] = []
    arr = np.zeros(_WINDOW + chunk_bytes, dtype=np.uint8)
    for i in range(nchunks):
        chunk = data[i * chunk_bytes : (i + 1) * chunk_bytes]
        if i == 0:
            prefix = (dictionary or b"")[-_WINDOW:]
        else:
            prefix = data[max(0, i * chunk_bytes - _WINDOW) : i * chunk_bytes]
        arr[:] = 0
        if prefix:
            arr[_WINDOW - len(prefix) : _WINDOW] = np.frombuffer(prefix, np.uint8)
        if chunk:
            arr[_WINDOW : _WINDOW + len(chunk)] = np.frombuffer(chunk, np.uint8)
        final = i == nchunks - 1
        res = deflate_encoder.encode_chunk(
            jnp.asarray(arr),
            jnp.int32(_WINDOW),
            jnp.int32(_WINDOW + len(chunk)),
            jnp.int32(_WINDOW - len(prefix)),
            jnp.int32(1 if final else 0),
            params,
            out_words,
            huffman_only=huffman_only,
            fixed_only=fixed_only,
        )
        nbits = int(res["nbits"])
        words = np.asarray(res["words"], dtype="<u4")
        if final:
            seg = words.tobytes()[: (nbits + 7) // 8]
        else:
            # +3 zero bits open the sync-flush empty stored block; its
            # alignment padding is zeros too (buffer is zero-initialized).
            seg = (
                words.tobytes()[: (nbits + 3 + 7) // 8]
                + containers.SYNC_FLUSH_MARKER
            )
        stored = containers.stored_segment(chunk, final=final)
        if len(stored) < len(seg):
            seg = stored
        segments.append(seg)
    return segments


def compress(
    data: bytes,
    level: int = 6,
    format: str = "zlib",
    dictionary: bytes | None = None,
    chunk_bytes: int = cfg_mod.DEFAULT_CHUNK_BYTES,
    strategy: int = cfg_mod.STRATEGY_DEFAULT,
) -> bytes:
    """One-shot compress to a zlib/gzip/raw stream (decodable by zlib)."""
    data = bytes(data)
    config = CodecConfig(
        level=level, format=format, chunk_bytes=chunk_bytes, strategy=strategy
    )
    if dictionary is not None and format == "gzip":
        raise ValueError("gzip streams cannot carry a preset dictionary")

    if level == 0:
        payload = containers.stored_segment(data, final=True)
    else:
        payload = b"".join(_encode_segments(data, config, dictionary))

    if format == "raw":
        return payload
    if format == "zlib":
        dictid = _zlib.adler32(dictionary) if dictionary is not None else None
        return (
            containers.zlib_header(level, dictid)
            + payload
            + containers.zlib_trailer(_zlib.adler32(data))
        )
    return (
        containers.gzip_header()
        + payload
        + containers.gzip_trailer(_zlib.crc32(data), len(data))
    )


def decompress(
    data: bytes, format: str = "zlib", dictionary: bytes | None = None
) -> bytes:
    """One-shot decompress (our own inflate; checksum-verified)."""
    return inflate.decompress(bytes(data), format=format, dictionary=dictionary)
