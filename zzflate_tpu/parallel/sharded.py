"""Multi-device data-parallel encode over a jax.sharding.Mesh.

The reference-class codec is single-threaded C++ with no distribution
(SURVEY.md section 2.1); scaling here is pure SPMD data parallelism, which
is exactly what DEFLATE's 32 KiB window makes legal: window-aligned chunks
with a 32 KiB halo (previous chunk's tail as preset dictionary) compress
independently, and their sync-flush-framed segments concatenate into ONE
valid zlib/gzip member (SURVEY.md section 5.7, verified on CPU at survey
time).

Design:
- one 1-D mesh axis ("chunks"); the (B, 32K+chunk) batch is sharded on
  its leading axis with NamedSharding, so the single jitted
  encode_chunks_batch call IS the multi-chip step — XLA partitions it with
  zero cross-device communication in the hot path (chunks are independent).
- compressed sizes (nbits) and word buffers come back to the host with one
  device_get per round; the ordered ragged concatenation + container
  framing is O(bytes) host work on process 0.
- checksums use the tree-combine math in ops/checksums so each shard's
  Adler/CRC partial can be merged in order without re-touching the bytes.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zzflate_tpu import config as cfg_mod
from zzflate_tpu.config import CodecConfig
from zzflate_tpu.models import deflate_encoder
from zzflate_tpu.utils import containers

_WINDOW = 32768


def make_mesh(devices=None) -> Mesh:
    """1-D device mesh over the chunk (data-parallel) axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("chunks",))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def encode_chunks_mesh(
    buf: np.ndarray,
    starts: np.ndarray,
    valid_ends: np.ndarray,
    window_starts: np.ndarray,
    bfinals: np.ndarray,
    params,
    out_words: int,
    mesh: Mesh,
    huffman_only: bool = False,
    fixed_only: bool = False,
):
    """Run the batched encoder with the leading axis sharded over `mesh`.

    The batch is padded up to a multiple of the mesh size with empty rows
    (their outputs are ignored by the caller). Returns device arrays.
    """
    ndev = mesh.devices.size
    b = buf.shape[0]
    bp = _round_up(b, ndev)
    if bp != b:
        pad = bp - b
        buf = np.concatenate([buf, np.zeros((pad,) + buf.shape[1:], buf.dtype)])
        starts = np.concatenate([starts, np.full((pad,), _WINDOW, np.int32)])
        valid_ends = np.concatenate(
            [valid_ends, np.full((pad,), _WINDOW, np.int32)]
        )
        window_starts = np.concatenate(
            [window_starts, np.full((pad,), _WINDOW, np.int32)]
        )
        bfinals = np.concatenate([bfinals, np.zeros((pad,), np.int32)])

    row = NamedSharding(mesh, P("chunks"))
    args = [
        jax.device_put(jnp.asarray(a), row)
        for a in (buf, starts, valid_ends, window_starts, bfinals)
    ]
    return deflate_encoder.encode_chunks_batch(
        *args,
        params,
        out_words,
        huffman_only=huffman_only,
        fixed_only=fixed_only,
        with_checksums=True,
    )


def compress_sharded(
    data: bytes,
    level: int = 6,
    format: str = "zlib",
    mesh: Mesh | None = None,
    chunk_bytes: int = cfg_mod.DEFAULT_CHUNK_BYTES,
    dictionary: bytes | None = None,
) -> bytes:
    """One-shot distributed compress: all chunks in one sharded dispatch.

    Functionally identical to zzflate_tpu.compress; the difference is that
    the chunk batch is laid out across every device of `mesh` (default: all
    local devices) before the single jitted call.
    """
    from zzflate_tpu.api import _build_chunk_batch

    data = bytes(data)
    config = CodecConfig(level=level, format=format, chunk_bytes=chunk_bytes)
    if dictionary is not None and format == "gzip":
        raise ValueError("gzip streams cannot carry a preset dictionary")
    if mesh is None:
        mesh = make_mesh()

    import zlib as _zlib

    if level == 0:
        payload = containers.stored_segment(data, final=True)
    else:
        buf, valid_ends, window_starts, bfinals, nchunks = _build_chunk_batch(
            data, chunk_bytes, dictionary
        )
        starts = np.full((nchunks,), _WINDOW, dtype=np.int32)
        out_words = deflate_encoder.output_words_bound(chunk_bytes)
        res = encode_chunks_mesh(
            buf,
            starts,
            valid_ends,
            window_starts,
            bfinals,
            config.params,
            out_words,
            mesh,
        )
        words_np = np.asarray(res["words"], dtype="<u4")
        nbits_np = np.asarray(res["nbits"])
        adler_np = np.asarray(res["adler"])
        crc_np = np.asarray(res["crc"])
        segments = []
        for i in range(nchunks):
            nbits = int(nbits_np[i])
            final = i == nchunks - 1
            if final:
                seg = words_np[i].tobytes()[: (nbits + 7) // 8]
            else:
                seg = (
                    words_np[i].tobytes()[: (nbits + 3 + 7) // 8]
                    + containers.SYNC_FLUSH_MARKER
                )
            chunk = data[i * chunk_bytes : (i + 1) * chunk_bytes]
            stored = containers.stored_segment(chunk, final=final)
            if len(stored) < len(seg):
                seg = stored
            segments.append(seg)
        payload = b"".join(segments)
        stored_whole = containers.stored_segment(data, final=True)
        if len(stored_whole) < len(payload):
            payload = stored_whole

    # Stream checksums from the per-chunk device partials, merged in order
    # (no host pass over the input bytes).
    if level == 0:
        adler = _zlib.adler32(data)
        crc = _zlib.crc32(data)
    else:
        lens = [
            min(chunk_bytes, len(data) - i * chunk_bytes)
            for i in range(nchunks)
        ]
        adler = containers.combine_adler(
            [(int(adler_np[i]), lens[i]) for i in range(nchunks)]
        )
        crc = containers.combine_crc(
            [(int(crc_np[i]), lens[i]) for i in range(nchunks)]
        )

    if format == "raw":
        return payload
    if format == "zlib":
        dictid = _zlib.adler32(dictionary) if dictionary is not None else None
        return (
            containers.zlib_header(level, dictid)
            + payload
            + containers.zlib_trailer(adler)
        )
    return (
        containers.gzip_header()
        + payload
        + containers.gzip_trailer(crc, len(data))
    )
