"""Multi-device data-parallel encode over a jax.sharding.Mesh.

The reference-class codec is single-threaded C++ with no distribution
(SURVEY.md section 2.1); scaling here is pure SPMD data parallelism, which
is exactly what DEFLATE's 32 KiB window makes legal: window-aligned chunks
with a 32 KiB halo (previous chunk's tail as preset dictionary) compress
independently, and their sync-flush-framed segments concatenate into ONE
valid zlib/gzip member (SURVEY.md section 5.7, verified on CPU at survey
time).

Design:
- one 1-D mesh axis ("chunks"); each batch of the two-phase encode
  pipeline (api._encode_segments) is laid out across the mesh with
  NamedSharding, so the same jitted analyze/emit graphs ARE the multi-chip
  step — XLA partitions them with zero cross-device communication in the
  hot path (chunks are independent).
- per-chunk Adler/CRC partials are computed on device during the analyze
  phase and merged in order on the host with the closed-form combines
  (ops/checksums, SURVEY.md C3/C4) — container trailers never re-touch
  the input bytes.
- the ordered ragged concatenation + container framing is O(bytes) host
  work on process 0.
"""
from __future__ import annotations

import zlib as _zlib

import numpy as np

import jax
from jax.sharding import Mesh

from zzflate_tpu import config as cfg_mod
from zzflate_tpu.api import _encode_segments
from zzflate_tpu.config import CodecConfig
from zzflate_tpu.native import adler32 as _nadler32, crc32 as _ncrc32
from zzflate_tpu.utils import containers


def make_mesh(devices=None) -> Mesh:
    """1-D device mesh over the chunk (data-parallel) axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("chunks",))


def compress_sharded(
    data: bytes,
    level: int = 6,
    format: str = "zlib",
    mesh: Mesh | None = None,
    chunk_bytes: int = cfg_mod.DEFAULT_CHUNK_BYTES,
    dictionary: bytes | None = None,
    indexed: bool = False,
    seekable: bool = False,
    mem_level: int = 8,
) -> bytes:
    """One-shot distributed compress: chunk batches sharded over `mesh`.

    Functionally identical to zzflate_tpu.compress (same chunking => same
    bytes); the difference is the device layout and that stream checksums
    come from on-device per-chunk partials combined in order. seekable /
    mem_level mirror api.compress (window reset per chunk / per-dispatch
    device-memory budget).
    """
    data = bytes(data)
    config = CodecConfig(level=level, format=format, chunk_bytes=chunk_bytes,
                         mem_level=mem_level)
    if dictionary is not None and format == "gzip":
        raise ValueError("gzip streams cannot carry a preset dictionary")
    if indexed and format != "gzip":
        raise ValueError("indexed output requires format='gzip'")
    if seekable and not indexed:
        raise ValueError("seekable output requires indexed=True")
    if indexed and level == 0:
        raise ValueError("indexed output requires level >= 1")
    if mesh is None:
        mesh = make_mesh()

    nchunks = max(1, -(-len(data) // chunk_bytes))
    if level == 0:
        payload = containers.stored_segment(data, final=True)
        adler = _nadler32(data)
        crc = _ncrc32(data)
        segments = None
    else:
        res = _encode_segments(
            data, config, dictionary, mesh=mesh, with_checksums=True,
            with_anchors=indexed, halo=not seekable,
        )
        segments = res["segments"]
        payload = b"".join(segments)
        lens = [
            min(chunk_bytes, len(data) - i * chunk_bytes)
            for i in range(nchunks)
        ]
        adler = containers.combine_adler(
            list(zip(res["adler"], lens))
        )
        crc = containers.combine_crc(list(zip(res["crc"], lens)))
        if not indexed:
            stored_whole = containers.stored_segment(data, final=True)
            if len(stored_whole) < len(payload):
                payload = stored_whole
                segments = None

    if format == "raw":
        return payload
    if format == "zlib":
        dictid = _nadler32(dictionary) if dictionary is not None else None
        return (
            containers.zlib_header(level, dictid)
            + payload
            + containers.zlib_trailer(adler)
        )
    if indexed and segments is not None:
        hdr = containers.gzip_header_indexed(
            chunk_bytes,
            list(
                zip(
                    (len(s) for s in segments),
                    res["blocks"],
                    res["anchors"],
                )
            ),
            flags=containers.ZZ_FLAG_SEEKABLE if seekable else 0,
        )
    else:
        hdr = containers.gzip_header()
    return hdr + payload + containers.gzip_trailer(crc, len(data))
