"""Resumable sharded compression (SURVEY.md section 5.3/5.4).

The reference's only checkpoint mechanism is the flush API (a full-flush
point is a restartable boundary). Here that concept is lifted to GB-scale
jobs: the input is split into shards, each shard compresses to an
independent sync-flush-framed segment file plus a manifest entry
(compressed size, adler/crc partials, length). A crashed or partially
failed run re-dispatches ONLY the missing shards (shards are independent,
so recovery is re-execution — SURVEY.md section 5.3), and assembly
concatenates segments in order, closes the stream, and merges checksum
partials into one valid zlib/gzip member without re-reading the input.
"""
from __future__ import annotations

import json
import os
import zlib as _zlib

from zzflate_tpu import config as cfg_mod
from zzflate_tpu.api import _encode_segments
from zzflate_tpu.config import CodecConfig
from zzflate_tpu.utils import containers
from zzflate_tpu.native import adler32 as _nadler32, crc32 as _ncrc32

_MANIFEST = "manifest.json"


def _shard_path(outdir: str, i: int) -> str:
    return os.path.join(outdir, f"shard_{i:06d}.seg")


def compress_to_dir(
    data: bytes,
    outdir: str,
    shard_bytes: int = 16 << 20,
    level: int = 6,
    chunk_bytes: int = cfg_mod.DEFAULT_CHUNK_BYTES,
) -> dict:
    """Compress `data` into per-shard segment files + manifest (resumable).

    Shards already present on disk (and recorded in the manifest) are
    skipped, so re-running after a crash or a fault-injected loss only
    encodes what's missing. Returns the manifest dict.
    """
    os.makedirs(outdir, exist_ok=True)
    mpath = os.path.join(outdir, _MANIFEST)
    manifest = {
        "shard_bytes": shard_bytes,
        "chunk_bytes": chunk_bytes,
        "level": level,
        "total_len": len(data),
        "shards": {},
    }
    if os.path.exists(mpath):
        with open(mpath) as f:
            old = json.load(f)
        if (
            old.get("shard_bytes") == shard_bytes
            and old.get("total_len") == len(data)
            and old.get("level") == level
        ):
            manifest = old

    nshards = max(1, -(-len(data) // shard_bytes))
    config = CodecConfig(level=level, format="raw", chunk_bytes=chunk_bytes)
    for i in range(nshards):
        key = str(i)
        if key in manifest["shards"] and os.path.exists(_shard_path(outdir, i)):
            continue
        shard = data[i * shard_bytes : (i + 1) * shard_bytes]
        res = _encode_segments(
            shard, config, dictionary=None, stream_final=False
        )
        seg = b"".join(res["segments"])
        with open(_shard_path(outdir, i), "wb") as f:
            f.write(seg)
        manifest["shards"][key] = {
            "bytes": len(seg),
            "length": len(shard),
            "adler": _nadler32(shard),
            "crc": _ncrc32(shard),
        }
        with open(mpath, "w") as f:
            json.dump(manifest, f)
    return manifest


def missing_shards(outdir: str) -> list[int]:
    """Shard indices not yet present (for a driver's re-dispatch loop)."""
    mpath = os.path.join(outdir, _MANIFEST)
    if not os.path.exists(mpath):
        return []
    with open(mpath) as f:
        manifest = json.load(f)
    n = max(1, -(-manifest["total_len"] // manifest["shard_bytes"]))
    return [
        i
        for i in range(n)
        if str(i) not in manifest["shards"]
        or not os.path.exists(_shard_path(outdir, i))
    ]


def assemble(outdir: str, format: str = "gzip") -> bytes:
    """Concatenate shard segments into one valid zlib/gzip/raw stream."""
    with open(os.path.join(outdir, _MANIFEST)) as f:
        manifest = json.load(f)
    n = max(1, -(-manifest["total_len"] // manifest["shard_bytes"]))
    payload = bytearray()
    adler, crc, total = 1, 0, 0
    for i in range(n):
        meta = manifest["shards"][str(i)]
        with open(_shard_path(outdir, i), "rb") as f:
            payload += f.read()
        adler = containers.adler32_combine(adler, meta["adler"], meta["length"])
        crc = containers.crc32_combine(crc, meta["crc"], meta["length"])
        total += meta["length"]
    payload += containers.FINAL_EMPTY_FIXED_BLOCK
    if format == "raw":
        return bytes(payload)
    if format == "zlib":
        return (
            containers.zlib_header(manifest["level"])
            + bytes(payload)
            + containers.zlib_trailer(adler)
        )
    return (
        containers.gzip_header()
        + bytes(payload)
        + containers.gzip_trailer(crc, total)
    )
