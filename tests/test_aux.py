"""Auxiliary subsystems: multi-host pipeline (single-process degenerate),
resumable sharded compression, fault-injection recovery (SURVEY.md
section 5.3/5.4/5.8)."""
import os
import zlib

import numpy as np

from zzflate_tpu.parallel.multihost import compress_multihost
from zzflate_tpu.utils import resume

CHUNK = 4096


def _data(n=40000, seed=0):
    rng = np.random.default_rng(seed)
    text = (b"auxiliary subsystem test body " * 2000)[: n // 2]
    rnd = rng.integers(0, 256, size=n - len(text), dtype=np.uint8).tobytes()
    return text + rnd


def test_multihost_single_process_gzip():
    data = _data()
    out = compress_multihost(data, level=6, format="gzip", chunk_bytes=CHUNK)
    assert out is not None
    assert zlib.decompress(out, wbits=31) == data


def test_multihost_single_process_zlib():
    data = _data(seed=1)
    out = compress_multihost(data, level=6, format="zlib", chunk_bytes=CHUNK)
    assert zlib.decompress(out) == data


def test_resume_roundtrip(tmp_path):
    data = _data(n=100000, seed=2)
    outdir = str(tmp_path / "shards")
    m = resume.compress_to_dir(
        data, outdir, shard_bytes=32768, chunk_bytes=CHUNK
    )
    assert len(m["shards"]) == -(-len(data) // 32768)
    assert resume.missing_shards(outdir) == []
    blob = resume.assemble(outdir, format="gzip")
    assert zlib.decompress(blob, wbits=31) == data
    blob_z = resume.assemble(outdir, format="zlib")
    assert zlib.decompress(blob_z) == data


def test_resume_skips_existing_and_recovers_lost(tmp_path):
    data = _data(n=100000, seed=3)
    outdir = str(tmp_path / "shards")
    resume.compress_to_dir(data, outdir, shard_bytes=32768, chunk_bytes=CHUNK)

    # Fault injection: lose one shard's blob (SURVEY.md 5.3 — recovery is
    # re-dispatch of the failed shard only).
    lost = os.path.join(outdir, "shard_000001.seg")
    mtimes = {}
    for f in os.listdir(outdir):
        p = os.path.join(outdir, f)
        mtimes[f] = os.path.getmtime(p)
    os.remove(lost)
    # Manifest entry exists but the file is gone -> shard 1 re-encoded;
    # the others are skipped (mtimes unchanged).
    import json

    with open(os.path.join(outdir, "manifest.json")) as f:
        man = json.load(f)
    del man["shards"]["1"]
    with open(os.path.join(outdir, "manifest.json"), "w") as f:
        json.dump(man, f)
    assert resume.missing_shards(outdir) == [1]

    resume.compress_to_dir(data, outdir, shard_bytes=32768, chunk_bytes=CHUNK)
    assert resume.missing_shards(outdir) == []
    for f, t in mtimes.items():
        if f not in ("shard_000001.seg", "manifest.json"):
            assert os.path.getmtime(os.path.join(outdir, f)) == t, f
    blob = resume.assemble(outdir, format="gzip")
    assert zlib.decompress(blob, wbits=31) == data
