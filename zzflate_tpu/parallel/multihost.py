"""Multi-host distributed encode (SURVEY.md M6 / section 5.8).

The reference is a single-process library; scaling across hosts is pure
data parallelism with a one-hop halo, exactly like the single-host chunk
scheme lifted one level:

  host i's byte range is chunked locally (parallel/sharded over its own
  chips); its first chunk uses host i-1's 32 KiB tail as the preset
  dictionary (halo exchange = one allgather of tiny tails); every host's
  payload is sync-flush framed; host N-1 closes the stream; process 0
  concatenates payloads in host order and merges the per-host checksum
  partials with the closed-form combines. The result is ONE valid
  zlib/gzip member, identical to what a single host would produce with
  the same chunking.

Small metadata (sizes, checksums, halo tails) moves via
jax.experimental.multihost_utils allgathers; the ragged payload bytes
move point-to-point to process 0 via jax.experimental.transfer pulls —
aggregate DCN traffic O(total compressed bytes) — with a coordinated
slab-allgather fallback on platforms without the transfer API
(_gather_payloads_to_root). Runs degenerate (and is tested) at
process_count() == 1; on a real pod slice call initialize() first.
"""
from __future__ import annotations

import os
import zlib as _zlib

import numpy as np

import jax

from zzflate_tpu import config as cfg_mod
from zzflate_tpu.api import _encode_segments
from zzflate_tpu.config import CodecConfig
from zzflate_tpu.ops.checksums import adler32_combine, crc32_combine
from zzflate_tpu.utils import containers

_WINDOW = 32768


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize passthrough (no-op if already set up)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def _allgather_np(arr: np.ndarray) -> np.ndarray:
    """All-gather a host-local numpy array along a new leading axis."""
    if jax.process_count() == 1:
        return arr[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr))


_PULL_UUID = 0x5A7A0000  # transfer-gather request ids: _PULL_UUID + pid

_TRANSFER_OK: bool | None = None


def _transfer_supported() -> bool:
    """Whether this host's PJRT client supports jax.experimental.transfer
    self-pulls — probed in a THROWAWAY SUBPROCESS, because a broken
    transport does not raise, it ABORTS the process (measured on this
    box's AOT-proxy CPU client: fatal CHECK in
    aux::LocalBulkTransportFactory::RecvBulkTransport, streaming.cc:193,
    SIGABRT — an in-process probe would take the whole host down, which
    is exactly how the 2-process test failed). ZZFLATE_MH_P2P=1 skips
    the probe (trust the client — e.g. a real pod where a second
    process cannot attach to the chips); =0 forces the slab fallback."""
    global _TRANSFER_OK
    if _TRANSFER_OK is not None:
        return _TRANSFER_OK
    env = os.environ.get("ZZFLATE_MH_P2P", "")
    if env in ("0", "1"):
        _TRANSFER_OK = env == "1"
        return _TRANSFER_OK
    import subprocess
    import sys

    code = (
        "import jax, numpy as np, jax.numpy as jnp\n"
        "from jax.experimental import transfer\n"
        "from jax.sharding import SingleDeviceSharding\n"
        "dev = jax.local_devices()[0]\n"
        "srv = transfer.start_transfer_server(dev.client)\n"
        "x = jnp.arange(8, dtype=jnp.uint8)\n"
        "srv.await_pull(7, [x])\n"
        "got = srv.connect(srv.address()).pull(7, [jax.ShapeDtypeStruct("
        "(8,), np.uint8, sharding=SingleDeviceSharding(dev))])[0]\n"
        "assert np.asarray(got).tolist() == list(range(8))\n"
        "print('TRANSFER-OK')\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            timeout=120,
        )
        _TRANSFER_OK = (
            r.returncode == 0 and b"TRANSFER-OK" in r.stdout
        )
    except Exception:
        _TRANSFER_OK = False
    return _TRANSFER_OK


def _gather_payloads_to_root(
    payload: bytes, metas: np.ndarray, pid: int, nproc: int
) -> list[bytes] | None:
    """Collect every host's ragged payload on process 0.

    Preferred path: `jax.experimental.transfer` point-to-point pulls —
    every host publishes its payload once and process 0 pulls each
    directly, so aggregate DCN traffic is O(total payload) (the
    round-4 verdict's gather-to-root). Hosts whose PJRT client lacks
    the transfer API (e.g. the AOT-proxy CPU client used by the CI
    mesh) agree via an allgathered flag to use the fallback: a
    symmetric slab allgather, aggregate O(hosts x total) on the wire
    but still O(slab) peak memory per non-root host.

    Returns the per-host payload list on process 0, None elsewhere.
    """
    if nproc == 1:
        return [payload] if pid == 0 else None

    import jax.numpy as jnp

    srv = arr = None
    ok = 0
    if _transfer_supported():
        try:
            from jax.experimental import transfer

            dev = jax.local_devices()[0]
            srv = transfer.start_transfer_server(dev.client)
            arr = jnp.asarray(np.frombuffer(payload, np.uint8))
            ok = 1
        except Exception:
            ok = 0

    addr = (srv.address() if ok else "").encode()[:128]
    a = np.zeros(132, np.uint8)
    a[: len(addr)] = np.frombuffer(addr, np.uint8)
    a[128:] = np.frombuffer(
        np.array([len(addr) * 2 + ok], np.uint32).tobytes(), np.uint8
    )
    cards = _allgather_np(a)
    flags = [
        int(np.frombuffer(cards[i, 128:].tobytes(), np.uint32)[0])
        for i in range(nproc)
    ]
    use_p2p = all(f & 1 for f in flags)

    if use_p2p:
        from jax.sharding import SingleDeviceSharding

        if pid != 0:
            srv.await_pull(_PULL_UUID + pid, [arr])
            # Hold the staged array until root confirms completion.
            _allgather_np(np.zeros(1, np.uint8))
            return None
        dev = jax.local_devices()[0]
        out: list[bytes] = []
        for i in range(nproc):
            if i == 0:
                out.append(payload)
                continue
            alen = flags[i] >> 1
            address = cards[i, :alen].tobytes().decode()
            conn = srv.connect(address)
            sds = jax.ShapeDtypeStruct(
                (int(metas[i, 0]),), np.uint8,
                sharding=SingleDeviceSharding(dev),
            )
            out.append(np.asarray(conn.pull(_PULL_UUID + i, [sds])[0])
                       .tobytes())
        _allgather_np(np.zeros(1, np.uint8))  # release peers
        return out

    # Fallback: symmetric slab allgather. Only process 0 accumulates
    # (non-root peak is O(slab)); wire traffic is O(hosts x total).
    max_len = int(metas[:, 0].max())
    SLAB = 4 << 20
    rounds = max(1, -(-max_len // SLAB))
    acc = [bytearray() for _ in range(nproc)] if pid == 0 else None
    for r in range(rounds):
        slab = np.zeros(SLAB, np.uint8)
        piece = payload[r * SLAB : (r + 1) * SLAB]
        if piece:
            slab[: len(piece)] = np.frombuffer(piece, np.uint8)
        got = _allgather_np(slab)
        if pid == 0:
            for i in range(nproc):
                take = min(SLAB, int(metas[i, 0]) - r * SLAB)
                if take > 0:
                    acc[i] += got[i, :take].tobytes()
        del got
    return [bytes(p) for p in acc] if pid == 0 else None


def compress_multihost(
    local_data: bytes,
    level: int = 6,
    format: str = "gzip",
    chunk_bytes: int = cfg_mod.DEFAULT_CHUNK_BYTES,
    use_halo: bool = True,
) -> bytes | None:
    """Distributed one-shot compress of a byte stream sharded across hosts.

    Each process passes ITS contiguous byte range (process order = byte
    order). Returns the complete stream on process 0, None elsewhere.
    """
    config = CodecConfig(level=level, format=format, chunk_bytes=chunk_bytes)
    pid = jax.process_index()
    nproc = jax.process_count()

    # Halo: every host publishes its 32 KiB tail; host i seeds its first
    # chunk with host i-1's tail (the cross-host sequence-parallel hop).
    tail = np.zeros(_WINDOW + 4, np.uint8)
    t = local_data[-_WINDOW:]
    tail[: len(t)] = np.frombuffer(t, np.uint8)
    tail[_WINDOW:] = np.frombuffer(
        np.array([len(t)], np.uint32).tobytes(), np.uint8
    )
    tails = _allgather_np(tail)
    dictionary = None
    if use_halo and pid > 0:
        prev_len = int(
            np.frombuffer(tails[pid - 1, _WINDOW:].tobytes(), np.uint32)[0]
        )
        dictionary = tails[pid - 1, :prev_len].tobytes()

    last = pid == nproc - 1
    res = _encode_segments(
        local_data,
        config,
        dictionary,
        stream_final=last,
        with_checksums=True,
    )
    payload = b"".join(res["segments"])
    nchunks = max(1, -(-len(local_data) // chunk_bytes))
    lens = [
        min(chunk_bytes, len(local_data) - i * chunk_bytes)
        for i in range(nchunks)
    ]
    adler = containers.combine_adler(list(zip(res["adler"], lens)))
    crc = containers.combine_crc(list(zip(res["crc"], lens)))

    # Gather ragged payloads to process 0: sizes first, then the bytes
    # point-to-point (preferred) or in bounded allgather slabs (fallback).
    meta = np.array(
        [len(payload), len(local_data), adler, crc], np.int64
    )
    metas = _allgather_np(meta)
    per_host = _gather_payloads_to_root(payload, metas, pid, nproc)

    if pid != 0:
        return None
    full_payload = b"".join(per_host)
    total_len = int(metas[:, 1].sum())
    full_adler, full_crc = 1, 0
    for i in range(nproc):
        ln = int(metas[i, 1])
        full_adler = adler32_combine(full_adler, int(metas[i, 2]), ln)
        full_crc = crc32_combine(full_crc, int(metas[i, 3]), ln)

    if format == "raw":
        return full_payload
    if format == "zlib":
        return (
            containers.zlib_header(level)
            + full_payload
            + containers.zlib_trailer(full_adler)
        )
    return (
        containers.gzip_header()
        + full_payload
        + containers.gzip_trailer(full_crc, total_len)
    )
