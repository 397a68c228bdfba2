"""Benchmark: end-to-end encode throughput vs single-thread zlib level 6.

Prints TWO JSON lines (round-3 verdict item #3: the two engines are
separate metrics every round, never substituted for each other):

  {"metric": "encode_MBps_level6", ...}          # TPU pipeline; value 0
                                                 # + note when the device
                                                 # is unresponsive/wedged
  {"metric": "encode_MBps_level6_native", ...}   # host C engine

The corpus is the deterministic 8 MiB mixed recipe from BASELINE.md
(headers + XML-ish text + binary), regenerated locally so the numbers are
comparable across rounds. Everything else (ratio, per-stage info) goes to
stderr. Run on the real chip by default; JAX_PLATFORMS=cpu for smoke.

--scaling: CPU-mesh scaling proxy (1/2/4/8 simulated devices, fixed
total bytes through parallel.compress_sharded) — the stand-in for the
multi-host >=80% gate (BASELINE.json:2,5) on a box with one chip.
--full [--mib=N]: per-level ratio table on the Silesia-like fixture.
"""
from __future__ import annotations

import glob
import json
import sys
import time
import zlib

import numpy as np

import os as _os

CHUNK_BYTES = int(_os.environ.get("ZZFLATE_BENCH_CHUNK", 1 << 18))
LEVEL = 6
TARGET_BYTES = int(float(_os.environ.get("ZZFLATE_BENCH_MIB", "8")) * (1 << 20))
REPS = 3


def build_corpus(target: int = TARGET_BYTES) -> bytes:
    parts = []
    total = 0
    # 1) C headers (text, highly compressible, long-range repeats)
    for path in sorted(glob.glob("/usr/include/*.h"))[:200]:
        try:
            b = open(path, "rb").read()
        except OSError:
            continue
        parts.append(b)
        total += len(b)
        if total >= target // 2:
            break
    # 2) synthetic XML-ish records (mid compressibility, deterministic)
    rng = np.random.default_rng(1234)
    ids = rng.integers(0, 10**9, size=20000)
    xml = "".join(
        f"<row id='{i}' v='{i % 997}'><name>item-{i % 5000}</name></row>\n"
        for i in ids
    ).encode()
    parts.append(xml[: target // 4])
    # 3) binary (an ELF if present, else pseudo-random = stored fallback)
    try:
        elf = open("/usr/bin/python3.12", "rb").read()[: target // 4]
    except OSError:
        elf = rng.integers(0, 256, size=target // 4, dtype=np.uint8).tobytes()
    parts.append(elf)
    data = b"".join(parts)[:target]
    if len(data) < target:
        data = (data * (target // max(1, len(data)) + 1))[:target]
    return data


def full_ratio_table(target_mib: int = 100) -> None:
    """--full: per-level ratio table on the Silesia-like fixture
    (ours vs zlib vs libdeflate); results recorded in BASELINE.md."""
    import ctypes

    import zzflate_tpu as zf
    from zzflate_tpu.utils import fixtures

    data = fixtures.silesia_like(target_mib << 20)
    mb = len(data) / 1e6

    libd = None
    try:
        libd = ctypes.CDLL("libdeflate.so.0")
        libd.libdeflate_alloc_compressor.restype = ctypes.c_void_p
        libd.libdeflate_zlib_compress.restype = ctypes.c_size_t
    except OSError:
        pass

    def libdeflate_size(level: int) -> int | None:
        if libd is None:
            return None
        comp = libd.libdeflate_alloc_compressor(ctypes.c_int(level))
        bound = len(data) + len(data) // 2 + 1024
        buf = ctypes.create_string_buffer(bound)
        n = libd.libdeflate_zlib_compress(
            ctypes.c_void_p(comp), data, ctypes.c_size_t(len(data)),
            buf, ctypes.c_size_t(bound),
        )
        libd.libdeflate_free_compressor(ctypes.c_void_p(comp))
        return int(n) or None

    print(f"fixture={len(data)}B ({mb:.0f} MB)", file=sys.stderr)
    print("level  ours_B  zlib_B  libdeflate_B  rel_zlib  enc_MBps")
    for level in (1, 6, 7, 8, 9):
        t0 = time.perf_counter()
        ours = zf.compress(
            data, level=level, format="zlib", chunk_bytes=CHUNK_BYTES
        )
        dt = time.perf_counter() - t0
        zsize = len(zlib.compress(data, level))
        assert zlib.decompress(ours) == data, "round-trip failed"
        lsize = libdeflate_size(level)
        print(
            f"{level}  {len(ours)}  {zsize}  {lsize}  "
            f"{len(ours)/zsize:.4f}  {mb/dt:.2f}"
        )


def _platform_responsive(timeout_s: float = 150.0) -> bool:
    """Probe the default JAX platform in a SUBPROCESS with a timeout.

    The tunneled axon platform occasionally dies in a way that makes even
    trivial device ops hang forever (BASELINE.md); a hung bench is worse
    than a CPU-fallback bench, and the platform choice must be made
    before this process touches a backend."""
    import subprocess

    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax, numpy as np, jax.numpy as jnp;"
                "print(int(np.asarray(jnp.sum(jnp.arange(8)))))",
            ],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0 and b"28" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def scaling_table(total_mib: int = 16, chunk_kib: int = 64) -> None:
    """--scaling: fixed-total-bytes encode through compress_sharded on a
    simulated CPU mesh of 1/2/4/8 devices.

    What this measures on a chip-less box: the sharding machinery's
    overhead. Total compute is constant (same bytes, same graphs) and the
    8 virtual devices share this host's cores, so the multi-chip layout
    is healthy when wall time stays FLAT as the mesh grows —
    eff_proxy(n) = T(1)/T(n), perfect = 1.0. On real chips the same
    NamedSharding layout splits that constant compute across real
    silicon (chunks are independent; XLA inserts no cross-device
    collectives in the hot path), which is what the >=80% linear-scaling
    gate (BASELINE.json:5) is about. Results + the chip-budget
    projection are recorded in BASELINE.md; tests/test_scaling.py gates
    eff_proxy(8) >= 0.7.
    """
    import os

    os.environ.setdefault("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from zzflate_tpu.parallel import sharded

    data = build_corpus(total_mib << 20)
    mb = len(data) / 1e6
    devs = jax.devices()
    rows = []
    for n in (1, 2, 4, 8):
        mesh = sharded.make_mesh(devs[:n])
        out = sharded.compress_sharded(
            data, level=LEVEL, format="gzip", mesh=mesh,
            chunk_bytes=chunk_kib << 10,
        )  # warm/compile
        assert zlib.decompress(out, wbits=31) == data
        best = 9e9
        for _ in range(3):
            t0 = time.perf_counter()
            sharded.compress_sharded(
                data, level=LEVEL, format="gzip", mesh=mesh,
                chunk_bytes=chunk_kib << 10,
            )
            best = min(best, time.perf_counter() - t0)
        rows.append((n, best, mb / best))
        print(f"devices={n} wall={best:.2f}s {mb/best:.2f} MB/s",
              file=sys.stderr, flush=True)
    t1 = rows[0][1]
    for n, t, mbps in rows:
        print(f"devices={n}  wall={t:.2f}s  MBps={mbps:.2f}  "
              f"eff_proxy={t1/t:.3f}")
    print(json.dumps({
        "metric": "scaling_eff_proxy_8dev", "value": round(t1 / rows[-1][1], 3),
        "unit": "T1/T8 (fixed total bytes, CPU mesh)",
        "vs_baseline": round((t1 / rows[-1][1]) / 0.8, 3),
    }), flush=True)


def main() -> None:
    import os

    # Measured 2026-08-20 (BASELINE.md round 4): one 8 MiB dispatch
    # (ZZFLATE_BATCH_MIB=8) is WORSE end-to-end (4.55 vs 5.23 MB/s)
    # despite the sort's 22%/byte batch advantage — the two-batch
    # pipeline's analyze/emit/fetch overlap dominates. Default batch
    # sizing (4 MiB) stands; env wins for A/B runs.

    import jax

    platform_note = ""
    if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",) and (
        not _platform_responsive()
    ):
        # The tunneled chip sometimes stops executing entirely (BASELINE.md
        # outage notes). The TPU metric is reported as 0 with a note (it
        # is NOT substituted — round-3 verdict item #3); the native C
        # engine line below still carries the host number.
        jax.config.update("jax_platforms", "cpu")
        platform_note = "device unresponsive"
        print(
            "WARNING: device platform unresponsive; TPU metric is 0 this"
            " run; the native line is the host serving path",
            file=sys.stderr,
        )

    # Persistent compile cache (works for CPU; harmless no-op if the axon
    # PJRT plugin cannot serialize executables).
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except (OSError, AttributeError):
        pass

    import zzflate_tpu as zf

    data = build_corpus()
    mb = len(data) / 1e6

    # Baseline: single-thread zlib level 6, measured now on this host.
    t0 = time.perf_counter()
    zref = zlib.compress(data, LEVEL)
    zlib_s = time.perf_counter() - t0
    zlib_mbps = mb / zlib_s

    from zzflate_tpu.utils import profiling

    # Native C engine (host serving path) — measured FIRST, always, so
    # its metric line survives any device wedge below.
    from zzflate_tpu import native as _zn

    nat_best = 9e9
    if _zn.lib() is not None:
        nout = _zn.deflate_raw_mt(data, level=LEVEL)  # warm
        assert zlib.decompress(nout, wbits=-15) == data
        for _ in range(3):
            t0 = time.perf_counter()
            _zn.deflate_raw_mt(data, level=LEVEL)
            nat_best = min(nat_best, time.perf_counter() - t0)
    nat_mbps = round(mb / nat_best, 2) if nat_best < 9e9 else 0.0

    def native_record() -> str:
        return json.dumps({
            "metric": "encode_MBps_level6_native", "value": nat_mbps,
            "unit": "MB/s", "vs_baseline": round(nat_mbps / zlib_mbps, 3),
        })

    def tpu_record(v: float, note: str | None) -> str:
        rec = {
            "metric": "encode_MBps_level6", "value": round(v, 2),
            "unit": "MB/s", "vs_baseline": round(v / zlib_mbps, 3),
        }
        if note:
            rec["note"] = note
        return json.dumps(rec)

    if platform_note:
        # Device dead at probe time: report TPU as 0 (never substituted),
        # then the native engine's own line, and stop — pipeline numbers
        # on CPU XLA say nothing about the framework.
        print(tpu_record(0.0, platform_note), flush=True)
        print(native_record(), flush=True)
        return

    # The device can pass the probe and then wedge mid-compile (the
    # tunnel outage pattern, BASELINE.md). A hung bench records NO
    # metric at all, so run the device path under a hard deadline on a
    # watchdog thread — if it blows, emit both metric lines (TPU = 0
    # with a note) and exit.
    import threading

    deadline_s = float(os.environ.get("ZZFLATE_BENCH_DEADLINE", "2000"))
    done = threading.Event()

    def _suicide():
        if not done.wait(deadline_s):
            print(tpu_record(0.0, "device wedged mid-bench"), flush=True)
            print(native_record(), flush=True)
            os._exit(3)

    threading.Thread(target=_suicide, daemon=True).start()

    # Warmup / compile.
    out = zf.compress(
        data, level=LEVEL, format="gzip", chunk_bytes=CHUNK_BYTES,
        engine="tpu",
    )
    assert zlib.decompress(out, wbits=31) == data, "round-trip failed"

    times = []
    stages = None
    for _ in range(REPS):
        with profiling.collect() as timer:
            t0 = time.perf_counter()
            out = zf.compress(
                data, level=LEVEL, format="gzip", chunk_bytes=CHUNK_BYTES,
                engine="tpu",
            )
            dt = time.perf_counter() - t0
        times.append(dt)
        if stages is None or dt == min(times):
            stages = timer.as_ms()
    done.set()
    best = min(times)
    mbps = mb / best

    # Emit both metric lines FIRST: first compiles through the remote
    # relay can take tens of minutes, and an external timeout during the
    # decode section below must not destroy the metrics already measured.
    print(tpu_record(mbps, None), flush=True)
    print(native_record(), flush=True)
    print(f"stages_ms={json.dumps(stages)}", file=sys.stderr, flush=True)

    # The decode/detail sections below are stderr-only color; the
    # metrics are already out. If the device wedges down there (seen:
    # 35+ min hangs mid-indexed-compile), exit cleanly instead of
    # eating the caller's whole timeout budget.
    import threading as _th

    tail_deadline = float(
        os.environ.get("ZZFLATE_BENCH_TAIL_DEADLINE", "1200")
    )

    def _tail_suicide():
        import time as _t

        _t.sleep(tail_deadline)
        print("bench tail deadline: device wedged in the decode "
              "section; exiting with the metrics already emitted",
              file=sys.stderr, flush=True)
        os._exit(0)

    _th.Thread(target=_tail_suicide, daemon=True).start()

    # Native C encode engine (stderr detail; the host serving path).
    enc_native = 0.0
    try:
        from zzflate_tpu import native as zn

        if zn.lib() is not None:
            zn.deflate_raw(data, level=LEVEL)  # warm
            t0 = time.perf_counter()
            raw = zn.deflate_raw(data, level=LEVEL)
            enc_native = mb / (time.perf_counter() - t0)
            assert zlib.decompress(raw, wbits=-15) == data
    except Exception as e:
        print(f"native-encode bench failed: {e!r}", file=sys.stderr)

    # Decode-side numbers (stderr detail): native C path + TPU indexed path.
    t0 = time.perf_counter()
    back = zf.decompress(out, format="gzip")
    dec_native = mb / (time.perf_counter() - t0)
    assert back == data
    from zzflate_tpu.models import inflate_tpu

    dec_tpu = dec_tpu_dev = 0.0
    try:
        # The indexed-encode compile is the bench's most wedge-prone
        # graph on the tunneled platform; reuse a cached blob of this
        # exact corpus when present (written below / by tools/chip_ab)
        # so the decode numbers survive a flaky compile service. The
        # decode itself CRC-verifies, so a stale blob fails loudly.
        import tempfile

        # Key the cache by the exact configuration: a blob built at a
        # different chunking would pass the content check but measure the
        # wrong layout. Per-user temp dir avoids the shared-/tmp hazard.
        blob = os.path.join(
            tempfile.gettempdir(),
            f"zzflate_bench_{os.getuid()}_{len(data)}_{CHUNK_BYTES}_{LEVEL}"
            ".gz",
        )
        oi = None
        try:
            cached = open(blob, "rb").read()
            if inflate_tpu.decompress_indexed(cached) == data:
                oi = cached
        except (OSError, ValueError):
            pass
        if oi is None:
            oi = zf.compress(data, level=LEVEL, format="gzip",
                             chunk_bytes=CHUNK_BYTES, indexed=True)
            try:
                open(blob, "wb").write(oi)
            except OSError:
                pass
        arr, n = inflate_tpu.decompress_indexed(oi, to_device=True)  # warm
        assert n == len(data)
        t0 = time.perf_counter()
        # Device-resident decode + on-device CRC verify (the TPU
        # data-loading path: bytes never leave the chip).
        inflate_tpu.decompress_indexed(oi, to_device=True)
        dec_tpu_dev = mb / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        assert zf.decompress(oi, format="gzip", engine="tpu") == data
        dec_tpu = mb / (time.perf_counter() - t0)
    except Exception as e:  # report, don't kill the encode metric
        print(f"tpu-decode bench failed: {e!r}", file=sys.stderr)

    # Optional: level-9 (optimal-parse) end-to-end through the device
    # pipeline + native DP — the round-4 verdict's missing L7-9 chip
    # number. Opt-in (ZZFLATE_BENCH_L9=1): it compiles a second analyze
    # graph (L9 matcher shapes), which the wedge-prone platform should
    # only pay inside a confirmed tunnel window (watch_tunnel sets it).
    if os.environ.get("ZZFLATE_BENCH_L9") == "1":
        try:
            t0 = time.perf_counter()
            o9 = zf.compress(data, level=9, format="gzip",
                             chunk_bytes=CHUNK_BYTES)
            warm9 = time.perf_counter() - t0
            assert zlib.decompress(o9, wbits=31) == data
            t0 = time.perf_counter()
            zf.compress(data, level=9, format="gzip",
                        chunk_bytes=CHUNK_BYTES)
            enc9 = mb / (time.perf_counter() - t0)
            print(
                f"enc_l9_tpu={enc9:.2f}MB/s warm={warm9:.1f}s "
                f"size9={len(o9)}B",
                file=sys.stderr, flush=True,
            )
        except Exception as e:
            print(f"l9 bench failed: {e!r}", file=sys.stderr)

    print(
        f"corpus={len(data)}B ours={len(out)}B ratio={len(data)/len(out):.3f} "
        f"zlib6={len(zref)}B ratio={len(data)/len(zref):.3f} "
        f"times={['%.2f' % t for t in times]} zlib6_enc={zlib_mbps:.1f}MB/s "
        f"enc_native={enc_native:.1f}MB/s "
        f"dec_native={dec_native:.0f}MB/s dec_tpu_dev={dec_tpu_dev:.2f}MB/s "
        f"dec_tpu={dec_tpu:.2f}MB/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if "--full" in sys.argv:
        mib = 100
        for a in sys.argv[1:]:
            if a.startswith("--mib="):
                mib = int(a.split("=")[1])
        full_ratio_table(mib)
    elif "--scaling" in sys.argv:
        mib = 16
        for a in sys.argv[1:]:
            if a.startswith("--mib="):
                mib = int(a.split("=")[1])
        scaling_table(mib)
    else:
        main()
