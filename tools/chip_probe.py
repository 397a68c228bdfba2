"""Decisive sort-shape probes on the real chip (round 4).

The matcher's lax.sort calls are the dominant encode cost
(analyze_fetch_freqs ~970 ms of a 1.57 s bench wall, BASELINE.md), and
round-2 session notes claim each sort costs ~190 ms per 2 MiB
*regardless of operand count* — which smells pass-count-bound, not
bandwidth-bound. If true, the lever is more data per sort call (bigger
batch, power-of-two rows), not narrower keys. This script measures
exactly that, one tiny graph per cell, printing one JSON line per cell
as it goes (incremental flush: a mid-script wedge keeps earlier cells).

Run under `timeout`; cells are ordered most-decisive-first.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from zzflate_tpu.ops import matcher as M

KW = 16  # level-6 key_words


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def emit(cell, ms, mib):
    print(
        json.dumps({
            "cell": cell, "ms": round(ms, 1),
            "ms_per_MiB": round(ms / mib, 2),
        }),
        flush=True,
    )


def sort_cell(name, b, n, nops, reps=3):
    """Time lax.sort of (b, n) rows with nops u32 key operands + pos."""
    raw = (open("/usr/include/zlib.h", "rb").read() * 600)[: b * n]
    data = jnp.asarray(np.frombuffer(raw, np.uint8).reshape(b, n))

    @jax.jit
    def f(d):
        def one(dd):
            w = M._pack_words(dd, nops)
            pos = jnp.arange(n, dtype=jnp.int32)
            out = jax.lax.sort(
                tuple(w) + (pos,), num_keys=nops, is_stable=True
            )
            return out[nops]
        sp = jax.vmap(one)(d)
        return jnp.sum(sp[:, ::256].astype(jnp.int32))

    try:
        ms = timeit(f, data, reps=reps)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"cell": name, "error": repr(e)[:200]}), flush=True)
        return
    emit(name, ms, b * n / (1 << 20))


# Default cell set. Phase-1 (sort shapes) was measured 2026-08-20 11:51
# on-chip: sortB(16,294912,k16)=101ms, (64,294912)=317ms (17.6/MiB),
# (16,524288)=145ms (18.1/MiB), k8=58.6ms. Sorts are ~30% of analyze;
# the default now runs the phase-2 cells that locate the other ~600ms.
# (Measured 2026-08-20: full=340ms, parse=170, hist=27, emit=252,
# walk cells ~93ns/lane-step, resolve=211, prop=26, fetch=33MB/s —
# BASELINE.md round 4. Only the LUT-build cell remains unmeasured.)
_DEFAULT = ("luts",)


def main():
    sel = set(sys.argv[1:])

    def want(name):
        return name in sel if sel else name in _DEFAULT

    # 1) Baseline: the production L6 sortB shape (16 chunks x 288 KiB).
    if want("base"):
        sort_cell("sortB 16x294912 k16", 16, 294912, KW)
    # 2) Batch scaling: same rows, 4x the batch. If ms barely moves,
    #    sort is pass-bound and bigger dispatches are ~free throughput.
    if want("batch"):
        sort_cell("sortB 64x294912 k16", 64, 294912, KW)
    # 3) Power-of-two rows: 294912 pads to 524288 inside a bitonic sort;
    #    do explicit 2^19 rows cost the same (=> 1.78x free data)?
    if want("pow2"):
        sort_cell("sortB 16x524288 k16", 16, 524288, KW)
    # 4) Narrow key: half the operands at the same shape.
    if want("narrow"):
        sort_cell("sortB 16x294912 k8", 16, 294912, 8)
    # 5) Segmented: many short rows (window-local sorts).
    if want("seg"):
        sort_cell("sortB 128x65536 k16", 128, 65536, KW)
    # 6) Reference: the full production matcher at L6 shapes.
    def full_cell(name, kw):
        raw = (open("/usr/include/zlib.h", "rb").read() * 600)[: 16 * 294912]
        data = jnp.asarray(np.frombuffer(raw, np.uint8).reshape(16, 294912))
        ve = jnp.full((16,), 294912, jnp.int32)
        ws = jnp.zeros((16,), jnp.int32)

        @jax.jit
        def f(d, v, w):
            ml, md = jax.vmap(
                lambda dd, vv, ww: M.find_matches(dd, vv, ww, 16, key_words=kw)
            )(d, v, w)
            return jnp.sum(ml[:, ::256] + md[:, ::256])

        try:
            ms = timeit(f, data, ve, ws)
            emit(name, ms, 16 * 294912 / (1 << 20))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"cell": name, "error": repr(e)[:200]}),
                  flush=True)

    if want("full"):
        full_cell("find_matches 16x294912 L6", KW)

    # ---- phase 2 (round-4): where do the OTHER ~600 ms of analyze go? ----
    # The phase-1 cells put both sorts at ~150 ms of the ~970 ms analyze
    # fetch; these isolate the remaining stages at production shapes.
    B, N = 16, 294912
    if sel & {"parse", "hist", "scan", "prop", "full8"} or not sel:
        raw = (open("/usr/include/zlib.h", "rb").read() * 600)[: B * N]
        data16 = jnp.asarray(np.frombuffer(raw, np.uint8).reshape(B, N))
        rng = np.random.default_rng(0)
        ml0 = rng.integers(3, 259, size=(B, N)).astype(np.int32)
        ml0 = np.where(rng.random((B, N)) < 0.6, 0, ml0)
        md0 = rng.integers(1, 32769, size=(B, N)).astype(np.int32)
        mlj = jnp.asarray(ml0)
        mdj = jnp.asarray(md0)

    if want("full8"):
        full_cell("find_matches 16x294912 L6 w8", 8)

    if want("parse"):
        st = jnp.full((B,), 32768, jnp.int32)
        vep = jnp.full((B,), N, jnp.int32)

        @jax.jit
        def fparse(ml, md):
            com, take = M.parse_commit_batch(
                ml, md, st, vep, lazy=True, max_lazy=16, nice=128
            )
            return jnp.sum(com[:, ::256].astype(jnp.int32))

        try:
            ms = timeit(fparse, mlj, mdj)
            emit("parse_commit_batch 16x294912", ms, B * N / (1 << 20))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"cell": "parse", "error": repr(e)[:200]}),
                  flush=True)

    if want("hist"):
        from zzflate_tpu.models import deflate_encoder as DE
        from zzflate_tpu.ops import huffman as H

        @jax.jit
        def fhist(sym, com):
            bounds = DE.sub_block_bounds(N)

            def one(s, c):
                return jnp.stack([
                    H.histogram(s[a:b], c[a:b], 288)
                    for a, b in zip(bounds[:-1], bounds[1:])
                ])

            return jnp.sum(jax.vmap(one)(sym, com)[:, :, ::7])

        sym = jnp.asarray(
            rng.integers(0, 286, size=(B, N)).astype(np.int32)
        )
        com = jnp.asarray(rng.random((B, N)) < 0.5)
        try:
            ms = timeit(fhist, sym, com)
            emit("histogram_ll 16x294912x4sb", ms, B * N / (1 << 20))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"cell": "hist", "error": repr(e)[:200]}),
                  flush=True)

    if want("fetch"):
        # Device->host transfer rate of a jit-output buffer (the emit
        # fetch path). Round-1 measured ~7 MB/s through the tunnel; if
        # this moved, the emit_fetch budget math changes. A FRESH buffer
        # per rep: jax.Array caches its host copy after the first
        # np.asarray, which silently zeroes repeat timings.
        f2 = jax.jit(lambda x, s: x + s)
        base = jnp.ones((1 << 19,), jnp.uint32)
        _ = np.asarray(f2(base, jnp.uint32(0))[:8])
        best = float("inf")
        for i in range(3):
            buf = f2(base, jnp.uint32(i + 1))
            buf.block_until_ready()
            t0 = time.perf_counter()
            _ = np.asarray(buf)
            best = min(best, time.perf_counter() - t0)
        mb = base.size * 4 / 1e6
        print(json.dumps({
            "cell": "fetch 2MB jit-output fresh",
            "ms": round(best * 1000, 1),
            "MBps": round(mb / best, 2),
        }), flush=True)

        # Concurrent fetches: does the tunnel parallelize transfers of
        # DISTINCT buffers across threads? If aggregate >> single, the
        # emit/decode fetch paths should fan out over a thread pool.
        import concurrent.futures as _cf

        bufs = [f2(base, jnp.uint32(100 + i)) for i in range(4)]
        for b in bufs:
            b.block_until_ready()
        t0 = time.perf_counter()
        with _cf.ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(np.asarray, bufs))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "cell": "fetch 4x2MB threads",
            "ms": round(dt * 1000, 1),
            "MBps_aggregate": round(4 * mb / dt, 2),
        }), flush=True)

    if want("emit"):
        # The emit phase alone at production shapes (device compute
        # without the fetch): committed/token arrays + host tables in,
        # packed words out; forces only a tiny slice back.
        from zzflate_tpu.models import deflate_encoder as DE
        from zzflate_tpu.ops import huffman_host as HH

        rng2 = np.random.default_rng(1)
        mlen2 = rng2.integers(3, 259, size=(B, N)).astype(np.int32)
        take2 = rng2.random((B, N)) < 0.25
        mlen2 = np.where(take2, mlen2, 0)
        mdist2 = np.where(
            take2, rng2.integers(1, 32769, size=(B, N)), 0
        ).astype(np.int32)
        com2 = take2 | (rng2.random((B, N)) < 0.5)
        sym2 = np.where(
            take2, 257 + rng2.integers(0, 29, size=(B, N)),
            rng2.integers(0, 256, size=(B, N)),
        ).astype(np.int32)
        lcode2 = np.maximum(sym2 - 257, 0)
        dcode2 = rng2.integers(0, 30, size=(B, N)).astype(np.int32)
        sb = DE.sub_block_count(N - 32768)
        ana = {
            "committed": jnp.asarray(com2),
            "is_match": jnp.asarray(take2),
            "litlen_sym": jnp.asarray(sym2),
            "lcode": jnp.asarray(lcode2),
            "dcode": jnp.asarray(dcode2),
            "mlen": jnp.asarray(mlen2),
            "mdist": jnp.asarray(mdist2),
        }
        ow = DE.output_words_bound(N - 32768)
        ll_len = jnp.asarray(
            np.full((B, sb, 288), 9, np.int32)
        )
        ll_code = jnp.asarray(np.zeros((B, sb, 288), np.uint32))
        d_len = jnp.asarray(np.full((B, sb, 30), 5, np.int32))
        d_code = jnp.asarray(np.zeros((B, sb, 30), np.uint32))
        hv = jnp.asarray(np.zeros((B, sb, DE.HDR_SLOTS), np.uint32))
        hn = jnp.asarray(np.zeros((B, sb, DE.HDR_SLOTS), np.int32))
        ev = jnp.asarray(np.zeros((B, sb), np.uint32))
        en = jnp.asarray(np.full((B, sb), 7, np.int32))

        def femit():
            res = DE.emit_chunks_batch(
                ana, ow, ll_len, ll_code, d_len, d_code, hv, hn, ev, en,
                compact=True,
            )
            return res["meta"][:, 0]

        try:
            ms = timeit(lambda: femit())
            emit("emit_batch 16x294912 compact", ms, B * N / (1 << 20))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"cell": "emit", "error": repr(e)[:200]}),
                  flush=True)

    # ---- decode walk scaling law (round-4): the anchor-walk fori_loop is
    # the chip decode cost (dec_tpu_dev 4.78 MB/s default; stacked vmap
    # variants REGRESS: 2.09 at anchor=1024, 1.12 at anchor=256). These
    # run the REAL _walk_core at synthetic shapes to find how per-step
    # cost scales with (t_steps, lanes, defer) — the decisive datum for
    # the decode redesign. Garbage bits deactivate lanes early but the
    # loop's op mix and trip count are identical (masked work).
    def walk_cell(name, t_steps, lanes, defer):
        from zzflate_tpu.models import inflate_tpu as IT

        rngw = np.random.default_rng(2)
        n_out_pad = 1 << 22
        nw = (4 << 20) // 4 + 2
        words = jnp.asarray(
            rngw.integers(0, 1 << 32, nw, dtype=np.uint32)
        )
        u_pad = 64
        z16 = np.zeros((u_pad, 16), np.int32)
        cnt = np.zeros((u_pad, 16), np.int32)
        cnt[:, 8] = 255  # plausible canonical shape
        ll_sym = np.zeros((u_pad, IT._MAX_LL), np.int32)
        d_sym = np.zeros((u_pad, IT._MAX_D), np.int32)
        lane_bit = jnp.asarray(
            rngw.integers(0, nw * 16, lanes, dtype=np.int32)
        )
        lane_out = jnp.asarray(
            rngw.integers(0, n_out_pad // 2, lanes, dtype=np.int32)
        )
        lane_uid = jnp.zeros((lanes,), jnp.int32)
        lane_valid = jnp.ones((lanes,), bool)
        prefix = jnp.zeros((IT._W,), jnp.uint8)
        si = jnp.zeros((1,), jnp.int32)
        sv = jnp.zeros((1,), jnp.uint8)

        wc = jax.jit(
            functools.partial(
                IT._walk_core, n_out_pad=n_out_pad, n_stored=0,
                t_steps=t_steps, defer=defer,
            ),
            static_argnames=(),
        )

        def f():
            lv, sm, da = wc(
                words, jnp.asarray(z16), jnp.asarray(cnt),
                jnp.asarray(z16), jnp.asarray(ll_sym),
                jnp.asarray(z16), jnp.asarray(cnt), jnp.asarray(z16),
                jnp.asarray(d_sym), lane_bit, lane_out, lane_uid,
                lane_valid, prefix, si, sv,
            )
            return lv[::4096]

        try:
            ms = timeit(lambda: f())
            print(json.dumps({
                "cell": name, "ms": round(ms, 1),
                "us_per_step": round(ms * 1000 / t_steps, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"cell": name, "error": repr(e)[:200]}),
                  flush=True)

    if want("walk1026x4096"):
        walk_cell("walk t=1026 lanes=4096 defer", 1026, 4096, True)
    if want("walk258x16384"):
        walk_cell("walk t=258 lanes=16384 defer", 258, 16384, True)
    if want("walk258x4096"):
        walk_cell("walk t=258 lanes=4096 defer", 258, 4096, True)
    if want("walk1026x4096d0"):
        walk_cell("walk t=1026 lanes=4096 nodefer", 1026, 4096, False)

    if want("luts"):
        from zzflate_tpu.models import inflate_tpu as IT

        u_pad = 64
        rngl = np.random.default_rng(9)
        first = jnp.asarray(
            rngl.integers(0, 1 << 14, (u_pad, 16)).astype(np.int32)
        )
        cntl = jnp.asarray(
            rngl.integers(0, 40, (u_pad, 16)).astype(np.int32)
        )
        offl = jnp.asarray(
            rngl.integers(0, 200, (u_pad, 16)).astype(np.int32)
        )
        symt = jnp.asarray(
            rngl.integers(0, 285, (u_pad, IT._MAX_LL)).astype(np.int32)
        )

        @jax.jit
        def fluts(f, c, o, s):
            lut = IT._build_luts(
                f, c, o, s, jnp.asarray(IT._ll_attr()), IT._MAX_LL, 10
            )
            return lut[:, ::4096]

        try:
            ms = timeit(fluts, first, cntl, offl, symt)
            print(json.dumps({
                "cell": "build_luts u=64 ll", "ms": round(ms, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"cell": "luts", "error": repr(e)[:200]}),
                  flush=True)

    if want("resolve"):
        from zzflate_tpu.models import inflate_tpu as IT

        rngr = np.random.default_rng(5)
        n_out_pad = 1 << 22
        litval0 = jnp.asarray(
            rngr.integers(0, 256, n_out_pad, dtype=np.int32)
        )
        sm0 = jnp.asarray(np.arange(n_out_pad, dtype=np.int32))
        da0 = jnp.asarray(
            np.where(rngr.random(n_out_pad) < 0.1,
                     rngr.integers(1, 32768, n_out_pad), 0
                     ).astype(np.int32)
        )

        @jax.jit
        def fres(lv, sm, da):
            return IT._resolve_lz(lv, sm, da, 1 << 22)[::4096]

        try:
            ms = timeit(fres, litval0, sm0, da0)
            print(json.dumps({
                "cell": "resolve_lz n=4M", "ms": round(ms, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"cell": "resolve", "error": repr(e)[:200]}),
                  flush=True)

    if want("prop"):
        from zzflate_tpu.ops import pallas_kernels as PK

        pk0 = jnp.asarray(
            np.where(ml0 > 0, (ml0 << 15) | (32768 - md0), 0
                     ).astype(np.int32)
        )

        @jax.jit
        def fprop(pk):
            return jnp.sum(jax.vmap(PK.propagate_matches)(pk)[:, ::256])

        try:
            ms = timeit(fprop, pk0)
            emit("propagate_pallas 16x294912", ms, B * N / (1 << 20))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"cell": "prop", "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
