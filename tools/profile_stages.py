"""Production-graph stage timing on the real chip (forced tiny fetch).

Times the ACTUAL pipeline graphs at production shapes (default 16 x
(32K halo + 256K chunk)) rather than synthetic ops. Each timing target
is a jit that ends in a small reduction over real outputs (so nothing
is dead-code-eliminated) and is timed by fetching that scalar.

Variants that depend on import-time env knobs (ZZFLATE_NO_ORDER_A,
ZZFLATE_PROP, ...) must run in separate processes; this script times one
configuration per invocation and prints a JSON line.

Usage: python tools/profile_stages.py [--bsz 16] [--chunk 262144]
       [stages...: matcher parse hist analyze emit fetch]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

WIN = 32768


def timeit(fn, *args, reps=3):
    out = fn(*args)  # compile + warm
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bsz", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=262144)
    ap.add_argument("--level", type=int, default=6)
    ap.add_argument("stages", nargs="*")
    args = ap.parse_args()
    bsz, chunk = args.bsz, args.chunk
    n = WIN + chunk

    from zzflate_tpu.config import LEVELS
    from zzflate_tpu.models import deflate_encoder as de
    from zzflate_tpu.ops import matcher

    params = LEVELS[args.level]

    raw = (open("/usr/include/zlib.h", "rb").read() * 200)[: bsz * chunk]
    data = np.zeros((bsz, n), np.uint8)
    for i in range(bsz):
        data[i, WIN:] = np.frombuffer(
            raw[i * chunk : (i + 1) * chunk], np.uint8
        )
        if i:
            data[i, :WIN] = np.frombuffer(
                raw[i * chunk - WIN : i * chunk], np.uint8
            )
    data = jnp.asarray(data)
    starts = jnp.full((bsz,), WIN, jnp.int32)
    vends = jnp.full((bsz,), n, jnp.int32)
    wstarts = jnp.concatenate(
        [jnp.full((1,), WIN, jnp.int32), jnp.zeros((bsz - 1,), jnp.int32)]
    )

    results = {}

    def bench(name, fn, *a):
        if args.stages and name not in args.stages:
            return
        try:
            ms = timeit(fn, *a)
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERR {type(e).__name__}: {e}"[:150]
            print(f"{name}: {results[name]}", file=sys.stderr)
            return
        results[name] = round(ms, 1)
        print(f"{name}: {ms:.1f} ms", file=sys.stderr)

    # floor: dispatch+tiny-fetch latency
    @jax.jit
    def _floor(d):
        return jnp.sum(d[:, 0].astype(jnp.int32))

    bench("floor", _floor, data)

    @jax.jit
    def _matcher(d, ve, ws):
        ml, md = jax.vmap(
            lambda dd, v, w: matcher.find_matches(
                dd, v, w, params.candidates, key_words=params.key_words
            )
        )(d, ve, ws)
        return jnp.sum(ml) + jnp.sum(md)

    bench("matcher", _matcher, data, vends, wstarts)

    @jax.jit
    def _matcher_parse(d, ve, ws, st):
        ml, md = jax.vmap(
            lambda dd, v, w: matcher.find_matches(
                dd, v, w, params.candidates, key_words=params.key_words
            )
        )(d, ve, ws)
        com, take = matcher.parse_commit_batch(
            ml, md, st, ve, lazy=params.lazy_mode,
            max_lazy=params.max_lazy, nice=params.nice,
        )
        return jnp.sum(com.astype(jnp.int32)) + jnp.sum(ml)

    bench("matcher_parse", _matcher_parse, data, vends, wstarts, starts)

    @jax.jit
    def _analyze(d, st, ve, ws):
        out = de.analyze_chunks_batch(d, st, ve, ws, params)
        return jnp.sum(out["freqs"])

    bench("analyze", _analyze, data, starts, vends, wstarts)

    # Histogram stage alone on realistic inputs
    @jax.jit
    def _hist(d, st, ve, ws):
        from zzflate_tpu import constants as C
        from zzflate_tpu.ops import huffman

        sym = d.astype(jnp.int32)
        com = (d & 1) == 0
        ism = (d & 3) == 0
        dc = (d % 30).astype(jnp.int32)
        bounds = de.sub_block_bounds(n)

        def chunk_hists(sy, cm, im, dcc):
            fll = jnp.stack([
                huffman.histogram(sy[s:e], cm[s:e], C.NUM_LITLEN_SYMBOLS)
                for s, e in zip(bounds[:-1], bounds[1:])
            ])
            fd = jnp.stack([
                huffman.histogram(dcc[s:e], im[s:e], C.NUM_DIST_SYMBOLS)
                for s, e in zip(bounds[:-1], bounds[1:])
            ])
            return fll, fd

        fll, fd = jax.vmap(chunk_hists)(sym, com, ism, dc)
        return jnp.sum(fll) + jnp.sum(fd)

    bench("hist", _hist, data, starts, vends, wstarts)

    # Full analyze once, then emit timing on its (device-resident) outputs.
    if not args.stages or "emit" in args.stages or "fetch" in args.stages:
        ana = de.analyze_chunks_batch(data, starts, vends, wstarts, params)
        ana = {k: jax.block_until_ready(v) for k, v in ana.items()}
        from zzflate_tpu.ops import huffman_host

        freqs = np.asarray(ana["freqs"])
        plans = [
            huffman_host.build_chunk_plan(
                freqs[j, :, :288], freqs[j, :, 288:], bfinal=0
            )
            for j in range(bsz)
        ]
        ow = de.output_words_bound(chunk)

        def stack(key, dtype):
            return jnp.asarray(np.stack([p[key] for p in plans]).astype(dtype))

        targs = (
            stack("ll_len", np.int32), stack("ll_code", np.uint32),
            stack("d_len", np.int32), stack("d_code", np.uint32),
            stack("hdr_vals", np.uint32), stack("hdr_nbits", np.int32),
            stack("eob_v", np.uint32), stack("eob_nb", np.int32),
        )
        sub = {
            k: ana[k]
            for k in (
                "committed", "is_match", "litlen_sym", "lcode", "dcode",
                "mlen", "mdist",
            )
        }

        def _emit(sub, targs):
            return de.emit_chunks_batch(sub, ow, *targs, compact=True)

        bench(
            "emit",
            jax.jit(
                lambda s, t: jnp.sum(_emit(s, t)["meta"][:, 0])
            ),
            sub, targs,
        )

        # fetch: transfer cost of the compacted words (compute prepaid)
        res = _emit(sub, targs)
        res = {k: jax.block_until_ready(v) for k, v in res.items()}
        nbits = np.asarray(res["meta"][:, 0])
        used = int(((nbits + 3 + 31) // 32).sum())

        def _fetch():
            return np.asarray(res["flat_words"][:used])

        t0 = time.perf_counter()
        _fetch()
        t_first = (time.perf_counter() - t0) * 1000
        best = min(
            (lambda: (lambda t0: ((_fetch(), time.perf_counter() - t0)[1]))(
                time.perf_counter()
            ))() for _ in range(3)
        ) * 1000
        results["fetch_words_ms"] = round(best, 1)
        results["fetch_words_bytes"] = used * 4
        print(
            f"fetch_words: {best:.1f} ms ({used*4} B, first {t_first:.1f})",
            file=sys.stderr,
        )

    env = {
        k: v for k, v in os.environ.items() if k.startswith("ZZFLATE")
    }
    print(json.dumps({
        "bsz": bsz, "chunk": chunk, "level": args.level, "env": env,
        "backend": jax.default_backend(), "results": results,
    }))


if __name__ == "__main__":
    main()
