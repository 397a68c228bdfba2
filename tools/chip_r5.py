"""Round-5 decisive chip probes, one small graph per cell (chip_probe
pattern: print incrementally, order decisive-first, run under timeout).

Cells:
  1. parse2_compile — does the rewritten Pallas row-sweep parse
     (pallas_kernels.parse_rows, register-window marching) COMPILE and
     run on the real chip (the round-4 verdict's Mosaic blocker), and is
     it bit-identical to the XLA sweeps at production shapes?
  2. parse_xla_time / parse2_time — the A/B the rewrite exists for
     (XLA sweeps measured ~170 ms per 4 MiB batch in round 4).
  3. emit_compact_ab — emit_chunks_batch at token width vs full width
     on one analyzed batch (modeled ~90-120 ms/4 MiB saving).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def emit(cell, **kw):
    print(json.dumps({"cell": cell, **kw}), flush=True)


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def main():
    from zzflate_tpu.config import LEVELS
    from zzflate_tpu.models import deflate_encoder as DE
    from zzflate_tpu.ops import matcher as M
    from zzflate_tpu.ops import pallas_kernels as pk

    B, CH = 16, 1 << 18
    N = 32768 + CH
    raw = (open("/usr/bin/python3.11", "rb").read() * 8)[: B * CH]
    data = np.zeros((B, N), np.uint8)
    for b in range(B):
        data[b, 32768:] = np.frombuffer(raw[b * CH : (b + 1) * CH], np.uint8)
    starts = jnp.full((B,), 32768, jnp.int32)
    vends = jnp.full((B,), N, jnp.int32)
    wstarts = jnp.full((B,), 32768, jnp.int32)
    dataj = jnp.asarray(data)

    # Synthetic but realistic step arrays for the parse cells (from a
    # cheap host model, so the parse cell doesn't need the matcher).
    rng = np.random.default_rng(1)
    mlen = np.where(
        rng.random((B, N)) < 0.25, rng.integers(3, 259, (B, N)), 0
    ).astype(np.int32)
    mdist = np.where(mlen > 0, rng.integers(1, 32769, (B, N)), 0).astype(
        np.int32
    )

    # --- Cell 1+2: parse kernel compile + A/B.
    t0 = time.time()
    try:
        args = (
            jnp.asarray(mlen), jnp.asarray(mdist), starts, vends, True,
        )
        M._PALLAS_PARSE = ""
        jax.clear_caches()
        c1, t1 = M.parse_commit_batch(*args)
        c1n = np.asarray(c1)
        best = 9e9
        for _ in range(3):
            t0b = time.perf_counter()
            c1, _t = M.parse_commit_batch(*args)
            _ = np.asarray(c1)[0, 0]
            best = min(best, time.perf_counter() - t0b)
        emit("parse_xla_time", ms=round(best * 1000, 1))

        M._PALLAS_PARSE = "1"
        jax.clear_caches()
        tc = time.time()
        c2, t2 = M.parse_commit_batch(*args)
        c2n = np.asarray(c2)
        emit(
            "parse2_compile", ok=True,
            compile_s=round(time.time() - tc, 1),
            identical=bool(np.array_equal(c1n, c2n)),
        )
        best = 9e9
        for _ in range(3):
            t0b = time.perf_counter()
            c2, _t = M.parse_commit_batch(*args)
            _ = np.asarray(c2)[0, 0]
            best = min(best, time.perf_counter() - t0b)
        emit("parse2_time", ms=round(best * 1000, 1))
    except Exception as e:
        emit("parse2_compile", ok=False, error=repr(e)[:300])
    finally:
        M._PALLAS_PARSE = ""
        jax.clear_caches()

    # --- Cell 3: emit compact vs full on one analyzed batch.
    try:
        params = LEVELS[6]
        ana = DE.analyze_chunks_batch(
            dataj, starts, vends, wstarts, params
        )
        _ = np.asarray(ana["freqs"]).sum()
        from zzflate_tpu.ops import huffman_host

        freqs = np.asarray(ana["freqs"])
        plans = [
            huffman_host.build_chunk_plan(
                freqs[j][..., :288], freqs[j][..., 288:], bfinal=0
            )
            for j in range(B)
        ]

        def stack(key, dtype):
            return jnp.asarray(
                np.stack([p[key] for p in plans]).astype(dtype)
            )

        targs = (
            stack("ll_len", np.int32), stack("ll_code", np.uint32),
            stack("d_len", np.int32), stack("d_code", np.uint32),
            stack("hdr_vals", np.uint32), stack("hdr_nbits", np.int32),
            stack("eob_v", np.uint32), stack("eob_nb", np.int32),
        )
        ow = DE.output_words_bound(CH)
        sub = {
            k: ana[k]
            for k in (
                "committed", "is_match", "litlen_sym", "lcode", "dcode",
                "mlen", "mdist",
            )
        }
        for cell, slots in (
            ("emit_full", 0),
            ("emit_compact", DE.token_budget(CH)),
        ):
            res = DE.emit_chunks_batch(
                sub, ow, *targs, compact=True, token_slots=slots
            )
            meta0 = np.asarray(res["meta"])
            best = 9e9
            for _ in range(3):
                t0b = time.perf_counter()
                res = DE.emit_chunks_batch(
                    sub, ow, *targs, compact=True, token_slots=slots
                )
                _ = np.asarray(res["meta"])[0, 0]
                best = min(best, time.perf_counter() - t0b)
            emit(cell, ms=round(best * 1000, 1),
                 nbits0=int(meta0[0, 0]))
    except Exception as e:
        emit("emit_ab", ok=False, error=repr(e)[:300])


if __name__ == "__main__":
    main()
