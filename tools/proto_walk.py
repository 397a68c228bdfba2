"""Prototype: sequential parse-walk as a Pallas kernel (the critical
unknown for the round-2 encode redesign). Measures a scalar while-loop
with dynamic VMEM loads/stores on the real chip.

The walk: from `start`, at position i take the match (jump mlen[i],
extending it in-kernel by comparing bytes) when take[i], else jump to the
next take position nm[i]. Marks committed matches and their extended
lengths. Iterations ~= committed matches (literal runs are skipped via
nm), worst-case (end-start)/3.

MEASURED CONCLUSION (2026-08-17, real chip): rejected — the scalar-loop
body costs ~550 ns/iter (proto_store.py), so the walk cannot beat the
lane-parallel row-sweep parse (ops/matcher.parse_commit_batch).
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_MATCH = 258


def walk_kernel(data_ref, take_ref, mlen_ref, mdist_ref, nm_ref, lim_ref,
                len_out_ref):
    n = len_out_ref.shape[0]
    len_out_ref[:] = jnp.zeros((n,), jnp.int32)
    start = lim_ref[0]
    end = lim_ref[1]

    def cond(state):
        i = state
        return i < end

    def body(state):
        i = state

        def take_match(i):
            d = mdist_ref[i]
            l0 = mlen_ref[i]

            # Extend: while data[i+l] == data[i-d+l] and l < cap.
            cap = jnp.minimum(MAX_MATCH, end - i)

            def ext_cond(l):
                return (l < cap) & (data_ref[i + l] == data_ref[i - d + l])

            def ext_body(l):
                return l + 1

            l = lax.while_loop(ext_cond, ext_body, l0)
            len_out_ref[i] = l
            return i + l

        def take_literal(i):
            # jump over the literal run to the next match candidate
            return nm_ref[i]

        return lax.cond(take_ref[i] != 0, take_match, take_literal, i)

    lax.while_loop(cond, body, start)


@jax.jit
def walk(data, take, mlen, mdist, nm, lims):
    n = data.shape[0]
    return pl.pallas_call(
        walk_kernel,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(data, take, mlen, mdist, nm, lims)


def reference_walk(data, take, mlen, mdist, nm, start, end):
    len_out = np.zeros(data.shape[0], np.int32)
    i = start
    while i < end:
        if take[i]:
            d = int(mdist[i])
            l = int(mlen[i])
            cap = min(MAX_MATCH, end - i)
            while l < cap and data[i + l] == data[i - d + l]:
                l += 1
            len_out[i] = l
            i += l
        else:
            i = int(nm[i])
    return len_out


def main():
    n = 294912
    start, end = 32768, n
    rng = np.random.default_rng(0)
    raw = open("/usr/include/zlib.h", "rb").read() * 40
    data = np.frombuffer(raw[:n], np.uint8).astype(np.int32)

    # Synthesize plausible matcher outputs: ~40% of positions have a
    # capped-at-8 match with some distance.
    take = (rng.random(n) < 0.4).astype(np.int32)
    mlen = np.where(take, rng.integers(3, 9, n), 0).astype(np.int32)
    mdist = np.where(
        take, np.minimum(rng.integers(1, 4096, n), np.arange(n) + 1), 1
    ).astype(np.int32)
    take = np.where(mdist <= np.arange(n), take, 0)
    # nm: next take position >= i (else n)
    nm = np.full(n, n, np.int32)
    nxt = n
    for i in range(n - 1, -1, -1):
        if take[i]:
            nxt = i
        nm[i] = nxt
    lims = np.array([start, end], np.int32)

    args = [jnp.asarray(x) for x in (data, take, mlen, mdist, nm, lims)]
    t0 = time.perf_counter()
    out = walk(*args)
    got = np.asarray(out)
    print(f"compile+run: {time.perf_counter()-t0:.2f}s")

    for _ in range(3):
        t0 = time.perf_counter()
        got = np.asarray(walk(*args))
        print(f"run: {(time.perf_counter()-t0)*1000:.1f} ms")

    ref = reference_walk(data, take, mlen, mdist, nm, start, end)
    print("match:", np.array_equal(got, ref),
          "tokens:", int((ref > 0).sum()))

    # Worst case: no matches at all -> nm jumps straight to end (cheap),
    # and all-match-len-3 -> (end-start)/3 iterations.
    take3 = np.ones(n, np.int32)
    mlen3 = np.full(n, 3, np.int32)
    mdist3 = np.ones(n, np.int32)
    nm3 = np.arange(n, dtype=np.int32)
    args3 = [jnp.asarray(x) for x in (data, take3, mlen3, mdist3, nm3, lims)]
    got3 = np.asarray(walk(*args3))  # warm same shape; no recompile
    t0 = time.perf_counter()
    got3 = np.asarray(walk(*args3))
    print(f"worst-case len-3 run: {(time.perf_counter()-t0)*1000:.1f} ms, "
          f"tokens {int((got3 > 0).sum())}")


if __name__ == "__main__":
    main()
