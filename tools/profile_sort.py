"""Sort-shape ablation on the real chip: what does lax.sort actually cost
at matcher shapes, and does operand count matter?

Variants (all vmapped over a (B, N) batch like the production matcher):
  s17   - 16 key words + pos payload, num_keys=16 (current order B @ L6+)
  s9    - 8 words + pos, num_keys=8
  s5    - 4 words + pos, num_keys=4 (current order B @ L1-5 / order A)
  s3    - 2 words + pos, num_keys=2
  s2    - 1 word + pos, num_keys=1
  s3g14 - s3 + gather the remaining 14 words post-sort (deep LCPs via
          gathers instead of carried operands)
Prints one JSON line.
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

B, N = 16, 294912
W = 16


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def main():
    raw = (open("/usr/include/zlib.h", "rb").read() * 200)[: B * N]
    d = np.frombuffer(raw, np.uint8).reshape(B, N).astype(np.uint32)
    # words[j]: (B, N) u32 big-endian 4-byte groups at byte offset 4j
    words = []
    dd = np.concatenate([d, np.zeros((B, 4 * W + 4), np.uint32)], axis=1)
    base = (
        (dd[:, 0:N + 4 * W] << 24) | (dd[:, 1:N + 4 * W + 1] << 16)
        | (dd[:, 2:N + 4 * W + 2] << 8) | dd[:, 3:N + 4 * W + 3]
    )
    for j in range(W):
        words.append(jnp.asarray(base[:, 4 * j : 4 * j + N]))
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))

    results = {}

    def bench(name, fn, *a):
        try:
            ms = timeit(fn, *a)
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERR {type(e).__name__}: {e}"[:120]
            print(f"{name}: {results[name]}", file=sys.stderr)
            return
        results[name] = round(ms, 1)
        print(f"{name}: {ms:.1f} ms", file=sys.stderr)

    @jax.jit
    def floor(p):
        return jnp.sum(p[:, 0])

    bench("floor", floor, pos)

    def mk_sort(nw):
        @jax.jit
        def f(ws, p):
            def one(ops):
                out = jax.lax.sort(ops, num_keys=nw, is_stable=True)
                return out[-1]
            sp = jax.vmap(lambda *ops: one(ops))(*ws[:nw], p)
            return jnp.sum(sp)
        return f

    for nw, name in ((16, "s17"), (8, "s9"), (4, "s5"), (2, "s3"), (1, "s2")):
        bench(name, mk_sort(nw), words, pos)

    @jax.jit
    def s3g14(ws, p):
        def one(w0, w1, pp, deep):
            o = jax.lax.sort((w0, w1, pp), num_keys=2, is_stable=True)
            spos = o[2]
            acc = o[0] ^ o[1]
            for wd in deep:
                acc = acc ^ jnp.take(wd, spos)
            return spos + (acc & 1).astype(jnp.int32)
        sp = jax.vmap(one)(ws[0], ws[1], p, ws[2:])
        return jnp.sum(sp)

    bench("s3g14", s3g14, words, pos)

    print(json.dumps({"B": B, "N": N, "results": results}))


if __name__ == "__main__":
    main()
