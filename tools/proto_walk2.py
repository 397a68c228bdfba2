"""Calibrate Mosaic scalar-loop cost: marginal ns/iteration for
arithmetic-only, load-only, store-only and combined bodies, at two trip
counts (to separate dispatch floor from marginal cost).

MEASURED CONCLUSION (2026-08-17, real chip): see proto_store.py —
scalar-loop bodies with dynamic memory access run ~550 ns/iter, which
rules out token-serial Pallas kernels for this codec's walks."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ROWS = 2304  # 294912/128
ITERS_A, ITERS_B = 5000, 50000


def timeit(fn, *args):
    r = np.asarray(fn(*args))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        r = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def make(body_kind, iters):
    def kern(step_ref, src_ref, out_ref):
        out_ref[0, 0] = 0
        step = step_ref[0]

        if body_kind == "arith":
            def body(k, acc):
                return (acc * 5 + k) & 0xFFFFF
            acc = lax.fori_loop(0, iters, body, 0)
        elif body_kind == "load2d":
            def body(k, acc):
                i = acc % (N_ROWS * 128)
                v = src_ref[i // 128, i % 128]
                return acc + step + (v & 1)
            acc = lax.fori_loop(0, iters, body, 0)
        elif body_kind == "load2d_ds":
            def body(k, acc):
                i = acc % (N_ROWS * 128)
                v = src_ref[i // 128, pl.ds(i % 128, 1)]
                return acc + step + (v[0] & 1)
            acc = lax.fori_loop(0, iters, body, 0)
        elif body_kind == "while_arith":
            def cond(st):
                return st[0] < iters
            def body(st):
                k, acc = st
                return (k + 1, (acc * 5 + k) & 0xFFFFF)
            _, acc = lax.while_loop(cond, body, (0, 0))
        out_ref[0, 0] = acc

    @jax.jit
    def f(step, src):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(step, src)
    return f


step = jnp.full((1,), 7, jnp.int32)
src = jnp.arange(N_ROWS * 128, dtype=jnp.int32).reshape(N_ROWS, 128)
for kind in ("arith", "while_arith", "load2d", "load2d_ds"):
    try:
        fa = make(kind, ITERS_A)
        fb = make(kind, ITERS_B)
        ta = timeit(fa, step, src)
        tb = timeit(fb, step, src)
        marg = (tb - ta) / (ITERS_B - ITERS_A) * 1e6
        print(f"{kind}: {ta:.1f}ms@{ITERS_A} {tb:.1f}ms@{ITERS_B} "
              f"-> {marg:.0f} ns/iter")
    except Exception as e:
        print(f"{kind}: FAIL {type(e).__name__}: {str(e)[:150]}")
