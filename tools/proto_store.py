"""Which dynamic-store forms does Mosaic accept, and how fast are they?

Tests, inside a scalar while-loop: (a) (1,)-vector dynamic store to a 1D
VMEM ref; (b) dynamic lane store to a 2D VMEM ref; (c) scalar store to
SMEM scratch.

MEASURED CONCLUSION (2026-08-17, real chip): 2D dynamic stores work at
~550 ns/iter marginal (after subtracting the ~25 ms dispatch floor);
SMEM stores are the same; 1D dynamic stores and scalar VMEM loads CRASH
the remote compiler. At 550 ns/iter a token-serial Pallas walk costs
seconds per MiB — sequential walk-kernels were REJECTED for both the
encode parse and the decode walk on this platform (the XLA lane-
parallel formulations in ops/matcher.py and models/inflate_tpu.py are
the production paths).
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 294912
ITERS = 30000


def run(name, fn, *args):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        r = np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"{name}: compile+run {time.perf_counter()-t0:.2f}s "
              f"sum={r.ravel()[:4]}")
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1000:.1f} ms for {ITERS} dynamic stores "
              f"({best/ITERS*1e9:.0f} ns/store)")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


# (a) 1-element dynamic-slice store into 1D VMEM
def kern_a(step_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    step = step_ref[0]

    def body(k, i):
        out_ref[pl.ds(i, 1)] = jnp.full((1,), k, jnp.int32)
        return i + step

    lax.fori_loop(0, ITERS, body, 0)


@jax.jit
def f_a(step):
    return pl.pallas_call(
        kern_a,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(step)


# (b) dynamic row store into 2D VMEM (128-wide rows)
def kern_b(step_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    step = step_ref[0]

    def body(k, i):
        out_ref[i, pl.ds(0, 1)] = jnp.full((1,), k, jnp.int32)
        return i + step

    lax.fori_loop(0, ITERS, body, 0)


@jax.jit
def f_b(step):
    return pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(step)


# (c) scalar store to SMEM scratch, bulk-copied out at the end
def kern_c(step_ref, out_ref, smem):
    step = step_ref[0]

    def body(k, i):
        smem[i % 4096] = k
        return i + step

    lax.fori_loop(0, ITERS, body, 0)
    out_ref[:] = jnp.zeros_like(out_ref)


@jax.jit
def f_c(step):
    return pl.pallas_call(
        kern_c,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((4096,), jnp.int32)],
    )(step)


# (d) dynamic scalar LOAD speed from VMEM (the other half of the walk)
def kern_d(step_ref, src_ref, out_ref):
    step = step_ref[0]

    def body(k, acc):
        i, s = acc
        v = src_ref[i]
        return (i + step + (v & 0), s + v)

    _, s = lax.fori_loop(0, ITERS, body, (0, 0))
    out_ref[0] = s


@jax.jit
def f_d(step, src):
    return pl.pallas_call(
        kern_d,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(step, src)


if __name__ == "__main__":
    step = jnp.full((1,), 7, jnp.int32)
    src = jnp.arange(N, dtype=jnp.int32)
    run("a_1d_ds_store", f_a, step)
    run("b_2d_row_store", f_b, step)
    run("c_smem_store", f_c, step)
    run("d_vmem_scalar_load", f_d, step, src)
