"""Pallas TPU kernels for the hot fused passes.

The matcher's candidate scan is a K-neighbor stencil over two arrays
(adjacent-LCP mins + sort-payload positions). In pure XLA every shifted
view materializes a full HBM pass (~400 passes for K=16 both ways); this
kernel keeps a VMEM tile resident and runs the whole K-loop on the VPU,
reading each input element once.

Layout: 1-D arrays are viewed as (rows, 128) lanes. A flat shift by
s < 128 decomposes into a lane roll plus a select against the
neighboring row, so each block also receives the row-shifted copies of
its inputs (built by the caller with cheap slices of a padded array —
no overlapping block reads needed):

    back_s[r, l] = a[r, l-s]          if l >= s else  prev[r, 128+l-s]
    fwd_s [r, l] = a[r, l+s]          if l+s < 128 else next[r, l+s-128]

Runs compiled on TPU; interpret mode (pure Python) on CPU so the same
code path is exercised by the CPU test mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zzflate_tpu.constants import WINDOW_SIZE

_LANES = 128
_TR = 32  # rows per program: 6 inputs * 32*128*4B = 96 KiB VMEM
_PAD_POS = -(1 << 30)


def _scan_kernel(ws_ref, adj, adj_p, adj_n, pos, pos_p, pos_n,
                 out_len, out_dist, *, k_each, lcp_cap, backward_only):
    a = adj[:]
    ap = adj_p[:]
    an = adj_n[:]
    p0 = pos[:]
    pp = pos_p[:]
    pn = pos_n[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    wstart = ws_ref[0, 0]

    def back(x, xp, s):
        if s == 0:
            return x
        return jnp.where(lane >= s, pltpu.roll(x, s, 1), pltpu.roll(xp, s, 1))

    def fwd(x, xn, s):
        # left-roll by s == right-roll by LANES - s (pltpu.roll needs >= 0)
        return jnp.where(
            lane < _LANES - s,
            pltpu.roll(x, _LANES - s, 1),
            pltpu.roll(xn, _LANES - s, 1),
        )

    s_len = jnp.zeros_like(a)
    s_dist = jnp.zeros_like(a)
    back_min = jnp.full_like(a, lcp_cap)
    fwd_min = jnp.full_like(a, lcp_cap)

    def consider(s_len, s_dist, ln_ok, dist, ok):
        ln = jnp.where(ok, ln_ok, 0)
        better = ((ln > s_len) | ((ln == s_len) & (ln > 0) & (dist < s_dist)))
        better = better & ok
        return (
            jnp.where(better, ln, s_len),
            jnp.where(better, dist, s_dist),
        )

    for k in range(1, k_each + 1):
        back_min = jnp.minimum(back_min, back(a, ap, k - 1))
        cpos = back(p0, pp, k)
        dist = p0 - cpos
        ok = (dist >= 1) & (dist <= WINDOW_SIZE) & (cpos >= wstart)
        s_len, s_dist = consider(s_len, s_dist, back_min, dist, ok)

        if backward_only:
            continue
        fwd_min = jnp.minimum(fwd_min, fwd(a, an, k))
        cpos = fwd(p0, pn, k)
        dist = p0 - cpos
        ok = (dist >= 1) & (dist <= WINDOW_SIZE) & (cpos >= wstart)
        s_len, s_dist = consider(s_len, s_dist, fwd_min, dist, ok)

    out_len[:] = s_len
    out_dist[:] = s_dist


@functools.partial(
    jax.jit,
    static_argnames=("k_each", "lcp_cap", "backward_only", "interpret"),
)
def scan_candidates(
    adj: jax.Array,
    spos: jax.Array,
    window_start: jax.Array,
    k_each: int,
    lcp_cap: int = 16,
    backward_only: bool = False,
    interpret: bool = False,
):
    """Fused K-neighbor candidate scan (sort space).

    adj: (n,) adjacent-LCP values; spos: (n,) positions in sort order.
    Returns (s_len, s_dist) per sorted element — identical semantics to
    the XLA roll-loop in ops/matcher.scan_order.
    """
    n = adj.shape[0]
    tile = _TR * _LANES
    n_pad = -(-n // tile) * tile
    rows = n_pad // _LANES

    def prep(x, fill):
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        x2 = x.reshape(rows, _LANES)
        pad_row = jnp.full((1, _LANES), fill, x.dtype)
        xp = jnp.concatenate([pad_row, x2[:-1]], axis=0)
        xn = jnp.concatenate([x2[1:], pad_row], axis=0)
        return x2, xp, xn

    a2, ap, an = prep(adj, 0)
    p2, pp, pn = prep(spos, _PAD_POS)
    ws = window_start.astype(jnp.int32).reshape(1, 1)

    grid = rows // _TR
    bs = pl.BlockSpec((_TR, _LANES), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _scan_kernel, k_each=k_each, lcp_cap=lcp_cap,
            backward_only=backward_only,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            bs, bs, bs, bs, bs, bs,
        ],
        out_specs=(bs, bs),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ),
        interpret=interpret,
    )(ws, a2, ap, an, p2, pp, pn)
    return out[0].reshape(-1)[:n], out[1].reshape(-1)[:n]
