"""Pallas candidate-scan kernel vs the XLA roll loop (bit-exact), in
interpret mode on the CPU test mesh (compiled path runs on real TPUs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zzflate_tpu.constants import WINDOW_SIZE
from zzflate_tpu.ops import pallas_kernels as pk


def _xla_reference(adj, spos, window_start, k_each, backward_only):
    n = adj.shape[0]
    srank = jnp.arange(n, dtype=jnp.int32)
    s_len = jnp.zeros((n,), jnp.int32)
    s_dist = jnp.zeros((n,), jnp.int32)

    def consider(s_len, s_dist, ln_ok, dist, ok):
        ln = jnp.where(ok, ln_ok, 0)
        better = (ln > s_len) | ((ln == s_len) & (ln > 0) & (dist < s_dist))
        better = better & ok
        return jnp.where(better, ln, s_len), jnp.where(better, dist, s_dist)

    back_min = jnp.full((n,), 16, jnp.int32)
    fwd_min = jnp.full((n,), 16, jnp.int32)
    for k in range(1, k_each + 1):
        back_min = jnp.minimum(back_min, jnp.roll(adj, k - 1))
        cpos = jnp.roll(spos, k)
        dist = spos - cpos
        ok = ((srank >= k) & (dist >= 1) & (dist <= WINDOW_SIZE)
              & (cpos >= window_start))
        s_len, s_dist = consider(s_len, s_dist, back_min, dist, ok)
        if backward_only:
            continue
        fwd_min = jnp.minimum(fwd_min, jnp.roll(adj, -k))
        cpos = jnp.roll(spos, -k)
        dist = spos - cpos
        ok = ((srank < n - k) & (dist >= 1) & (dist <= WINDOW_SIZE)
              & (cpos >= window_start))
        s_len, s_dist = consider(s_len, s_dist, fwd_min, dist, ok)
    return np.asarray(s_len), np.asarray(s_dist)


@pytest.mark.parametrize("backward_only", [False, True])
@pytest.mark.parametrize("k_each", [1, 8, 16])
def test_scan_matches_xla(k_each, backward_only):
    rng = np.random.default_rng(k_each + int(backward_only))
    n = 1000  # non-multiple of the tile => exercises padding
    adj = jnp.asarray(rng.integers(0, 17, size=n), jnp.int32)
    spos = jnp.asarray(rng.permutation(n), jnp.int32)
    ws = jnp.int32(37)
    got_l, got_d = pk.scan_candidates(
        adj, spos, ws, k_each, backward_only=backward_only, interpret=True
    )
    exp_l, exp_d = _xla_reference(adj, spos, ws, k_each, backward_only)
    assert (np.asarray(got_l) == exp_l).all()
    assert (np.asarray(got_d) == exp_d).all()


def test_scan_window_edges():
    # Positions straddling the 32 KiB window limit.
    n = 512
    adj = jnp.full((n,), 16, jnp.int32)
    spos = jnp.asarray(
        np.concatenate([[0], np.arange(WINDOW_SIZE, WINDOW_SIZE + n - 1)]),
        jnp.int32,
    )
    got_l, got_d = pk.scan_candidates(
        adj, spos, jnp.int32(0), 4, interpret=True
    )
    exp_l, exp_d = _xla_reference(adj, spos, jnp.int32(0), 4, False)
    assert (np.asarray(got_l) == exp_l).all()
    assert (np.asarray(got_d) == exp_d).all()


@pytest.mark.parametrize("lazy", [False, True])
def test_parse_rows_matches_xla(lazy):
    """Fused Pallas row-sweep parse (P1+P2+P3 in one kernel, interpret
    mode here) is bit-identical to matcher.parse_commit_batch's XLA
    sweeps — greedy and lazy, npad != n, nonzero starts."""
    import zzflate_tpu.ops.matcher as M

    rng = np.random.default_rng(7)
    B, N = 2, 2048 + 123
    mlen = np.where(
        rng.random((B, N)) < 0.3, rng.integers(3, 259, (B, N)), 0
    ).astype(np.int32)
    mdist = np.where(mlen > 0, rng.integers(1, 1000, (B, N)), 0).astype(
        np.int32
    )
    starts = np.array([700, 0], np.int32)
    vends = np.array([N - 9, N], np.int32)
    args = (
        jnp.asarray(mlen), jnp.asarray(mdist),
        jnp.asarray(starts), jnp.asarray(vends), lazy,
    )
    prev = M._PALLAS_PARSE
    try:
        M._PALLAS_PARSE = ""
        jax.clear_caches()
        c1, t1 = M.parse_commit_batch(*args)
        c1, t1 = np.asarray(c1), np.asarray(t1)
        M._PALLAS_PARSE = "i"
        jax.clear_caches()
        c2, t2 = M.parse_commit_batch(*args)
        assert np.array_equal(c1, np.asarray(c2))
        assert np.array_equal(t1, np.asarray(t2))
        assert c1.sum() > 0
    finally:
        M._PALLAS_PARSE = prev
        jax.clear_caches()


def _xla_propagate(pk_arr):
    from zzflate_tpu.constants import MAX_MATCH

    n = pk_arr.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    out = pk_arr
    shift = 1
    while shift < MAX_MATCH:
        cand = jnp.roll(out, shift) - (shift << 15)
        cand = jnp.where((pos >= shift) & (cand >= (3 << 15)), cand, 0)
        out = jnp.maximum(out, cand)
        shift *= 2
    return np.asarray(out)


@pytest.mark.parametrize("n", [1000, 4096, 12345])
def test_propagate_matches_xla(n):
    rng = np.random.default_rng(n)
    mlen = rng.integers(3, 259, size=n).astype(np.int32)
    mlen = np.where(rng.random(n) < 0.6, 0, mlen)
    mdist = rng.integers(1, 32769, size=n).astype(np.int32)
    packed = jnp.asarray(
        np.where(mlen > 0, (mlen << 15) | (WINDOW_SIZE - mdist), 0),
        jnp.int32,
    )
    got = np.asarray(pk.propagate_matches(packed, interpret=True))
    exp = _xla_propagate(packed)
    assert (got == exp).all()
