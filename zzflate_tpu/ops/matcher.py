"""LZ77 match finding and parse commit, designed TPU-first.

The reference-class codec walks per-position hash chains and extends
matches with a sequential memcmp loop (SURVEY.md C5-C7, the dominant ~70%
of encode cycles). Neither maps to a vector machine, so this module
replaces them wholesale:

- **Candidate lookup** — instead of hash-table insert/lookup, stable-sort
  all positions by their exact 3-byte prefix key. The K entries preceding a
  position inside its key group ARE its K most recent prior occurrences
  (exactly hash-chain order, but with zero collisions and produced by one
  parallel sort).
- **Match scoring** — every position scores its K candidates at once with
  16-byte vectorized compares, then only the winning candidate is extended
  to the 258 limit in 16-byte strides (overlapping matches work because
  comparing raw input bytes is self-consistent for dist < len).
- **Commit (greedy/lazy parse)** — the classically sequential "which
  positions emit tokens" decision becomes *pointer doubling*: each position
  p precomputes its successor next[p] = p + (commit ? len : 1) from purely
  local data (the lazy one-byte-defer rule only consults len[p+1]), and the
  committed set = the orbit of the first position under next[], found in
  ceil(log2 N) gather+scatter rounds instead of an N-step scan.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zzflate_tpu.constants import MAX_MATCH, MIN_MATCH, WINDOW_SIZE

_PRE = 16  # phase-1 compare width (bytes)
_EXT_STEPS = 16  # extension strides of _PRE bytes: 16+16*16=272 >= 258
_TOO_FAR = 4096  # reject len-3 matches farther than this (zlib heuristic)


def _gather(data: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take(data, idx, mode="clip")


def _run_length(eq: jax.Array) -> jax.Array:
    """Length of the leading True run along the last axis."""
    return jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=-1), axis=-1)


@functools.partial(jax.jit, static_argnames=("candidates",))
def find_matches(
    data: jax.Array,
    valid_end: jax.Array,
    window_start: jax.Array,
    candidates: int,
):
    """Best match per position.

    Args:
      data: (N,) uint8, zero-padded beyond valid_end.
      valid_end: scalar int32; bytes at [0, valid_end) are real.
      window_start: scalar int32; match sources must be >= this (bytes
        before it are padding, not part of the decoder's window).
      candidates: static K, number of most-recent prior occurrences scored.

    Returns:
      (mlen, mdist): int32 (N,) arrays; mlen is 0 or in [3, 258].
    """
    n = data.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    d32 = data.astype(jnp.int32)

    b0 = d32
    b1 = _gather(d32, pos + 1)
    b2 = _gather(d32, pos + 2)
    key = (b0 << 16) | (b1 << 8) | b2

    # Stable sort groups equal keys with positions ascending; the k-th
    # previous element in a group is the k-th most recent occurrence.
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(pos)

    fwd = _gather(data, pos[:, None] + jnp.arange(_PRE)[None, :])
    in_bounds = (pos[:, None] + jnp.arange(_PRE)[None, :]) < valid_end

    best_len = jnp.zeros((n,), jnp.int32)
    best_dist = jnp.zeros((n,), jnp.int32)
    best_cand = jnp.zeros((n,), jnp.int32)
    for k in range(candidates):
        cand_rank = rank - 1 - k
        cand = _gather(order, jnp.maximum(cand_rank, 0))
        dist = pos - cand
        ok = (
            (cand_rank >= 0)
            & (_gather(key, cand) == key)
            & (dist >= 1)
            & (dist <= WINDOW_SIZE)
            & (cand >= window_start)
        )
        back = _gather(data, cand[:, None] + jnp.arange(_PRE)[None, :])
        eq = (fwd == back) & in_bounds
        ln = jnp.where(ok, _run_length(eq), 0)
        better = (ln > best_len) | ((ln == best_len) & (ln > 0) & (dist < best_dist))
        best_len = jnp.where(better, ln, best_len)
        best_dist = jnp.where(better, dist, best_dist)
        best_cand = jnp.where(better, cand, best_cand)

    # Extend the winning candidate in _PRE-byte strides while fully equal.
    mlen = best_len
    alive = best_len == _PRE
    for t in range(1, _EXT_STEPS + 1):
        off = t * _PRE
        fidx = pos[:, None] + off + jnp.arange(_PRE)[None, :]
        bidx = best_cand[:, None] + off + jnp.arange(_PRE)[None, :]
        eq = (_gather(data, fidx) == _gather(data, bidx)) & (fidx < valid_end)
        run = _run_length(eq)
        mlen = jnp.where(alive, mlen + run, mlen)
        alive = alive & (run == _PRE)

    mlen = jnp.minimum(mlen, jnp.minimum(MAX_MATCH, valid_end - pos))
    mlen = jnp.where(
        (mlen >= MIN_MATCH)
        & ~((mlen == MIN_MATCH) & (best_dist > _TOO_FAR)),
        mlen,
        0,
    )
    mdist = jnp.where(mlen > 0, best_dist, 0)
    return mlen, mdist


@functools.partial(jax.jit, static_argnames=("lazy",))
def parse_commit(
    mlen: jax.Array,
    mdist: jax.Array,
    start: jax.Array,
    valid_end: jax.Array,
    lazy: bool,
    max_lazy: int | jax.Array = 258,
    nice: int | jax.Array = 258,
):
    """Greedy or lazy parse via pointer doubling.

    Returns (committed, take): committed[p] marks token-emitting positions;
    take[p] says whether the token at p is the match (else a literal).
    """
    n = mlen.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    has = mlen >= MIN_MATCH
    if lazy:
        next_len = jnp.concatenate([mlen[1:], jnp.zeros((1,), mlen.dtype)])
        defer = has & (mlen < max_lazy) & (next_len > mlen) & (mlen < nice)
        take = has & ~defer
    else:
        take = has
    step = jnp.where(take, mlen, 1)

    sink = jnp.int32(n)
    g = jnp.minimum(pos + step, sink)
    g = jnp.where(pos >= valid_end, sink, g)
    g = jnp.concatenate([g, sink[None]])  # g[n] = n (fixed point)

    reach = jnp.zeros((n + 1,), jnp.int32).at[start].set(1)
    iters = max(1, (n).bit_length())
    for _ in range(iters):
        hopped = jnp.zeros((n + 1,), jnp.int32).at[g].max(reach)
        reach = jnp.maximum(reach, hopped)
        g = g[g]

    committed = (reach[:n] == 1) & (pos >= start) & (pos < valid_end)
    return committed, take & committed
