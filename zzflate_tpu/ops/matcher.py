"""LZ77 match finding and parse commit, designed TPU-first.

The reference-class codec walks per-position hash chains and extends
matches with a sequential memcmp loop (SURVEY.md C5-C7, the dominant ~70%
of encode cycles). Neither maps to a vector machine. Profiling on the
target chip showed the one expensive primitive is the random gather
(~200M elements/s) while sorts, rolls and elementwise passes are fast, so
this matcher is built almost entirely from sorts and rolls:

- **Candidate lookup = suffix sort.** lexsort all positions by their
  16-byte prefix (4 packed u32 words). The K elements preceding a
  position in sort order are the K lexicographically-nearest previous
  suffixes — a strictly stronger candidate set than a hash chain's
  most-recent-3-byte-prefix list for short matches. Neighbors are reached
  with rolls, not gathers.
- **Exact LCPs from adjacent compares.** The LCP between sort-neighbors
  is the running min of adjacent-element LCPs (computed once from the
  sorted key words with elementwise ops); min over a K-window needs K
  rolls.
- **Long-match extension by block ranks.** Positions whose best neighbor
  shares the full 16-byte key extend by comparing *dense ranks of 16-byte
  blocks* (rank equality <=> exact 16-byte equality — no hashing, no
  correctness risk): one (N,) gather per 16 bytes instead of sixteen.
  A final sub-block LCP tops up the tail.
- **Commit (greedy/lazy parse) = pointer doubling**, unchanged: the
  committed set is the orbit of `next[p] = p + (commit ? len : 1)` found
  in ceil(log2 N) gather+scatter rounds.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from zzflate_tpu.constants import MAX_MATCH, MIN_MATCH, WINDOW_SIZE

# The fused Pallas stencil for the K-neighbor scan (set ZZFLATE_NO_PALLAS=1
# to fall back to the pure-XLA roll loop).
_USE_PALLAS = os.environ.get("ZZFLATE_NO_PALLAS") != "1"

_KEY_BYTES = 16
_EXT_BLOCKS = 16  # 16 blocks x 16 B = 256 B + 16 B key >= MAX_MATCH
_TOO_FAR = 4096  # reject len-3 matches farther than this (zlib heuristic)


def _pack_words(data: jax.Array) -> list[jax.Array]:
    """w[j][i] = BIG-endian u32 of bytes data[i+4j : i+4j+4] (rolls).

    Big-endian (byte 0 in the high bits) so that unsigned u32 comparison
    equals byte-lexicographic order — the sorted orders below are then true
    lexicographic suffix orders, maximizing neighbor candidate quality."""
    d = data.astype(jnp.uint32)
    b = [jnp.roll(d, -s) for s in range(_KEY_BYTES)]
    n = data.shape[0]
    idx = jnp.arange(n)
    # Zero out wrapped tail bytes so keys beyond the buffer are stable.
    b = [jnp.where(idx < n - s, v, 0) for s, v in enumerate(b)]
    return [
        (b[4 * j] << 24)
        | (b[4 * j + 1] << 16)
        | (b[4 * j + 2] << 8)
        | b[4 * j + 3]
        for j in range(_KEY_BYTES // 4)
    ]


def _word_lcp_bytes(x: jax.Array) -> jax.Array:
    """Leading equal bytes (0..4) of two u32s given their XOR (BE order)."""
    x = x.astype(jnp.uint32)
    b0 = (x & jnp.uint32(0xFF000000)) == 0
    b1 = b0 & ((x & jnp.uint32(0xFF0000)) == 0)
    b2 = b1 & ((x & jnp.uint32(0xFF00)) == 0)
    b3 = b2 & ((x & jnp.uint32(0xFF)) == 0)
    return (
        b0.astype(jnp.int32)
        + b1.astype(jnp.int32)
        + b2.astype(jnp.int32)
        + b3.astype(jnp.int32)
    )


def _merge(best_len, best_dist, s_len, s_dist, spos, adj, n):
    """Scatter sort-space results to position order and fold into bests."""
    p_len = jnp.zeros((n,), jnp.int32).at[spos].set(s_len)
    p_dist = jnp.zeros((n,), jnp.int32).at[spos].set(s_dist)
    better = (p_len > best_len) | (
        (p_len == best_len) & (p_len > 0)
        & ((best_dist == 0) | (p_dist < best_dist))
    )
    better = better & (p_len > 0)
    best_len = jnp.where(better, p_len, best_len)
    best_dist = jnp.where(better, p_dist, best_dist)
    return best_len, best_dist, adj, spos


def _lcp16(aw: list[jax.Array], bw: list[jax.Array]) -> jax.Array:
    """Byte LCP (0..16) of two 16-byte keys given as 4 u32 words each."""
    l0 = _word_lcp_bytes(aw[0] ^ bw[0])
    l1 = _word_lcp_bytes(aw[1] ^ bw[1])
    l2 = _word_lcp_bytes(aw[2] ^ bw[2])
    l3 = _word_lcp_bytes(aw[3] ^ bw[3])
    lcp = l0
    lcp = lcp + jnp.where(l0 == 4, l1, 0)
    lcp = lcp + jnp.where((l0 == 4) & (l1 == 4), l2, 0)
    lcp = lcp + jnp.where((l0 == 4) & (l1 == 4) & (l2 == 4), l3, 0)
    return lcp


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
      candidates: static K, number of nearest previous suffixes scored.

    Returns:
      (mlen, mdist): int32 (N,) arrays; mlen is 0 or in [3, 258].
    """
    n = data.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    w = _pack_words(data)
    srank = jnp.arange(n, dtype=jnp.int32)

    def scan_order(order, best_len, best_dist, k_each, backward_only=False):
        """Score K neighbors (both directions) of one suffix order.

        A previous occurrence with a long common prefix may sit on either
        side in sort order (e.g. an end-padded suffix sorts before its
        extensions), so scan both ways. LCP(i, i±k) is the running min of
        adjacent LCPs — all rolls, no gathers. Returns the merged
        per-position bests plus this order's adjacency info.
        """
        sw = [jnp.take(v, order) for v in w]
        spos = order
        adj = _lcp16([jnp.roll(v, 1) for v in sw], sw)
        adj = adj.at[0].set(0)

        # Pallas on real TPUs; the (bit-identical) XLA roll loop on CPU —
        # interpret-mode Pallas is much slower than XLA there.
        if _USE_PALLAS and jax.default_backend() != "cpu":
            from zzflate_tpu.ops import pallas_kernels as pk

            s_len, s_dist = pk.scan_candidates(
                adj, spos, window_start, k_each,
                backward_only=backward_only,
            )
            return _merge(best_len, best_dist, s_len, s_dist, spos, adj, n)

        s_len = jnp.zeros((n,), jnp.int32)
        s_dist = jnp.zeros((n,), jnp.int32)

        def consider(s_len, s_dist, ln_ok, dist, ok):
            ln = jnp.where(ok, ln_ok, 0)
            better = (ln > s_len) | (
                (ln == s_len) & (ln > 0) & (dist < s_dist)
            )
            better = better & ok
            return (
                jnp.where(better, ln, s_len),
                jnp.where(better, dist, s_dist),
            )

        back_min = jnp.full((n,), 16, jnp.int32)
        fwd_min = jnp.full((n,), 16, jnp.int32)
        for k in range(1, k_each + 1):
            back_min = jnp.minimum(back_min, jnp.roll(adj, k - 1))
            cpos = jnp.roll(spos, k)
            dist = spos - cpos
            ok = (
                (srank >= k)
                & (dist >= 1)
                & (dist <= WINDOW_SIZE)
                & (cpos >= window_start)
            )
            s_len, s_dist = consider(s_len, s_dist, back_min, dist, ok)

            if backward_only:
                continue
            fwd_min = jnp.minimum(fwd_min, jnp.roll(adj, -k))
            cpos = jnp.roll(spos, -k)
            dist = spos - cpos
            ok = (
                (srank < n - k)
                & (dist >= 1)
                & (dist <= WINDOW_SIZE)
                & (cpos >= window_start)
            )
            s_len, s_dist = consider(s_len, s_dist, fwd_min, dist, ok)

        return _merge(best_len, best_dist, s_len, s_dist, spos, adj, n)

    best_len = jnp.zeros((n,), jnp.int32)
    best_dist = jnp.zeros((n,), jnp.int32)

    # Order A — by 4-byte key only: stable sort keeps equal groups in
    # position order, so backward neighbors are the MOST RECENT previous
    # occurrences of the same 4-byte prefix — exactly the reference's
    # hash-chain candidate order (SURVEY.md C5), with zero collisions.
    # Backward-only: with a stable sort, forward neighbors in this order
    # are almost always FUTURE positions (invalid sources); the rare
    # cross-group len-3 candidates are covered by order B's forward scan.
    order4 = jnp.lexsort((w[0],)).astype(jnp.int32)
    best_len, best_dist, _, _ = scan_order(
        order4, best_len, best_dist, min(candidates, 8), backward_only=True
    )

    # Order B — by the full 16-byte key: neighbors are the suffixes with
    # the LONGEST common prefixes (what a deep chain walk searches for).
    order16 = jnp.lexsort((w[3], w[2], w[1], w[0])).astype(jnp.int32)
    best_len, best_dist, adj16, spos16 = scan_order(
        order16, best_len, best_dist, candidates
    )

    mlen = best_len
    mdist = best_dist

    # Dense rank of each 16-byte key (exact equality classes) for the
    # long-match extension: rank16[p] identifies p's 16-byte block content.
    key_change = (adj16 < 16).astype(jnp.int32)
    rank_sorted = jnp.cumsum(key_change)
    rank16 = jnp.zeros((n,), jnp.int32).at[spos16].set(rank_sorted)

    # Extend full-key matches in 16-byte block steps via rank equality.
    full = mlen >= _KEY_BYTES
    cand = pos - mdist
    alive = full
    ext = jnp.zeros((n,), jnp.int32)
    for k in range(1, _EXT_BLOCKS):
        eq = jnp.roll(rank16, -16 * k) == jnp.take(
            rank16, cand + 16 * k, mode="clip"
        )
        eq = eq & (pos + 16 * k < n - _KEY_BYTES)
        alive = alive & eq
        ext = ext + alive.astype(jnp.int32)

    # Tail: sub-block LCP at the first unequal block.
    tail_p = pos + 16 * (ext + 1)
    tail_c = cand + 16 * (ext + 1)
    pw = [jnp.take(v, tail_p, mode="clip") for v in w]
    cw = [jnp.take(v, tail_c, mode="clip") for v in w]
    tail = _lcp16(pw, cw)
    mlen = jnp.where(full, 16 * (ext + 1) + tail, mlen)

    mlen = jnp.minimum(mlen, jnp.minimum(MAX_MATCH, valid_end - pos))
    mlen = jnp.where(
        (mlen >= MIN_MATCH)
        & ~((mlen == MIN_MATCH) & (mdist > _TOO_FAR)),
        mlen,
        0,
    )
    mdist = jnp.where(mlen > 0, mdist, 0)
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
