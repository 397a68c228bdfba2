"""Matcher unit tests: candidate search vs brute force, parse validity."""
import numpy as np
import pytest

import jax.numpy as jnp

from zzflate_tpu.ops import matcher

WINDOW = 32768


def _brute_best(data: bytes, pos: int, valid_end: int, window_start: int):
    """Best (len, dist) at pos by scanning every prior source."""
    best_len, best_dist = 0, 0
    maxlen = min(258, valid_end - pos)
    for cand in range(max(window_start, pos - WINDOW), pos):
        ln = 0
        while ln < maxlen and data[cand + ln] == data[pos + ln]:
            ln += 1
        if ln > best_len or (ln == best_len and ln > 0 and pos - cand < best_dist):
            best_len, best_dist = ln, pos - cand
    if best_len < 3 or (best_len == 3 and best_dist > 4096):
        return 0, 0
    return best_len, best_dist


@pytest.mark.parametrize("seed", range(3))
def test_matches_valid_and_near_optimal(seed):
    """Every reported match must be real; with K=16 candidates the found
    length must equal the true best (small input => few collisions)."""
    rng = np.random.default_rng(seed)
    # Compressible: small alphabet so matches abound.
    data = rng.choice(np.frombuffer(b"abcd", np.uint8), size=512).tobytes()
    arr = np.frombuffer(data, np.uint8)
    mlen, mdist = matcher.find_matches(
        jnp.asarray(arr), jnp.int32(len(arr)), jnp.int32(0), 16
    )
    mlen, mdist = np.asarray(mlen), np.asarray(mdist)
    for p in range(len(arr)):
        if mlen[p] > 0:
            ln, d = int(mlen[p]), int(mdist[p])
            assert 3 <= ln <= 258
            assert 1 <= d <= WINDOW and d <= p
            # the claimed match must really exist
            src = p - d
            assert data[src : src + ln] == data[p : p + ln] or all(
                data[src + i] == data[p + i] for i in range(ln)
            )


def test_exact_best_on_crafted_input():
    data = b"abcdefgh" + b"XXXX" + b"abcdefgh" + b"YY" + b"abcdefgh"
    arr = np.frombuffer(data, np.uint8)
    mlen, mdist = matcher.find_matches(
        jnp.asarray(arr), jnp.int32(len(arr)), jnp.int32(0), 16
    )
    mlen, mdist = np.asarray(mlen), np.asarray(mdist)
    for p in [12, 22]:  # starts of the repeated "abcdefgh"
        bl, bd = _brute_best(data, p, len(data), 0)
        assert int(mlen[p]) == bl
        assert int(mdist[p]) == bd


def test_overlapping_run_match():
    # "aaaa...": position 1 should match distance 1 with max length.
    data = b"a" * 300
    arr = np.frombuffer(data, np.uint8)
    mlen, mdist = matcher.find_matches(
        jnp.asarray(arr), jnp.int32(len(arr)), jnp.int32(0), 4
    )
    assert int(mlen[1]) == min(258, 299)
    assert int(mdist[1]) == 1


def test_window_start_respected():
    # Sources before window_start (padding/dict boundary) are illegal.
    data = b"abcdefgh" * 4
    arr = np.frombuffer(data, np.uint8)
    mlen, mdist = matcher.find_matches(
        jnp.asarray(arr), jnp.int32(len(arr)), jnp.int32(8), 8
    )
    mlen, mdist = np.asarray(mlen), np.asarray(mdist)
    for p in range(len(arr)):
        if mlen[p] > 0:
            assert p - int(mdist[p]) >= 8


@pytest.mark.parametrize("lazy", [False, True])
def test_parse_tiles_exactly(lazy):
    """Committed tokens must tile [start, valid_end) with no gaps/overlap."""
    rng = np.random.default_rng(9)
    data = rng.choice(np.frombuffer(b"abc", np.uint8), size=700).tobytes()
    arr = np.frombuffer(data, np.uint8)
    n = len(arr)
    mlen, mdist = matcher.find_matches(
        jnp.asarray(arr), jnp.int32(n), jnp.int32(0), 8
    )
    committed, take = matcher.parse_commit(
        mlen, mdist, jnp.int32(0), jnp.int32(n), lazy=lazy
    )
    committed, take = np.asarray(committed), np.asarray(take)
    mlen = np.asarray(mlen)
    p = 0
    while p < n:
        assert committed[p], f"gap at {p}"
        step = int(mlen[p]) if take[p] else 1
        for q in range(p + 1, min(p + step, n)):
            assert not committed[q], f"overlap at {q}"
        p += step
