"""Bit-packing scatter vs a host-reference sequential bit writer."""
import jax.numpy as jnp
import numpy as np
import pytest

from zzflate_tpu.ops import bitpack


def _host_pack(values, nbits):
    """Sequential LSB-first bit writer (the reference C1 semantics)."""
    out = bytearray()
    acc, acc_n = 0, 0
    for v, n in zip(values, nbits):
        acc |= (int(v) & ((1 << int(n)) - 1)) << acc_n
        acc_n += int(n)
        while acc_n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_n -= 8
    if acc_n:
        out.append(acc & 0xFF)
    return bytes(out), sum(int(n) for n in nbits)


@pytest.mark.parametrize("seed", range(5))
def test_random_fields(seed):
    rng = np.random.default_rng(seed)
    f = int(rng.integers(1, 2000))
    nbits = rng.integers(0, 17, size=f).astype(np.int32)
    values = rng.integers(0, 1 << 16, size=f).astype(np.uint32)
    out_words = (int(nbits.sum()) + 31) // 32 + 2
    words, total = bitpack.pack_fields(values, nbits, out_words)
    ref_bytes, ref_total = _host_pack(values, nbits)
    assert int(total) == ref_total
    got = bitpack.words_to_bytes(words, int(total))
    assert got == ref_bytes


def test_all_zero_width_fields():
    values = np.array([5, 6, 7], np.uint32)
    nbits = np.array([0, 0, 0], np.int32)
    words, total = bitpack.pack_fields(values, nbits, 4)
    assert int(total) == 0
    assert bitpack.words_to_bytes(words, 0) == b""


def test_word_straddling_field():
    # A 16-bit field starting at bit 24 must straddle two u32 words.
    values = np.array([0xFFFFFF, 0xABCD], np.uint32)
    nbits = np.array([24, 16], np.int32)
    words, total = bitpack.pack_fields(values, nbits, 4)
    ref_bytes, _ = _host_pack(values, nbits)
    assert bitpack.words_to_bytes(words, int(total)) == ref_bytes


def test_value_masking():
    # Values wider than nbits must be truncated to the low bits.
    values = np.array([0xFFFF], np.uint32)
    nbits = np.array([4], np.int32)
    words, total = bitpack.pack_fields(values, nbits, 2)
    assert bitpack.words_to_bytes(words, int(total)) == b"\x0f"


def test_scatter_field48_vs_host():
    # Random <=48-bit fields at dense offsets must reproduce the host
    # bit-writer exactly (three-word straddles included).
    rng = np.random.default_rng(42)
    widths = rng.integers(1, 49, size=200).astype(np.int32)
    vals = rng.integers(0, 1 << 48, size=200, dtype=np.uint64) & (
        (np.uint64(1) << widths.astype(np.uint64)) - np.uint64(1)
    )
    offsets = np.concatenate([[0], np.cumsum(widths)[:-1]]).astype(np.int32)
    total = int(widths.sum())
    out_words = total // 32 + 3
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    words = bitpack.scatter_field48(
        jnp.zeros((out_words,), jnp.uint32),
        jnp.asarray(offsets), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(widths), out_words,
    )
    got = bitpack.words_to_bytes(words, total)
    # host reference
    acc = 0
    for v, w, o in zip(vals, widths, offsets):
        acc |= int(v) << int(o)
    ref = acc.to_bytes((total + 7) // 8, "little")
    assert got == ref


def test_closed_form_symbol_math_vs_tables():
    from zzflate_tpu import constants as C
    from zzflate_tpu.models import deflate_encoder as de

    mlen = jnp.arange(3, 259, dtype=jnp.int32)
    lc = np.asarray(de._len_code(mlen))
    assert (lc == np.asarray(C.LENGTH_TO_CODE)[3:259]).all()
    lext, lbase = de._len_extra_base(jnp.arange(29, dtype=jnp.int32))
    assert (np.asarray(lext) == np.asarray(C.LENGTH_EXTRA)).all()
    assert (np.asarray(lbase) == np.asarray(C.LENGTH_BASE)).all()

    dist = jnp.arange(1, 32769, dtype=jnp.int32)
    dc = np.asarray(de._dist_code(dist))
    ref = (
        np.searchsorted(
            np.asarray(C.DIST_BASE), np.arange(1, 32769), side="right"
        )
        - 1
    )
    assert (dc == ref).all()
    dext, dbase = de._dist_extra_base(jnp.arange(30, dtype=jnp.int32))
    assert (np.asarray(dext) == np.asarray(C.DIST_EXTRA)).all()
    assert (np.asarray(dbase) == np.asarray(C.DIST_BASE)).all()
