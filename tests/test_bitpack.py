"""Bit-packing scatter vs a host-reference sequential bit writer."""
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
