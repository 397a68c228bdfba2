"""Compression-ratio regression gates on the Silesia-like fixture.

BASELINE.md gate: output <= zlib at the same level + <= 0.5 % chunking
overhead (BASELINE.json:5 "size <= reference at same level"). Gated on a
4 MiB slice of the deterministic fixture so the test stays CI-sized;
`python bench.py --full` runs the full ~100 MiB table.
"""
import zlib

import pytest

import zzflate_tpu as zf
from zzflate_tpu.utils import fixtures

_SLICE = 4 << 20


@pytest.fixture(scope="module")
def corpus():
    return fixtures.silesia_like(_SLICE)


@pytest.mark.parametrize(
    "level,rel_budget",
    [
        (1, 1.000),   # suffix-sort candidates beat zlib's 4-entry chains
        (6, 1.005),
        (7, 1.000),   # cost-aware optimal parse beats zlib-7 outright
        (8, 1.000),   # cost-aware optimal parse beats zlib-8 outright
        (9, 1.005),
    ],
)
def test_ratio_gate(corpus, level, rel_budget):
    ours = zf.compress(corpus, level=level, format="zlib")
    assert zlib.decompress(ours) == corpus
    zsize = len(zlib.compress(corpus, level))
    rel = len(ours) / zsize
    assert rel <= rel_budget, f"L{level}: rel {rel:.4f} > {rel_budget}"


def test_homogeneous_text_gate():
    """The round-1 failure mode: homogeneous text at L6/L9 (VERDICT #3)."""
    data = open("/usr/include/zlib.h", "rb").read() * 6
    for level in (6, 9):
        ours = zf.compress(data, level=level, format="zlib")
        assert zlib.decompress(ours) == data
        rel = len(ours) / len(zlib.compress(data, level))
        assert rel <= 1.005, f"L{level}: rel {rel:.4f}"
