"""Multi-device sharded encode on the simulated 8-device CPU mesh
(SURVEY.md section 4.6: CPU-simulated meshes are the CI stand-in)."""
import zlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import zzflate_tpu as zf
from zzflate_tpu.parallel import compress_sharded, make_mesh

CHUNK = 4096


def _data(n=40000, seed=2):
    rng = np.random.default_rng(seed)
    text = (b"mesh sharded deflate chunk test " * 800)[: n // 2]
    rnd = rng.integers(0, 256, size=n - len(text), dtype=np.uint8).tobytes()
    return text + rnd


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("fmt", ["zlib", "gzip"])
def test_sharded_roundtrip(fmt):
    data = _data()
    out = compress_sharded(data, level=6, format=fmt, chunk_bytes=CHUNK)
    wbits = 31 if fmt == "gzip" else 15
    assert zlib.decompress(out, wbits=wbits) == data


def test_sharded_matches_single_device_bytes():
    # Same chunking + params => identical deflate payload regardless of
    # how many devices the batch is laid out across.
    data = _data(seed=5)
    out_sharded = compress_sharded(data, level=6, format="zlib", chunk_bytes=CHUNK)
    out_single = zf.compress(data, level=6, format="zlib", chunk_bytes=CHUNK)
    assert out_sharded == out_single


def test_sharded_uneven_chunks():
    # Batch size not a multiple of the mesh => padded rows must be ignored.
    data = _data(n=CHUNK * 3 + 17, seed=6)
    out = compress_sharded(data, level=6, format="zlib", chunk_bytes=CHUNK)
    assert zlib.decompress(out) == data


def test_sharded_with_dictionary():
    dictionary = b"dictionary payload for every chunk " * 50
    data = b"dictionary payload for every chunk -- body " * 300
    out = compress_sharded(
        data, level=6, format="zlib", chunk_bytes=CHUNK, dictionary=dictionary
    )
    d = zlib.decompressobj(zdict=dictionary)
    assert d.decompress(out) == data


def test_dryrun_entrypoints():
    import __graft_entry__ as g

    fn, args = g.entry()
    res = jax.jit(fn)(*args)
    # Production analyze graph: committed tokens and histogram mass exist.
    assert int(jnp.sum(res["committed"])) > 0
    assert int(jnp.sum(res["freq_ll"])) > 0
    g.dryrun_multichip(8)
