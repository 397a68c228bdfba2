"""On-chip A/B of the perf env knobs (run by tools/watch_tunnel.sh when
the tunnel recovers; safe to run by hand).

Round-4 decode cells for the PACKED-scatter walk (single record buffer /
single scatter, per-lane sinks): does the stacked single-dispatch mode
win now that the per-step emission cost is 1/3?

Compiles are the scarce resource on the tunneled platform: the indexed
test stream is encoded ONCE (in its own subprocess) and cached at
/tmp/ab_indexed.bin, so every decode cell only compiles the decode
graphs. Prints one JSON line per cell, incrementally.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
import tempfile

import bench as _bench  # noqa: E402  (for the shared cache key)

# Same cache key bench.py uses (corpus size, chunking, level, per-user),
# so a blob encoded here is reused by the bench's decode section.
BLOB = os.path.join(
    tempfile.gettempdir(),
    f"zzflate_bench_{os.getuid()}_{_bench.TARGET_BYTES}_"
    f"{_bench.CHUNK_BYTES}_{_bench.LEVEL}.gz",
)

ENC_BODY = r"""
import sys, zlib
sys.path.insert(0, %(here)r)
import bench, zzflate_tpu as zf
data = bench.build_corpus()
oi = zf.compress(data, level=bench.LEVEL, format="gzip",
                 chunk_bytes=bench.CHUNK_BYTES, indexed=True)
assert zlib.decompress(oi, wbits=31) == data
open(%(blob)r, "wb").write(oi)
print("encoded", len(oi))
"""

DEC_BODY = r"""
import time, json, sys
sys.path.insert(0, %(here)r)
import bench
from zzflate_tpu.models import inflate_tpu
data = bench.build_corpus()
oi = open(%(blob)r, "rb").read()
arr, n = inflate_tpu.decompress_indexed(oi, to_device=True)  # warm/compile
assert n == len(data)
best = 9e9
for _ in range(3):
    t0 = time.perf_counter()
    inflate_tpu.decompress_indexed(oi, to_device=True)
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"cell": %(cell)r, "dec_tpu_dev_MBps":
                  round(len(data) / 1e6 / best, 2)}))
"""


def run(cell: str, body: str, env_extra: dict, timeout: int = 2400):
    env = dict(os.environ, **env_extra)
    try:
        r = subprocess.run(
            [sys.executable, "-c", body],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        out = r.stdout.strip().splitlines()
        print(out[-1] if out else json.dumps(
            {"cell": cell, "error": r.stderr[-300:]}), flush=True)
    except subprocess.TimeoutExpired:
        print(json.dumps({"cell": cell, "error": "timeout"}), flush=True)


def main():
    if not os.path.exists(BLOB):
        run("encode indexed", ENC_BODY % {"here": HERE, "blob": BLOB},
            {}, timeout=2400)
    if not os.path.exists(BLOB):
        return  # encode wedged; cells next window
    # Round-5 cells: LUT-free walk decode, token-compacted emit,
    # extension stride, compiled Pallas parse — each in its own
    # subprocess (env flags are baked at trace time; jit caches don't
    # key on them).
    for cell, env in (
        ("dec nolut=1", {"ZZFLATE_WALK_NOLUT": "1"}),
        ("dec nolut=0", {"ZZFLATE_WALK_NOLUT": "0"}),
    ):
        run(cell, DEC_BODY % {"here": HERE, "blob": BLOB, "cell": cell},
            dict(env, ZZFLATE_WALK_UNROLL="1"), timeout=1500)
    for cell, env in (
        ("enc default (compact_tokens+prop)", {}),
        ("enc compact_tokens=0", {"ZZFLATE_COMPACT_TOKENS": "0"}),
        ("enc ext_stride=32", {"ZZFLATE_EXT_STRIDE": "32"}),
        ("enc pallas_parse=1", {"ZZFLATE_PALLAS_PARSE": "1"}),
    ):
        run(cell, ENCT_BODY % {"here": HERE, "cell": cell}, env,
            timeout=2400)


ENCT_BODY = r"""
import sys, time, json, zlib
sys.path.insert(0, %(here)r)
import bench, zzflate_tpu as zf
data = bench.build_corpus()
out = zf.compress(data, level=6, format="gzip",
                  chunk_bytes=bench.CHUNK_BYTES)
assert zlib.decompress(out, wbits=31) == data
best = 9e9
for _ in range(2):
    t0 = time.perf_counter()
    zf.compress(data, level=6, format="gzip", chunk_bytes=bench.CHUNK_BYTES)
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"cell": %(cell)r,
                  "enc_MBps": round(len(data) / 1e6 / best, 2)}))
"""


if __name__ == "__main__":
    main()
