"""On-chip A/B of the perf env knobs (run by tools/watch_tunnel.sh when
the tunnel recovers; safe to run by hand).

Measures, each in a fresh subprocess so env knobs bind before jax init:
  1. indexed TPU decode with ZZFLATE_WALK_VMAP=0/1 (stacked groups)
     x ZZFLATE_WALK_UNROLL=1/4
  2. encode with ZZFLATE_PALLAS_PARSE=1 vs XLA row sweeps
Prints one JSON line per cell.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEC_BODY = r"""
import time, json, sys, zlib
sys.path.insert(0, %(here)r)
import bench, zzflate_tpu as zf
from zzflate_tpu.models import inflate_tpu
data = bench.build_corpus()
oi = zf.compress(data, level=6, format="gzip", chunk_bytes=1 << 18,
                 indexed=True)
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
    # Compiles are the scarce resource on the tunneled platform (the
    # remote compile service wedges; see BASELINE.md round 3): run only
    # the decisive decode cells. Round-4 hypotheses, from the round-3
    # on-chip datum (stacked/deferred walk = 2.09 MB/s, WORSE than the
    # round-2 in-loop-scatter path's 4.80):
    #   1. anchor=256: 4x fewer sequential walk steps (t_steps 258 vs
    #      1026) at 4x the lanes — if the loop is step-latency-bound,
    #      decode scales ~4x.
    #   2. defer=0 at anchor=256: are the deferred-emit record buffers
    #      (three (t_steps, lanes) DUS per step) the chip regression?
    # Round-4 cells for the PACKED-scatter walk (single record buffer /
    # single scatter, per-lane sinks): does the stacked single-dispatch
    # mode win now that the per-step emission cost is 1/3?
    for cell, env in (
        ("dec packed vmap=0 defer=1", {"ZZFLATE_WALK_VMAP": "0"}),
        ("dec packed vmap=1 defer=1", {"ZZFLATE_WALK_VMAP": "1"}),
        ("dec packed vmap=0 defer=0",
         {"ZZFLATE_WALK_VMAP": "0", "ZZFLATE_WALK_DEFER": "0"}),
    ):
        run(cell, DEC_BODY % {"here": HERE, "cell": cell},
            dict(env, ZZFLATE_WALK_UNROLL="1"), timeout=1800)


if __name__ == "__main__":
    main()
