"""Subprocess worker for the real multi-process multihost test.

Usage: python multihost_worker.py <coordinator> <nprocs> <pid> <corpus_file>
       <chunk_bytes> <out_file>

Each process takes its contiguous shard of the corpus (shard size is a
multiple of chunk_bytes so the distributed chunk layout matches the
single-process one exactly) and runs compress_multihost; process 0
writes the stream to out_file.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coord, nprocs, pid, corpus_file, chunk_bytes, out_file = sys.argv[1:7]
    nprocs, pid, chunk_bytes = int(nprocs), int(pid), int(chunk_bytes)
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs

    data = open(corpus_file, "rb").read()
    n = len(data)
    # Host shards: contiguous, chunk-aligned, last host takes the tail.
    chunks_total = max(1, -(-n // chunk_bytes))
    per_host = -(-chunks_total // nprocs) * chunk_bytes
    lo = min(n, pid * per_host)
    hi = min(n, (pid + 1) * per_host) if pid < nprocs - 1 else n
    local = data[lo:hi]

    from zzflate_tpu.parallel import multihost

    out = multihost.compress_multihost(
        local, level=6, format="gzip", chunk_bytes=chunk_bytes
    )
    if pid == 0:
        with open(out_file, "wb") as f:
            f.write(out)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
