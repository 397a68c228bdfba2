from zzflate_tpu.parallel.sharded import (
    compress_sharded,
    encode_chunks_mesh,
    make_mesh,
)

__all__ = ["compress_sharded", "encode_chunks_mesh", "make_mesh"]
