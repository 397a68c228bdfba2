from zzflate_tpu.parallel.sharded import compress_sharded, make_mesh

__all__ = ["compress_sharded", "make_mesh"]
