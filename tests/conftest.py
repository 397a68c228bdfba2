"""Test configuration: run everything on a simulated 8-device CPU mesh.

The container bakes JAX_PLATFORMS=axon into the environment AND its
sitecustomize imports jax at interpreter startup, so setting env vars here
is not enough — jax already read them. Force the platform through the
config API (backends initialize lazily, so this works as long as no device
was touched yet), plus the env for any subprocesses.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the encoder graphs take 30-120 s each to
# compile on CPU; caching them makes suite re-runs minutes faster.
_cache = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"
)
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except (OSError, AttributeError):
    pass
