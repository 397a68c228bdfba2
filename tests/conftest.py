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
