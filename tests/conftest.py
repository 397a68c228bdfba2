"""Test configuration: run everything on a simulated 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test
process (SURVEY.md section 4.6: CPU-simulated meshes are the reference-free
way to test multi-chip sharding).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
