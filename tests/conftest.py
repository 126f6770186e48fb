"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's localhost-cluster emulation trick (SURVEY.md §4):
multi-chip sharding logic is validated on host CPU devices so the suite runs
anywhere, while the real TPU path is exercised by bench.py / the driver.
"""

import os

# Force CPU: the ambient environment may point JAX_PLATFORMS at a TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
