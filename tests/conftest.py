"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharded/multi-chip paths are validated on host CPU devices; the real TPU is
exercised by bench.py and the driver's compile checks.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
