"""Test configuration.

Tests run on the default JAX backend (the axon TPU in this environment —
its remote compile service is much faster than local 2-core LLVM; plain
CPU elsewhere).  An 8-device virtual CPU platform is always registered so
sharding tests can build a Mesh from jax.devices("cpu") regardless of the
accelerator.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
