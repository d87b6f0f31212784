"""Test configuration.

Tests run on the default JAX backend (the axon TPU in this environment —
its remote compile service is much faster than local 2-core LLVM; plain
CPU elsewhere).  An 8-device virtual CPU platform is always registered so
sharding tests can build a Mesh from jax.devices("cpu") regardless of the
accelerator.
"""
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_t0 = time.time()


def pytest_runtest_logreport(report):
    """Live per-test wall-clock lines (suite runs are long on this host:
    remote-TPU compiles dominate; this makes the slow spots visible
    without waiting for --durations at the end)."""
    if report.when == "call":
        print(
            f"\n[{time.time() - _t0:7.1f}s] {report.nodeid} "
            f"{report.outcome} in {report.duration:.1f}s",
            file=sys.stderr,
            flush=True,
        )
