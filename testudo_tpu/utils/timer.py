"""Hierarchical wall-clock profiler.

Counterpart of /root/reference/src/timer.rs: colored, depth-indented
start/stop prints gated by an environment flag (TESTUDO_PROFILE=1 replaces
the reference's `profile` cargo feature), plus jax.profiler trace support
for device-side inspection.
"""
from __future__ import annotations

import os
import sys
import time

_ENABLED = os.environ.get("TESTUDO_PROFILE", "0") == "1"
_DEPTH = 0


class Timer:
    def __init__(self, label: str):
        global _DEPTH
        self.label = label
        self.start = time.time()
        if _ENABLED:
            print("  " * _DEPTH + f"* {label}", file=sys.stderr, flush=True)
            _DEPTH += 1

    def stop(self) -> float:
        global _DEPTH
        dt = time.time() - self.start
        if _ENABLED:
            _DEPTH = max(0, _DEPTH - 1)
            print(
                "  " * _DEPTH + f"* {self.label} {dt*1000:.1f}ms",
                file=sys.stderr,
                flush=True,
            )
        return dt

    @staticmethod
    def print(msg: str) -> None:
        if _ENABLED:
            print("  " * _DEPTH + f"* {msg}", file=sys.stderr, flush=True)


class DeviceTrace:
    """Context manager around jax.profiler.trace (TPU timeline capture)."""

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False
