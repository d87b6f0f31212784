"""Persistent XLA compilation cache setup.

The limb-arithmetic graphs (curve adds inside MSM loops) take O(minutes) to
compile on the CPU backend; caching compiled executables across processes
makes tests and benches pay that cost once per machine.
"""
import os

import jax

_DONE = False


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE:
        return
    cache_dir = os.environ.get(
        "TESTUDO_JAX_CACHE", os.path.expanduser("~/.cache/testudo_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist EVERYTHING: on the remote-TPU backend even a trivial
        # primitive costs ~0.35s to compile, and protocol paths touch
        # hundreds of small ops — sub-second entries are exactly the ones
        # that must not recompile in every process.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    _DONE = True


enable_compilation_cache()
