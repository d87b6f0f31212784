"""Eager-call jitting for device ops.

On this environment's remote-TPU backend every EAGER JAX primitive costs a
~0.35 s mini-compile + tunnel round trip; a single un-jitted `mont_mul`
decomposes into dozens of such primitives, so protocol paths that call
field/curve ops eagerly (host loops between Fiat-Shamir rounds, MIPP
folds, eq-table builds) were spending minutes dispatching microseconds of
arithmetic.

`eager_jit` wraps an op so that

  - called with concrete arrays (eager): it dispatches through one
    `jax.jit` executable — one compile per shape, cached in-process and in
    the persistent compilation cache;
  - called with tracers (inside an enclosing jit/scan/vmap): it inlines
    exactly as before, adding no call boundaries to fused graphs.
"""
from __future__ import annotations

import functools

import jax

from . import cache as _cache  # noqa: F401  (persistent compile cache on)


def _has_tracer(tree) -> bool:
    return any(
        isinstance(x, jax.core.Tracer)
        for x in jax.tree_util.tree_leaves(tree)
    )


def eager_jit(fn=None, *, static_argnums=(), static_argnames=()):
    """Decorator: jit this op when called eagerly, inline when traced."""

    def deco(f):
        jitted = jax.jit(
            f, static_argnums=static_argnums, static_argnames=static_argnames
        )

        @functools.wraps(f)
        def wrapper(*args, **kw):
            if _has_tracer((args, kw)):
                return f(*args, **kw)
            return jitted(*args, **kw)

        wrapper.__wrapped__ = f
        return wrapper

    return deco if fn is None else deco(fn)
