"""Pallas TPU kernels for the field hot loops (experimental).

The XLA-traced limb arithmetic in tpu/field.py is the portable path; this
module provides hand-scheduled Pallas equivalents for the highest-volume
ops so the bucket-accumulation inner loop can keep its accumulators in
VMEM across steps instead of round-tripping HBM.

Status: mont_mul kernel implemented and validated against tpu/field.py;
the fused EC-add kernel is the round-2 target.  Not yet wired into the
default MSM path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .field import FQ, FR, LIMB_BITS, MASK, FieldSpec, _int_to_limbs


def _mont_mul_body(spec: FieldSpec, a, b):
    """Straight-line Montgomery product on (tile, nlimbs) u32 blocks.

    Reuses the shear/parallel-prefix formulation from tpu/field.py — the
    same code traces into the Pallas kernel body, where Mosaic schedules
    it directly without XLA's fusion passes.
    """
    from . import field as jf

    return jf.mont_mul(spec, a, b)


def mont_mul_pallas(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
                    tile: int = 1024) -> jnp.ndarray:
    """Batched Montgomery product via pallas_call with VMEM tiling.

    a, b: (N, nlimbs) canonical limb arrays; N must be a multiple of tile.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[0]
    assert n % tile == 0, (n, tile)
    nl = spec.nlimbs

    def kernel(a_ref, b_ref, out_ref):
        out_ref[:] = _mont_mul_body(spec, a_ref[:], b_ref[:])

    grid = (n // tile,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, nl), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, nl), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(a, b)


def bench_kernel_vs_xla(n: int = 1 << 18, iters: int = 10):
    """Compare pallas vs plain-XLA mont_mul throughput (run on TPU)."""
    import time

    import numpy as np

    from . import field as jf

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 15, size=(n, FQ.nlimbs), dtype=np.uint32))

    fx = jax.jit(lambda x, y: jf.mont_mul(FQ, x, y))
    fp = jax.jit(lambda x, y: mont_mul_pallas(FQ, x, y))

    for name, f in (("xla", fx), ("pallas", fp)):
        r = f(a, a)
        jax.block_until_ready(r)
        t0 = time.time()
        out = a
        for _ in range(iters):
            out = f(out, a)
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(f"{name}: {iters * n / dt / 1e6:.1f} Mmul/s")
    # cross-check
    assert FQ.decode(np.asarray(fp(a, a)[:4])) == FQ.decode(np.asarray(fx(a, a)[:4]))
