"""Experiment: lane-concatenated group Montgomery mul vs sequential muls.

The RCB16 complete add's muls come in two independent groups of 6
(curve.py _complete_add); _RowOpsFq.mul_many currently runs them as 6
sequential (n, L) mont-muls.  If Mosaic per-op overhead dominates
(~2.8 cycles/vreg-op measured r4), ONE (n, 6L) mul should amortize it
~6x on those stages — and unlike the block formulation this changes no
math, only operand packing.

Run on TPU: python tools/exp_mulmany_wide.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from testudo_tpu.fields.bls12_377 import P  # noqa: E402
from testudo_tpu.tpu.pallas_field import (  # noqa: E402
    _limbs_of, _mont_mul_rows_block, _mont_mul_rows,
)

import os
n = 24
L = int(os.environ.get("EXP_L", "256"))
G = 6  # group size (RCB16 stage-1/stage-3 mul groups)
p_limbs = _limbs_of(P, n)
mont_r = 1 << (16 * n)
npr_limbs = _limbs_of((-pow(P, -1, mont_r)) % mont_r, n)


def mk(K, variant):
    def kernel(a_ref, b_ref, o_ref):
        # a/b: (G, n, L) — G independent operand pairs
        outs = [a_ref[g] for g in range(G)]
        b = [b_ref[g] for g in range(G)]
        for _ in range(K):
            if variant == "seq":
                outs = [
                    jnp.stack(
                        _mont_mul_rows_block(outs[g], b[g], n, p_limbs, npr_limbs)
                    )
                    for g in range(G)
                ]
            else:
                wide_a = jnp.concatenate(outs, axis=1)  # (n, G*L)
                wide_b = jnp.concatenate(b, axis=1)
                r = jnp.stack(
                    _mont_mul_rows_block(wide_a, wide_b, n, p_limbs, npr_limbs)
                )
                outs = [r[:, g * L : (g + 1) * L] for g in range(G)]
        o_ref[:] = jnp.stack(outs)

    @jax.jit
    def call(a, b):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, n, L), jnp.uint32),
        )(a, b)

    return call


def sync(x):
    return int(jax.device_get(jnp.sum(x[0, 0, :1])))


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(G, n, L), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(G, n, L), dtype=np.uint32))

    r1 = mk(1, "seq")(a, b)
    r2 = mk(1, "wide")(a, b)
    same = bool(jax.device_get(jnp.all(r1 == r2)))
    print("wide == seq:", same, flush=True)
    assert same

    for variant in ("seq", "wide"):
        ts = {}
        for K in (8, 64):
            call = mk(K, variant)
            o = call(a, b)
            sync(o)
            t0 = time.time()
            for _ in range(10):
                o = call(o, b)
            sync(o)
            ts[K] = (time.time() - t0) / 10
        per = (ts[64] - ts[8]) / 56
        print(
            f"{variant:5s}: K8 {ts[8]*1e3:.2f}ms K64 {ts[64]*1e3:.2f}ms"
            f" -> {per*1e6:7.2f} us per {G}-mul group"
            f" ({per*1e6/G:6.2f} us/mul)",
            flush=True,
        )


if __name__ == "__main__":
    main()
