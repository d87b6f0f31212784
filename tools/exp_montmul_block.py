"""Experiment: block-structured Montgomery mul vs row-list baseline.

Hypothesis: Mosaic per-op overhead (~2.8 cycles/vreg-op measured r4)
penalizes the row-list formulation (~6,200 small IR ops per mul); fewer,
larger ops (whole (n,L)/(2n,L) block adds with padded placement) should
amortize it and also shrink kernel IR (cold-start lever).

Run on TPU: python tools/exp_montmul_block.py
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
    _carry_ripple_rows, _cond_sub_p_rows, _limbs_of, _mont_mul_rows,
)

n = 24
L = 1024
MASK = (1 << 16) - 1
p_limbs = _limbs_of(P, n)
mont_r = 1 << (16 * n)
npr_limbs = _limbs_of((-pow(P, -1, mont_r)) % mont_r, n)
P_np = np.asarray(p_limbs, np.uint32)
NPR_np = np.asarray(npr_limbs, np.uint32)


def mont_mul_block(at, bt, pv, nprv):
    """Block formulation: same math as _mont_mul_rows, whole-array ops.

    Accumulates the schoolbook into (2n+1, L) relaxed buffers via padded
    block adds (one pad + one add per i instead of ~4n row ops).
    pv/nprv: (n, L) broadcast constant-limb inputs (Pallas kernels must
    receive constants as operands).  Shifted accumulation uses pad+add
    (Mosaic has no scatter-add lowering; `.at[slice].add` fails)."""

    def shift_add(acc, block, off):
        # acc (H, L) += block placed at row offset `off`
        H = acc.shape[0]
        return acc + jnp.pad(block, ((off, H - off - block.shape[0]), (0, 0)))

    # pass 1: T = a*b
    acc = jnp.zeros((2 * n + 1, L), jnp.uint32)
    for i in range(n):
        prods = at[i][None, :] * bt          # (n, L) exact u32
        acc = shift_add(acc, prods & MASK, i)
        acc = shift_add(acc, prods >> 16, i + 1)
    T, t_carry = _carry_ripple_rows([acc[k] for k in range(2 * n)], 2 * n)

    # pass 2: m = (T mod R) * N' mod R — triangular, constant multiplicand
    Tarr = jnp.stack(T[:n])
    accm = jnp.zeros((n, L), jnp.uint32)
    for i in range(n):
        w = n - i
        pr = Tarr[i][None, :] * nprv[:w]     # (w, L)
        accm = shift_add(accm, pr & MASK, i)
        if w > 1:
            accm = shift_add(accm, (pr >> 16)[: w - 1], i + 1)
    m, _ = _carry_ripple_rows([accm[k] for k in range(n)], n)

    # pass 3: U = m * p, S = T + U
    accu = jnp.zeros((2 * n + 1, L), jnp.uint32)
    for i in range(n):
        pr = m[i][None, :] * pv              # (n, L)
        accu = shift_add(accu, pr & MASK, i)
        accu = shift_add(accu, pr >> 16, i + 1)
    S_rows = [T[k] + accu[k] for k in range(2 * n)]
    S_rows.append(t_carry + accu[2 * n])
    S, s_carry = _carry_ripple_rows(S_rows, 2 * n + 1)
    res = S[n : 2 * n]
    hi_extra = S[2 * n] + s_carry
    return _cond_sub_p_rows(res, hi_extra, p_limbs)


def _splat_consts(L_):
    """Build (n, L) constant-limb blocks IN-KERNEL from scalar splats (no
    captured array constants, no extra kernel operands — the integration
    path for pallas_field/_mont_mul_rows)."""
    pv = jnp.stack(
        [jnp.full((L_,), np.uint32(v), jnp.uint32) for v in p_limbs]
    )
    nprv = jnp.stack(
        [jnp.full((L_,), np.uint32(v), jnp.uint32) for v in npr_limbs]
    )
    return pv, nprv


def mk(K, variant):
    def kernel(a_ref, b_ref, p_ref, npr_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        for _ in range(K):
            if variant == "rows":
                a = jnp.stack(_mont_mul_rows(a, b, n, p_limbs, npr_limbs))
            elif variant == "block_splat":
                pv_k, nprv_k = _splat_consts(a.shape[1])
                a = jnp.stack(mont_mul_block(a, b, pv_k, nprv_k))
            else:
                a = jnp.stack(mont_mul_block(a, b, p_ref[:], npr_ref[:]))
        o_ref[:] = a

    pv = jnp.broadcast_to(jnp.asarray(P_np)[:, None], (n, L))
    nprv = jnp.broadcast_to(jnp.asarray(NPR_np)[:, None], (n, L))

    @jax.jit
    def call(a, b):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, L), jnp.uint32),
        )(a, b, pv, nprv)

    return call


def sync(x):
    return int(jax.device_get(jnp.sum(x[0, :1])))


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(n, L), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(n, L), dtype=np.uint32))

    # correctness: block == rows on the same inputs
    r1 = mk(1, "rows")(a, b)
    r2 = mk(1, "block")(a, b)
    same = bool(jax.device_get(jnp.all(r1 == r2)))
    print("block == rows:", same, flush=True)
    assert same
    r3 = mk(1, "block_splat")(a, b)
    same2 = bool(jax.device_get(jnp.all(r1 == r3)))
    print("block_splat == rows:", same2, flush=True)
    assert same2

    for variant in ("rows", "block", "block_splat"):
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
            f"{variant:6s}: K8 {ts[8]*1e3:.2f}ms K64 {ts[64]*1e3:.2f}ms"
            f" -> {per*1e6:7.2f} us/mul",
            flush=True,
        )


if __name__ == "__main__":
    main()
