"""Pallas TPU kernel for batched Montgomery multiplication.

Why this exists: the pure-XLA `field.mont_mul` materializes the (n x n)
limb product tensor (and its shear/carry intermediates) through HBM —
~1.5 GB of traffic per 64k-lane multiply, measured ~25 ms/call on a v5e
(~300x off bandwidth).  This kernel keeps every intermediate in VMEM:

  - tiles of TN points are loaded as (TN, n) u32 blocks and transposed
    once to (n, TN), so each limb row is a fully-occupied (8, 128)-tiled
    VPU vector and the 16-bit limb products are exact in u32;
  - the schoolbook is row-broadcast: iteration i multiplies a_i against
    ALL of b in one (n, TN) op — n static iterations, no gathers;
  - carry chains ripple over rows (static Python loops over limb index —
    row extraction is free), values bounded far below 2^32 throughout;
  - the non-interleaved Montgomery reduction (m = T*N' mod R, S = T + m*p)
    follows field.mont_mul exactly, so results are bit-identical.

The public `mont_mul(spec, a, b)` matches field.mont_mul's signature and
is dispatched from there when running on a TPU backend.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field import FieldSpec, LIMB_BITS, MASK

TN = 1024  # batch tile: each limb row is (8, 128) exactly


def _limbs_of(x: int, n: int):
    return tuple((x >> (LIMB_BITS * i)) & MASK for i in range(n))


def _carry_ripple_rows(rows, nout):
    """Relaxed u32 rows (< 2^26) -> canonical 16-bit rows, ripple carry.
    Returns (rows[:nout], carry_out)."""
    out = []
    carry = 0
    for k in range(nout):
        v = (rows[k] if k < len(rows) else 0) + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return out, carry


def _cond_sub_p_rows(rows, hi_extra, p_limbs):
    """rows (canonical) -> rows - p if (hi_extra>0 or rows >= p)."""
    n = len(p_limbs)
    borrow = None
    diff = []
    for k in range(n):
        v = rows[k] + (1 << LIMB_BITS) - p_limbs[k]
        if borrow is not None:
            v = v - borrow
        diff.append(v & MASK)
        borrow = 1 - (v >> LIMB_BITS)  # 1 if a borrow was taken
    geq_p = borrow == 0
    need = geq_p if hi_extra is None else ((hi_extra > 0) | geq_p)
    return [jnp.where(need, d, r) for d, r in zip(diff, rows)]


import os as _os

# Block-structured mont-mul (default): whole-array padded block adds
# instead of per-row accumulator updates.  Measured 2.2x faster in-kernel
# on v5e (tools/exp_montmul_block.py: 5.6 us vs 12.1 us per 1024-lane
# 24-limb mul) — Mosaic per-op overhead (~2.8 cycles/vreg-op, PERF.md r4)
# dominates the row-list formulation's ~6,200 small ops.  Bit-identical
# results; TESTUDO_BLOCK_MUL=0 restores the row-list formulation.
_BLOCK_MUL = _os.environ.get("TESTUDO_BLOCK_MUL", "1") == "1"


# The block form's (2n+1, L) accumulators need several live buffers of
# (2n+1)*L*4 bytes of scoped VMEM; pallas_curve raises its kernels'
# vmem_limit_bytes to 96 MB so widths through 8192 (wide groups at full
# lane tiles) fit.  Wider launches keep the row-list form as a backstop.
_BLOCK_MAX_L = 8192


def _mont_mul_rows(at, bt, n, p_limbs, npr_limbs, lazy=False):
    """lazy=True skips the final conditional subtract and returns the raw
    Montgomery quotient S/R, which is < 2p whenever the inputs satisfy
    bound(a)*bound(b)*p <= R (the caller tracks bounds — pallas_curve's
    lazy-reduction row ops).  With canonical inputs (< p) the non-lazy
    form returns the fully reduced (< p) result as before."""
    if _BLOCK_MUL and at.shape[-1] <= _BLOCK_MAX_L:
        return _mont_mul_rows_block(at, bt, n, p_limbs, npr_limbs, lazy)
    return _mont_mul_rows_list(at, bt, n, p_limbs, npr_limbs, lazy)


def _splat_rows(limbs, L):
    """(v_0..v_{k-1}) scalar limbs -> (k, L) block via per-row splats (no
    captured array constants — Mosaic folds scalar fills)."""
    return jnp.stack(
        [jnp.full((L,), np.uint32(v), jnp.uint32) for v in limbs]
    )


def _mont_mul_rows_block(at, bt, n, p_limbs, npr_limbs, lazy=False):
    """Block-structured Montgomery product: at, bt (n, L) -> n rows (L,).

    Same math as _mont_mul_rows_list (full product, m = T*N' mod R,
    S = T + m*p, take S/R, conditional subtract) with the schoolbook
    accumulated into whole (2n+1, L) buffers via padded block adds —
    one pad+add per i instead of ~4n row updates.  Shifted placement
    uses pad+add because Mosaic has no scatter-add lowering."""
    L = at.shape[-1]
    pv = _splat_rows(p_limbs, L)
    nprv = _splat_rows(npr_limbs, L)

    def shift_add(acc, block, off):
        H = acc.shape[0]
        return acc + jnp.pad(block, ((off, H - off - block.shape[0]), (0, 0)))

    # pass 1: T = a*b
    acc = jnp.zeros((2 * n + 1, L), jnp.uint32)
    for i in range(n):
        prods = at[i][None, :] * bt  # (n, L) exact u32
        acc = shift_add(acc, prods & MASK, i)
        acc = shift_add(acc, prods >> LIMB_BITS, i + 1)
    T, t_carry = _carry_ripple_rows([acc[k] for k in range(2 * n)], 2 * n)

    # pass 2: m = (T mod R) * N' mod R — triangular, constant multiplicand
    Tarr = jnp.stack(T[:n])
    accm = jnp.zeros((n, L), jnp.uint32)
    for i in range(n):
        w = n - i
        pr = Tarr[i][None, :] * nprv[:w]  # (w, L)
        accm = shift_add(accm, pr & MASK, i)
        if w > 1:
            accm = shift_add(accm, (pr >> LIMB_BITS)[: w - 1], i + 1)
    m, _ = _carry_ripple_rows([accm[k] for k in range(n)], n)

    # pass 3: U = m * p, S = T + U
    accu = jnp.zeros((2 * n + 1, L), jnp.uint32)
    for i in range(n):
        pr = m[i][None, :] * pv  # (n, L)
        accu = shift_add(accu, pr & MASK, i)
        accu = shift_add(accu, pr >> LIMB_BITS, i + 1)
    S_rows = [T[k] + accu[k] for k in range(2 * n)]
    S_rows.append(t_carry + accu[2 * n])
    if lazy:
        # S < 2Rp < 2^(16*(2n+1)) when bounds hold: rows above 2n-1 are 0
        S, _ = _carry_ripple_rows(S_rows, 2 * n)
        return S[n : 2 * n]
    S, s_carry = _carry_ripple_rows(S_rows, 2 * n + 1)
    res = S[n : 2 * n]
    hi_extra = S[2 * n] + s_carry
    return _cond_sub_p_rows(res, hi_extra, p_limbs)


def _mont_mul_rows_list(at, bt, n, p_limbs, npr_limbs, lazy=False):
    """Transposed-tile Montgomery product: at, bt (n, TN) -> n rows (TN,).

    Mirrors field.mont_mul's math (full product, m = T*N' mod R, S = T+m*p,
    take S/R, conditional subtract) with all intermediates in VMEM.
    """
    z = jnp.zeros(at.shape[1:], jnp.uint32)

    # full product T = a*b in relaxed columns (row-list accumulators:
    # static slices only — Mosaic has no scatter)
    acc_lo = [z] * (2 * n)
    acc_hi = [z] * (2 * n)
    for i in range(n):
        prods = at[i][None, :] * bt  # (n, TN), exact u32
        plo = prods & MASK
        phi = prods >> LIMB_BITS
        for j in range(n):
            acc_lo[i + j] = acc_lo[i + j] + plo[j]
            acc_hi[i + j] = acc_hi[i + j] + phi[j]
    T_rows = [acc_lo[k] + (acc_hi[k - 1] if k > 0 else 0) for k in range(2 * n)]
    T, t_carry = _carry_ripple_rows(T_rows, 2 * n)

    # m = (T mod R) * N' mod R  (constant multiplicand)
    m_lo = [z] * n
    m_hi = [z] * n
    for i in range(n):
        ti = T[i]
        for j in range(n - i):
            pr = ti * np.uint32(npr_limbs[j])
            k = i + j
            m_lo[k] = m_lo[k] + (pr & MASK)
            if k + 1 < n:
                m_hi[k + 1] = m_hi[k + 1] + (pr >> LIMB_BITS)
    m_rows = [m_lo[k] + m_hi[k] for k in range(n)]
    m, _ = _carry_ripple_rows(m_rows, n)  # mod R: drop top carry

    # U = m * p (constant multiplicand), S = T + U
    u_lo = [z] * (2 * n)
    u_hi = [z] * (2 * n)
    for i in range(n):
        mi = m[i]
        for j in range(n):
            pr = mi * np.uint32(p_limbs[j])
            k = i + j
            u_lo[k] = u_lo[k] + (pr & MASK)
            u_hi[k + 1] = u_hi[k + 1] + (pr >> LIMB_BITS)
    S_rows = [T[k] + u_lo[k] + u_hi[k] for k in range(2 * n)]
    S_rows.append(t_carry)
    if lazy:
        S, _ = _carry_ripple_rows(S_rows, 2 * n)
        return S[n : 2 * n]
    S, s_carry = _carry_ripple_rows(S_rows, 2 * n + 1)
    res = S[n : 2 * n]
    hi_extra = S[2 * n] + s_carry
    return _cond_sub_p_rows(res, hi_extra, p_limbs)


def _make_kernel(n: int, p_limbs, npr_limbs):
    def kernel(a_ref, b_ref, o_ref):
        # blocks arrive pre-transposed as (n, TN): limb rows on sublanes,
        # batch on lanes — no in-kernel transposes
        rows = _mont_mul_rows(a_ref[:], b_ref[:], n, p_limbs, npr_limbs)
        o_ref[:] = jnp.stack(rows, axis=0)

    return kernel


@functools.lru_cache(maxsize=None)
def _mont_mul_call(n: int, modulus: int):
    p_limbs = _limbs_of(modulus, n)
    mont_r = 1 << (LIMB_BITS * n)
    npr = (-pow(modulus, -1, mont_r)) % mont_r
    npr_limbs = _limbs_of(npr, n)
    kernel = _make_kernel(n, p_limbs, npr_limbs)

    @jax.jit
    def call(a, b):
        # a, b: (m, n) canonical limbs; transpose in XLA (bandwidth-cheap)
        m = a.shape[0]
        grid = m // TN
        out_t = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((n, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, TN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m), jnp.uint32),
        )(a.T, b.T)
        return out_t.T

    return call


def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pallas-backed drop-in for field.mont_mul (canonical-limb I/O)."""
    n = spec.nlimbs
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, n)
    b = jnp.broadcast_to(b, shape).reshape(-1, n)
    m = a.shape[0]
    pad = (-m) % TN
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, n), jnp.uint32)], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, n), jnp.uint32)], axis=0)
    out = _mont_mul_call(n, spec.modulus)(a, b)
    if pad:
        out = out[:m]
    return out.reshape(shape)
