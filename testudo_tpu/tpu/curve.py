"""Batched elliptic curve arithmetic for TPU (JAX, limb-vectorized).

Replaces ark-ec/blst point arithmetic (SURVEY.md §2.3) with a TPU-first
design: points live in homogeneous projective coordinates (X:Y:Z) as limb
arrays, and addition uses the COMPLETE formulas of Renes-Costello-Batina
(EuroCrypt 2016, Algorithm 7 for a=0 curves).  Complete addition is
branchless — it is correct for P+Q, P+P, P+O and O+Q alike — which is
exactly what a SIMD machine wants: no data-dependent control flow, every
lane runs the same 12M+2mb3 sequence.

G1 points: tuples (X, Y, Z) of (..., 24)-limb Fq arrays (Montgomery form).
G2 points: tuples over Fq2 elements, each an (c0, c1) pair of Fq arrays.

The identity is (0 : 1 : 0).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import P
from ..fields.host import Fq2 as HostFq2
from ..curves.host_curve import B2
from . import field as jf
from .jitutil import eager_jit
from .field import FQ

# b3 = 3*b for G1 (b = 1)
_B3_G1 = 3

Fq2Dev = Tuple[jnp.ndarray, jnp.ndarray]

# ---------------------------------------------------------------------------
# Device Fq2 arithmetic (for G2)
# ---------------------------------------------------------------------------

_QNR = P - 5  # u^2 = -5


@eager_jit
def fq2_add(a: Fq2Dev, b: Fq2Dev) -> Fq2Dev:
    return (jf.add(FQ, a[0], b[0]), jf.add(FQ, a[1], b[1]))


@eager_jit
def fq2_sub(a: Fq2Dev, b: Fq2Dev) -> Fq2Dev:
    return (jf.sub(FQ, a[0], b[0]), jf.sub(FQ, a[1], b[1]))


@eager_jit
def fq2_neg(a: Fq2Dev) -> Fq2Dev:
    return (jf.neg(FQ, a[0]), jf.neg(FQ, a[1]))


_QNR_LIMBS = None


def _qnr_limbs():
    global _QNR_LIMBS
    if _QNR_LIMBS is None:
        _QNR_LIMBS = np.asarray(jf.const_array(FQ, _QNR))
    return _QNR_LIMBS


@eager_jit
def fq2_mul(a: Fq2Dev, b: Fq2Dev) -> Fq2Dev:
    t0 = jf.mont_mul(FQ, a[0], b[0])
    t1 = jf.mont_mul(FQ, a[1], b[1])
    s = jf.mont_mul(FQ, jf.add(FQ, a[0], a[1]), jf.add(FQ, b[0], b[1]))
    c1 = jf.sub(FQ, jf.sub(FQ, s, t0), t1)
    c0 = jf.add(FQ, t0, jf.mont_mul(FQ, t1, _qnr_limbs()))
    return (c0, c1)


@eager_jit
def fq2_select(cond, a: Fq2Dev, b: Fq2Dev) -> Fq2Dev:
    return (jf.select(cond, a[0], b[0]), jf.select(cond, a[1], b[1]))


# ---------------------------------------------------------------------------
# Generic complete addition over a coordinate-field "ops" namespace
# ---------------------------------------------------------------------------
#
# The RCB16 formulas are evaluated in STAGES: all multiplications inside a
# stage are independent and are stacked into a single batched mont_mul call
# (3 calls per add instead of 12).  This shrinks the XLA graph ~4x and
# widens every multiply, which is exactly what the VPU wants.


class _G1Ops:
    @staticmethod
    def add(a, b):
        return jf.add(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return jf.sub(FQ, a, b)

    @staticmethod
    def mul_many(pairs):
        k = len(pairs)
        A = jnp.stack([p[0] for p in pairs], axis=0)
        B = jnp.stack([p[1] for p in pairs], axis=0)
        out = jf.mont_mul(FQ, A, B)
        return [out[i] for i in range(k)]

    @staticmethod
    def mul_b3_pair(x, y):
        # b3 = 3: two additions each
        t3 = lambda v: jf.add(FQ, jf.add(FQ, v, v), v)
        return t3(x), t3(y)

    @staticmethod
    def mul_b3(x):
        return jf.add(FQ, jf.add(FQ, x, x), x)

    @staticmethod
    def select(c, a, b):
        return jf.select(c, a, b)


_B3_G2_HOST = B2 + B2 + B2  # 3 * b2 = (0, -3/5) in Fq2
# (0 + k u)(a0 + a1 u) = (qnr k a1, k a0) and qnr*k = (-5)(-3/5) = 3
_B3_K = _B3_G2_HOST.c1  # k = -3/5 mod p


def _fq2_mul_many(pairs):
    """Batched Karatsuba: one stacked mont_mul of 3k products, qnr=-5 fold
    via additions (c0 = t0 - 5 t1)."""
    k = len(pairs)
    A = jnp.stack(
        [p[0][0] for p in pairs]
        + [p[0][1] for p in pairs]
        + [jf.add(FQ, p[0][0], p[0][1]) for p in pairs],
        axis=0,
    )
    B = jnp.stack(
        [p[1][0] for p in pairs]
        + [p[1][1] for p in pairs]
        + [jf.add(FQ, p[1][0], p[1][1]) for p in pairs],
        axis=0,
    )
    out = jf.mont_mul(FQ, A, B)
    res = []
    for i in range(k):
        t0, t1, s = out[i], out[k + i], out[2 * k + i]
        c1 = jf.sub(FQ, jf.sub(FQ, s, t0), t1)
        t1_4 = jf.add(FQ, jf.add(FQ, t1, t1), jf.add(FQ, t1, t1))
        c0 = jf.sub(FQ, t0, jf.add(FQ, t1_4, t1))  # t0 - 5 t1
        res.append((c0, c1))
    return res


class _G2Ops:
    add = staticmethod(fq2_add)
    sub = staticmethod(fq2_sub)
    mul_many = staticmethod(_fq2_mul_many)
    select = staticmethod(fq2_select)

    @staticmethod
    def mul_b3_pair(x, y):
        # b3 * a = (3 a1, k a0), k = -3/5; batch the two k-muls
        kc = jnp.asarray(jf.const_array(FQ, _B3_K))
        A = jnp.stack([x[0], y[0]], axis=0)
        B = jnp.stack(
            [jnp.broadcast_to(kc, x[0].shape), jnp.broadcast_to(kc, y[0].shape)],
            axis=0,
        )
        out = jf.mont_mul(FQ, A, B)
        t3 = lambda v: jf.add(FQ, jf.add(FQ, v, v), v)
        return (t3(x[1]), out[0]), (t3(y[1]), out[1])

    @staticmethod
    def mul_b3(x):
        kc = jnp.asarray(jf.const_array(FQ, _B3_K))
        ka0 = jf.mont_mul(FQ, x[0], jnp.broadcast_to(kc, x[0].shape))
        t3 = lambda v: jf.add(FQ, jf.add(FQ, v, v), v)
        return (t3(x[1]), ka0)


def _complete_add(F, p1, p2):
    """RCB16 Algorithm 7 (a = 0): complete projective addition, staged."""
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    # stage 1: all pairwise coordinate products
    t0, t1, t2, m3, m4, m5 = F.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (F.add(Y1, Z1), F.add(Y2, Z2)),
            (F.add(X1, Z1), F.add(X2, Z2)),
        ]
    )
    t3 = F.sub(m3, F.add(t0, t1))
    t4 = F.sub(m4, F.add(t1, t2))
    Y3 = F.sub(m5, F.add(t0, t2))
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2b, Y3b = F.mul_b3_pair(t2, Y3)
    Z3 = F.add(t1, t2b)
    t1 = F.sub(t1, t2b)
    # stage 3: six independent products
    a1, a2, a3, a4, a5, a6 = F.mul_many(
        [(t4, Y3b), (t3, t1), (Y3b, t0), (t1, Z3), (t0, t3), (Z3, t4)]
    )
    X3 = F.sub(a2, a1)
    Y3 = F.add(a4, a3)
    Z3 = F.add(a6, a5)
    return (X3, Y3, Z3)


def _complete_add_mixed(F, p1, p2):
    """RCB16 Algorithm 8 (a = 0, Z2 = 1): complete mixed addition.

    p2 = (X2, Y2) is affine (coordinates in the Montgomery lift, i.e. the
    projective Z2 is implicitly mont(1)).  Complete for ANY p1 — identity,
    p1 = +-p2 — but p2 must not be the identity (callers mask such lanes).
    One fewer field mul than Algorithm 7 and about half the adds; used by
    the MSM bucket phase when the bases are affine (the reference's
    VariableBaseMSM likewise takes &[Affine] bases)."""
    X1, Y1, Z1 = p1
    X2, Y2 = p2
    t0, t1, m3, m4, m5 = F.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (Y2, Z1),
            (X2, Z1),
        ]
    )
    t3 = F.sub(m3, F.add(t0, t1))
    t4 = F.add(m4, Y1)
    Y3 = F.add(m5, X1)
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2b, Y3b = F.mul_b3_pair(Z1, Y3)
    Z3 = F.add(t1, t2b)
    t1 = F.sub(t1, t2b)
    a1, a2, a3, a4, a5, a6 = F.mul_many(
        [(t4, Y3b), (t3, t1), (Y3b, t0), (t1, Z3), (t0, t3), (Z3, t4)]
    )
    X3 = F.sub(a2, a1)
    Y3 = F.add(a4, a3)
    Z3 = F.add(a6, a5)
    return (X3, Y3, Z3)


def _complete_double(F, p):
    """RCB16 Algorithm 9 (a = 0): complete projective doubling, staged."""
    X, Y, Z = p
    t0, t1, t2, txy = F.mul_many([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
    z3 = F.add(t0, t0)
    z3 = F.add(z3, z3)
    z3 = F.add(z3, z3)  # 8 Y^2 ... follows Alg 9's Z3 pre-product value
    t2b = F.mul_b3(t2)
    y3 = F.add(t0, t2b)
    t1d = F.add(t2b, t2b)
    t2t = F.add(t1d, t2b)
    t0 = F.sub(t0, t2t)
    # products: X3 = t2b*z3, Z3 = t1*z3, Y3 = t0*y3, xf = t0*txy
    b1, b2, b3_, b4 = F.mul_many([(t2b, z3), (t1, z3), (t0, y3), (t0, txy)])
    Y3 = F.add(b1, b3_)
    X3 = F.add(b4, b4)
    Z3 = b2
    return (X3, Y3, Z3)


# -- public wrappers --------------------------------------------------------


@eager_jit
def g1_add(p1, p2):
    return _complete_add(_G1Ops, p1, p2)


@eager_jit
def g1_double(p):
    return _complete_double(_G1Ops, p)


@eager_jit
def g1_neg(p):
    return (p[0], jf.neg(FQ, p[1]), p[2])


@eager_jit
def g1_select(cond, p1, p2):
    return tuple(jf.select(cond, a, b) for a, b in zip(p1, p2))


@eager_jit(static_argnums=(0,))
def g1_identity(batch_shape=()):
    z = jnp.zeros(batch_shape + (FQ.nlimbs,), jnp.uint32)
    one = jnp.broadcast_to(jf.const_array(FQ, 1), batch_shape + (FQ.nlimbs,))
    return (z, one, jnp.zeros(batch_shape + (FQ.nlimbs,), jnp.uint32))


@eager_jit
def g2_add(p1, p2):
    return _complete_add(_G2Ops, p1, p2)


@eager_jit
def g2_double(p):
    return _complete_double(_G2Ops, p)


@eager_jit
def g2_neg(p):
    return (p[0], fq2_neg(p[1]), p[2])


@eager_jit
def g2_select(cond, p1, p2):
    return tuple(fq2_select(cond, a, b) for a, b in zip(p1, p2))


@eager_jit(static_argnums=(0,))
def g2_identity(batch_shape=()):
    def z():
        return jnp.zeros(batch_shape + (FQ.nlimbs,), jnp.uint32)

    one = jnp.broadcast_to(jf.const_array(FQ, 1), batch_shape + (FQ.nlimbs,))
    return ((z(), z()), (one, z()), (z(), z()))


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------


def g1_from_affine_host(points: List) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Affine host points ((x, y) ints or None) -> projective device arrays."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    return (
        jnp.asarray(FQ.encode(xs)),
        jnp.asarray(FQ.encode(ys)),
        jnp.asarray(FQ.encode(zs)),
    )


def g1_to_affine_host(p) -> List:
    """Projective device point(s) -> affine host points (slow; small batches)."""
    X = FQ.decode(np.asarray(p[0]).reshape(-1, FQ.nlimbs))
    Y = FQ.decode(np.asarray(p[1]).reshape(-1, FQ.nlimbs))
    Z = FQ.decode(np.asarray(p[2]).reshape(-1, FQ.nlimbs))
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, P)
            out.append((x * zi % P, y * zi % P))
    return out


def g2_from_affine_host(points: List):
    x0, x1, y0, y1, z0 = [], [], [], [], []
    for pt in points:
        if pt is None:
            x0.append(0)
            x1.append(0)
            y0.append(1)
            y1.append(0)
            z0.append(0)
        else:
            x0.append(pt[0].c0)
            x1.append(pt[0].c1)
            y0.append(pt[1].c0)
            y1.append(pt[1].c1)
            z0.append(1)
    enc = lambda v: jnp.asarray(FQ.encode(v))
    zeros = jnp.zeros((len(points), FQ.nlimbs), jnp.uint32)
    return (
        (enc(x0), enc(x1)),
        (enc(y0), enc(y1)),
        (enc(z0), zeros),
    )


def g2_to_affine_host(p) -> List:
    X0 = FQ.decode(np.asarray(p[0][0]).reshape(-1, FQ.nlimbs))
    X1 = FQ.decode(np.asarray(p[0][1]).reshape(-1, FQ.nlimbs))
    Y0 = FQ.decode(np.asarray(p[1][0]).reshape(-1, FQ.nlimbs))
    Y1 = FQ.decode(np.asarray(p[1][1]).reshape(-1, FQ.nlimbs))
    Z0 = FQ.decode(np.asarray(p[2][0]).reshape(-1, FQ.nlimbs))
    Z1 = FQ.decode(np.asarray(p[2][1]).reshape(-1, FQ.nlimbs))
    out = []
    for x0, x1, y0, y1, z0, z1 in zip(X0, X1, Y0, Y1, Z0, Z1):
        z = HostFq2(z0, z1)
        if z.is_zero():
            out.append(None)
        else:
            zi = z.inv()
            out.append((HostFq2(x0, x1) * zi, HostFq2(y0, y1) * zi))
    return out


# ---------------------------------------------------------------------------
# Batched fixed-base scalar multiplication (SRS generation)
# ---------------------------------------------------------------------------


def _bit_of(scalars_canon: jnp.ndarray, bit: jnp.ndarray) -> jnp.ndarray:
    """Extract bit `bit` (traced scalar) of each (N, 16)-limb Fr scalar."""
    limb = bit // 16
    sh = bit % 16
    col = jnp.take_along_axis(
        scalars_canon, jnp.broadcast_to(limb, (scalars_canon.shape[0], 1)), axis=1
    )[:, 0]
    return (col >> sh) & 1


def fixed_base_mul_g1(scalars_canon: jnp.ndarray, base_host):
    """[s_i] * base for one shared host affine base -> batched projective G1.

    253-step double-free ladder: host-precomputed 2^k * base table, one
    batched complete add + select per bit.  Used for SRS generation
    (g^{eq(t, b)} tables) where all lanes share the generator.
    """
    from ..curves import host_curve as hc

    nbits = 16 * 16
    doublings = []
    cur = base_host
    for _ in range(nbits):
        doublings.append(cur)
        cur = hc.g1_add(cur, cur)
    table = g1_from_affine_host(doublings)  # (nbits, ...)

    n = scalars_canon.shape[0]

    def body(i, acc):
        bit = _bit_of(scalars_canon, i)
        base_i = jax.tree_util.tree_map(
            lambda coord: jnp.broadcast_to(coord[i], (n,) + coord.shape[1:]),
            table,
        )
        new = g1_add(acc, base_i)
        return g1_select(bit == 1, new, acc)

    import jax

    return jax.lax.fori_loop(0, nbits, body, g1_identity((n,)))


def fixed_base_mul_g2(scalars_canon: jnp.ndarray, base_host):
    from ..curves import host_curve as hc
    import jax

    nbits = 16 * 16
    doublings = []
    cur = base_host
    for _ in range(nbits):
        doublings.append(cur)
        cur = hc.g2_add(cur, cur)
    table = g2_from_affine_host(doublings)

    n = scalars_canon.shape[0]

    def body(i, acc):
        bit = _bit_of(scalars_canon, i)
        base_i = jax.tree_util.tree_map(
            lambda coord: jnp.broadcast_to(coord[i], (n,) + coord.shape[1:]),
            table,
        )
        new = g2_add(acc, base_i)
        return g2_select(bit == 1, new, acc)

    return jax.lax.fori_loop(0, nbits, body, g2_identity((n,)))


# ---------------------------------------------------------------------------
# Batched single-scalar multiplication (MIPP compression folds)
# ---------------------------------------------------------------------------


def _scalar_bits_dev(scalar_canon: jnp.ndarray):
    """(16,)-limb canonical Fr scalar -> bit lookup helper."""

    def bit(i):
        limb = i // 16
        sh = i % 16
        return (scalar_canon[limb] >> sh) & 1

    return bit


_LADDER_PAD = 64  # fixed lane count for small batches: one trace/executable


def _pad_point_batch(points, target: int):
    n = jax.tree_util.tree_leaves(points)[0].shape[0]
    if n >= target:
        return points, n
    return (
        jax.tree_util.tree_map(
            lambda c: jnp.concatenate(
                [c, jnp.zeros((target - n,) + c.shape[1:], c.dtype)], axis=0
            ),
            points,
        ),
        n,
    )


@eager_jit
def _scalar_mul_ladder_g1(points, scalar_canon: jnp.ndarray):
    bit = _scalar_bits_dev(scalar_canon)
    n = points[0].shape[0]

    def body(i, state):
        acc, base = state
        acc = g1_select(jnp.broadcast_to(bit(i) == 1, (n,)), g1_add(acc, base), acc)
        return acc, g1_double(base)

    acc, _ = jax.lax.fori_loop(0, 16 * 16, body, (g1_identity((n,)), points))
    return acc


@eager_jit
def _scalar_mul_ladder_g2(points, scalar_canon: jnp.ndarray):
    bit = _scalar_bits_dev(scalar_canon)
    n = points[0][0].shape[0]

    def body(i, state):
        acc, base = state
        acc = g2_select(jnp.broadcast_to(bit(i) == 1, (n,)), g2_add(acc, base), acc)
        return acc, g2_double(base)

    acc, _ = jax.lax.fori_loop(0, 16 * 16, body, (g2_identity((n,)), points))
    return acc


def _packed_backend() -> bool:
    """Same gate as msm._use_packed (TPU backend, TESTUDO_PACKED override)."""
    from . import msm as _msm  # lazy: msm imports this module

    return _msm._use_packed()


def _scalar_mul_batch_packed(Gp, points, scalar_canon: jnp.ndarray):
    """One fused-ladder launch: [c] * P_i over a whole batch (TPU path)."""
    n = jax.tree_util.tree_leaves(points)[0].shape[0]
    target = max(128, n + (-n) % 128)
    padded, _ = _pad_point_batch(points, target)
    packed = Gp.pack(padded)
    scal = jnp.broadcast_to(scalar_canon[:, None], (scalar_canon.shape[0], target))
    acc = Gp.unpack(Gp.ladder(packed, scal))
    return jax.tree_util.tree_map(lambda c: c[:n], acc)


def scalar_mul_batch_g1(points, scalar_canon: jnp.ndarray):
    """[c] * P_i for one (dynamic) scalar applied to a whole point batch.

    LSB-first double-free: acc += bit_i ? base : 0; base = 2*base.
    On TPU this is one fused Pallas ladder launch; the XLA fallback pads
    to a fixed lane count so every call shape-shares one jitted ladder.
    """
    if _packed_backend():
        from . import pallas_curve as pcu

        return _scalar_mul_batch_packed(pcu.G1P, points, scalar_canon)
    padded, n = _pad_point_batch(points, _LADDER_PAD)
    acc = _scalar_mul_ladder_g1(padded, scalar_canon)
    return jax.tree_util.tree_map(lambda c: c[:n], acc)


def scalar_mul_batch_g2(points, scalar_canon: jnp.ndarray):
    if _packed_backend():
        from . import pallas_curve as pcu

        return _scalar_mul_batch_packed(pcu.G2P, points, scalar_canon)
    padded, n = _pad_point_batch(points, _LADDER_PAD)
    acc = _scalar_mul_ladder_g2(padded, scalar_canon)
    return jax.tree_util.tree_map(lambda c: c[:n], acc)
