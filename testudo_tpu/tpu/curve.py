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

import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import P
from ..fields.host import Fq2 as HostFq2
from ..curves.host_curve import B2
from . import field as jf
from .field import FQ

# b3 = 3*b for G1 (b = 1)
_B3_G1 = 3

Fq2Dev = Tuple[jnp.ndarray, jnp.ndarray]

# ---------------------------------------------------------------------------
# Device Fq2 arithmetic (for G2)
# ---------------------------------------------------------------------------

_QNR = P - 5  # u^2 = -5


def fq2_add(a: Fq2Dev, b: Fq2Dev) -> Fq2Dev:
    return (jf.add(FQ, a[0], b[0]), jf.add(FQ, a[1], b[1]))


def fq2_sub(a: Fq2Dev, b: Fq2Dev) -> Fq2Dev:
    return (jf.sub(FQ, a[0], b[0]), jf.sub(FQ, a[1], b[1]))


def fq2_neg(a: Fq2Dev) -> Fq2Dev:
    return (jf.neg(FQ, a[0]), jf.neg(FQ, a[1]))


_QNR_LIMBS = None


def _qnr_limbs():
    global _QNR_LIMBS
    if _QNR_LIMBS is None:
        _QNR_LIMBS = jf.const_array(FQ, _QNR)
    return _QNR_LIMBS


def fq2_mul(a: Fq2Dev, b: Fq2Dev) -> Fq2Dev:
    t0 = jf.mont_mul(FQ, a[0], b[0])
    t1 = jf.mont_mul(FQ, a[1], b[1])
    s = jf.mont_mul(FQ, jf.add(FQ, a[0], a[1]), jf.add(FQ, b[0], b[1]))
    c1 = jf.sub(FQ, jf.sub(FQ, s, t0), t1)
    c0 = jf.add(FQ, t0, jf.mont_mul(FQ, t1, _qnr_limbs()))
    return (c0, c1)


def fq2_select(cond, a: Fq2Dev, b: Fq2Dev) -> Fq2Dev:
    return (jf.select(cond, a[0], b[0]), jf.select(cond, a[1], b[1]))


# ---------------------------------------------------------------------------
# Generic complete addition over a coordinate-field "ops" namespace
# ---------------------------------------------------------------------------


class _G1Ops:
    @staticmethod
    def add(a, b):
        return jf.add(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return jf.sub(FQ, a, b)

    @staticmethod
    def mul(a, b):
        return jf.mont_mul(FQ, a, b)

    @staticmethod
    def mul_b3(a):
        # b3 = 3: two additions
        return jf.add(FQ, jf.add(FQ, a, a), a)

    @staticmethod
    def select(c, a, b):
        return jf.select(c, a, b)

    @staticmethod
    def zero_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def one_like(a):
        one = jf.const_array(FQ, 1)
        return jnp.broadcast_to(one, a.shape)

    @staticmethod
    def is_zero(a):
        return jf.is_zero(FQ, a)


_B3_G2_HOST = (B2 + B2 + B2)  # 3 * b2 in Fq2


class _G2Ops:
    add = staticmethod(fq2_add)
    sub = staticmethod(fq2_sub)
    mul = staticmethod(fq2_mul)
    select = staticmethod(fq2_select)

    @staticmethod
    def mul_b3(a):
        b3c0 = jnp.broadcast_to(jf.const_array(FQ, _B3_G2_HOST.c0), a[0].shape)
        b3c1 = jnp.broadcast_to(jf.const_array(FQ, _B3_G2_HOST.c1), a[1].shape)
        return fq2_mul(a, (b3c0, b3c1))

    @staticmethod
    def zero_like(a):
        return (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))

    @staticmethod
    def one_like(a):
        one = jf.const_array(FQ, 1)
        return (jnp.broadcast_to(one, a[0].shape), jnp.zeros_like(a[1]))

    @staticmethod
    def is_zero(a):
        return jf.is_zero(FQ, a[0]) & jf.is_zero(FQ, a[1])


def _complete_add(F, p1, p2):
    """RCB16 Algorithm 7 (a = 0): complete projective addition."""
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t2 = F.mul(Z1, Z2)
    t3 = F.add(X1, Y1)
    t4 = F.add(X2, Y2)
    t3 = F.mul(t3, t4)
    t4 = F.add(t0, t1)
    t3 = F.sub(t3, t4)
    t4 = F.add(Y1, Z1)
    X3 = F.add(Y2, Z2)
    t4 = F.mul(t4, X3)
    X3 = F.add(t1, t2)
    t4 = F.sub(t4, X3)
    X3 = F.add(X1, Z1)
    Y3 = F.add(X2, Z2)
    X3 = F.mul(X3, Y3)
    Y3 = F.add(t0, t2)
    Y3 = F.sub(X3, Y3)
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2 = F.mul_b3(t2)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = F.mul_b3(Y3)
    X3 = F.mul(t4, Y3)
    t2 = F.mul(t3, t1)
    X3 = F.sub(t2, X3)
    Y3 = F.mul(Y3, t0)
    t1 = F.mul(t1, Z3)
    Y3 = F.add(t1, Y3)
    t0 = F.mul(t0, t3)
    Z3 = F.mul(Z3, t4)
    Z3 = F.add(Z3, t0)
    return (X3, Y3, Z3)


def _complete_double(F, p):
    """RCB16 Algorithm 9 (a = 0): complete projective doubling."""
    X, Y, Z = p
    t0 = F.mul(Y, Y)
    Z3 = F.add(t0, t0)
    Z3 = F.add(Z3, Z3)
    Z3 = F.add(Z3, Z3)
    t1 = F.mul(Y, Z)
    t2 = F.mul(Z, Z)
    t2 = F.mul_b3(t2)
    X3 = F.mul(t2, Z3)
    Y3 = F.add(t0, t2)
    Z3 = F.mul(t1, Z3)
    t1 = F.add(t2, t2)
    t2 = F.add(t1, t2)
    t0 = F.sub(t0, t2)
    Y3 = F.mul(t0, Y3)
    Y3 = F.add(X3, Y3)
    t1 = F.mul(X, Y)
    X3 = F.mul(t0, t1)
    X3 = F.add(X3, X3)
    return (X3, Y3, Z3)


# -- public wrappers --------------------------------------------------------


def g1_add(p1, p2):
    return _complete_add(_G1Ops, p1, p2)


def g1_double(p):
    return _complete_double(_G1Ops, p)


def g1_neg(p):
    return (p[0], jf.neg(FQ, p[1]), p[2])


def g1_select(cond, p1, p2):
    return tuple(jf.select(cond, a, b) for a, b in zip(p1, p2))


def g1_identity(batch_shape=()):
    z = jnp.zeros(batch_shape + (FQ.nlimbs,), jnp.uint32)
    one = jnp.broadcast_to(jf.const_array(FQ, 1), batch_shape + (FQ.nlimbs,))
    return (z, one, jnp.zeros(batch_shape + (FQ.nlimbs,), jnp.uint32))


def g2_add(p1, p2):
    return _complete_add(_G2Ops, p1, p2)


def g2_double(p):
    return _complete_double(_G2Ops, p)


def g2_neg(p):
    return (p[0], fq2_neg(p[1]), p[2])


def g2_select(cond, p1, p2):
    return tuple(fq2_select(cond, a, b) for a, b in zip(p1, p2))


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
