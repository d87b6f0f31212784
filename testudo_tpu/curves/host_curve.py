"""Host-side elliptic curve arithmetic for BLS12-377 G1 and G2.

Points are represented in affine form as tuples of field elements; the
point at infinity is `None`.  G1 coordinates are Python ints (Fq); G2
coordinates are `Fq2` elements.  Group logic is generic over the coordinate
field via duck-typing helpers.

This is the correctness reference for the vectorized JAX curve kernels
(testudo_tpu/tpu/curve.py) and serves cold host paths (generator setup,
small scalar muls, proof verification glue).
"""
from __future__ import annotations

from typing import Optional, Tuple

from ..fields.bls12_377 import P, R, H1, H2, B1
from ..fields import host as hf
from ..fields.host import Fq2, Fq6, Fq12

# G2 curve coefficient: b2 = 1 / XI = -u/5 (D-type twist), verified at import.
B2 = Fq2(0, 1).inv()


# ---------------------------------------------------------------------------
# Generic affine group ops (coordinate field via helpers)
# ---------------------------------------------------------------------------


class _FqOps:
    @staticmethod
    def add(a, b):
        return (a + b) % P

    @staticmethod
    def sub(a, b):
        return (a - b) % P

    @staticmethod
    def mul(a, b):
        return a * b % P

    @staticmethod
    def sqr(a):
        return a * a % P

    @staticmethod
    def inv(a):
        return pow(a, -1, P)

    @staticmethod
    def neg(a):
        return (-a) % P

    @staticmethod
    def is_zero(a):
        return a % P == 0

    zero = 0
    one = 1
    b_coeff = B1


class _Fq2Ops:
    add = staticmethod(lambda a, b: a + b)
    sub = staticmethod(lambda a, b: a - b)
    mul = staticmethod(lambda a, b: a * b)
    sqr = staticmethod(lambda a: a.square())
    inv = staticmethod(lambda a: a.inv())
    neg = staticmethod(lambda a: -a)
    is_zero = staticmethod(lambda a: a.is_zero())
    zero = Fq2.zero()
    one = Fq2.one()
    b_coeff = B2


Point = Optional[Tuple[object, object]]


def _add(F, p1: Point, p2: Point) -> Point:
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if F.is_zero(F.add(y1, y2)):
            return None
        return _double(F, p1)
    lam = F.mul(F.sub(y2, y1), F.inv(F.sub(x2, x1)))
    x3 = F.sub(F.sub(F.sqr(lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    return (x3, y3)


def _double(F, p: Point) -> Point:
    if p is None:
        return None
    x, y = p
    if F.is_zero(y):
        return None
    # lambda = 3x^2 / 2y
    x2 = F.sqr(x)
    num = F.add(F.add(x2, x2), x2)
    lam = F.mul(num, F.inv(F.add(y, y)))
    x3 = F.sub(F.sqr(lam), F.add(x, x))
    y3 = F.sub(F.mul(lam, F.sub(x, x3)), y)
    return (x3, y3)


def _neg(F, p: Point) -> Point:
    if p is None:
        return None
    return (p[0], F.neg(p[1]))


def _mul(F, p: Point, k: int) -> Point:
    # scalars may exceed r (cofactor clearing), so no reduction here
    if k < 0:
        return _mul(F, _neg(F, p), -k)
    res: Point = None
    add = p
    while k:
        if k & 1:
            res = _add(F, res, add)
        add = _add(F, add, add)
        k >>= 1
    return res


def _is_on_curve(F, p: Point) -> bool:
    if p is None:
        return True
    x, y = p
    return F.sqr(y) == F.add(F.mul(F.sqr(x), x), F.b_coeff)


# Public, curve-specific wrappers ------------------------------------------


def g1_add(p1, p2):
    return _add(_FqOps, p1, p2)


def g1_neg(p):
    return _neg(_FqOps, p)


def g1_mul(p, k):
    if native.available():
        return native.g1_mul(p, k)
    return _mul(_FqOps, p, k)


def g1_is_on_curve(p):
    return _is_on_curve(_FqOps, p)


def g2_add(p1, p2):
    return _add(_Fq2Ops, p1, p2)


def g2_neg(p):
    return _neg(_Fq2Ops, p)


def g2_mul(p, k):
    if native.available():
        return native.g2_mul(p, k)
    return _mul(_Fq2Ops, p, k)


def g2_is_on_curve(p):
    return _is_on_curve(_Fq2Ops, p)


def g1_msm(points, scalars):
    """Host MSM (native Pippenger when available; device MSM in tpu/msm.py)."""
    points, scalars = list(points), [s % R for s in scalars]
    if native.available():
        return native.g1_msm(points, scalars)
    acc = None
    for pt, s in zip(points, scalars):
        if s == 0 or pt is None:
            continue
        acc = g1_add(acc, _mul(_FqOps, pt, s))
    return acc


def g2_msm(points, scalars):
    points, scalars = list(points), [s % R for s in scalars]
    if native.available():
        return native.g2_msm(points, scalars)
    acc = None
    for pt, s in zip(points, scalars):
        if s == 0 or pt is None:
            continue
        acc = g2_add(acc, _mul(_Fq2Ops, pt, s))
    return acc


# ---------------------------------------------------------------------------
# Generators (deterministic nothing-up-my-sleeve derivation)
# ---------------------------------------------------------------------------


def _find_g1_generator():
    x = 1
    while True:
        rhs = (x * x * x + B1) % P
        y = hf.fq_sqrt(rhs)
        if y is not None:
            y = min(y, P - y)
            pt = _mul(_FqOps, (x, y), H1)
            if pt is not None and _mul(_FqOps, pt, R) is None:
                return pt
        x += 1


def _find_g2_generator():
    k = 0
    while True:
        x = Fq2(k, 1)
        rhs = x.square() * x + B2
        y = rhs.sqrt()
        if y is not None:
            pt = _mul(_Fq2Ops, (x, y), H2)
            if pt is not None and _mul(_Fq2Ops, pt, R) is None:
                return pt
        k += 1


_G1_GEN = None
_G2_GEN = None


def g1_generator():
    global _G1_GEN
    if _G1_GEN is None:
        _G1_GEN = _find_g1_generator()
    return _G1_GEN


def g2_generator():
    global _G2_GEN
    if _G2_GEN is None:
        _G2_GEN = _find_g2_generator()
    return _G2_GEN


from .. import native  # noqa: E402  (bottom import: native codecs need fields only)
