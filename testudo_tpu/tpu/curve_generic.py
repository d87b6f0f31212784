"""Generic device Weierstrass groups over arbitrary prime fields.

Factory form of tpu/curve.py's G1 machinery: the RCB16 complete formulas
are already generic over an ops namespace; this module instantiates them
for any (FieldSpec, curve b) — used for the BW6-761 outer curve, whose G1
AND G2 both live over the 761-bit prime field (k = 6, fields/bw6_761.py),
so the one-layer Groth16 wrap of the TestudoCommVerifier circuit can run
its MSMs on device with the same kernels.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bw6_761 as bwf
from . import field as jf
from .curve import _complete_add, _complete_double
from .field import FieldSpec

FQ761 = FieldSpec(bwf.Q, 48, "bw6fq")


@dataclass(frozen=True)
class FpGroup:
    """Device group ops for y^2 = x^3 + b over a prime field."""

    spec: FieldSpec
    b: int

    # -- ops namespace for the RCB16 formulas -------------------------------

    @property
    def _ops(self):
        spec = self.spec
        b3 = 3 * self.b % spec.modulus
        b3c = jf.const_array(spec, b3)

        class Ops:
            @staticmethod
            def add(a, b_):
                return jf.add(spec, a, b_)

            @staticmethod
            def sub(a, b_):
                return jf.sub(spec, a, b_)

            @staticmethod
            def mul_many(pairs):
                k = len(pairs)
                A = jnp.stack([p[0] for p in pairs], axis=0)
                B = jnp.stack([p[1] for p in pairs], axis=0)
                out = jf.mont_mul(spec, A, B)
                return [out[i] for i in range(k)]

            @staticmethod
            def mul_b3(x):
                return jf.mont_mul(
                    spec, x, jnp.broadcast_to(jnp.asarray(b3c), x.shape)
                )

            @staticmethod
            def mul_b3_pair(x, y):
                A = jnp.stack([x, y], axis=0)
                B = jnp.broadcast_to(jnp.asarray(b3c), A.shape)
                out = jf.mont_mul(spec, A, B)
                return out[0], out[1]

            @staticmethod
            def select(c, a, b_):
                return jf.select(c, a, b_)

        return Ops

    # -- group interface (matches msm.py's _G1/_G2 wrappers) ----------------

    def add(self, p1, p2):
        return _complete_add(self._ops, p1, p2)

    def double(self, p):
        return _complete_double(self._ops, p)

    def neg(self, p):
        return (p[0], jf.neg(self.spec, p[1]), p[2])

    def select(self, cond, p1, p2):
        return tuple(jf.select(cond, a, b) for a, b in zip(p1, p2))

    def identity(self, batch_shape=()):
        spec = self.spec
        z = jnp.zeros(batch_shape + (spec.nlimbs,), jnp.uint32)
        one = jnp.broadcast_to(
            jnp.asarray(jf.const_array(spec, 1)), batch_shape + (spec.nlimbs,)
        )
        return (z, one, jnp.zeros(batch_shape + (spec.nlimbs,), jnp.uint32))

    # -- host <-> device ----------------------------------------------------

    def from_affine_host(self, points: List):
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
        spec = self.spec
        return (
            jnp.asarray(spec.encode(xs)),
            jnp.asarray(spec.encode(ys)),
            jnp.asarray(spec.encode(zs)),
        )

    def to_affine_host(self, p) -> List:
        spec = self.spec
        X = spec.decode(np.asarray(p[0]).reshape(-1, spec.nlimbs))
        Y = spec.decode(np.asarray(p[1]).reshape(-1, spec.nlimbs))
        Z = spec.decode(np.asarray(p[2]).reshape(-1, spec.nlimbs))
        out = []
        q = spec.modulus
        for x, y, z in zip(X, Y, Z):
            if z == 0:
                out.append(None)
            else:
                zi = pow(z, -1, q)
                out.append((x * zi % q, y * zi % q))
        return out


@lru_cache(maxsize=None)
def bw6_g1() -> FpGroup:
    return FpGroup(FQ761, bwf.B1)


@lru_cache(maxsize=None)
def bw6_g2() -> FpGroup:
    return FpGroup(FQ761, bwf.B2)


def _bit_of(scalars_canon: jnp.ndarray, bit) -> jnp.ndarray:
    limb = bit // 16
    sh = bit % 16
    col = jnp.take_along_axis(
        scalars_canon,
        jnp.broadcast_to(limb, (scalars_canon.shape[0], 1)),
        axis=1,
    )[:, 0]
    return (col >> sh) & 1


def fixed_base_mul(G: FpGroup, scalars_canon: jnp.ndarray, base_host,
                   host_add):
    """[s_i] * base (shared host affine base) -> batched projective points.

    Generic form of curve.fixed_base_mul_g1: host-precomputed doubling
    table + one batched complete add/select per scalar bit."""
    nbits = 16 * scalars_canon.shape[1]
    doublings = []
    cur = base_host
    for _ in range(nbits):
        doublings.append(cur)
        cur = host_add(cur, cur)
    table = G.from_affine_host(doublings)
    n = scalars_canon.shape[0]

    def body(i, acc):
        bit = _bit_of(scalars_canon, i)
        base_i = jax.tree_util.tree_map(
            lambda coord: jnp.broadcast_to(coord[i], (n,) + coord.shape[1:]),
            table,
        )
        new = G.add(acc, base_i)
        return G.select(bit == 1, new, acc)

    return jax.lax.fori_loop(0, nbits, body, G.identity((n,)))
