"""Curve profiles: the genericity axis of the protocol layers.

The reference is generic over an arkworks pairing engine `E: Pairing` and
proves over BLS12-377, BLS12-381 and blst-backed BLS12-381 through one
implementation (r1csproof.rs:754-801, parameters.rs:2588-2634).  Here the
same role is played by a `CurveProfile`: scalar-field spec + host group
ops + pairing + Poseidon parameters + serialization + batch group
backends.  Protocol modules (core/pst.py, core/mipp.py, core/sqrt_pst.py,
core/r1csproof.py) take an optional profile and default to BLS12-377.

Backends: BLS12-377 G1/G2 batches are device limb arrays driven by the
fused Pallas MSM pipeline (tpu/msm.py).  BLS12-381 currently uses
host-side batches (affine tuples + bigint msm) — the same role ark-blst
plays for the reference: a second engine behind the same interface.  Its
Fr TABLES still run on device (FieldSpec is field-generic), so sumchecks
are accelerated on every curve; only its group ops are host-side for now.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from ..tpu.field import FR, FieldSpec

tree_map = jax.tree_util.tree_map


class GroupBackend:
    """Batch group-operation interface consumed by PST/MIPP/sqrt-PST.

    A "repr" is an opaque batched point container (device pytree for
    BLS12-377, list of host affine points for host backends)."""

    def from_affine(self, pts: List):  # -> repr
        raise NotImplementedError

    def to_affine(self, repr_) -> List:
        raise NotImplementedError

    def size(self, repr_) -> int:
        raise NotImplementedError

    def slice(self, repr_, lo: int, hi: int):
        raise NotImplementedError

    def msm(self, repr_, scalars: List[int]):  # -> host affine
        raise NotImplementedError

    def multi_msm(self, basis_repr, scal_rows: List[List[int]]):  # -> repr
        raise NotImplementedError

    def fold(self, l_repr, r_repr, c: int):  # -> repr of l + c*r
        raise NotImplementedError

    def fixed_base_mul(self, base_affine, scalars: List[int]):  # -> repr
        raise NotImplementedError


class HostGroupBackend(GroupBackend):
    """Pure-host backend over a host curve module's primitive ops."""

    def __init__(self, add, mul, msm, order: int):
        self._add = add
        self._mul = mul
        self._msm = msm
        self.order = order

    def from_affine(self, pts):
        return list(pts)

    def to_affine(self, repr_):
        return list(repr_)

    def size(self, repr_):
        return len(repr_)

    def slice(self, repr_, lo, hi):
        return repr_[lo:hi]

    def msm(self, repr_, scalars):
        return self._msm(repr_, [int(s) for s in scalars])

    def multi_msm(self, basis_repr, scal_rows):
        return [self.msm(basis_repr, row) for row in scal_rows]

    def fold(self, l_repr, r_repr, c):
        return [
            self._add(l, self._mul(r, c % self.order))
            for l, r in zip(l_repr, r_repr)
        ]

    def fixed_base_mul(self, base_affine, scalars):
        return [self._mul(base_affine, int(s) % self.order) for s in scalars]


@dataclass
class CurveProfile:
    name: str
    R: int  # scalar field modulus
    P: int  # base field modulus
    fr_spec: FieldSpec
    fr_params: Callable  # Poseidon config over Fr
    fq_params: Callable  # Poseidon config over Fq (commitment transcript)
    # host single-point ops
    g1_add: Callable
    g1_neg: Callable
    g1_mul: Callable
    g1_generator: Callable
    g2_add: Callable
    g2_neg: Callable
    g2_mul: Callable
    g2_generator: Callable
    pairing: Callable
    multi_pairing: Callable
    fq12_one: Callable
    gt_pow: Callable
    # transcript encodings
    ser_g1_uncompressed: Callable
    ser_g2_uncompressed: Callable
    ser_gt: Callable
    # batch backends
    g1b: GroupBackend = None
    g2b: GroupBackend = None
    fused_sumcheck: bool = False  # device sponge available for this curve


# ---------------------------------------------------------------------------
# BLS12-377 (default): device backends over the fused Pallas pipeline
# ---------------------------------------------------------------------------


class _Dev377Backend(GroupBackend):
    def __init__(self, group: str):
        self.group = group

    def _mods(self):
        from ..tpu import curve as jc, msm

        return jc, msm

    def from_affine(self, pts):
        jc, _ = self._mods()
        return (
            jc.g1_from_affine_host(pts)
            if self.group == "g1"
            else jc.g2_from_affine_host(pts)
        )

    def to_affine(self, repr_):
        jc, _ = self._mods()
        return (
            jc.g1_to_affine_host(repr_)
            if self.group == "g1"
            else jc.g2_to_affine_host(repr_)
        )

    def size(self, repr_):
        return jax.tree_util.tree_leaves(repr_)[0].shape[0]

    def slice(self, repr_, lo, hi):
        return tree_map(lambda c: c[lo:hi], repr_)

    def msm(self, repr_, scalars):
        _, msm = self._mods()
        fn = msm.msm_g1 if self.group == "g1" else msm.msm_g2
        return fn(repr_, scalars)

    def multi_msm(self, basis_repr, scal_rows):
        _, msm = self._mods()
        canon = jnp.asarray(
            [FR.to_limbs([int(s) for s in row]) for row in scal_rows]
        )
        return msm._multi_msm_device(
            self.group, basis_repr, canon, msm._pick_window(canon.shape[1])
        )

    def fold(self, l_repr, r_repr, c):
        from ..tpu import curve as jc

        c_canon = jnp.asarray(FR.to_limbs(c % FR.modulus))
        if self.group == "g1":
            return jc.g1_add(l_repr, jc.scalar_mul_batch_g1(r_repr, c_canon))
        return jc.g2_add(l_repr, jc.scalar_mul_batch_g2(r_repr, c_canon))

    def fixed_base_mul(self, base_affine, scalars):
        from ..tpu import curve as jc

        canon = jnp.asarray(FR.to_limbs([int(s) % FR.modulus for s in scalars]))
        fn = (
            jc.fixed_base_mul_g1 if self.group == "g1" else jc.fixed_base_mul_g2
        )
        return fn(canon, base_affine)


def _multi_pairing_377(g1s, g2s):
    """Native threaded multi-pairing when the C++ library is available
    (MIPP's per-round t_l/t_r products, mipp.rs:87-94, are the open
    path's host hot spot); pure-Python fallback otherwise."""
    from .. import native
    from ..curves import pairing as pr

    if native.available():
        return native.multi_pairing(g1s, g2s)
    return pr.multi_pairing(g1s, g2s)


def _gt_pow_377(f, e):
    from .. import native
    from ..curves import pairing as pr

    if native.available():
        return native.gt_pow(f, e)
    return pr.gt_pow(f, e)


@lru_cache(maxsize=None)
def bls12_377() -> CurveProfile:
    from ..fields.bls12_377 import P as P377, R as R377
    from ..fields.host import Fq12
    from ..curves import host_curve as hc
    from ..curves import pairing as pr
    from ..poseidon.transcript import fq_params, fr_params
    from .. import serialize as ser

    # TESTUDO_HOST_CURVE=1 swaps the device group backends for host/native
    # ones (the role HostGroupBackend already plays for BLS12-381): every
    # curve op runs through the C++ library (or pure Python), so nothing
    # curve-shaped is jit-compiled.  Used by the driver dryrun, where the
    # multi-chip property under test is the SHARDED Fr work (sumcheck
    # tables, psum'd round evals) and the XLA curve graphs' multi-minute
    # CPU compiles would otherwise blow the budget.  Value parity with the
    # device backends is exact (same canonical host affine results).
    if os.environ.get("TESTUDO_HOST_CURVE") == "1":
        g1b = HostGroupBackend(hc.g1_add, hc.g1_mul, _host_msm_g1_377, R377)
        g2b = HostGroupBackend(hc.g2_add, hc.g2_mul, _host_msm_g2_377, R377)
        fused = False
    else:
        g1b = _Dev377Backend("g1")
        g2b = _Dev377Backend("g2")
        fused = True
    return CurveProfile(
        name="bls12_377",
        R=R377,
        P=P377,
        fr_spec=FR,
        fr_params=fr_params,
        fq_params=fq_params,
        g1_add=hc.g1_add,
        g1_neg=hc.g1_neg,
        g1_mul=hc.g1_mul,
        g1_generator=hc.g1_generator,
        g2_add=hc.g2_add,
        g2_neg=hc.g2_neg,
        g2_mul=hc.g2_mul,
        g2_generator=hc.g2_generator,
        pairing=pr.pairing,
        multi_pairing=_multi_pairing_377,
        fq12_one=Fq12.one,
        gt_pow=_gt_pow_377,
        ser_g1_uncompressed=lambda pt: ser.g1_to_bytes(pt, compress=False),
        ser_g2_uncompressed=lambda pt: ser.g2_to_bytes(pt, compress=False),
        ser_gt=ser.fq12_to_bytes,
        g1b=g1b,
        g2b=g2b,
        fused_sumcheck=fused,
    )


def _host_msm_g1_377(points, scalars):
    from .. import native
    from ..curves import host_curve as hc

    if native.available():
        return native.g1_msm(list(points), [int(s) for s in scalars])
    return hc.g1_msm(list(points), [int(s) for s in scalars])


def _host_msm_g2_377(points, scalars):
    from .. import native
    from ..curves import host_curve as hc

    if native.available():
        return native.g2_msm(list(points), [int(s) for s in scalars])
    return hc.g2_msm(list(points), [int(s) for s in scalars])


# ---------------------------------------------------------------------------
# BLS12-381: host group backend (ark-blst role), device Fr tables
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def bls12_381() -> CurveProfile:
    from ..fields import bls12_381 as f381
    from ..curves import bls12_381 as c381
    from ..poseidon.transcript import fr_params_381
    from .. import serialize as ser

    FR381 = FieldSpec(f381.R, 16, "fr381")
    fq_bytes = 48

    def fq_to_bytes(x: int) -> bytes:
        return (x % f381.P).to_bytes(fq_bytes, "little")

    def _is_neg(y: int) -> bool:
        return y > f381.P - y

    def ser_g1_unc(pt) -> bytes:
        if pt is None:
            b = bytearray(2 * fq_bytes)
            b[-1] |= ser.FLAG_INFINITY
            return bytes(b)
        return fq_to_bytes(pt[0]) + fq_to_bytes(pt[1])

    def fq2_to_bytes(x) -> bytes:
        return fq_to_bytes(x.c0) + fq_to_bytes(x.c1)

    def ser_g2_unc(pt) -> bytes:
        if pt is None:
            b = bytearray(4 * fq_bytes)
            b[-1] |= ser.FLAG_INFINITY
            return bytes(b)
        return fq2_to_bytes(pt[0]) + fq2_to_bytes(pt[1])

    def ser_gt(x) -> bytes:
        out = b""
        for c6 in (x.c0, x.c1):
            for c2 in (c6.c0, c6.c1, c6.c2):
                out += fq2_to_bytes(c2)
        return out

    def gt_pow(x, e: int):
        return x.pow(e % f381.R)

    return CurveProfile(
        name="bls12_381",
        R=f381.R,
        P=f381.P,
        fr_spec=FR381,
        # BLS12-381 Poseidon: the reference only ships Fr params
        # (poseidon_params_bls12381, parameters.rs:341-2587) and its
        # 381 test path uses them for both transcripts.
        fr_params=fr_params_381,
        fq_params=fr_params_381,
        g1_add=c381.g1_add,
        g1_neg=c381.g1_neg,
        g1_mul=c381.g1_mul,
        g1_generator=c381.g1_generator,
        g2_add=c381.g2_add,
        g2_neg=c381.g2_neg,
        g2_mul=c381.g2_mul,
        g2_generator=c381.g2_generator,
        pairing=c381.pairing,
        multi_pairing=c381.multi_pairing,
        fq12_one=c381.Fq12.one,
        gt_pow=gt_pow,
        ser_g1_uncompressed=ser_g1_unc,
        ser_g2_uncompressed=ser_g2_unc,
        ser_gt=ser_gt,
        g1b=HostGroupBackend(c381.g1_add, c381.g1_mul, c381.g1_msm, f381.R),
        g2b=HostGroupBackend(c381.g2_add, c381.g2_mul, c381.g2_msm, f381.R),
        fused_sumcheck=False,
    )
