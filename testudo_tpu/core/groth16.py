"""Groth16 over BLS12-377 (setup / prove / verify).

TPU-native counterpart of the reference's ark-groth16 dependency
(r1csproof.rs:27, 149, 421, 467): proves the Spartan verifier circuit
(core/circuit.py).  The prover's heavy work — the A/B/C/H/L multi-scalar
multiplications and the QAP division — runs on device (tpu/msm.py +
core/ntt.py); setup key generation uses batched fixed-base ladders.

QAP layout (standard, matching arkworks' LibsnarkReduction):
  - evaluation domain size m = next_pow2(num_constraints + num_public);
  - A_i picks up input-consistency rows: A_{pub i}(domain[nc + i]) = 1;
  - h(x) = (A(x) B(x) - C(x)) / Z(x) computed on a multiplicative coset.
"""
from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import R
from ..fields.host import Fq12
from ..curves import host_curve as hc
from ..curves import pairing as pr
from ..poly import dense
from ..tpu import curve as jc
from ..tpu import field as jf
from ..tpu import msm
from ..tpu.field import FR
from . import ntt
from .circuit import ConstraintSystem

_COSET_GEN = 5  # any non-subgroup element works; fixed for determinism


@dataclass
class ProvingKey:
    num_pub: int
    num_vars: int
    domain_log: int
    alpha_g1: object
    beta_g1: object
    beta_g2: object
    delta_g1: object
    delta_g2: object
    a_query: object  # device G1 batch, one per variable
    b_g1_query: object
    b_g2_query: object  # device G2 batch
    h_query: object  # device G1 batch (m-1)
    l_query: object  # device G1 batch (witness vars)
    vk: "VerifyingKey"


@dataclass
class VerifyingKey:
    alpha_g1: object
    beta_g2: object
    gamma_g2: object
    delta_g2: object
    gamma_abc_g1: List  # host affine, one per public var (incl. ONE)


@dataclass
class Proof:
    a: object  # host affine G1
    b: object  # host affine G2
    c: object  # host affine G1


def _qap_matrices(cs: ConstraintSystem):
    """Per-variable sparse columns of A, B, C over the extended domain."""
    nc = len(cs.constraints)
    npub = cs.num_pub
    m = 1 << max(1, (nc + npub - 1).bit_length())
    return nc, npub, m


def _lagrange_at(tau: int, m: int) -> List[int]:
    """L_j(tau) for the size-m domain: (tau^m - 1)/(m (tau - w^j)) * w^j."""
    w = ntt.root_of_unity(m.bit_length() - 1)
    zt = (pow(tau, m, R) - 1) % R
    minv = pow(m, -1, R)
    out = []
    wj = 1
    denoms = []
    for j in range(m):
        denoms.append((tau - wj) % R)
        wj = wj * w % R
    # batch invert
    inv = _batch_inv(denoms)
    wj = 1
    for j in range(m):
        out.append(zt * minv % R * inv[j] % R * wj % R)
        wj = wj * w % R
    return out


def _batch_inv(vals: List[int]) -> List[int]:
    pref = [1] * (len(vals) + 1)
    for i, v in enumerate(vals):
        pref[i + 1] = pref[i] * v % R
    total_inv = pow(pref[-1], -1, R)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = pref[i] * total_inv % R
        total_inv = total_inv * vals[i] % R
    return out


def setup(cs: ConstraintSystem, seed: bytes = b"testudo-tpu-groth16"):
    """Circuit-specific setup (CircuitGens::setup, r1csproof.rs:80-151)."""
    rng = np.random.default_rng(
        int.from_bytes(__import__("hashlib").sha256(seed).digest()[:8], "little")
    )

    def rand_fr() -> int:
        return int.from_bytes(rng.bytes(40), "little") % R

    alpha, beta, gamma, delta, tau = (rand_fr() for _ in range(5))
    nc, npub, m = _qap_matrices(cs)
    nvars = len(cs.values)

    L = _lagrange_at(tau, m)
    # per-variable A_i(tau), B_i(tau), C_i(tau)
    a_t = [0] * nvars
    b_t = [0] * nvars
    c_t = [0] * nvars
    for j, (A, B, C) in enumerate(cs.constraints):
        lj = L[j]
        for i, co in A.items():
            a_t[i] = (a_t[i] + co * lj) % R
        for i, co in B.items():
            b_t[i] = (b_t[i] + co * lj) % R
        for i, co in C.items():
            c_t[i] = (c_t[i] + co * lj) % R
    # input consistency rows (LibsnarkReduction): A_i(domain[nc + i]) = 1
    for i in range(npub):
        a_t[i] = (a_t[i] + L[nc + i]) % R

    zt = (pow(tau, m, R) - 1) % R
    dinv = pow(delta, -1, R)
    ginv = pow(gamma, -1, R)

    g1 = hc.g1_generator()
    g2 = hc.g2_generator()

    # batched fixed-base key generation
    def g1_batch(scalars: List[int]):
        return jc.fixed_base_mul_g1(jnp.asarray(FR.to_limbs(scalars)), g1)

    def g2_batch(scalars: List[int]):
        return jc.fixed_base_mul_g2(jnp.asarray(FR.to_limbs(scalars)), g2)

    a_query = g1_batch(a_t)
    b_g1_query = g1_batch(b_t)
    b_g2_query = g2_batch(b_t)

    h_scalars = []
    tp = 1
    for i in range(m - 1):
        h_scalars.append(tp * zt % R * dinv % R)
        tp = tp * tau % R
    h_query = g1_batch(h_scalars)

    l_scalars = [
        (beta * a_t[i] + alpha * b_t[i] + c_t[i]) % R * dinv % R
        for i in range(npub, nvars)
    ]
    l_query = g1_batch(l_scalars) if l_scalars else None

    gamma_abc = [
        (beta * a_t[i] + alpha * b_t[i] + c_t[i]) % R * ginv % R
        for i in range(npub)
    ]
    gamma_abc_g1 = jc.g1_to_affine_host(g1_batch(gamma_abc))

    vk = VerifyingKey(
        alpha_g1=hc.g1_mul(g1, alpha),
        beta_g2=hc.g2_mul(g2, beta),
        gamma_g2=hc.g2_mul(g2, gamma),
        delta_g2=hc.g2_mul(g2, delta),
        gamma_abc_g1=gamma_abc_g1,
    )
    pk = ProvingKey(
        num_pub=npub,
        num_vars=nvars,
        domain_log=m.bit_length() - 1,
        alpha_g1=vk.alpha_g1,
        beta_g1=hc.g1_mul(g1, beta),
        beta_g2=vk.beta_g2,
        delta_g1=hc.g1_mul(g1, delta),
        delta_g2=vk.delta_g2,
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
        vk=vk,
    )
    return pk, vk


def _witness_h(cs: ConstraintSystem, m: int) -> jnp.ndarray:
    """h coefficients via coset NTT: h = (az~ * bz~ - cz~) / Z."""
    z = cs.values
    nc = len(cs.constraints)
    npub = cs.num_pub

    def row_evals(which: int) -> List[int]:
        out = [0] * m
        for j, cons in enumerate(cs.constraints):
            lc = cons[which]
            out[j] = sum(co * z[i] for i, co in lc.items()) % R
        return out

    az = row_evals(0)
    bz = row_evals(1)
    cz = row_evals(2)
    # input consistency rows
    for i in range(npub):
        az[nc + i] = z[i]

    az_d = dense.encode_table(az)
    bz_d = dense.encode_table(bz)
    cz_d = dense.encode_table(cz)
    # to coefficients
    a_c = ntt.ntt(az_d, inverse=True)
    b_c = ntt.ntt(bz_d, inverse=True)
    c_c = ntt.ntt(cz_d, inverse=True)
    # to the coset
    g = _COSET_GEN
    a_e = ntt.ntt(ntt.coset_scale(a_c, g))
    b_e = ntt.ntt(ntt.coset_scale(b_c, g))
    c_e = ntt.ntt(ntt.coset_scale(c_c, g))
    num = jf.sub(FR, jf.mont_mul(FR, a_e, b_e), c_e)
    # Z on the coset is the constant g^m - 1
    zinv = dense.encode_scalar(pow(pow(g, m, R) - 1, -1, R))
    h_e = jf.mont_mul(FR, num, zinv)
    h_c = ntt.coset_scale(ntt.ntt(h_e, inverse=True), g, inverse=True)
    return h_c  # (m, 16); top coefficient is zero by construction


def prove(pk: ProvingKey, cs: ConstraintSystem) -> Proof:
    """Groth16 prover: 4 MSMs + QAP division, all on device."""
    assert cs.num_pub == pk.num_pub
    z = cs.values
    m = 1 << pk.domain_log

    r = secrets.randbelow(R)
    s = secrets.randbelow(R)

    z_canon = jnp.asarray(FR.to_limbs(z))
    a_acc = msm.msm_g1(pk.a_query, z_canon)
    b_acc_g2 = msm.msm_g2(pk.b_g2_query, z_canon)
    b_acc_g1 = msm.msm_g1(pk.b_g1_query, z_canon)

    h_c = _witness_h(cs, m)
    h_canon = jf.mont_mul(
        FR,
        h_c,
        jnp.broadcast_to(
            jnp.asarray(jf._int_to_limbs(1, FR.nlimbs)), h_c.shape
        ),
    )
    h_acc = msm.msm_g1(pk.h_query, h_canon[: m - 1])

    wit_canon = jnp.asarray(FR.to_limbs(z[pk.num_pub :]))
    l_acc = msm.msm_g1(pk.l_query, wit_canon)

    A = hc.g1_add(
        hc.g1_add(pk.alpha_g1, a_acc), hc.g1_mul(pk.delta_g1, r)
    )
    B = hc.g2_add(
        hc.g2_add(pk.beta_g2, b_acc_g2), hc.g2_mul(pk.delta_g2, s)
    )
    B_g1 = hc.g1_add(
        hc.g1_add(pk.beta_g1, b_acc_g1), hc.g1_mul(pk.delta_g1, s)
    )
    # C = L + H + sA + rB_g1 - rs delta
    C = hc.g1_add(l_acc, h_acc)
    C = hc.g1_add(C, hc.g1_mul(A, s))
    C = hc.g1_add(C, hc.g1_mul(B_g1, r))
    C = hc.g1_add(C, hc.g1_neg(hc.g1_mul(pk.delta_g1, r * s % R)))
    return Proof(A, B, C)


def verify(vk: VerifyingKey, public_inputs: List[int], proof: Proof) -> bool:
    """e(A, B) == e(alpha, beta) e(acc, gamma) e(C, delta)."""
    assert len(public_inputs) == len(vk.gamma_abc_g1) - 1
    acc = vk.gamma_abc_g1[0]
    for v, pt in zip(public_inputs, vk.gamma_abc_g1[1:]):
        acc = hc.g1_add(acc, hc.g1_mul(pt, v % R))
    lhs = pr.multi_pairing(
        [proof.a, hc.g1_neg(vk.alpha_g1), hc.g1_neg(acc), hc.g1_neg(proof.c)],
        [proof.b, vk.beta_g2, vk.gamma_g2, vk.delta_g2],
    )
    return lhs == Fq12.one()
