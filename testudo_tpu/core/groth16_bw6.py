"""Groth16 over BW6-761 — the one-layer recursion wrap.

Proves the Fq-native TestudoCommVerifier constraint system
(core/circuit_verifier.py) over the outer curve BW6-761, whose scalar
field IS BLS12-377's Fq (fields/bw6_761.py).  This realizes the
composition the reference fork left commented out
(circuit_verifier.rs:653-658: "Groth16::<BW6_761>...").

Same algorithm as core/groth16.py (LibsnarkReduction QAP layout, coset
NTT division, 4 proving MSMs) with the BW6 bindings: scalar arithmetic
mod q377 on the 24-limb device spec, G1/G2 both on the 761-bit curve via
the generic device group (tpu/curve_generic.py), verification through the
host Tate pairing (curves/bw6_761.py).
"""
from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import List

import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import P as R  # BW6 scalar field = BLS12-377 Fq
from ..curves import bw6_761 as bw
from ..tpu import curve_generic as cg
from ..tpu import field as jf
from ..tpu import msm
from ..tpu.field import FQ  # 24-limb spec of the scalar field
from . import ntt
from .circuit import ConstraintSystem

_COSET_GEN = 7  # fixed non-subgroup coset shift


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
    a_query: object
    b_g1_query: object
    b_g2_query: object
    h_query: object
    l_query: object
    vk: "VerifyingKey"


@dataclass
class VerifyingKey:
    alpha_g1: object
    beta_g2: object
    gamma_g2: object
    delta_g2: object
    gamma_abc_g1: List


@dataclass
class Proof:
    a: object
    b: object
    c: object


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


def _lagrange_at(tau: int, m: int) -> List[int]:
    w = ntt.root_of_unity(m.bit_length() - 1, R)
    zt = (pow(tau, m, R) - 1) % R
    minv = pow(m, -1, R)
    denoms = []
    wj = 1
    for _ in range(m):
        denoms.append((tau - wj) % R)
        wj = wj * w % R
    inv = _batch_inv(denoms)
    out = []
    wj = 1
    for j in range(m):
        out.append(zt * minv % R * inv[j] % R * wj % R)
        wj = wj * w % R
    return out


def setup(cs: ConstraintSystem, seed: bytes = b"testudo-tpu-groth16-bw6"):
    """Circuit-specific setup over BW6-761.

    The circuit must be over Fq (cs.modulus == q377), e.g. the output of
    circuit_verifier.build_comm_verifier."""
    assert cs.modulus == R, "BW6 Groth16 proves Fq-field circuits"
    rng = np.random.default_rng(
        int.from_bytes(__import__("hashlib").sha256(seed).digest()[:8], "little")
    )

    def rand_fr() -> int:
        return int.from_bytes(rng.bytes(56), "little") % R

    alpha, beta, gamma, delta, tau = (rand_fr() for _ in range(5))
    nc = len(cs.constraints)
    npub = cs.num_pub
    m = 1 << max(1, (nc + npub - 1).bit_length())
    nvars = len(cs.values)

    L = _lagrange_at(tau, m)
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
    for i in range(npub):
        a_t[i] = (a_t[i] + L[nc + i]) % R

    zt = (pow(tau, m, R) - 1) % R
    dinv = pow(delta, -1, R)
    ginv = pow(gamma, -1, R)

    g1 = bw.g1_generator()
    g2 = bw.g2_generator()
    G1, G2 = cg.bw6_g1(), cg.bw6_g2()

    def g1_batch(scalars: List[int]):
        return cg.fixed_base_mul(
            G1, jnp.asarray(FQ.to_limbs(scalars)), g1, bw.g1_add
        )

    def g2_batch(scalars: List[int]):
        return cg.fixed_base_mul(
            G2, jnp.asarray(FQ.to_limbs(scalars)), g2, bw.g2_add
        )

    a_query = g1_batch(a_t)
    b_g1_query = g1_batch(b_t)
    b_g2_query = g2_batch(b_t)

    h_scalars = []
    tp = 1
    for _ in range(m - 1):
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
    gamma_abc_g1 = G1.to_affine_host(g1_batch(gamma_abc))

    vk = VerifyingKey(
        alpha_g1=bw.g1_mul(g1, alpha),
        beta_g2=bw.g2_mul(g2, beta),
        gamma_g2=bw.g2_mul(g2, gamma),
        delta_g2=bw.g2_mul(g2, delta),
        gamma_abc_g1=gamma_abc_g1,
    )
    pk = ProvingKey(
        num_pub=npub,
        num_vars=nvars,
        domain_log=m.bit_length() - 1,
        alpha_g1=vk.alpha_g1,
        beta_g1=bw.g1_mul(g1, beta),
        beta_g2=vk.beta_g2,
        delta_g1=bw.g1_mul(g1, delta),
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
    z = cs.values
    nc = len(cs.constraints)
    npub = cs.num_pub

    def row_evals(which: int) -> List[int]:
        out = [0] * m
        for j, cons in enumerate(cs.constraints):
            out[j] = sum(co * z[i] for i, co in cons[which].items()) % R
        return out

    az = row_evals(0)
    bz = row_evals(1)
    cz = row_evals(2)
    for i in range(npub):
        az[nc + i] = z[i]

    enc = lambda vals: jnp.asarray(FQ.encode(vals))
    a_c = ntt.ntt(enc(az), inverse=True, modulus=R)
    b_c = ntt.ntt(enc(bz), inverse=True, modulus=R)
    c_c = ntt.ntt(enc(cz), inverse=True, modulus=R)
    g = _COSET_GEN
    a_e = ntt.ntt(ntt.coset_scale(a_c, g, modulus=R), modulus=R)
    b_e = ntt.ntt(ntt.coset_scale(b_c, g, modulus=R), modulus=R)
    c_e = ntt.ntt(ntt.coset_scale(c_c, g, modulus=R), modulus=R)
    num = jf.sub(FQ, jf.mont_mul(FQ, a_e, b_e), c_e)
    zinv = jnp.asarray(FQ.encode(pow(pow(g, m, R) - 1, -1, R)))
    h_e = jf.mont_mul(FQ, num, zinv)
    h_c = ntt.coset_scale(
        ntt.ntt(h_e, inverse=True, modulus=R), g, inverse=True, modulus=R
    )
    return h_c


def prove(pk: ProvingKey, cs: ConstraintSystem) -> Proof:
    assert cs.num_pub == pk.num_pub
    z = cs.values
    m = 1 << pk.domain_log

    r = secrets.randbelow(R)
    s = secrets.randbelow(R)
    G1, G2 = cg.bw6_g1(), cg.bw6_g2()

    z_canon = jnp.asarray(FQ.to_limbs(z))
    a_acc = msm.msm_fp(G1, bw.g1_add, pk.a_query, z_canon)
    b_acc_g2 = msm.msm_fp(G2, bw.g2_add, pk.b_g2_query, z_canon)
    b_acc_g1 = msm.msm_fp(G1, bw.g1_add, pk.b_g1_query, z_canon)

    h_c = _witness_h(cs, m)
    h_canon = jf.mont_mul(
        FQ,
        h_c,
        jnp.broadcast_to(jnp.asarray(jf._int_to_limbs(1, FQ.nlimbs)), h_c.shape),
    )
    h_acc = msm.msm_fp(G1, bw.g1_add, pk.h_query, h_canon[: m - 1])

    wit_canon = jnp.asarray(FQ.to_limbs(z[pk.num_pub :]))
    l_acc = msm.msm_fp(G1, bw.g1_add, pk.l_query, wit_canon)

    A = bw.g1_add(bw.g1_add(pk.alpha_g1, a_acc), bw.g1_mul(pk.delta_g1, r))
    B = bw.g2_add(bw.g2_add(pk.beta_g2, b_acc_g2), bw.g2_mul(pk.delta_g2, s))
    B_g1 = bw.g1_add(
        bw.g1_add(pk.beta_g1, b_acc_g1), bw.g1_mul(pk.delta_g1, s)
    )
    C = bw.g1_add(l_acc, h_acc)
    C = bw.g1_add(C, bw.g1_mul(A, s))
    C = bw.g1_add(C, bw.g1_mul(B_g1, r))
    C = bw.g1_add(C, bw.g1_neg(bw.g1_mul(pk.delta_g1, r * s % R)))
    return Proof(A, B, C)


def verify(vk: VerifyingKey, public_inputs: List[int], proof: Proof) -> bool:
    """e(A, B) == e(alpha, beta) e(acc, gamma) e(C, delta) over BW6-761."""
    assert len(public_inputs) == len(vk.gamma_abc_g1) - 1
    acc = vk.gamma_abc_g1[0]
    for v, pt in zip(public_inputs, vk.gamma_abc_g1[1:]):
        acc = bw.g1_add(acc, bw.g1_mul(pt, v % R))
    lhs = bw.multi_pairing(
        [proof.a, bw.g1_neg(vk.alpha_g1), bw.g1_neg(acc), bw.g1_neg(proof.c)],
        [proof.b, vk.beta_g2, vk.gamma_g2, vk.delta_g2],
    )
    return lhs == bw.Fq6.one()
