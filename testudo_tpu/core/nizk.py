"""Log-size dot-product argument (Bullet reduction + sigma protocol).

Mirror of /root/reference/src/nizk/mod.rs and nizk/bullet.rs (the
bulletproofs-style IPA Spartan uses inside the Spark sparse commitment).
Transcript: Fr sponge; points absorbed COMPRESSED (append_point).

Device usage: the per-round generator folds G_L*u_inv + G_R*u and the
cross MSMs run on the TPU; scalar vector folds are small host loops.
"""
from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import List, Tuple

import jax.numpy as jnp

from ..fields.bls12_377 import R
from ..curves import host_curve as hc
from ..tpu import curve as jc
from ..tpu import field as jf
from ..tpu import msm
from ..tpu.field import FR
from . import commitments as com

tree_map_slice = None


def _rand_fr() -> int:
    return secrets.randbelow(R)


@dataclass
class BulletReductionProof:
    L_vec: List  # host affine points
    R_vec: List


def bullet_prove(
    transcript,
    Q,
    G_vec: List,
    H,
    a_vec: List[int],
    b_vec: List[int],
    blind: int,
    blinds_vec: List[Tuple[int, int]],
):
    """bullet.rs:36-152.  Returns (proof, Gamma_hat, a_hat, b_hat, g_hat,
    blind_fin)."""
    n = len(G_vec)
    assert n & (n - 1) == 0
    a = list(a_vec)
    b = list(b_vec)
    G_dev = jc.g1_from_affine_host(G_vec)
    L_vec, R_vec = [], []
    blind_fin = blind % R
    blinds_iter = iter(blinds_vec)

    while n != 1:
        n //= 2
        a_L, a_R = a[:n], a[n:]
        b_L, b_R = b[:n], b[n:]
        c_L = sum(x * y for x, y in zip(a_L, b_R)) % R
        c_R = sum(x * y for x, y in zip(a_R, b_L)) % R
        blind_L, blind_R = next(blinds_iter)

        G_L = jax_slice(G_dev, 0, n)
        G_R = jax_slice(G_dev, n, n)
        # L = MSM(G_R || Q || H, a_L || c_L || blind_L)
        L_base = msm.msm_g1(G_R, a_L)
        L = hc.g1_add(
            L_base,
            hc.g1_add(hc.g1_mul(Q, c_L), hc.g1_mul(H, blind_L % R)),
        )
        R_base = msm.msm_g1(G_L, a_R)
        Rp = hc.g1_add(
            R_base,
            hc.g1_add(hc.g1_mul(Q, c_R), hc.g1_mul(H, blind_R % R)),
        )

        transcript.append_g1_point(L)
        transcript.append_g1_point(Rp)
        u = transcript.challenge_scalar(R)
        u_inv = pow(u, -1, R)

        a = [(x * u + u_inv * y) % R for x, y in zip(a_L, a_R)]
        b = [(x * u_inv + u * y) % R for x, y in zip(b_L, b_R)]
        # G_L[i] <- u_inv * G_L[i] + u * G_R[i]
        G_dev = jc.g1_add(
            jc.scalar_mul_batch_g1(G_L, jnp.asarray(FR.to_limbs(u_inv))),
            jc.scalar_mul_batch_g1(G_R, jnp.asarray(FR.to_limbs(u))),
        )
        blind_fin = (blind_fin + u * u * blind_L + u_inv * u_inv * blind_R) % R
        L_vec.append(L)
        R_vec.append(Rp)

    g_hat = jc.g1_to_affine_host(G_dev)[0]
    Gamma_hat = hc.g1_add(
        hc.g1_mul(g_hat, a[0]),
        hc.g1_add(hc.g1_mul(Q, a[0] * b[0] % R), hc.g1_mul(H, blind_fin)),
    )
    return (
        BulletReductionProof(L_vec, R_vec),
        Gamma_hat,
        a[0],
        b[0],
        g_hat,
        blind_fin,
    )


def jax_slice(points, start, size):
    import jax

    return jax.tree_util.tree_map(lambda c: c[start : start + size], points)


def bullet_verification_scalars(proof: BulletReductionProof, n: int, transcript):
    """bullet.rs:157-218."""
    lg_n = len(proof.L_vec)
    assert n == 1 << lg_n
    challenges = []
    for L, Rp in zip(proof.L_vec, proof.R_vec):
        transcript.append_g1_point(L)
        transcript.append_g1_point(Rp)
        challenges.append(transcript.challenge_scalar(R))
    challenges_inv = [pow(c, -1, R) for c in challenges]
    allinv = 1
    for c in challenges_inv:
        allinv = allinv * c % R
    challenges_sq = [c * c % R for c in challenges]
    challenges_inv_sq = [c * c % R for c in challenges_inv]
    s = [allinv]
    for i in range(1, n):
        lg_i = i.bit_length() - 1
        k = 1 << lg_i
        s.append(s[i - k] * challenges_sq[(lg_n - 1) - lg_i] % R)
    return challenges_sq, challenges_inv_sq, s


def bullet_verify(
    proof: BulletReductionProof, n: int, a: List[int], transcript, Gamma, Gs_dev
):
    """bullet.rs:224-260.  Returns (g_hat, Gamma_hat, a_hat)."""
    u_sq, u_inv_sq, s = bullet_verification_scalars(proof, n, transcript)
    g_hat = msm.msm_g1(Gs_dev, s, affine=True)
    a_hat = 0
    for x, y in zip(a, s):
        a_hat = (a_hat + x * y) % R
    pts = proof.L_vec + proof.R_vec + [Gamma]
    scals = u_sq + u_inv_sq + [1]
    Gamma_hat = hc.g1_msm(pts, scals)
    return g_hat, Gamma_hat, a_hat


@dataclass
class DotProductProofGens:
    n: int
    gens_n: com.MultiCommitGens
    gens_1: com.MultiCommitGens

    @staticmethod
    def new(n: int, label: bytes) -> "DotProductProofGens":
        gens_n, gens_1 = com.MultiCommitGens.new(n + 1, label).split_at(n)
        return DotProductProofGens(n, gens_n, gens_1)


@dataclass
class DotProductProofLog:
    bullet_reduction_proof: BulletReductionProof
    delta: object
    beta: object
    z1: int
    z2: int


def dotproduct_prove(
    gens: DotProductProofGens,
    transcript,
    x_vec: List[int],
    blind_x: int,
    a_vec: List[int],
    y: int,
    blind_y: int,
):
    """nizk/mod.rs:45-125.  Returns (proof, Cx, Cy)."""
    n = len(x_vec)
    assert len(a_vec) == n and gens.n == n
    d = _rand_fr()
    r_delta = _rand_fr()
    r_beta = _rand_fr()
    lg_n = n.bit_length() - 1
    blinds_vec = [(_rand_fr(), _rand_fr()) for _ in range(2 * lg_n)]

    Cx = com.commit_slice_dev(jnp.asarray(FR.to_limbs(x_vec)), blind_x, gens.gens_n)
    transcript.append_g1_point(Cx)
    Cy = com.commit_scalar(y, blind_y, gens.gens_1)
    transcript.append_g1_point(Cy)
    transcript.append_scalar_vector(a_vec, R)

    blind_Gamma = (blind_x + blind_y) % R
    proof, _Gamma_hat, x_hat, a_hat, g_hat, rhat_Gamma = bullet_prove(
        transcript,
        gens.gens_1.G[0],
        gens.gens_n.G,
        gens.gens_n.h,
        x_vec,
        a_vec,
        blind_Gamma,
        blinds_vec,
    )
    y_hat = x_hat * a_hat % R

    gens_hat = com.MultiCommitGens(1, [g_hat], gens.gens_1.h)
    delta = com.commit_scalar(d, r_delta, gens_hat)
    transcript.append_g1_point(delta)
    beta = com.commit_scalar(d, r_beta, gens.gens_1)
    transcript.append_g1_point(beta)
    c = transcript.challenge_scalar(R)

    z1 = (d + c * y_hat) % R
    z2 = (a_hat * (c * rhat_Gamma + r_beta) + r_delta) % R
    return DotProductProofLog(proof, delta, beta, z1, z2), Cx, Cy


def dotproduct_verify(
    proof: DotProductProofLog,
    n: int,
    gens: DotProductProofGens,
    transcript,
    a: List[int],
    Cx,
    Cy,
) -> bool:
    """nizk/mod.rs:127-179."""
    assert gens.n == n and len(a) == n
    transcript.append_g1_point(Cx)
    transcript.append_g1_point(Cy)
    transcript.append_scalar_vector(a, R)
    Gamma = hc.g1_add(Cx, Cy)
    g_hat, Gamma_hat, a_hat = bullet_verify(
        proof.bullet_reduction_proof, n, a, transcript, Gamma, gens.gens_n.dev()
    )
    transcript.append_g1_point(proof.delta)
    transcript.append_g1_point(proof.beta)
    c = transcript.challenge_scalar(R)
    lhs = hc.g1_add(
        hc.g1_mul(hc.g1_add(hc.g1_mul(Gamma_hat, c), proof.beta), a_hat),
        proof.delta,
    )
    rhs = hc.g1_add(
        hc.g1_mul(
            hc.g1_add(g_hat, hc.g1_mul(gens.gens_1.G[0], a_hat)), proof.z1
        ),
        hc.g1_mul(gens.gens_1.h, proof.z2),
    )
    return lhs == rhs
