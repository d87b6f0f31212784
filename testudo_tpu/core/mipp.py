"""MIPP: multi-inner-product-pairing argument (GIPA/TIPP-style).

TPU-native counterpart of /root/reference/src/mipp.rs.  Proves that
U = sum_i y_i * A_i opens the pairing commitment T = prod_i e(A_i, h_i).

Per halving round (mipp.rs:58-120):
  - cross commitments u_l = MSM(a_l, y_r), u_r = MSM(a_r, y_l) — device
    Pippenger MSMs;
  - cross pairings t_l = prod e(a_l, h_r), t_r = prod e(a_r, h_l);
  - absorb u_l, u_r, t_l, t_r (generic/uncompressed append, mipp.rs:97-100)
    into the Fq transcript, squeeze c_inv (an Fr challenge), set
    c = c_inv^-1 (mipp.rs:101-106);
  - compress a <- a_l + c * a_r, y <- y_l + c_inv * y_r,
    h <- h_l + c_inv * h_r — batched single-scalar ladders on device.

Final step: the structured polynomial p_h with evals
prod-over-set-bits cs_inv[m-1-bit] (mipp.rs:159-180) is committed in G2
(must equal final_h) and opened at transcript challenges rs via the PST G2
side.  Note on indexing: this implementation's PST binds variables
MSB-first (see core/pst.py), so the verifier computes
p_h(rs) = prod_i (1 - rs_i + cs_inv[i] * rs_i) — the same polynomial the
reference evaluates with reversed coefficient order against ark's
LSB-first binding (mipp.rs:294-297).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..fields.bls12_377 import R
from ..fields.host import Fq12
from ..curves import host_curve as hc
from ..curves import pairing as pr
from ..poly import dense
from ..tpu import curve as jc
from ..tpu import field as jf
from ..tpu import msm
from ..tpu.field import FR
from . import pst

tree_map = jax.tree_util.tree_map


@dataclass
class MippProof:
    comms_t: List[Tuple[Fq12, Fq12]]
    comms_u: List[Tuple[object, object]]  # pairs of host affine G1
    final_a: object  # host affine G1
    final_h: object  # host affine G2
    pst_proof_h: List  # G2 proofs


def _halves(tree):
    n = jax.tree_util.tree_leaves(tree)[0].shape[0]
    half = n // 2
    lo = tree_map(lambda c: c[:half], tree)
    hi = tree_map(lambda c: c[half:], tree)
    return lo, hi


def prove(
    transcript,
    ck: pst.CommitterKey,
    a_dev,  # device projective G1 batch (the column commitments)
    y_mont: jnp.ndarray,  # device Montgomery Fr scalars (chi(b))
    h_dev,  # device projective G2 batch (ck.powers_of_h[odd])
    U,  # host affine G1
    T: Fq12,
) -> MippProof:
    n = y_mont.shape[0]
    m = n.bit_length() - 1
    comms_t, comms_u, xs, xs_inv = [], [], [], []

    transcript.append_g1_uncompressed(U)  # mipp.rs:56

    m_a, m_y, m_h = a_dev, y_mont, h_dev
    while jax.tree_util.tree_leaves(m_a)[0].shape[0] > 1:
        a_l, a_r = _halves(m_a)
        y_l, y_r = _halves(m_y)
        h_l, h_r = _halves(m_h)

        comm_u_l = msm.msm_g1(a_l, pst._to_canon_scalars(y_r))
        comm_u_r = msm.msm_g1(a_r, pst._to_canon_scalars(y_l))
        comm_t_l = pr.multi_pairing(
            jc.g1_to_affine_host(a_l), jc.g2_to_affine_host(h_r)
        )
        comm_t_r = pr.multi_pairing(
            jc.g1_to_affine_host(a_r), jc.g2_to_affine_host(h_l)
        )

        transcript.append_g1_uncompressed(comm_u_l)
        transcript.append_g1_uncompressed(comm_u_r)
        transcript.append_gt_uncompressed(comm_t_l)
        transcript.append_gt_uncompressed(comm_t_r)
        c_inv = transcript.challenge_scalar(R)
        c = pow(c_inv, -1, R)

        c_canon = jnp.asarray(FR.to_limbs(c))
        c_inv_canon = jnp.asarray(FR.to_limbs(c_inv))
        m_a = jc.g1_add(a_l, jc.scalar_mul_batch_g1(a_r, c_canon))
        m_y = jf.add(
            FR, y_l, jf.mont_mul(FR, y_r, jnp.asarray(FR.encode(c_inv)))
        )
        m_h = jc.g2_add(h_l, jc.scalar_mul_batch_g2(h_r, c_inv_canon))

        comms_t.append((comm_t_l, comm_t_r))
        comms_u.append((comm_u_l, comm_u_r))
        xs.append(c)
        xs_inv.append(c_inv)

    final_a = jc.g1_to_affine_host(m_a)[0]
    final_h = jc.g2_to_affine_host(m_h)[0]

    # structured polynomial p_h (mipp.rs:159-180)
    evals = _ph_evals(xs_inv)
    table = dense.encode_table(evals)
    # (commit_g2(table) == final_h by construction; asserted in tests)

    rs = [transcript.challenge_scalar(R) for _ in range(m)]
    pst_proof_h = pst.open_g2(ck, table, rs)

    return MippProof(comms_t, comms_u, final_a, final_h, pst_proof_h)


def _ph_evals(cs_inv: List[int]) -> List[int]:
    """Evals of prod_i (1 - z_i + cs_inv[m-1-i] z_i) over the hypercube
    (mipp.rs:159-180: bit j (lsb) set -> factor cs_inv[m-1-j])."""
    m = len(cs_inv)
    out = []
    for i in range(1 << m):
        acc = 1
        for j in range(m):
            if (i >> j) & 1:
                acc = acc * cs_inv[m - j - 1] % R
        out.append(acc)
    return out


def verify(
    vk: pst.VerifierKey,
    transcript,
    proof: MippProof,
    point_b: List[int],
    U,  # host affine G1
    T: Fq12,
) -> bool:
    xs, xs_inv = [], []
    final_y = 1

    transcript.append_g1_uncompressed(U)

    for i, ((u_l, u_r), (t_l, t_r)) in enumerate(
        zip(proof.comms_u, proof.comms_t)
    ):
        transcript.append_g1_uncompressed(u_l)
        transcript.append_g1_uncompressed(u_r)
        transcript.append_gt_uncompressed(t_l)
        transcript.append_gt_uncompressed(t_r)
        c_inv = transcript.challenge_scalar(R)
        c = pow(c_inv, -1, R)
        xs.append(c)
        xs_inv.append(c_inv)
        final_y = final_y * (1 + c_inv * point_b[i] - point_b[i]) % R

    # fold T and U with the challenges (mipp.rs:240-277)
    tc = T
    uc = U
    for (u_l, u_r), (t_l, t_r), c, c_inv in zip(
        proof.comms_u, proof.comms_t, xs, xs_inv
    ):
        tc = tc * pr.gt_pow(t_l, c_inv) * pr.gt_pow(t_r, c)
        uc = hc.g1_add(uc, hc.g1_add(hc.g1_mul(u_l, c_inv), hc.g1_mul(u_r, c)))

    m = len(xs_inv)
    rs = [transcript.challenge_scalar(R) for _ in range(m)]
    # p_h(rs) in O(m) -- MSB-first binding means cs_inv in forward order
    v = 1
    for i in range(m):
        v = v * (1 - rs[i] + xs_inv[i] * rs[i]) % R

    check_h = pst.check_g2(vk, proof.final_h, rs, v, proof.pst_proof_h)
    if not check_h:
        return False

    final_t = pr.pairing(proof.final_a, proof.final_h)
    if tc != final_t:
        return False

    final_u = hc.g1_mul(proof.final_a, final_y)
    if uc != final_u:
        return False
    return True
