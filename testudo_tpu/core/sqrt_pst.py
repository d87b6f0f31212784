"""sqrt-PST: square-root-sized PST commitment with MIPP aggregation.

TPU-native counterpart of /root/reference/src/sqrt_pst.rs — THE core
witness commitment.  A 2^n evaluation table is viewed as a
2^m_row x 2^m_col matrix (m_col = n//2, m_row = n - m_col, odd case adds a
row variable — sqrt_pst.rs:38-43); each column p_i is PST-committed, the
per-column commitments are aggregated into T = prod e(com_i, h_i), and an
opening consists of (U = MSM(com_i, chi_i(b)), a MIPP proof that U folds T
correctly, and a PST opening of q(Y) = sum_j p(j, .)*chi_j at a).

Differences from the reference (behavior-preserving):
  - the whole matrix lives on device; columns are committed with ONE
    batched Pippenger pass per window (the reference commits per-column
    with rayon, sqrt_pst.rs:120-126);
  - no point reversal before the PST open (sqrt_pst.rs:221-225): our PST
    binds MSB-first, Spartan's own order (see core/pst.py docstring).

Transcript: Fq sponge (PoseidonTranscript over get_bls12377_fq_params),
exactly like sqrt_pst.rs:170, 233.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..fields.bls12_377 import R
from ..fields.host import Fq12
from ..curves import pairing as pr
from ..poly import dense
from ..tpu import curve as jc
from ..tpu import field as jf
from ..tpu import msm
from ..tpu.field import FR
from . import mipp, pst

tree_map = jax.tree_util.tree_map


@dataclass
class SqrtPstCommitment:
    comm_dev: object  # device projective G1 batch: per-column commitments
    t: Fq12  # aggregated pairing commitment T


class Polynomial:
    """Mirror of sqrt_pst.rs::Polynomial."""

    def __init__(self, matrix: jnp.ndarray, m: int, odd: int):
        self.matrix = matrix  # (2^m_row, 2^m_col, 16) Montgomery Fr
        self.m = m
        self.odd = odd
        self.q: Optional[jnp.ndarray] = None
        self.chis_b: Optional[jnp.ndarray] = None

    @staticmethod
    def from_evaluations(Z: jnp.ndarray) -> "Polynomial":
        n = Z.shape[0]
        num_vars = n.bit_length() - 1
        m_col = num_vars // 2
        m_row = num_vars - m_col
        # Z[(j << m_col) | i] = matrix[j, i]  (sqrt_pst.rs:58)
        matrix = Z.reshape(1 << m_row, 1 << m_col, FR.nlimbs)
        return Polynomial(matrix, m_col, num_vars % 2)

    @property
    def m_row(self) -> int:
        return self.m + self.odd

    def commit(self, ck: pst.CommitterKey) -> Tuple[object, Fq12]:
        """PST-commit every column + aggregate T (sqrt_pst.rs:117-149).

        All column MSMs share the same basis, so they run as one batched
        Pippenger pass (vmapped windows over columns).
        """
        level = ck.nv - self.m_row
        basis = ck.powers_of_g[level]
        cols = jnp.swapaxes(self.matrix, 0, 1)  # (2^m_col, 2^m_row, 16)
        comm_dev = _multi_msm_g1(basis, pst._to_canon_scalars(cols))
        h_vec = ck.powers_of_h[level + self.odd]
        t = pr.multi_pairing(
            jc.g1_to_affine_host(comm_dev), jc.g2_to_affine_host(h_vec)
        )
        return comm_dev, t

    def _get_q(self, point: List[int]) -> None:
        """q(Y) = sum_j (sum_i p(j, i) chi_i(b)) chi_j(Y) (sqrt_pst.rs:81)."""
        assert len(point) == 2 * self.m + self.odd
        b = point[self.m + self.odd :]
        chis = dense.eq_evals(b)  # (2^m, 16) MSB-first == get_chi_i order
        prods = jf.mont_mul(FR, self.matrix, chis[None, :, :])
        self.q = jf.reduce_sum(FR, prods, axis=1)  # (2^m_row, 16)
        self.chis_b = chis

    def eval(self, point: List[int]) -> int:
        """p(a, b) = q(a) (sqrt_pst.rs:105-115)."""
        a = point[: self.m + self.odd]
        if self.q is None:
            self._get_q(point)
        return dense.evaluate(self.q, a)

    def open(
        self,
        transcript,
        comm_dev,
        ck: pst.CommitterKey,
        point: List[int],
        t: Fq12,
    ):
        """(U, pst_proof, mipp_proof) (sqrt_pst.rs:168-230)."""
        a = point[: self.m + self.odd]
        if self.q is None:
            self._get_q(point)

        # U = MSM(com_i, chi_i(b)) — the PST commitment of q
        U = msm.msm_g1(comm_dev, pst._to_canon_scalars(self.chis_b))

        level = ck.nv - self.m_row
        h_vec = ck.powers_of_h[level + self.odd]
        mipp_proof = mipp.prove(
            transcript, ck, comm_dev, self.chis_b, h_vec, U, t
        )
        # No a-reversal: our PST binds MSB-first natively (cf.
        # sqrt_pst.rs:221-225 where the reference must reverse for ark).
        pst_proof = pst.open_(ck, self.q, a)
        return U, pst_proof, mipp_proof


def verify(
    transcript,
    vk: pst.VerifierKey,
    U,
    point: List[int],
    v: int,
    pst_proof,
    mipp_proof: mipp.MippProof,
    T: Fq12,
) -> bool:
    """Mirror of sqrt_pst.rs:232-264."""
    ln = len(point)
    odd = ln % 2
    a = point[: ln // 2 + odd]
    b = point[ln // 2 + odd :]
    res_mipp = mipp.verify(vk, transcript, mipp_proof, b, U, T)
    if not res_mipp:
        return False
    return pst.check(vk, U, a, v, pst_proof)


def _multi_msm_g1(basis, scalars_canon: jnp.ndarray):
    """Many MSMs sharing one point basis: scalars (K, N, 16) -> K points.

    Used for the per-column sqrt-PST commitments.  Runs the windowed
    bucket pipeline per column via lax.map to bound memory.
    """
    N = scalars_canon.shape[1]
    c = msm._pick_window(N)
    return msm._multi_msm_device("g1", basis, scalars_canon, c)
