"""Row-wise Pedersen commitment for dense multilinear polynomials.

Mirror of the legacy PolyCommitment / PolyEvalProof in
/root/reference/src/dense_mlpoly.rs:175-575 — used ONLY inside the Spark
sparse-matrix commitment (comb_ops / comb_mem / derefs), not for the
witness (which uses sqrt-PST).

Commitment: view the 2^n table as 2^(n/2) rows x 2^(n-n/2) cols; commit
each row with shared Pedersen generators.  Evaluation proof: L/R factored
evaluation + DotProductProofLog over the R-side.
"""
from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..fields.bls12_377 import R
from ..curves import host_curve as hc
from ..poly import dense
from ..tpu import curve as jc
from ..tpu import field as jf
from ..tpu import msm
from ..tpu.field import FR
from . import commitments as com
from . import nizk
from . import pst as pst_mod


@dataclass
class PolyCommitmentGens:
    """dense_mlpoly.rs:176-199 (Pedersen part only; the PST part of the
    reference's PolyCommitmentGens lives in core/pst.py)."""

    num_vars: int
    gens: nizk.DotProductProofGens

    @staticmethod
    def setup(num_vars: int, label: bytes) -> "PolyCommitmentGens":
        _, right = dense.factored_lens(num_vars)
        return PolyCommitmentGens(
            num_vars, nizk.DotProductProofGens.new(1 << right, label)
        )


@dataclass
class PolyCommitment:
    C: List  # host affine G1, one commitment per row

    def write_to_transcript(self, transcript) -> None:
        for c in self.C:
            transcript.append_g1_point(c)


def commit(
    table: jnp.ndarray, gens: PolyCommitmentGens, random_blinds: bool = False
):
    """dense_mlpoly.rs:349-377.  Returns (PolyCommitment, blinds).

    All rows share the Pedersen basis, so the row commitments run as ONE
    batched shared-basis multi-MSM (the reference commits rows with a
    rayon par_iter, dense_mlpoly.rs:355-361); blind terms (hiding mode
    only) are folded in on the host afterwards."""
    n = table.shape[0]
    ell = n.bit_length() - 1
    left, right = dense.factored_lens(ell)
    L_size, R_size = 1 << left, 1 << right
    blinds = [secrets.randbelow(R) if random_blinds else 0 for _ in range(L_size)]
    rows = table.reshape(L_size, R_size, FR.nlimbs)
    canon = pst_mod._to_canon_scalars(rows)
    gens_n = gens.gens.gens_n
    cols = msm._multi_msm_device(
        "g1", gens_n.dev(), canon, msm._pick_window(R_size)
    )
    C = jc.g1_to_affine_host(cols)
    if random_blinds:
        C = [
            hc.g1_add(c, hc.g1_mul(gens_n.h, b % R))
            for c, b in zip(C, blinds)
        ]
    return PolyCommitment(C), blinds


@dataclass
class PolyEvalProof:
    proof: nizk.DotProductProofLog


def prove(
    table: jnp.ndarray,
    blinds: Optional[List[int]],
    r: List[int],
    Zr: int,
    blind_Zr: int,
    gens: PolyCommitmentGens,
    transcript,
):
    """dense_mlpoly.rs:482-534.  Returns (PolyEvalProof, C_Zr)."""
    ell = len(r)
    left, right = dense.factored_lens(ell)
    L_size = 1 << left
    if blinds is None:
        blinds = [0] * L_size
    L_table = dense.eq_evals(r[:left])
    R_table = dense.eq_evals(r[left:])
    LZ = dense.bound_L(table, L_table)  # (R_size, 16) device
    LZ_ints = dense.decode_table(LZ)
    L_ints = dense.decode_table(L_table)
    R_ints = dense.decode_table(R_table)
    LZ_blind = sum(b * l for b, l in zip(blinds, L_ints)) % R
    proof, _C_LR, C_Zr = nizk.dotproduct_prove(
        gens.gens, transcript, LZ_ints, LZ_blind, R_ints, Zr, blind_Zr
    )
    return PolyEvalProof(proof), C_Zr


def verify_plain(
    proof: PolyEvalProof,
    gens: PolyCommitmentGens,
    transcript,
    r: List[int],
    Zr: int,
    comm: PolyCommitment,
) -> bool:
    """dense_mlpoly.rs:536-574 (with a zero-blind commitment to Zr)."""
    C_Zr = com.commit_scalar(Zr, 0, gens.gens.gens_1)
    ell = len(r)
    left, right = dense.factored_lens(ell)
    L_table = dense.eq_evals(r[:left])
    L_ints = dense.decode_table(L_table)
    R_ints = dense.decode_table(dense.eq_evals(r[left:]))
    # C_LZ = MSM(comm.C, L)
    C_LZ = hc.g1_msm(comm.C, L_ints)
    return nizk.dotproduct_verify(
        proof.proof, 1 << right, gens.gens, transcript, R_ints, C_LZ, C_Zr
    )
