"""Proof serialization and sizing (CanonicalSerialize equivalents).

The reference's only persistence is CanonicalSerialize on proof structs
(SURVEY.md §5 checkpoint/resume).  This module serializes every proof
object this library produces into the arkworks-compatible byte layout
(serialize.py conventions: compressed points, u64-length-prefixed vectors)
and reports sizes for the bench harnesses (benches/pst.rs:19,
benches/testudo.rs:22-24).
"""
from __future__ import annotations

from typing import List

from .fields.host import Fq12
from . import serialize as ser
from .core import mipp as mipp_mod
from .core import r1csproof as rp
from .core import snark as snark_mod


def ser_unipoly(p) -> bytes:
    return ser.vec_to_bytes(p.coeffs, ser.fr_to_bytes)


def ser_sumcheck(s) -> bytes:
    return ser.vec_to_bytes(s.polys, ser_unipoly)


def ser_mipp(m: mipp_mod.MippProof) -> bytes:
    out = bytearray()
    out += ser.vec_to_bytes(
        m.comms_t, lambda t: ser.fq12_to_bytes(t[0]) + ser.fq12_to_bytes(t[1])
    )
    out += ser.vec_to_bytes(
        m.comms_u,
        lambda u: ser.g1_to_bytes(u[0], True) + ser.g1_to_bytes(u[1], True),
    )
    out += ser.g1_to_bytes(m.final_a, True)
    out += ser.g2_to_bytes(m.final_h, True)
    out += ser.vec_to_bytes(m.pst_proof_h, lambda p: ser.g2_to_bytes(p, True))
    return bytes(out)


def ser_pst_proof(proofs: List) -> bytes:
    return ser.vec_to_bytes(proofs, lambda p: ser.g1_to_bytes(p, True))


def ser_r1cs_proof(p: rp.R1CSProof) -> bytes:
    out = bytearray()
    out += ser.g1_to_bytes(p.comm_U, True)
    out += ser_sumcheck(p.sc_proof_phase1)
    for c in p.claims_phase2:
        out += ser.fr_to_bytes(c)
    out += ser_sumcheck(p.sc_proof_phase2)
    out += ser.fr_to_bytes(p.eval_vars_at_ry)
    out += ser_pst_proof(p.proof_eval_vars_at_ry)
    out += ser.vec_to_bytes(p.rx, ser.fr_to_bytes)
    out += ser.vec_to_bytes(p.ry, ser.fr_to_bytes)
    out += ser.fr_to_bytes(p.transcript_sat_state)
    out += ser.fr_to_bytes(p.initial_state)
    out += ser.fq12_to_bytes(p.t)
    out += ser_mipp(p.mipp_proof)
    return bytes(out)


def ser_groth16_proof(p) -> bytes:
    return (
        ser.g1_to_bytes(p.a, True)
        + ser.g2_to_bytes(p.b, True)
        + ser.g1_to_bytes(p.c, True)
    )


def _ser_polycommit(c) -> bytes:
    return ser.vec_to_bytes(c.C, lambda pt: ser.g1_to_bytes(pt, True))


def _ser_dotproduct_log(d) -> bytes:
    out = bytearray()
    out += ser.vec_to_bytes(
        d.bullet_reduction_proof.L_vec, lambda pt: ser.g1_to_bytes(pt, True)
    )
    out += ser.vec_to_bytes(
        d.bullet_reduction_proof.R_vec, lambda pt: ser.g1_to_bytes(pt, True)
    )
    out += ser.g1_to_bytes(d.delta, True)
    out += ser.g1_to_bytes(d.beta, True)
    out += ser.fr_to_bytes(d.z1)
    out += ser.fr_to_bytes(d.z2)
    return bytes(out)


def ser_spark_proof(p) -> bytes:
    """SparseMatPolyEvalProof layout (sizes only need to be stable)."""
    out = bytearray()
    out += _ser_polycommit(p.comm_derefs.comm_ops_val)
    pl = p.proof_prod_layer
    for group in (pl.eval_row, pl.eval_col):
        out += ser.fr_to_bytes(group[0])
        out += ser.vec_to_bytes(group[1], ser.fr_to_bytes)
        out += ser.vec_to_bytes(group[2], ser.fr_to_bytes)
        out += ser.fr_to_bytes(group[3])
    out += ser.vec_to_bytes(pl.eval_val[0], ser.fr_to_bytes)
    out += ser.vec_to_bytes(pl.eval_val[1], ser.fr_to_bytes)
    for prf in (pl.proof_mem, pl.proof_ops):
        out += ser.vec_to_bytes(
            prf.proof,
            lambda layer: ser_sumcheck(layer.proof)
            + ser.vec_to_bytes(layer.claims_prod_left, ser.fr_to_bytes)
            + ser.vec_to_bytes(layer.claims_prod_right, ser.fr_to_bytes),
        )
        for lst in prf.claims_dotp:
            out += ser.vec_to_bytes(lst, ser.fr_to_bytes)
    hl = p.proof_hash_layer
    for group in (hl.eval_row, hl.eval_col):
        out += ser.vec_to_bytes(group[0], ser.fr_to_bytes)
        out += ser.vec_to_bytes(group[1], ser.fr_to_bytes)
        out += ser.fr_to_bytes(group[2])
    out += ser.vec_to_bytes(hl.eval_val, ser.fr_to_bytes)
    out += ser.vec_to_bytes(hl.eval_derefs[0], ser.fr_to_bytes)
    out += ser.vec_to_bytes(hl.eval_derefs[1], ser.fr_to_bytes)
    out += _ser_dotproduct_log(hl.proof_ops.proof)
    out += _ser_dotproduct_log(hl.proof_mem.proof)
    out += _ser_dotproduct_log(hl.proof_derefs.proof_derefs.proof)
    return bytes(out)


def ser_testudo_snark(p: "snark_mod.TestudoSnark") -> bytes:
    out = bytearray()
    out += ser_r1cs_proof(p.r1cs_sat_proof)
    out += ser_spark_proof(p.r1cs_eval_proof.proof)
    for e in p.inst_evals:
        out += ser.fr_to_bytes(e)
    out += ser.vec_to_bytes(p.r[0], ser.fr_to_bytes)
    out += ser.vec_to_bytes(p.r[1], ser.fr_to_bytes)
    if p.r1cs_verifier_proof is not None:
        out += ser_groth16_proof(p.r1cs_verifier_proof.circuit_proof)
    return bytes(out)
