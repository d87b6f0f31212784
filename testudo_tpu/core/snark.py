"""TestudoSNARK / TestudoNIZK: the public proving API.

Mirror of the reference's (commented but canonical) top-level wrappers
/root/reference/src/testudo_snark.rs and testudo_nizk.rs:

  - TestudoNIZK: R1CS satisfiability only — the verifier evaluates
    A~, B~, C~(rx, ry) itself (suitable for uniform circuits).
  - TestudoSNARK: adds the Spark computation commitment so matrix
    evaluations are proven, not recomputed (R1CSEvalProof), plus the
    Groth16-compressed verification of the sumcheck verifier circuit.

This module provides both native-verified proofs (full transcript replay +
PST/MIPP + Spark checks — "verify_native") and the Groth16-compressed path
(core/groth16.py + core/circuit.py) where the sumcheck verifier is proven
in a circuit, as in the reference's prove_verifier (r1csproof.rs:374-434).

Transcript: Fr sponge (poseidon_params()), as in the upstream pipeline.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..fields.bls12_377 import R
from ..poseidon.transcript import PoseidonTranscript, fr_params
from . import r1cs, r1csproof, spark


@dataclass
class ComputationCommitment:
    """Spark commitment to (A, B, C) (lib.rs:54-56, r1csinstance.rs:55-88)."""

    num_cons: int
    num_vars: int
    num_inputs: int
    comm: spark.SparseMatPolyCommitment

    def write_to_transcript(self, transcript) -> None:
        transcript.append_u64(self.num_cons)
        transcript.append_u64(self.num_vars)
        transcript.append_u64(self.num_inputs)
        self.comm.write_to_transcript(transcript)


@dataclass
class ComputationDecommitment:
    dense: spark.MultiSparseMatPolynomialAsDense


@dataclass
class R1CSCommitmentGens:
    gens: spark.SparseMatPolyCommitmentGens

    @staticmethod
    def setup(label: bytes, num_cons: int, num_vars: int, num_inputs: int,
              num_nz_entries: int) -> "R1CSCommitmentGens":
        assert num_inputs < num_vars
        num_poly_vars_x = num_cons.bit_length() - 1
        num_poly_vars_y = (2 * num_vars).bit_length() - 1
        return R1CSCommitmentGens(
            spark.SparseMatPolyCommitmentGens.setup(
                label, num_poly_vars_x, num_poly_vars_y, num_nz_entries, 3
            )
        )


@dataclass
class R1CSEvalProof:
    proof: spark.SparseMatPolyEvalProof


def r1cs_commit(inst: r1cs.R1CSInstance, gens: R1CSCommitmentGens):
    comm, dense_rep = spark.multi_commit([inst.A, inst.B, inst.C], gens.gens)
    return (
        ComputationCommitment(inst.num_cons, inst.num_vars, inst.num_inputs, comm),
        ComputationDecommitment(dense_rep),
    )


def r1cs_eval_prove(decomm: ComputationDecommitment, rx, ry, evals,
                    gens: R1CSCommitmentGens, transcript) -> R1CSEvalProof:
    return R1CSEvalProof(
        spark.prove(decomm.dense, rx, ry, list(evals), gens.gens, transcript)
    )


def r1cs_eval_verify(proof: R1CSEvalProof, comm: ComputationCommitment,
                     rx, ry, evals, gens: R1CSCommitmentGens, transcript) -> bool:
    return spark.verify(
        proof.proof, comm.comm, rx, ry, list(evals), gens.gens, transcript
    )


def _pad_params(num_cons: int, num_vars: int, num_inputs: int):
    num_vars_padded = max(num_vars, num_inputs + 1)
    if num_vars_padded & (num_vars_padded - 1):
        num_vars_padded = 1 << num_vars_padded.bit_length()
    num_cons_padded = num_cons
    if num_cons_padded in (0, 1):
        num_cons_padded = 2
    if num_cons & (num_cons - 1):
        num_cons_padded = 1 << num_cons.bit_length()
    return num_cons_padded, num_vars_padded


# ---------------------------------------------------------------------------
# TestudoNIZK
# ---------------------------------------------------------------------------


@dataclass
class TestudoNizkGens:
    gens_r1cs_sat: r1csproof.R1CSGens
    gens_gc: "r1csproof.CircuitGens | None" = None

    @staticmethod
    def setup(num_cons: int, num_vars: int, num_inputs: int,
              with_groth16: bool = False) -> "TestudoNizkGens":
        nc, nv = _pad_params(num_cons, num_vars, num_inputs)
        gc = r1csproof.CircuitGens.setup(nc, nv, num_inputs) if with_groth16 else None
        return TestudoNizkGens(r1csproof.R1CSGens.setup(nv), gc)


@dataclass
class TestudoNizk:
    r1cs_sat_proof: r1csproof.R1CSProof
    r: Tuple[List[int], List[int]]


def nizk_prove(inst: r1cs.Instance, vars_: r1cs.Assignment,
               inputs: r1cs.Assignment, gens: TestudoNizkGens,
               transcript: PoseidonTranscript) -> TestudoNizk:
    """testudo_nizk.rs:80-130 (with the native proof in place of the
    Groth16-wrapped R1CSVerifierProof)."""
    transcript.append_bytes(inst.digest)
    c = transcript.challenge_scalar(R)
    transcript.new_from_state(c)

    padded = (
        vars_.pad(inst.inst.num_vars)
        if inst.inst.num_vars > len(vars_.assignment)
        else vars_
    )
    proof, rx, ry = r1csproof.prove(
        inst.inst, padded.assignment, inputs.assignment, gens.gens_r1cs_sat,
        transcript,
    )
    return TestudoNizk(proof, (rx, ry))


def nizk_verify(proof: TestudoNizk, gens: TestudoNizkGens, inst: r1cs.Instance,
                inputs: r1cs.Assignment, transcript: PoseidonTranscript) -> bool:
    """testudo_nizk.rs:136-157: the verifier evaluates A, B, C itself."""
    from ..utils.timer import Timer

    transcript.append_bytes(inst.digest)
    c = transcript.challenge_scalar(R)
    transcript.new_from_state(c)
    rx, ry = proof.r
    tev = Timer("nizk_verify::evaluate A,B,C")
    inst_evals = inst.inst.evaluate(rx, ry)
    tev.stop()
    return r1csproof.verify_native(
        proof.r1cs_sat_proof, inst_evals, inst.inst.num_cons,
        inst.inst.num_vars, inputs.assignment, gens.gens_r1cs_sat, transcript,
    )


# ---------------------------------------------------------------------------
# TestudoSNARK
# ---------------------------------------------------------------------------


@dataclass
class TestudoSnarkGens:
    gens_r1cs_sat: r1csproof.R1CSGens
    gens_r1cs_eval: R1CSCommitmentGens
    gens_gc: "r1csproof.CircuitGens | None" = None

    @staticmethod
    def setup(num_cons: int, num_vars: int, num_inputs: int,
              num_nz_entries: int, with_groth16: bool = True) -> "TestudoSnarkGens":
        """Setup incl. the Groth16 circuit keys (TestudoSnarkGens::setup,
        testudo_snark.rs:41-90: R1CSGens bundles PST + CircuitGens)."""
        nc, nv = _pad_params(num_cons, num_vars, num_inputs)
        gc = r1csproof.CircuitGens.setup(nc, nv, num_inputs) if with_groth16 else None
        return TestudoSnarkGens(
            r1csproof.R1CSGens.setup(nv),
            R1CSCommitmentGens.setup(b"gens_r1cs_eval", nc, nv, num_inputs,
                                     num_nz_entries),
            gc,
        )


@dataclass
class TestudoSnark:
    """Mirror of testudo_snark.rs:23-33: the satisfiability side ships as
    the Groth16-compressed R1CSVerifierProof when circuit gens are present,
    plus the Spark evaluation proof."""

    r1cs_sat_proof: r1csproof.R1CSProof
    r1cs_eval_proof: R1CSEvalProof
    inst_evals: Tuple[int, int, int]
    r: Tuple[List[int], List[int]]
    r1cs_verifier_proof: "r1csproof.R1CSVerifierProof | None" = None


def snark_encode(inst: r1cs.Instance, gens: TestudoSnarkGens):
    """TestudoSnark::encode (testudo_snark.rs:100-114)."""
    return r1cs_commit(inst.inst, gens.gens_r1cs_eval)


def snark_prove(inst: r1cs.Instance, comm: ComputationCommitment,
                decomm: ComputationDecommitment, vars_: r1cs.Assignment,
                inputs: r1cs.Assignment, gens: TestudoSnarkGens,
                transcript: PoseidonTranscript) -> TestudoSnark:
    """testudo_snark.rs:120-196."""
    comm.write_to_transcript(transcript)
    c = transcript.challenge_scalar(R)
    transcript.new_from_state(c)

    padded = (
        vars_.pad(inst.inst.num_vars)
        if inst.inst.num_vars > len(vars_.assignment)
        else vars_
    )
    sat_proof, rx, ry = r1csproof.prove(
        inst.inst, padded.assignment, inputs.assignment, gens.gens_r1cs_sat,
        transcript,
    )

    Ar, Br, Cr = inst.inst.evaluate(rx, ry)
    transcript.append_scalar(Ar, R)
    transcript.append_scalar(Br, R)
    transcript.append_scalar(Cr, R)

    eval_proof = r1cs_eval_prove(
        decomm, rx, ry, (Ar, Br, Cr), gens.gens_r1cs_eval, transcript
    )

    verifier_proof = None
    if gens.gens_gc is not None:
        # re-key and Groth16-prove the verifier circuit (testudo_snark.rs:
        # 176-190)
        transcript.new_from_state(c)
        verifier_proof = r1csproof.prove_verifier(
            sat_proof, inst.inst.num_vars, inst.inst.num_cons,
            inputs.assignment, (Ar, Br, Cr), transcript, gens.gens_gc,
        )
    return TestudoSnark(sat_proof, eval_proof, (Ar, Br, Cr), (rx, ry),
                        verifier_proof)


def snark_verify(proof: TestudoSnark, gens: TestudoSnarkGens,
                 comm: ComputationCommitment, inputs: r1cs.Assignment,
                 transcript: PoseidonTranscript) -> bool:
    """testudo_snark.rs:198-235."""
    comm.write_to_transcript(transcript)
    c = transcript.challenge_scalar(R)
    transcript.new_from_state(c)

    rx, ry = proof.r
    if gens.gens_gc is not None and proof.r1cs_verifier_proof is not None:
        # Groth16-compressed verification + enabled PST/MIPP opening check.
        # verifier_proof_verify re-keys the transcript at sat_state and
        # advances it through the MIPP absorbs, exactly as the prover's
        # transcript was advanced (testudo_snark.rs:209-216).
        sat_ok = r1csproof.verifier_proof_verify(
            proof.r1cs_verifier_proof, (rx, ry), inputs.assignment,
            proof.inst_evals, transcript, gens.gens_gc, gens.gens_r1cs_sat,
        )
        if not sat_ok:
            return False
    else:
        sat_ok = r1csproof.verify_native(
            proof.r1cs_sat_proof, proof.inst_evals, comm.num_cons, comm.num_vars,
            inputs.assignment, gens.gens_r1cs_sat, transcript,
        )
        if not sat_ok:
            return False

    Ar, Br, Cr = proof.inst_evals
    transcript.append_scalar(Ar, R)
    transcript.append_scalar(Br, R)
    transcript.append_scalar(Cr, R)

    return r1cs_eval_verify(
        proof.r1cs_eval_proof, comm, rx, ry, proof.inst_evals,
        gens.gens_r1cs_eval, transcript,
    )
