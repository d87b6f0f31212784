"""Top-level API tests: Spark, Groth16, TestudoNIZK, TestudoSNARK.

Mirrors check_sparse_polyeval_proof (sparse_mlpoly.rs:1630-1688),
check_testudo_nizk (testudo_nizk.rs:169-201) and check_testudo_snark
(testudo_snark.rs:250-376) at reduced sizes.
"""
import random

import pytest

from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.core import r1cs, snark, spark
from testudo_tpu.poseidon.transcript import PoseidonTranscript, fr_params

pytestmark = pytest.mark.slow  # compile-heavy: CI slow tier

rng = random.Random(41)


def test_spark_sparse_polyeval():
    """Batch-of-3 sparse matrix commit -> prove -> verify (the reference
    uses 256x256; 16x16 keeps the CPU-side compile load sane)."""
    nx, ny = 4, 4
    nnz = 8
    mats = []
    for _ in range(3):
        entries = [
            (rng.randrange(1 << nx), rng.randrange(1 << ny), rng.randrange(R))
            for _ in range(nnz)
        ]
        import numpy as np

        mats.append(
            r1cs.SparseMatPolynomial(
                nx,
                ny,
                np.asarray([e[0] for e in entries], dtype=np.int32),
                np.asarray([e[1] for e in entries], dtype=np.int32),
                [e[2] for e in entries],
            )
        )
    gens = spark.SparseMatPolyCommitmentGens.setup(b"spark-test", nx, ny, nnz, 3)
    comm, dense_rep = spark.multi_commit(mats, gens)

    rx = [rng.randrange(R) for _ in range(nx)]
    ry = [rng.randrange(R) for _ in range(ny)]
    evals = [m.evaluate(rx, ry) for m in mats]

    tp = PoseidonTranscript(fr_params())
    proof = spark.prove(dense_rep, rx, ry, evals, gens, tp)
    tv = PoseidonTranscript(fr_params())
    assert spark.verify(proof, comm, rx, ry, evals, gens, tv)
    # wrong eval rejected
    tv2 = PoseidonTranscript(fr_params())
    bad = [evals[0], evals[1], (evals[2] + 1) % R]
    assert spark.verify(proof, comm, rx, ry, bad, gens, tv2) is False


def test_groth16_tiny():
    from testudo_tpu.core import groth16
    from testudo_tpu.core.circuit import ConstraintSystem

    cs = ConstraintSystem()
    out = cs.alloc_input(35)
    x = cs.alloc_witness(3)
    x2 = cs.mul(x, x)
    x3 = cs.mul(x2, x)
    cs.enforce_equal(x3 + x + 5, out)
    assert cs.is_satisfied()
    pk, vk = groth16.setup(cs)
    proof = groth16.prove(pk, cs)
    assert groth16.verify(vk, [35], proof)
    assert not groth16.verify(vk, [36], proof)


def test_testudo_nizk_end_to_end():
    num_vars = num_cons = 16
    num_inputs = 3
    inst, vars_, inputs = r1cs.Instance.produce_synthetic_r1cs(
        num_cons, num_vars, num_inputs
    )
    gens = snark.TestudoNizkGens.setup(num_cons, num_vars, num_inputs)
    tp = PoseidonTranscript(fr_params())
    proof = snark.nizk_prove(inst, vars_, inputs, gens, tp)
    tv = PoseidonTranscript(fr_params())
    assert snark.nizk_verify(proof, gens, inst, inputs, tv)


def test_testudo_snark_end_to_end():
    num_vars = num_cons = 16
    num_inputs = 3
    inst, vars_, inputs = r1cs.Instance.produce_synthetic_r1cs(
        num_cons, num_vars, num_inputs
    )
    gens = snark.TestudoSnarkGens.setup(
        num_cons, num_vars, num_inputs, num_cons, with_groth16=True
    )
    comm, decomm = snark.snark_encode(inst, gens)
    tp = PoseidonTranscript(fr_params())
    proof = snark.snark_prove(inst, comm, decomm, vars_, inputs, gens, tp)
    assert proof.r1cs_verifier_proof is not None
    tv = PoseidonTranscript(fr_params())
    assert snark.snark_verify(proof, gens, comm, inputs, tv)

    # wire-format round trip: serialize -> parse -> re-serialize -> verify
    from testudo_tpu import proofs

    blob = proofs.ser_testudo_snark(proof)
    assert len(blob) > 0
    parsed = proofs.parse_testudo_snark(blob)
    assert proofs.ser_testudo_snark(parsed) == blob
    tv3 = PoseidonTranscript(fr_params())
    assert snark.snark_verify(parsed, gens, comm, inputs, tv3)


def test_padded_constraints_byte_api():
    """Byte-level Instance API with padding (test_padded_constraints,
    testudo_snark.rs:300-376 shape)."""
    from testudo_tpu import serialize as ser

    num_cons, num_vars, num_inputs = 3, 3, 1
    one = ser.fr_to_bytes(1)
    # x * x = x2 ; x2 * x = x3 ; (x3 + x + 5) * 1 = y  (folded into 3 rows)
    A = [(0, 0, one), (1, 1, one), (2, 2, ser.fr_to_bytes(1))]
    B = [(0, 0, one), (1, 0, one), (2, 3, one)]
    C = [(0, 1, one), (1, 2, one), (2, 4, one)]
    inst = r1cs.Instance.new(num_cons, num_vars, num_inputs, A, B, C)
    # padded to pow2 sizes
    assert inst.inst.num_cons == 4
    assert inst.inst.num_vars == 4
    x = 3
    x2 = 9
    x3 = 27
    y = x3  # third constraint: z2 * ONE = I0 -> y = x3
    vars_ = r1cs.Assignment([x, x2, x3])
    inputs = r1cs.Assignment([y])
    assert inst.is_sat(vars_, inputs)
