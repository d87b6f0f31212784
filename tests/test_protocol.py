"""Protocol-layer tests: sumcheck, PST, sqrt-PST, MIPP, Spartan R1CS proof.

Mirrors the reference test strategy (SURVEY.md §4): sqrt_pst.rs
check_sqrt_poly_eval / check_commit (odd nv=5 and even nv=6),
r1csproof.rs test_tiny_r1cs / test_synthetic_r1cs / check_r1cs_proof.
Sizes are kept small: the CPU backend is a correctness harness, the real
target is the TPU.
"""
import random


import pytest

from testudo_tpu.fields.bls12_377 import R, P
from testudo_tpu.poly import dense
from testudo_tpu.poseidon.transcript import PoseidonTranscript, fq_params, fr_params
from testudo_tpu.core import pst, sqrt_pst, mipp, sumcheck, r1cs, r1csproof

pytestmark = pytest.mark.slow  # compile-heavy: CI slow tier

rng = random.Random(23)


@pytest.fixture(scope="module")
def srs3():
    return pst.setup(3)


def test_sumcheck_quad_roundtrip():
    n = 16
    A = [rng.randrange(R) for _ in range(n)]
    B = [rng.randrange(R) for _ in range(n)]
    claim = sum(a * b for a, b in zip(A, B)) % R
    tp = PoseidonTranscript(fq_params())
    proof, rs, claims = sumcheck.prove_quad(
        claim, 4, dense.encode_table(A), dense.encode_table(B), tp
    )
    tv = PoseidonTranscript(fq_params())
    e, rs_v = proof.verify(claim, 4, 2, tv)
    assert rs_v == rs
    assert e == claims[0] * claims[1] % R


def test_sumcheck_cubic_roundtrip():
    n = 8
    tau = [rng.randrange(R) for _ in range(n)]
    A = [rng.randrange(R) for _ in range(n)]
    B = [rng.randrange(R) for _ in range(n)]
    C = [(a * b) % R for a, b in zip(A, B)]  # so claim = 0
    tp = PoseidonTranscript(fq_params())
    proof, rs, claims = sumcheck.prove_cubic_with_additive_term(
        0,
        3,
        dense.encode_table(tau),
        dense.encode_table(A),
        dense.encode_table(B),
        dense.encode_table(C),
        tp,
    )
    tv = PoseidonTranscript(fq_params())
    e, rs_v = proof.verify(0, 3, 3, tv)
    assert rs_v == rs
    t_c, a_c, b_c, c_c = claims
    assert e == t_c * (a_c * b_c - c_c) % R


def test_sqrt_poly_eval():
    """sqrt-decomposition eval == dense eval (sqrt_pst.rs:278-295)."""
    for nv in (5, 6):
        Z = [rng.randrange(R) for _ in range(1 << nv)]
        r = [rng.randrange(R) for _ in range(nv)]
        table = dense.encode_table(Z)
        direct = dense.evaluate(table, r)
        pl = sqrt_pst.Polynomial.from_evaluations(table)
        assert pl.eval(r) == direct


@pytest.mark.parametrize("nv", [5, 6])
def test_sqrt_pst_commit_open_verify(nv, srs3):
    """Full commit -> open -> verify round trip (sqrt_pst.rs:297-342)."""
    ck, vk = srs3
    Z = [rng.randrange(R) for _ in range(1 << nv)]
    r = [rng.randrange(R) for _ in range(nv)]
    table = dense.encode_table(Z)
    pl = sqrt_pst.Polynomial.from_evaluations(table)
    v = pl.eval(r)
    comm_dev, t = pl.commit(ck)
    tp = PoseidonTranscript(fq_params())
    U, pst_proof, mipp_proof = pl.open(tp, comm_dev, ck, r, t)
    tv = PoseidonTranscript(fq_params())
    assert sqrt_pst.verify(tv, vk, U, r, v, pst_proof, mipp_proof, t)
    # reject wrong value
    tv2 = PoseidonTranscript(fq_params())
    assert not sqrt_pst.verify(
        tv2, vk, U, r, (v + 1) % R, pst_proof, mipp_proof, t
    )


def _tiny_r1cs():
    """Hand-built 3-constraint instance (r1csproof.rs:665-720)."""
    num_cons, num_vars, num_inputs = 128, 256, 2
    one = 1
    A = [(0, 0, one), (0, 1, one), (1, 0, one), (1, num_vars + 2, one), (2, 4, one)]
    B = [(0, num_vars + 1, one), (1, 2, one), (2, num_vars, one)]
    C = [(0, 2, one), (1, 3, one)]
    inst = r1cs.R1CSInstance.new(num_cons, num_vars, num_inputs, A, B, C)
    i0, i1 = rng.randrange(R), rng.randrange(R)
    z1, z2 = rng.randrange(R), rng.randrange(R)
    z3 = (z1 + z2) * i0 % R
    z4 = (z1 + i1) * z3 % R
    vars_ = [0] * num_vars
    vars_[0], vars_[1], vars_[2], vars_[3], vars_[4] = z1, z2, z3, z4, 0
    inputs = [i0, i1]
    return inst, vars_, inputs


def test_tiny_r1cs_sat():
    inst, vars_, inputs = _tiny_r1cs()
    assert inst.is_sat(vars_, inputs)


def test_synthetic_r1cs_sat():
    inst, vars_, inputs = r1cs.R1CSInstance.produce_synthetic_r1cs(64, 64, 5)
    assert inst.is_sat(vars_, inputs)


@pytest.mark.parametrize("params_fn", [fq_params, fr_params], ids=["fq", "fr"])
def test_r1cs_proof_end_to_end(params_fn):
    """prove + full native verify on a small synthetic instance
    (check_r1cs_proof, r1csproof.rs:754-801) — with the PST+MIPP check
    enabled, for both transcript field modes."""
    num_vars = 16
    num_cons = 16
    num_inputs = 3
    inst, vars_, inputs = r1cs.R1CSInstance.produce_synthetic_r1cs(
        num_cons, num_vars, num_inputs
    )
    gens = r1csproof.R1CSGens.setup(num_vars)

    tp = PoseidonTranscript(params_fn())
    c = tp.challenge_scalar(R)
    tp.new_from_state(c)
    proof, rx, ry = r1csproof.prove(inst, vars_, inputs, gens, tp)

    inst_evals = inst.evaluate(rx, ry)

    tv = PoseidonTranscript(params_fn())
    c2 = tv.challenge_scalar(R)
    assert c2 == c
    tv.new_from_state(c2)
    assert r1csproof.verify_native(
        proof, inst_evals, num_cons, num_vars, inputs, gens, tv
    )

    # corrupt the claimed evaluation -> reject
    tv3 = PoseidonTranscript(params_fn())
    tv3.challenge_scalar(R)
    tv3.new_from_state(c)
    import dataclasses

    bad = dataclasses.replace(proof, eval_vars_at_ry=(proof.eval_vars_at_ry + 1) % R)
    assert not r1csproof.verify_native(
        bad, inst_evals, num_cons, num_vars, inputs, gens, tv3
    )
