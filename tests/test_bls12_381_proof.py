"""End-to-end R1CS proof over BLS12-381 through the curve-generic path.

Mirror of check_r1cs_proof_bls12_381 (r1csproof.rs:754-801): the SAME
prove/verify implementation (core/r1csproof.py) runs over a second
pairing engine via curves.profile.bls12_381 — host group backends in the
ark-blst role, device Fr tables (FieldSpec is field-generic).
"""
import random

import pytest

from testudo_tpu.core import r1cs, r1csproof
from testudo_tpu.curves import profile as cprof
from testudo_tpu.poseidon.transcript import PoseidonTranscript, fr_params_381

pytestmark = pytest.mark.slow  # compile-heavy: CI slow tier

rng = random.Random(19)


def test_check_r1cs_proof_bls12_381():
    prof = cprof.bls12_381()
    num_cons = num_vars = 16
    num_inputs = 3
    inst, vars_, inputs = r1cs.R1CSInstance.produce_synthetic_r1cs(
        num_cons, num_vars, num_inputs, seed=3, spec=prof.fr_spec
    )
    assert inst.is_sat(vars_, inputs)

    gens = r1csproof.R1CSGens.setup(num_vars, profile=prof)
    tp = PoseidonTranscript(fr_params_381())
    proof, rx, ry = r1csproof.prove(inst, vars_, inputs, gens, tp)

    inst_evals = inst.evaluate(rx, ry)
    tv = PoseidonTranscript(fr_params_381())
    assert r1csproof.verify_native(
        proof, inst_evals, num_cons, num_vars, inputs, gens, tv
    )

    # reject: corrupted claimed evaluation
    import dataclasses

    bad = dataclasses.replace(
        proof, eval_vars_at_ry=(proof.eval_vars_at_ry + 1) % prof.R
    )
    tv2 = PoseidonTranscript(fr_params_381())
    assert not r1csproof.verify_native(
        bad, inst_evals, num_cons, num_vars, inputs, gens, tv2
    )


def test_pst_roundtrip_bls12_381():
    """PST commit -> open -> check over the 381 profile (small)."""
    from testudo_tpu.core import pst
    from testudo_tpu.poly import dense

    prof = cprof.bls12_381()
    spec = prof.fr_spec
    ck, vk = pst.setup(3, seed=b"381-pst", profile=prof)
    evals = [rng.randrange(prof.R) for _ in range(8)]
    table = dense.encode_table(evals, spec)
    C = pst.commit(ck, table)
    point = [rng.randrange(prof.R) for _ in range(3)]
    proofs = pst.open_(ck, table, point)
    cur = evals
    for p in point:
        half = len(cur) // 2
        cur = [
            (cur[i] + p * (cur[half + i] - cur[i])) % prof.R
            for i in range(half)
        ]
    v = cur[0]
    assert pst.check(vk, C, point, v, proofs)
    assert not pst.check(vk, C, point, (v + 1) % prof.R, proofs)
