"""BLS12-381 curve family tests (second curve wired in by the reference:
ark-bls12-381 / ark-blst, Cargo.toml:25-26; SURVEY.md §2 component #13's
poseidon_params_bls12381)."""
import pytest

import random

from testudo_tpu.fields.bls12_381 import P, R, H1, H2
from testudo_tpu.fields import tower
from testudo_tpu.curves import bls12_381 as c381
from testudo_tpu.poseidon.transcript import (
    PoseidonTranscript, fr_params_381, params_for_curve,
)

pytestmark = pytest.mark.slow  # compile-heavy: CI slow tier

rng = random.Random(17)


def test_tower_field_axioms():
    Fq2, Fq6, Fq12 = c381.Fq2, c381.Fq6, c381.Fq12
    a = Fq12(
        Fq6(*(Fq2(rng.randrange(P), rng.randrange(P)) for _ in range(3))),
        Fq6(*(Fq2(rng.randrange(P), rng.randrange(P)) for _ in range(3))),
    )
    b = Fq12(
        Fq6(*(Fq2(rng.randrange(P), rng.randrange(P)) for _ in range(3))),
        Fq6(*(Fq2(rng.randrange(P), rng.randrange(P)) for _ in range(3))),
    )
    assert a * a.inv() == Fq12.one()
    assert a * b == b * a
    assert a.square() == a * a
    # frobenius is the p-power map: frob^12 == identity
    f = a
    for _ in range(12):
        f = f.frobenius(1)
    assert f == a
    # frobenius(i) == frobenius(1) applied i times
    g = a.frobenius(1).frobenius(1)
    assert g == a.frobenius(2)


def test_generators_and_subgroup():
    g1, g2 = c381.g1_generator(), c381.g2_generator()
    assert c381.g1_is_on_curve(g1) and c381.g2_is_on_curve(g2)
    assert c381.g1_mul(g1, R) is None
    assert c381.g2_mul(g2, R) is None


def test_pairing_bilinearity():
    g1, g2 = c381.g1_generator(), c381.g2_generator()
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    e1 = c381.pairing(c381.g1_mul(g1, a), c381.g2_mul(g2, b))
    e2 = c381.pairing(g1, g2).pow(a * b % R)
    assert e1 == e2
    assert c381.pairing(g1, g2) != c381.Fq12.one()
    # multi_pairing product form
    prod = c381.multi_pairing(
        [c381.g1_mul(g1, a), c381.g1_neg(c381.g1_mul(g1, a))], [g2, g2]
    )
    assert prod == c381.Fq12.one()


def test_poseidon_381_transcript():
    """rate-1 t=2 alpha=5 sponge runs and is deterministic + sensitive."""
    params = fr_params_381()
    assert params.rate == 1 and params.alpha == 5
    t1 = PoseidonTranscript(params)
    t1.append_scalar(42, R)
    c1 = t1.challenge_scalar(R)
    t2 = PoseidonTranscript(params)
    t2.append_scalar(42, R)
    assert t2.challenge_scalar(R) == c1
    t3 = PoseidonTranscript(params)
    t3.append_scalar(43, R)
    assert t3.challenge_scalar(R) != c1
    assert 0 < c1 < R


def test_params_for_curve_dispatch():
    assert params_for_curve("bls12-377").modulus != params_for_curve("bls12-381").modulus
    assert params_for_curve("blst").modulus == params_for_curve("bls12-381").modulus
