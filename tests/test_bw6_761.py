"""BW6-761 outer-curve tests (the Groth16-over-BW6 target of the fork's
one-layer recursion, circuit_verifier.rs:653-658)."""
import random

from testudo_tpu.fields.bw6_761 import Q, R, TRACE
from testudo_tpu.fields.bls12_377 import P as P377
from testudo_tpu.curves import bw6_761 as bw

rng = random.Random(31)


def test_scalar_field_is_bls377_fq():
    assert R == P377  # the whole point of the curve


def test_field_and_curve_constants():
    assert Q.bit_length() == 761
    assert hex(Q).startswith("0x122e824fb83ce0ad")
    assert (TRACE * TRACE - 4 * Q) % 3 == 0  # CM disc -3


def test_tower():
    a = bw.Fq6(tuple(rng.randrange(Q) for _ in range(6)))
    assert a * a.inv() == bw.Fq6.one()
    assert a.frobenius(1) == a.pow(Q)
    f = a
    for _ in range(6):
        f = f.frobenius(1)
    assert f == a


def test_generators():
    g1, g2 = bw.g1_generator(), bw.g2_generator()
    assert bw.g1_is_on_curve(g1) and bw.g2_is_on_curve(g2)
    assert bw.g1_mul(g1, R) is None and bw.g2_mul(g2, R) is None


def test_pairing_bilinear():
    g1, g2 = bw.g1_generator(), bw.g2_generator()
    e = bw.pairing(g1, g2)
    assert e != bw.Fq6.one() and e.pow(R) == bw.Fq6.one()
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    assert bw.pairing(bw.g1_mul(g1, a), bw.g2_mul(g2, b)) == e.pow(a * b % R)
    assert (
        bw.multi_pairing(
            [bw.g1_mul(g1, a), bw.g1_neg(bw.g1_mul(g1, a))], [g2, g2]
        )
        == bw.Fq6.one()
    )
