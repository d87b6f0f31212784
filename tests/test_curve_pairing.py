"""Host curve and pairing tests: group laws, orders, bilinearity."""
import random

from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.fields.host import Fq12
from testudo_tpu.curves import host_curve as hc
from testudo_tpu.curves import pairing as pr

rng = random.Random(11)


def test_g1_group_law():
    g = hc.g1_generator()
    assert hc.g1_is_on_curve(g)
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    pa, pb = hc.g1_mul(g, a), hc.g1_mul(g, b)
    assert hc.g1_add(pa, pb) == hc.g1_mul(g, (a + b) % R)
    assert hc.g1_mul(g, R) is None
    assert hc.g1_add(pa, hc.g1_neg(pa)) is None


def test_g2_group_law():
    g = hc.g2_generator()
    assert hc.g2_is_on_curve(g)
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    pa, pb = hc.g2_mul(g, a), hc.g2_mul(g, b)
    assert hc.g2_add(pa, pb) == hc.g2_mul(g, (a + b) % R)
    assert hc.g2_mul(g, R) is None


def test_pairing_bilinear():
    g1, g2 = hc.g1_generator(), hc.g2_generator()
    e = pr.pairing(g1, g2)
    assert e != Fq12.one()
    assert e.pow(R) == Fq12.one()
    a, b = 97531, 13579
    assert pr.pairing(hc.g1_mul(g1, a), hc.g2_mul(g2, b)) == e.pow(a * b % R)


def test_multi_pairing():
    g1, g2 = hc.g1_generator(), hc.g2_generator()
    e = pr.pairing(g1, g2)
    # e(2g1, g2) * e(g1, -g2) = e(g1, g2)
    got = pr.multi_pairing([hc.g1_mul(g1, 2), g1], [g2, hc.g2_neg(g2)])
    assert got == e
