"""Host field tower tests (axioms, Frobenius, sqrt)."""
import random

from testudo_tpu.fields.bls12_377 import P, R, TWO_ADICITY_R
from testudo_tpu.fields.host import Fq2, Fq6, Fq12, fq_sqrt, fr_sqrt

rng = random.Random(7)


def rfq2():
    return Fq2(rng.randrange(P), rng.randrange(P))


def rfq6():
    return Fq6(rfq2(), rfq2(), rfq2())


def rfq12():
    return Fq12(rfq6(), rfq6())


def test_fq2_axioms():
    a, b, c = rfq2(), rfq2(), rfq2()
    assert (a + b) * c == a * c + b * c
    assert a * a.inv() == Fq2.one()
    assert a.square() == a * a
    assert a.pow(P) == a.frobenius(1)


def test_fq6_axioms():
    a, b = rfq6(), rfq6()
    assert a * a.inv() == Fq6.one()
    assert (a + b) * (a - b) == a * a - b * b
    # Frobenius == p-power (checked via the Fq12 embedding)
    e = Fq12(a, Fq6.zero())
    assert e.pow(P) == Fq12(a.frobenius(1), Fq6.zero())


def test_fq12_axioms():
    a, b = rfq12(), rfq12()
    assert a * a.inv() == Fq12.one()
    assert a.square() == a * a
    assert a.frobenius(1) == a.pow(P)
    assert a.frobenius(2) == a.frobenius(1).frobenius(1)
    assert (a * b).inv() == b.inv() * a.inv()


def test_sqrt():
    x = rng.randrange(P)
    s = fq_sqrt(x * x % P)
    assert s is not None and s * s % P == x * x % P
    y = rng.randrange(R)
    s = fr_sqrt(y * y % R)
    assert s is not None and s * s % R == y * y % R
    assert TWO_ADICITY_R == 47


def test_fq2_sqrt():
    a = rfq2()
    sq = a.square()
    s = sq.sqrt()
    assert s is not None and s.square() == sq
