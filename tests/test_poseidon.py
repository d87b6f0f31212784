"""Poseidon sponge/transcript contract tests.

These mirror the reference's prova.rs / prova2.rs / prova3.rs transcript
contracts: the encodings of scalar, G1 and GT absorbs must be stable and
deterministic, prover/verifier transcripts must agree, and the byte-absorb
path must equal the foreign-field absorb path (the property the fork's
native-vs-circuit tests relied on).
"""
import random

from testudo_tpu.fields.bls12_377 import P, R
from testudo_tpu.fields.host import Fq2
from testudo_tpu.curves import host_curve as hc
from testudo_tpu.poseidon.sponge import PoseidonSponge
from testudo_tpu.poseidon.transcript import PoseidonTranscript, fq_params, fr_params

rng = random.Random(3)


def test_permutation_changes_state():
    s = PoseidonSponge(fr_params())
    s.permute()
    assert s.state != [0, 0, 0]
    s2 = PoseidonSponge(fr_params())
    s2.permute()
    assert s.state == s2.state  # deterministic


def test_absorb_squeeze_roundtrip_deterministic():
    t1 = PoseidonTranscript(fq_params())
    t2 = PoseidonTranscript(fq_params())
    for t in (t1, t2):
        t.append_scalar(5, R)
    c1 = t1.challenge_scalar(R)
    c2 = t2.challenge_scalar(R)
    assert c1 == c2
    assert 0 < c1 < 1 << 252  # foreign squeeze yields (bits-1)-bit values


def test_fr_into_fq_sponge_equals_byte_absorb():
    """prova.rs contract: absorbing an Fr scalar into an Fq sponge equals
    absorbing its 32 little-endian bytes (one 47-byte chunk)."""
    x = rng.randrange(R)
    t1 = PoseidonTranscript(fq_params())
    t1.append_scalar(x, R)
    t2 = PoseidonTranscript(fq_params())
    t2.append_bytes(x.to_bytes(32, "little"))
    assert t1.challenge_scalar(R) == t2.challenge_scalar(R)


def test_g1_absorb_deterministic():
    g = hc.g1_generator()
    pt = hc.g1_mul(g, 123456789)
    t1 = PoseidonTranscript(fq_params())
    t1.append_g1_uncompressed(pt)
    t2 = PoseidonTranscript(fq_params())
    t2.append_g1_uncompressed(pt)
    c_unc = t1.challenge_scalar(R)
    assert c_unc == t2.challenge_scalar(R)
    # compressed encoding gives a different transcript than uncompressed
    t3 = PoseidonTranscript(fq_params())
    t3.append_g1_point(pt)
    assert t3.challenge_scalar(R) != c_unc


def test_native_squeeze_full_width():
    t = PoseidonTranscript(fr_params())
    t.append_scalar(7, R)
    c = t.challenge_scalar(R)  # native squeeze: full field element
    assert 0 <= c < R


def test_mode_machine():
    """absorb -> squeeze -> absorb -> squeeze gives distinct, stable values."""
    t = PoseidonTranscript(fr_params())
    t.append_scalar(1, R)
    a = t.challenge_scalar(R)
    t.append_scalar(2, R)
    b = t.challenge_scalar(R)
    assert a != b
    # replay
    t2 = PoseidonTranscript(fr_params())
    t2.append_scalar(1, R)
    assert t2.challenge_scalar(R) == a
    t2.append_scalar(2, R)
    assert t2.challenge_scalar(R) == b


def test_rate_boundary():
    """Absorbing more than `rate` elements forces internal permutes."""
    t = PoseidonTranscript(fr_params())
    for i in range(5):
        t.append_scalar(i + 1, R)
    c = t.challenge_scalar(R)
    t2 = PoseidonTranscript(fr_params())
    t2.append_scalar_vector([1, 2, 3, 4, 5], R)
    assert t2.challenge_scalar(R) == c


def test_new_from_state():
    t = PoseidonTranscript(fq_params())
    t.append_scalar(42, R)
    c = t.challenge_scalar(R)
    t.new_from_state2_scalar(c, R)
    d1 = t.challenge_scalar(R)
    # equivalent fresh construction
    t2 = PoseidonTranscript(fq_params())
    t2.append_serialized_scalar(c, R)
    assert t2.challenge_scalar(R) == d1
