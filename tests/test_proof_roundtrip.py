"""Proof wire-format round trips (CanonicalSerialize + Deserialize parity).

The reference derives both halves on every proof struct (r1csproof.rs:32,
mipp.rs:21, sparse_mlpoly.rs:1441); these tests lock serialize -> parse ->
re-serialize byte identity on synthetic proof objects built from host data
(no device proving needed), including compressed-point decompression.
"""
import random

from testudo_tpu import proofs, serialize as ser
from testudo_tpu.core import mipp as mipp_mod
from testudo_tpu.core import nizk as nizk_mod
from testudo_tpu.core import r1csproof as rp
from testudo_tpu.core import sumcheck as sumcheck_mod
from testudo_tpu.curves import host_curve as hc
from testudo_tpu.curves import pairing
from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.poly.unipoly import UniPoly

rng = random.Random(1234)


def _g1():
    return hc.g1_mul(hc.g1_generator(), rng.randrange(1, R))


def _g2():
    return hc.g2_mul(hc.g2_generator(), rng.randrange(1, R))


def _gt():
    return pairing.pairing(_g1(), _g2())


def _fr():
    return rng.randrange(R)


def test_point_roundtrip_compressed_and_not():
    for _ in range(4):
        p1, p2 = _g1(), _g2()
        for compress in (True, False):
            b1 = ser.g1_to_bytes(p1, compress)
            r = ser.Reader(b1)
            assert ser.read_g1(r, compress) == p1
            r.finish()
            b2 = ser.g2_to_bytes(p2, compress)
            r = ser.Reader(b2)
            assert ser.read_g2(r, compress) == p2
            r.finish()
    # points at infinity
    for compress in (True, False):
        r = ser.Reader(ser.g1_to_bytes(None, compress))
        assert ser.read_g1(r, compress) is None
        r = ser.Reader(ser.g2_to_bytes(None, compress))
        assert ser.read_g2(r, compress) is None


def test_point_rejects_off_curve():
    # scan for an x with x^3 + 1 a quadratic non-residue (about half of all
    # x qualify), then check its compressed encoding is rejected
    from testudo_tpu.fields.bls12_377 import P
    from testudo_tpu.fields.host import fq_sqrt

    x = 2
    while fq_sqrt((x * x % P * x + 1) % P) is not None:
        x += 1
    blob = ser.fq_to_bytes(x)
    try:
        ser.read_g1(ser.Reader(blob), True)
    except ser.DeserializeError:
        pass
    else:
        raise AssertionError("off-curve x accepted")


def _mk_sumcheck(rounds, degree):
    return sumcheck_mod.SumcheckInstanceProof(
        [UniPoly([_fr() for _ in range(degree + 1)]) for _ in range(rounds)]
    )


def _mk_mipp(m):
    return mipp_mod.MippProof(
        comms_t=[(_gt(), _gt()) for _ in range(m)],
        comms_u=[(_g1(), _g1()) for _ in range(m)],
        final_a=_g1(),
        final_h=_g2(),
        pst_proof_h=[_g2() for _ in range(m)],
    )


def _mk_r1cs_proof():
    return rp.R1CSProof(
        comm_U=_g1(),
        sc_proof_phase1=_mk_sumcheck(3, 3),
        claims_phase2=tuple(_fr() for _ in range(4)),
        sc_proof_phase2=_mk_sumcheck(4, 2),
        eval_vars_at_ry=_fr(),
        proof_eval_vars_at_ry=[_g1() for _ in range(2)],
        rx=[_fr() for _ in range(3)],
        ry=[_fr() for _ in range(4)],
        transcript_sat_state=_fr(),
        initial_state=_fr(),
        t=_gt(),
        mipp_proof=_mk_mipp(2),
    )


def test_mipp_roundtrip():
    m = _mk_mipp(3)
    blob = proofs.ser_mipp(m)
    r = ser.Reader(blob)
    m2 = proofs.de_mipp(r)
    r.finish()
    assert proofs.ser_mipp(m2) == blob


def test_r1cs_proof_roundtrip():
    p = _mk_r1cs_proof()
    blob = proofs.ser_r1cs_proof(p)
    p2 = proofs.parse_r1cs_proof(blob)
    assert proofs.ser_r1cs_proof(p2) == blob
    # structural equality on the scalar fields
    assert p2.rx == p.rx and p2.ry == p.ry
    assert p2.claims_phase2 == p.claims_phase2
    assert p2.comm_U == p.comm_U
    assert p2.mipp_proof.final_a == p.mipp_proof.final_a


def test_dotproduct_log_roundtrip():
    d = nizk_mod.DotProductProofLog(
        bullet_reduction_proof=nizk_mod.BulletReductionProof(
            L_vec=[_g1() for _ in range(3)], R_vec=[_g1() for _ in range(3)]
        ),
        delta=_g1(),
        beta=_g1(),
        z1=_fr(),
        z2=_fr(),
    )
    blob = proofs._ser_dotproduct_log(d)
    r = ser.Reader(blob)
    d2 = proofs._de_dotproduct_log(r)
    r.finish()
    assert proofs._ser_dotproduct_log(d2) == blob


def test_truncation_rejected():
    blob = proofs.ser_r1cs_proof(_mk_r1cs_proof())
    for cut in (1, len(blob) // 2, len(blob) - 1):
        try:
            proofs.parse_r1cs_proof(blob[:cut])
        except ser.DeserializeError:
            continue
        raise AssertionError(f"truncated proof at {cut} accepted")
    # trailing garbage rejected too
    try:
        proofs.parse_r1cs_proof(blob + b"\x00")
    except ser.DeserializeError:
        pass
    else:
        raise AssertionError("trailing bytes accepted")


# -- CanonicalDeserialize validation (ark Validate::Yes parity, ADVICE r4) --


def _raises_deser(fn):
    try:
        fn()
    except ser.DeserializeError:
        return True
    return False


def test_non_subgroup_g1_rejected():
    """On-curve points outside the r-order subgroup must not deserialize
    (BLS12-377 G1 has cofactor > 1, so such points exist)."""
    from testudo_tpu.fields.bls12_377 import P
    from testudo_tpu.fields.host import fq_sqrt

    x = 2
    pt = None
    while pt is None:
        y = fq_sqrt((x * x % P * x + 1) % P)
        if y is not None and hc.g1_mul((x, y), R) is not None:
            pt = (x, y)
        x += 1
    for compress in (True, False):
        blob = ser.g1_to_bytes(pt, compress)
        assert _raises_deser(
            lambda: ser.read_g1(ser.Reader(blob), compress)
        ), "non-subgroup point accepted"


def test_out_of_range_coordinate_rejected():
    """Uncompressed coordinates must be < p (non-canonical encodings would
    otherwise alias: proof-blob malleability)."""
    from testudo_tpu.fields.bls12_377 import P

    pt = _g1()
    good = bytearray(ser.g1_to_bytes(pt, compress=False))
    # replace x with x + p (same field element, non-canonical bytes)
    bad = bytearray(good)
    bad[:48] = (pt[0] + P).to_bytes(48, "little")
    assert _raises_deser(
        lambda: ser.read_g1(ser.Reader(bytes(bad)), False)
    ), "non-canonical x accepted"
    # and y likewise (keep flag bits clear: y + p stays below 2^382)
    bad2 = bytearray(good)
    bad2[48:] = (pt[1] + P).to_bytes(48, "little")
    assert _raises_deser(
        lambda: ser.read_g1(ser.Reader(bytes(bad2)), False)
    ), "non-canonical y accepted"


def test_unexpected_flag_bits_rejected():
    """Uncompressed points never carry the Y_NEG flag; a blob with it set
    is not a canonical encoding."""
    pt = _g1()
    raw = bytearray(ser.g1_to_bytes(pt, compress=False))
    raw[-1] |= ser.FLAG_Y_NEG
    assert _raises_deser(lambda: ser.read_g1(ser.Reader(bytes(raw)), False))
    pt2 = _g2()
    raw2 = bytearray(ser.g2_to_bytes(pt2, compress=False))
    raw2[-1] |= ser.FLAG_Y_NEG
    assert _raises_deser(lambda: ser.read_g2(ser.Reader(bytes(raw2)), False))
