"""Byte-level R1CS construction API error paths.

Mirrors /root/reference/src/lib.rs:301-344 (`check_r1cs_invalid_index`,
`check_r1cs_invalid_scalar`) — host-only, fast.
"""
import pytest

from testudo_tpu.core.r1cs import (
    Assignment,
    Instance,
    InvalidIndex,
    InvalidScalar,
    R1CSError,
)
from testudo_tpu.fields.bls12_377 import R
from testudo_tpu import serialize as ser


def _le32(v: int) -> bytes:
    return v.to_bytes(32, "little")


def test_invalid_row_index_rejected():
    # lib.rs:301-320: a (row >= num_cons) triple must raise InvalidIndex
    num_cons, num_vars, num_inputs = 4, 8, 1
    A = [(num_cons + 1, 0, _le32(1))]
    with pytest.raises(InvalidIndex):
        Instance.new(num_cons, num_vars, num_inputs, A, [], [])


def test_invalid_col_index_rejected():
    num_cons, num_vars, num_inputs = 4, 8, 1
    A = [(0, num_vars + 1 + num_inputs, _le32(1))]
    with pytest.raises(InvalidIndex):
        Instance.new(num_cons, num_vars, num_inputs, A, [], [])


def test_invalid_scalar_rejected():
    # lib.rs:322-344: a non-canonical (>= r) LE byte vector must raise
    num_cons, num_vars, num_inputs = 4, 8, 1
    bad = _le32(R)  # exactly the modulus: not a canonical scalar
    A = [(0, 0, bad)]
    with pytest.raises(InvalidScalar):
        Instance.new(num_cons, num_vars, num_inputs, A, [], [])


def test_invalid_scalar_all_ones_rejected():
    bad = b"\xff" * 32
    with pytest.raises(InvalidScalar):
        Instance.new(4, 8, 1, [(0, 0, bad)], [], [])


def test_assignment_invalid_scalar_rejected():
    with pytest.raises(InvalidScalar):
        Assignment.new([_le32(R + 5)])


def test_assignment_roundtrip_canonical():
    vals = [0, 1, R - 1]
    a = Assignment.new([_le32(v) for v in vals])
    assert a.assignment == vals


def test_is_sat_arity_errors():
    inst, vars_, inputs = Instance.produce_synthetic_r1cs(16, 16, 2)
    with pytest.raises(R1CSError):
        inst.is_sat(Assignment([0] * (inst.inst.num_vars + 1)), inputs)
    with pytest.raises(R1CSError):
        inst.is_sat(vars_, Assignment([0] * (inst.inst.num_inputs + 1)))


def test_padding_and_remap_keeps_satisfiability():
    # non-pow2 sizes exercise padding + the input-column remap (lib.rs:187):
    # x^3 = y with x = 2, y = 8 as 3 constraints over 3 vars + 1 input
    one = _le32(1)
    A = [(0, 0, one), (1, 1, one), (2, 2, one)]
    B = [(0, 0, one), (1, 0, one), (2, 3, one)]  # col 3 = constant-one col
    C = [(0, 1, one), (1, 2, one), (2, 4, one)]  # col 4 = input 0
    inst = Instance.new(3, 3, 1, A, B, C)
    assert inst.inst.num_vars == 4 and inst.inst.num_cons == 4
    vars_ = Assignment.new([_le32(v) for v in (2, 4, 8)])
    good = Assignment.new([_le32(8)])
    assert inst.is_sat(vars_, good)
    bad = Assignment.new([_le32(9)])
    assert not inst.is_sat(vars_, bad)
