"""R1CS instances: sparse matrix polynomials, satisfiability, digests.

TPU-native counterpart of /root/reference/src/r1csinstance.rs and the
byte-level construction API of lib.rs:

  - A, B, C are sparse multilinear polynomials over
    (x, y) = (constraints, 2*num_vars) hypercubes (r1csinstance.rs:116-117:
    num_poly_vars_y = log2(2 * num_vars));
  - multiply_vec computes (Az, Bz, Cz) as device segment-sums;
  - compute_eval_table_sparse scatters val * eq_rx[row] into columns
    (r1csinstance.rs:292-306);
  - evaluate computes A~(rx, ry) via chi gathers (sparse_mlpoly.rs
    multi_evaluate);
  - get_digest: Shake256 over the canonical serialization
    (r1csinstance.rs:155-164).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import R
from ..poly import dense
from ..tpu import field as jf
from ..tpu.field import FR
from .. import serialize as ser


def _log2(n: int) -> int:
    assert n > 0 and (n & (n - 1)) == 0, n
    return n.bit_length() - 1


@dataclass
class SparseMatPolynomial:
    """COO sparse multilinear matrix polynomial (sparse_mlpoly.rs)."""

    num_vars_x: int
    num_vars_y: int
    rows: np.ndarray  # (nnz,) int32
    cols: np.ndarray  # (nnz,) int32
    vals: List[int]  # canonical Fr ints

    _vals_dev: object = None
    spec: object = FR  # scalar FieldSpec (curve-generic axis)

    def vals_dev(self) -> jnp.ndarray:
        if self._vals_dev is None:
            object.__setattr__(
                self, "_vals_dev", dense.encode_table(self.vals, self.spec)
            )
        return self._vals_dev

    @property
    def nnz(self) -> int:
        return len(self.vals)

    def multiply_vec(self, num_rows: int, num_cols: int, z_dev: jnp.ndarray) -> jnp.ndarray:
        """(M z): out[row] += val * z[col]  — device gather + segment sum."""
        prods = jf.mont_mul(
            self.spec, self.vals_dev(), z_dev[jnp.asarray(self.cols)]
        )
        sums = jax.ops.segment_sum(
            prods, jnp.asarray(self.rows), num_segments=num_rows
        )
        return jf._fold_wide(self.spec, sums)

    def eval_table(self, eq_rx_dev: jnp.ndarray, num_rows: int, num_cols: int) -> jnp.ndarray:
        """out[col] += val * eq_rx[row] (compute_eval_table_sparse)."""
        prods = jf.mont_mul(
            self.spec, self.vals_dev(), eq_rx_dev[jnp.asarray(self.rows)]
        )
        sums = jax.ops.segment_sum(
            prods, jnp.asarray(self.cols), num_segments=num_cols
        )
        return jf._fold_wide(self.spec, sums)

    def evaluate(self, rx: Sequence[int], ry: Sequence[int]) -> int:
        """M~(rx, ry) = sum val * chi_row(rx) * chi_col(ry)."""
        eq_rx = dense.eq_evals(rx, self.spec)
        eq_ry = dense.eq_evals(ry, self.spec)
        prods = jf.mont_mul(
            self.spec,
            jf.mont_mul(
                self.spec, self.vals_dev(), eq_rx[jnp.asarray(self.rows)]
            ),
            eq_ry[jnp.asarray(self.cols)],
        )
        return dense.decode_scalar(jf.reduce_sum(self.spec, prods), self.spec)

    def serialize(self) -> bytes:
        """CanonicalSerialize-compatible layout: usize fields as u64 LE,
        Vec<SparseMatEntry> with u64 length prefix."""
        out = bytearray()
        out += ser.u64_to_bytes(self.num_vars_x)
        out += ser.u64_to_bytes(self.num_vars_y)
        out += ser.u64_to_bytes(len(self.vals))
        for r_, c_, v in zip(self.rows, self.cols, self.vals):
            out += ser.u64_to_bytes(int(r_))
            out += ser.u64_to_bytes(int(c_))
            out += ser.fr_to_bytes(v)
        return bytes(out)


@dataclass
class R1CSInstance:
    num_cons: int
    num_vars: int
    num_inputs: int
    A: SparseMatPolynomial
    B: SparseMatPolynomial
    C: SparseMatPolynomial

    @staticmethod
    def new(
        num_cons: int,
        num_vars: int,
        num_inputs: int,
        A: List[Tuple[int, int, int]],
        B: List[Tuple[int, int, int]],
        C: List[Tuple[int, int, int]],
        spec=FR,
    ) -> "R1CSInstance":
        assert num_cons & (num_cons - 1) == 0
        assert num_vars & (num_vars - 1) == 0
        assert num_inputs < num_vars
        nx = _log2(num_cons)
        ny = _log2(2 * num_vars)
        m = spec.modulus

        def mk(entries):
            rows = np.asarray([e[0] for e in entries], dtype=np.int32)
            cols = np.asarray([e[1] for e in entries], dtype=np.int32)
            vals = [e[2] % m for e in entries]
            return SparseMatPolynomial(nx, ny, rows, cols, vals, spec=spec)

        return R1CSInstance(num_cons, num_vars, num_inputs, mk(A), mk(B), mk(C))

    def get_digest(self) -> bytes:
        """Shake256(serialized instance) -> 256 bytes (r1csinstance.rs:155)."""
        data = (
            ser.u64_to_bytes(self.num_cons)
            + ser.u64_to_bytes(self.num_vars)
            + ser.u64_to_bytes(self.num_inputs)
            + self.A.serialize()
            + self.B.serialize()
            + self.C.serialize()
        )
        return hashlib.shake_256(data).digest(256)

    def z_vector(self, vars_: Sequence[int], inputs: Sequence[int]) -> List[int]:
        """z = vars || 1 || inputs || 0-pad to 2*num_vars (r1csproof.rs:269)."""
        z = list(vars_) + [1] + list(inputs)
        z += [0] * (2 * self.num_vars - len(z))
        return z

    def is_sat(self, vars_: Sequence[int], inputs: Sequence[int]) -> bool:
        assert len(vars_) == self.num_vars
        assert len(inputs) == self.num_inputs
        z = list(vars_) + [1] + list(inputs)
        zc = {i: v for i, v in enumerate(z)}

        mod = self.A.spec.modulus

        def mul_vec(m: SparseMatPolynomial):
            out = [0] * self.num_cons
            for r_, c_, v in zip(m.rows, m.cols, m.vals):
                out[int(r_)] = (out[int(r_)] + v * zc.get(int(c_), 0)) % mod
            return out

        Az, Bz, Cz = mul_vec(self.A), mul_vec(self.B), mul_vec(self.C)
        return all(a * b % mod == c % mod for a, b, c in zip(Az, Bz, Cz))

    def multiply_vec_dev(self, z_dev: jnp.ndarray):
        nc, ncols = self.num_cons, z_dev.shape[0]
        return (
            self.A.multiply_vec(nc, ncols, z_dev),
            self.B.multiply_vec(nc, ncols, z_dev),
            self.C.multiply_vec(nc, ncols, z_dev),
        )

    def compute_eval_table_sparse(self, eq_rx_dev: jnp.ndarray, num_cols: int):
        return (
            self.A.eval_table(eq_rx_dev, self.num_cons, num_cols),
            self.B.eval_table(eq_rx_dev, self.num_cons, num_cols),
            self.C.eval_table(eq_rx_dev, self.num_cons, num_cols),
        )

    def evaluate(self, rx: Sequence[int], ry: Sequence[int]):
        return (
            self.A.evaluate(rx, ry),
            self.B.evaluate(rx, ry),
            self.C.evaluate(rx, ry),
        )

    @staticmethod
    def produce_synthetic_r1cs(
        num_cons: int, num_vars: int, num_inputs: int, seed: int = 0, spec=FR
    ):
        """Deterministic analogue of r1csinstance.rs:166-242."""
        import random

        m = spec.modulus
        rng = random.Random(seed)
        size_z = num_vars + num_inputs + 1
        Z = [rng.randrange(m) for _ in range(size_z)]
        Z[num_vars] = 1
        A, B, C = [], [], []
        for i in range(num_cons):
            a_idx = i % size_z
            b_idx = (i + 2) % size_z
            A.append((i, a_idx, 1))
            B.append((i, b_idx, 1))
            ab = Z[a_idx] * Z[b_idx] % m
            c_idx = (i + 3) % size_z
            cv = Z[c_idx]
            if cv == 0:
                C.append((i, num_vars, ab))
            else:
                C.append((i, c_idx, ab * pow(cv, -1, m) % m))
        inst = R1CSInstance.new(num_cons, num_vars, num_inputs, A, B, C, spec)
        vars_, inputs = Z[:num_vars], Z[num_vars + 1 :]
        assert inst.is_sat(vars_, inputs)
        return inst, vars_, inputs


# ---------------------------------------------------------------------------
# Byte-level construction API (lib.rs mirror)
# ---------------------------------------------------------------------------


class R1CSError(Exception):
    pass


class InvalidIndex(R1CSError):
    pass


class InvalidScalar(R1CSError):
    pass


class Assignment:
    """Mirror of lib.rs::Assignment (LE byte vectors -> Fr)."""

    def __init__(self, assignment: List[int]):
        self.assignment = assignment

    @staticmethod
    def new(byte_vecs: List[bytes]) -> "Assignment":
        out = []
        for b in byte_vecs:
            v = ser.fr_from_bytes(b)
            if v is None:
                raise InvalidScalar(b.hex())
            out.append(v)
        return Assignment(out)

    def pad(self, length: int) -> "Assignment":
        assert length > len(self.assignment)
        return Assignment(
            self.assignment + [0] * (length - len(self.assignment))
        )


class Instance:
    """Mirror of lib.rs::Instance — byte-level R1CS construction with
    padding and input-column remapping (lib.rs:129-235)."""

    def __init__(self, inst: R1CSInstance, digest: bytes):
        self.inst = inst
        self.digest = digest

    @staticmethod
    def new(
        num_cons: int,
        num_vars: int,
        num_inputs: int,
        A: List[Tuple[int, int, bytes]],
        B: List[Tuple[int, int, bytes]],
        C: List[Tuple[int, int, bytes]],
    ) -> "Instance":
        num_vars_padded = max(num_vars, num_inputs + 1)
        if num_vars_padded & (num_vars_padded - 1):
            num_vars_padded = 1 << num_vars_padded.bit_length()
        num_cons_padded = num_cons
        if num_cons_padded in (0, 1):
            num_cons_padded = 2
        if num_cons & (num_cons - 1):
            num_cons_padded = 1 << num_cons.bit_length()

        def conv(tups):
            mat = []
            for row, col, val_bytes in tups:
                if row >= num_cons:
                    raise InvalidIndex(f"row {row}")
                if col >= num_vars + 1 + num_inputs:
                    raise InvalidIndex(f"col {col}")
                v = ser.fr_from_bytes(val_bytes)
                if v is None:
                    raise InvalidScalar(bytes(val_bytes).hex())
                if col >= num_vars:
                    # constant/input columns remap past padding (lib.rs:187)
                    mat.append((row, col + num_vars_padded - num_vars, v))
                else:
                    mat.append((row, col, v))
            if num_cons in (0, 1):
                for i in range(len(tups), num_cons_padded):
                    mat.append((i, num_vars, 0))
            return mat

        inst = R1CSInstance.new(
            num_cons_padded, num_vars_padded, num_inputs, conv(A), conv(B), conv(C)
        )
        return Instance(inst, inst.get_digest())

    def is_sat(self, vars_: Assignment, inputs: Assignment) -> bool:
        if len(vars_.assignment) > self.inst.num_vars:
            raise R1CSError("too many vars")
        if len(inputs.assignment) != self.inst.num_inputs:
            raise R1CSError("wrong number of inputs")
        padded = (
            vars_.pad(self.inst.num_vars)
            if self.inst.num_vars > len(vars_.assignment)
            else vars_
        )
        return self.inst.is_sat(padded.assignment, inputs.assignment)

    @staticmethod
    def produce_synthetic_r1cs(num_cons, num_vars, num_inputs, seed: int = 0):
        inst, vars_, inputs = R1CSInstance.produce_synthetic_r1cs(
            num_cons, num_vars, num_inputs, seed
        )
        return (
            Instance(inst, inst.get_digest()),
            Assignment(vars_),
            Assignment(inputs),
        )
