"""Dense multilinear polynomials over a scalar field as device limb arrays.

TPU-native counterpart of the reference's DensePolynomial / EqPolynomial /
IdentityPolynomial (/root/reference/src/dense_mlpoly.rs).  Evaluation tables
live on device in Montgomery form, shape (2^nv, nlimbs); variable binding
and equality tables are vectorized; only scalars cross the host boundary.

Every function takes an optional `spec` (a tpu.field.FieldSpec) so the
same machinery serves any scalar field — BLS12-377 Fr by default, BLS12-381
Fr for the curve-generic protocol path (r1csproof.rs:754-801 proves over
multiple curves through one generic implementation; here the genericity
axis is the FieldSpec + curves.profile.CurveProfile pair).

Conventions (identical to the reference):
  - `bound_top` folds index pairs (i, i + n/2): Z'[i] = Z[i] + r (Z[i+n/2]
    - Z[i])  (dense_mlpoly.rs:389-396) — binds the MOST significant index
    bit to r.
  - eq_evals(r) produces chi_i(r) with MSB-first bit convention
    (dense_mlpoly.rs:231-250 — interleaved doubling fill), consistent with
    get_chi_i (sqrt_pst.rs:152-166) and Math::get_bits (math.rs:21-25).
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..tpu import field as jf
from ..tpu.jitutil import eager_jit
from ..tpu.field import FR

R = FR.modulus  # default scalar modulus (BLS12-377 Fr)


def encode_table(values: Sequence[int], spec: jf.FieldSpec = FR) -> jnp.ndarray:
    """Host canonical ints -> device Montgomery table (n, nlimbs)."""
    if isinstance(values, np.ndarray) and values.dtype.kind in "iu":
        return encode_table_small(values, spec)
    values = list(values)
    if len(values) > (1 << 14):
        # big tables: canonical limb split on host (cheap to_bytes loop),
        # Montgomery lift on device — skips a Python big-int multiply per
        # element (2^20-scale Spark/z tables pay ~1 us/elt for it)
        return _to_mont_dev(jnp.asarray(spec.to_limbs(values)), spec)
    return jnp.asarray(spec.encode(values))


@partial(jax.jit, static_argnums=(1,))
def _to_mont_dev(limbs: jnp.ndarray, spec: jf.FieldSpec) -> jnp.ndarray:
    """Canonical limbs -> Montgomery form on device: x * R = mont_mul(x, R^2).

    mont_mul returns canonical limbs < p, so the result is bit-identical to
    the host encode path."""
    r2 = jnp.asarray(jf._int_to_limbs(spec.r2_mod_p, spec.nlimbs))
    return jf.mont_mul(spec, limbs, jnp.broadcast_to(r2, limbs.shape))


def encode_table_small(values: np.ndarray, spec: jf.FieldSpec = FR) -> jnp.ndarray:
    """Vectorized encode for nonnegative machine-int values (< 2^63):
    numpy limb split + one device Montgomery multiply, instead of a Python
    big-int loop per element (the Spark encode path at 2^20 nnz runs three
    matrices x five tables through here — sparse_mlpoly.rs:220-279)."""
    v = np.asarray(values, dtype=np.int64)
    assert v.size == 0 or int(v.min()) >= 0, "encode_table_small: negative"
    u = v.astype(np.uint64)
    limbs = np.zeros((v.shape[0], spec.nlimbs), np.uint32)
    for k in range(min(4, spec.nlimbs)):
        limbs[:, k] = ((u >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(
            np.uint32
        )
    return _to_mont_dev(jnp.asarray(limbs), spec)


def decode_table(arr, spec: jf.FieldSpec = FR) -> List[int]:
    return spec.decode(np.asarray(arr))


def decode_scalar(arr, spec: jf.FieldSpec = FR) -> int:
    return spec.decode(np.asarray(arr).reshape(1, -1))[0]


def encode_scalar(x: int, spec: jf.FieldSpec = FR) -> jnp.ndarray:
    return jnp.asarray(spec.encode(x % spec.modulus))


@partial(jax.jit, static_argnums=(2,))
def _bound_top(Z: jnp.ndarray, r: jnp.ndarray, spec: jf.FieldSpec) -> jnp.ndarray:
    n = Z.shape[0] // 2
    lo, hi = Z[:n], Z[n:]
    return jf.add(spec, lo, jf.mont_mul(spec, jf.sub(spec, hi, lo), r))


def bound_top(Z: jnp.ndarray, r: jnp.ndarray, spec: jf.FieldSpec = FR) -> jnp.ndarray:
    """One variable-binding round: fold halves with challenge r."""
    return _bound_top(Z, r, spec)


@partial(jax.jit, static_argnums=(2,))
def _bound_bot(Z: jnp.ndarray, r: jnp.ndarray, spec: jf.FieldSpec) -> jnp.ndarray:
    lo = Z[0::2]
    hi = Z[1::2]
    return jf.add(spec, lo, jf.mont_mul(spec, jf.sub(spec, hi, lo), r))


def bound_bot(Z: jnp.ndarray, r: jnp.ndarray, spec: jf.FieldSpec = FR) -> jnp.ndarray:
    """Fold adjacent pairs (2i, 2i+1) with challenge r (LSB binding)."""
    return _bound_bot(Z, r, spec)


@eager_jit(static_argnums=(1,))
def eq_evals_device(rs: Sequence[jnp.ndarray], spec: jf.FieldSpec = FR) -> jnp.ndarray:
    """chi table over {0,1}^len(rs), MSB-first (device Montgomery scalars).

    evals[i] = prod_j (bit_{msb-j}(i) ? r_j : 1 - r_j).
    """
    one = jnp.asarray(spec.encode(1)).reshape(1, spec.nlimbs)
    evals = one
    for r in rs:
        rb = jnp.broadcast_to(r.reshape(1, -1), evals.shape)
        hi = jf.mont_mul(spec, evals, rb)
        lo = jf.sub(spec, evals, hi)
        evals = jnp.stack([lo, hi], axis=1).reshape(-1, spec.nlimbs)
    return evals


def eq_evals(point: Sequence[int], spec: jf.FieldSpec = FR) -> jnp.ndarray:
    """chi table from host ints (canonical)."""
    return eq_evals_device([encode_scalar(x, spec) for x in point], spec)


@eager_jit(static_argnums=(2,))
def _dot(Z: jnp.ndarray, chis: jnp.ndarray, spec: jf.FieldSpec = FR) -> jnp.ndarray:
    return jf.reduce_sum(spec, jf.mont_mul(spec, Z, chis))


def evaluate(Z: jnp.ndarray, point: Sequence[int], spec: jf.FieldSpec = FR) -> int:
    """Z~(point) in O(n): dot(Z, chi(point)); returns a canonical host int."""
    return decode_scalar(_dot(Z, eq_evals(point, spec), spec), spec)


def eq_evaluate(r: Sequence[int], rx: Sequence[int], modulus: int = R) -> int:
    """eq(r, rx) on host ints (dense_mlpoly.rs:224-229)."""
    acc = 1
    for a, b in zip(r, rx):
        acc = acc * (a * b + (1 - a) * (1 - b)) % modulus
    return acc


def identity_evaluate(point: Sequence[int], modulus: int = R) -> int:
    """IdentityPolynomial evaluation (dense_mlpoly.rs:276-283)."""
    ln = len(point)
    return sum((1 << (ln - i - 1)) * point[i] for i in range(ln)) % modulus


def factored_lens(ell: int):
    return ell // 2, ell - ell // 2


@eager_jit(static_argnums=(2,))
def bound_L(Z: jnp.ndarray, L: jnp.ndarray, spec: jf.FieldSpec = FR) -> jnp.ndarray:
    """Vector-matrix product: out[i] = sum_j L[j] Z[j * R_size + i]
    (dense_mlpoly.rs:379-387)."""
    L_size = L.shape[0]
    R_size = Z.shape[0] // L_size
    Zm = Z.reshape(L_size, R_size, spec.nlimbs)
    prods = jf.mont_mul(spec, Zm, L[:, None, :])
    return jf.reduce_sum(spec, prods, axis=0)


@eager_jit(static_argnums=(1,))
def merge_tables(tables: List[jnp.ndarray], spec: jf.FieldSpec = FR) -> jnp.ndarray:
    """Concatenate then zero-pad to a power of two (dense_mlpoly.rs:431-444)."""
    total = sum(t.shape[0] for t in tables)
    target = 1 << max(0, (total - 1).bit_length())
    parts = list(tables)
    if target > total:
        parts.append(jnp.zeros((target - total, spec.nlimbs), jnp.uint32))
    return jnp.concatenate(parts, axis=0)
