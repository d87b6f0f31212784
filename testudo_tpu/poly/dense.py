"""Dense multilinear polynomials over Fr as device limb arrays.

TPU-native counterpart of the reference's DensePolynomial / EqPolynomial /
IdentityPolynomial (/root/reference/src/dense_mlpoly.rs).  Evaluation tables
live on device in Montgomery form, shape (2^nv, 16); variable binding and
equality tables are vectorized; only scalars cross the host boundary.

Conventions (identical to the reference):
  - `bound_top` folds index pairs (i, i + n/2): Z'[i] = Z[i] + r (Z[i+n/2]
    - Z[i])  (dense_mlpoly.rs:389-396) — binds the MOST significant index
    bit to r.
  - eq_evals(r) produces chi_i(r) with MSB-first bit convention
    (dense_mlpoly.rs:231-250 — interleaved doubling fill), consistent with
    get_chi_i (sqrt_pst.rs:152-166) and Math::get_bits (math.rs:21-25).
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import R
from ..tpu import field as jf
from ..tpu.jitutil import eager_jit
from ..tpu.field import FR


def encode_table(values: Sequence[int]) -> jnp.ndarray:
    """Host canonical ints -> device Montgomery table (n, 16)."""
    return jnp.asarray(FR.encode(list(values)))


def decode_table(arr) -> List[int]:
    return FR.decode(np.asarray(arr))


def decode_scalar(arr) -> int:
    return FR.decode(np.asarray(arr).reshape(1, -1))[0]


def encode_scalar(x: int) -> jnp.ndarray:
    return jnp.asarray(FR.encode(x % R))


@jax.jit
def bound_top(Z: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """One variable-binding round: fold halves with challenge r."""
    n = Z.shape[0] // 2
    lo, hi = Z[:n], Z[n:]
    return jf.add(FR, lo, jf.mont_mul(FR, jf.sub(FR, hi, lo), r))


@jax.jit
def bound_bot(Z: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Fold adjacent pairs (2i, 2i+1) with challenge r (LSB binding)."""
    lo = Z[0::2]
    hi = Z[1::2]
    return jf.add(FR, lo, jf.mont_mul(FR, jf.sub(FR, hi, lo), r))


@eager_jit
def eq_evals_device(rs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """chi table over {0,1}^len(rs), MSB-first (device Montgomery scalars).

    evals[i] = prod_j (bit_{msb-j}(i) ? r_j : 1 - r_j).
    """
    one = jnp.asarray(FR.encode(1)).reshape(1, FR.nlimbs)
    evals = one
    for r in rs:
        rb = jnp.broadcast_to(r.reshape(1, -1), evals.shape)
        hi = jf.mont_mul(FR, evals, rb)
        lo = jf.sub(FR, evals, hi)
        evals = jnp.stack([lo, hi], axis=1).reshape(-1, FR.nlimbs)
    return evals


def eq_evals(point: Sequence[int]) -> jnp.ndarray:
    """chi table from host ints (canonical)."""
    return eq_evals_device([encode_scalar(x) for x in point])


@eager_jit
def _dot(Z: jnp.ndarray, chis: jnp.ndarray) -> jnp.ndarray:
    return jf.reduce_sum(FR, jf.mont_mul(FR, Z, chis))


def evaluate(Z: jnp.ndarray, point: Sequence[int]) -> int:
    """Z~(point) in O(n): dot(Z, chi(point)); returns a canonical host int."""
    return decode_scalar(_dot(Z, eq_evals(point)))


def eq_evaluate(r: Sequence[int], rx: Sequence[int]) -> int:
    """eq(r, rx) on host ints (dense_mlpoly.rs:224-229)."""
    acc = 1
    for a, b in zip(r, rx):
        acc = acc * (a * b + (1 - a) * (1 - b)) % R
    return acc


def identity_evaluate(point: Sequence[int]) -> int:
    """IdentityPolynomial evaluation (dense_mlpoly.rs:276-283)."""
    ln = len(point)
    return sum((1 << (ln - i - 1)) * point[i] for i in range(ln)) % R


def factored_lens(ell: int):
    return ell // 2, ell - ell // 2


@eager_jit
def bound_L(Z: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Vector-matrix product: out[i] = sum_j L[j] Z[j * R_size + i]
    (dense_mlpoly.rs:379-387)."""
    L_size = L.shape[0]
    R_size = Z.shape[0] // L_size
    Zm = Z.reshape(L_size, R_size, FR.nlimbs)
    prods = jf.mont_mul(FR, Zm, L[:, None, :])
    return jf.reduce_sum(FR, prods, axis=0)


@eager_jit
def merge_tables(tables: List[jnp.ndarray]) -> jnp.ndarray:
    """Concatenate then zero-pad to a power of two (dense_mlpoly.rs:431-444)."""
    total = sum(t.shape[0] for t in tables)
    target = 1 << max(0, (total - 1).bit_length())
    parts = list(tables)
    if target > total:
        parts.append(jnp.zeros((target - total, FR.nlimbs), jnp.uint32))
    return jnp.concatenate(parts, axis=0)
