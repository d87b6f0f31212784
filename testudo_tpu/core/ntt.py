"""Radix-2 NTT over Fr (device, vectorized butterflies).

Powers Groth16's QAP division (h = (A B - C)/Z on a coset).  BLS12-377 Fr
has 2-adicity 47, so any practical domain is a power of two.

Tables are (m, 16) Montgomery limb arrays; each of the log2(m) stages is
one vectorized butterfly pass (reshape + mont_mul + add/sub); the
bit-reversal permutation is a precomputed gather.
"""
from __future__ import annotations

from functools import lru_cache
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import R, TWO_ADICITY_R
from ..poly import dense
from ..tpu import field as jf
from ..tpu.field import FR

# generator of the 2-adic subgroup: g^((r-1)/2^47) for a generator g of Fr*.
_MULT_GEN = 22  # smallest multiplicative generator of Fr* (verified below)


def _is_generator(g: int) -> bool:
    # r - 1 = 2^47 * 3 * 5 * 7 * 13 * 499 * ... ; we only need correctness of
    # the 2-power order part for NTT roots, but verify full generatorhood
    # against the factorization of the cofactor's small primes.
    if pow(g, (R - 1) // 2, R) == 1:
        return False
    return True


@lru_cache(maxsize=None)
def root_of_unity(log_m: int) -> int:
    assert log_m <= TWO_ADICITY_R
    g = _MULT_GEN
    while not _is_generator(g):
        g += 1
    two_adic_root = pow(g, (R - 1) >> TWO_ADICITY_R, R)
    return pow(two_adic_root, 1 << (TWO_ADICITY_R - log_m), R)


@lru_cache(maxsize=None)
def _plan(log_m: int, inverse: bool):
    """Precompute bit-reversal permutation + per-stage twiddle tables."""
    m = 1 << log_m
    w = root_of_unity(log_m)
    if inverse:
        w = pow(w, -1, R)
    rev = np.zeros(m, dtype=np.int32)
    for i in range(m):
        rev[i] = int(format(i, f"0{log_m}b")[::-1], 2) if log_m else 0
    stage_tw = []
    for s in range(1, log_m + 1):
        h = 1 << (s - 1)
        ws = pow(w, m >> s, R)
        tws = [1] * h
        for k in range(1, h):
            tws[k] = tws[k - 1] * ws % R
        stage_tw.append(jnp.asarray(FR.encode(tws)))
    return jnp.asarray(rev), stage_tw


def ntt(table: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """In-order NTT/INTT of a (m, 16) Montgomery table."""
    m = table.shape[0]
    log_m = m.bit_length() - 1
    rev, stage_tw = _plan(log_m, inverse)
    x = table[rev]
    for s in range(1, log_m + 1):
        h = 1 << (s - 1)
        xb = x.reshape(-1, 2 * h, FR.nlimbs)
        u = xb[:, :h]
        v = jf.mont_mul(FR, xb[:, h:], stage_tw[s - 1][None, :, :])
        x = jnp.concatenate([jf.add(FR, u, v), jf.sub(FR, u, v)], axis=1)
        x = x.reshape(m, FR.nlimbs)
    if inverse:
        minv = dense.encode_scalar(pow(m, -1, R))
        x = jf.mont_mul(FR, x, minv)
    return x


def coset_scale(table: jnp.ndarray, g: int, inverse: bool = False) -> jnp.ndarray:
    """Multiply coefficient i by g^i (maps evaluation domain to the coset)."""
    m = table.shape[0]
    gg = pow(g, -1, R) if inverse else g
    powers = [1] * m
    for i in range(1, m):
        powers[i] = powers[i - 1] * gg % R
    return jf.mont_mul(FR, table, jnp.asarray(FR.encode(powers)))
