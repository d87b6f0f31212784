"""Radix-2 NTT (device, vectorized butterflies), generic over the field.

Powers Groth16's QAP division (h = (A B - C)/Z on a coset).  BLS12-377 Fr
has 2-adicity 47 and Fq (= BW6-761's scalar field) has 46, so any
practical domain is a power of two for both the inner (BLS12-377) and
outer (BW6-761) Groth16 instances.

Tables are (m, nlimbs) Montgomery limb arrays; each of the log2(m) stages
is one vectorized butterfly pass (reshape + mont_mul + add/sub); the
bit-reversal permutation is a precomputed gather.
"""
from __future__ import annotations

from functools import lru_cache
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import R
from ..poly import dense
from ..tpu import field as jf
from ..tpu.field import FR, FieldSpec, FQ


@lru_cache(maxsize=None)
def _two_adicity(modulus: int) -> int:
    return ((modulus - 1) & -(modulus - 1)).bit_length() - 1


@lru_cache(maxsize=None)
def _mult_generator(modulus: int) -> int:
    """Smallest g with g^((p-1)/2) != 1 — sufficient for the 2-power roots
    the NTT needs (full generatorhood is not required)."""
    g = 2
    while pow(g, (modulus - 1) // 2, modulus) == 1:
        g += 1
    return g


@lru_cache(maxsize=None)
def root_of_unity(log_m: int, modulus: int = R) -> int:
    adic = _two_adicity(modulus)
    assert log_m <= adic
    g = _mult_generator(modulus)
    two_adic_root = pow(g, (modulus - 1) >> adic, modulus)
    return pow(two_adic_root, 1 << (adic - log_m), modulus)


def _spec_of(modulus: int) -> FieldSpec:
    if modulus == FR.modulus:
        return FR
    if modulus == FQ.modulus:
        return FQ
    raise ValueError("unsupported NTT field")


@lru_cache(maxsize=None)
def _plan(log_m: int, inverse: bool, modulus: int = R):
    """Precompute bit-reversal permutation + per-stage twiddle tables."""
    spec = _spec_of(modulus)
    m = 1 << log_m
    w = root_of_unity(log_m, modulus)
    if inverse:
        w = pow(w, -1, modulus)
    rev = np.zeros(m, dtype=np.int32)
    for i in range(m):
        rev[i] = int(format(i, f"0{log_m}b")[::-1], 2) if log_m else 0
    stage_tw = []
    for s in range(1, log_m + 1):
        h = 1 << (s - 1)
        ws = pow(w, m >> s, modulus)
        tws = [1] * h
        for k in range(1, h):
            tws[k] = tws[k - 1] * ws % modulus
        stage_tw.append(jnp.asarray(spec.encode(tws)))
    return jnp.asarray(rev), stage_tw


def ntt(table: jnp.ndarray, inverse: bool = False, modulus: int = R) -> jnp.ndarray:
    """In-order NTT/INTT of a (m, nlimbs) Montgomery table."""
    spec = _spec_of(modulus)
    m = table.shape[0]
    log_m = m.bit_length() - 1
    rev, stage_tw = _plan(log_m, inverse, modulus)
    x = table[rev]
    for s in range(1, log_m + 1):
        h = 1 << (s - 1)
        xb = x.reshape(-1, 2 * h, spec.nlimbs)
        u = xb[:, :h]
        v = jf.mont_mul(spec, xb[:, h:], stage_tw[s - 1][None, :, :])
        x = jnp.concatenate([jf.add(spec, u, v), jf.sub(spec, u, v)], axis=1)
        x = x.reshape(m, spec.nlimbs)
    if inverse:
        minv = jnp.asarray(spec.encode(pow(m, -1, modulus)))
        x = jf.mont_mul(spec, x, minv)
    return x


def coset_scale(table: jnp.ndarray, g: int, inverse: bool = False,
                modulus: int = R) -> jnp.ndarray:
    """Multiply coefficient i by g^i (maps evaluation domain to the coset)."""
    spec = _spec_of(modulus)
    m = table.shape[0]
    gg = pow(g, -1, modulus) if inverse else g
    powers = [1] * m
    for i in range(1, m):
        powers[i] = powers[i - 1] * gg % modulus
    return jf.mont_mul(spec, table, jnp.asarray(spec.encode(powers)))
