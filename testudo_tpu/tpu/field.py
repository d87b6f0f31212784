"""Vectorized big-field arithmetic for TPU (JAX, limb-decomposed).

Replaces the reference's native field backends (ark-ff `asm` Montgomery
multiplication, blst SIMD — see SURVEY.md §2.3) with a TPU-first design:

  - Field elements are arrays of 16-bit limbs held in uint32 lanes, shape
    (..., NLIMBS), little-endian limb order; Fr = 16 limbs, Fq = 24 limbs.
  - All ops are elementwise over the leading (batch) axes and map onto the
    TPU VPU; no 64-bit arithmetic anywhere (u32 only).
  - Multiplication: outer product + "shear" reshape for anti-diagonal
    column sums (pure data movement + one reduction — no gather/scatter),
    with products split into 16-bit lo/hi parts so every accumulator stays
    far below 2^32.
  - Reduction: non-interleaved Montgomery (m = T*N' mod R computed as one
    low half product), so the only serial structure is carry propagation —
    and carries are resolved with Kogge-Stone parallel prefix in O(log n)
    vector steps instead of O(n) ripple chains.  This keeps both the XLA
    graph and the dependency depth small.
  - Elements are kept in Montgomery form (aR mod p, R = 2^(16*NLIMBS),
    matching arkworks' R = 2^256 / 2^384) throughout the protocol layers.

The same functions trace into jitted XLA and into Pallas kernel bodies.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import P, R
from .jitutil import eager_jit

LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs(x: int, n: int) -> np.ndarray:
    return np.frombuffer(int(x).to_bytes(2 * n, "little"), dtype="<u2").astype(
        np.uint32
    )


@dataclass(frozen=True)
class FieldSpec:
    """Static description of a prime field in limb representation."""

    modulus: int
    nlimbs: int
    name: str

    @property
    def mont_r(self) -> int:
        return 1 << (LIMB_BITS * self.nlimbs)

    @property
    def p_limbs(self) -> np.ndarray:
        return _int_to_limbs(self.modulus, self.nlimbs)

    @property
    def nprime_limbs(self) -> np.ndarray:
        """-p^{-1} mod R as limbs (for the one-shot m = T*N' mod R)."""
        npr = (-pow(self.modulus, -1, self.mont_r)) % self.mont_r
        return _int_to_limbs(npr, self.nlimbs)

    @property
    def r_mod_p(self) -> int:
        return self.mont_r % self.modulus

    @property
    def r2_mod_p(self) -> int:
        return self.mont_r * self.mont_r % self.modulus

    # -- host <-> device conversion ---------------------------------------

    def to_limbs(self, values) -> np.ndarray:
        if isinstance(values, int):
            return _int_to_limbs(values % self.modulus, self.nlimbs)
        buf = b"".join(
            (int(v) % self.modulus).to_bytes(2 * self.nlimbs, "little")
            for v in values
        )
        arr = np.frombuffer(buf, dtype="<u2").astype(np.uint32)
        return arr.reshape(len(values), self.nlimbs)

    def from_limbs(self, arr) -> List[int]:
        a = np.asarray(arr).astype(np.uint32)
        flat = a.reshape(-1, self.nlimbs).astype("<u4").astype("<u2")
        out = []
        for row in flat:
            out.append(int.from_bytes(row.tobytes(), "little"))
        return out

    def from_limbs_single(self, arr) -> int:
        return self.from_limbs(arr)[0]

    def to_mont_int(self, x: int) -> int:
        return x * self.mont_r % self.modulus

    def from_mont_int(self, x: int) -> int:
        return x * pow(self.mont_r, -1, self.modulus) % self.modulus

    def encode(self, values) -> np.ndarray:
        """ints -> Montgomery-form limb array (the device representation)."""
        if isinstance(values, int):
            return self.to_limbs(self.to_mont_int(values % self.modulus))
        return self.to_limbs([self.to_mont_int(v % self.modulus) for v in values])

    def decode(self, arr) -> List[int]:
        rinv = pow(self.mont_r, -1, self.modulus)
        return [v * rinv % self.modulus for v in self.from_limbs(arr)]


FR = FieldSpec(R, 16, "fr")
FQ = FieldSpec(P, 24, "fq")


# ---------------------------------------------------------------------------
# Parallel-prefix carry machinery (Kogge-Stone over the limb axis)
# ---------------------------------------------------------------------------


def _shift_up(x: jnp.ndarray, d: int, fill=0) -> jnp.ndarray:
    """Shift limbs toward higher indices by d (value * 2^(16 d))."""
    if d == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
    return jnp.pad(x[..., :-d], pad, constant_values=fill)


def _carry_pp(t: jnp.ndarray, nout: int) -> jnp.ndarray:
    """Resolve carries of relaxed u32 limbs (< 2^26) into canonical 16-bit
    limbs, via parallel prefix.  The true value must fit in nout limbs."""
    k = t.shape[-1]
    if k < nout:
        t = jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, nout - k)])
    else:
        t = t[..., :nout]
    b = t >> LIMB_BITS  # bulk carries, < 2^10
    r = t & MASK
    v = r + _shift_up(b, 1)  # < 2^16 + 2^10
    c = v >> LIMB_BITS  # in {0,1}: carry emitted to next position
    r2 = v & MASK
    # cascade resolution: carry-in at position k
    g = _shift_up(c, 1)  # g[k] = 1 -> position k receives a carry seed
    p = _shift_up(r2 == MASK, 1)  # propagate condition of position k-1
    d = 1
    n = nout
    while d < n:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    out = (r2 + g.astype(jnp.uint32)) & MASK
    return out


def _sub_pp(a: jnp.ndarray, b: jnp.ndarray):
    """(a - b) over canonical limbs via parallel-prefix borrows.

    Returns (diff mod 2^(16 n), borrow_out) with borrow_out in {0,1}.
    """
    base = a + (MASK + 1) - b  # in [1, 2^17)
    r = base & MASK
    nb = base >> LIMB_BITS  # 1 = no borrow taken at this position
    # borrow generated at k regardless of borrow-in: base < 2^16;
    # propagated (borrow-out iff borrow-in): base == 2^16 <=> r==0, nb==1
    g = nb == 0
    pr = (r == 0) & (nb == 1)
    n = a.shape[-1]
    gi = _shift_up(g, 1)  # borrow-in seeds
    pi = _shift_up(pr, 1)
    d = 1
    while d < n:
        gi = gi | (pi & _shift_up(gi, d))
        pi = pi & _shift_up(pi, d)
        d *= 2
    bin_ = gi.astype(jnp.uint32)  # borrow-in at each position
    out = (r - bin_) & MASK
    top_borrow = g[..., -1] | (pr[..., -1] & gi[..., -1])
    return out, top_borrow


def _geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b over canonical limbs (no borrow out of a - b)."""
    _, borrow = _sub_pp(a, b)
    return ~borrow


def _p_bcast(spec: "FieldSpec", shape) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(spec.p_limbs), shape)


def _cond_sub_p(spec: "FieldSpec", a: jnp.ndarray, force=None) -> jnp.ndarray:
    pb = _p_bcast(spec, a.shape)
    diff, borrow = _sub_pp(a, pb)
    need = ~borrow if force is None else (~borrow | force)
    return jnp.where(need[..., None], diff, a)


# ---------------------------------------------------------------------------
# Field ops
# ---------------------------------------------------------------------------


@eager_jit(static_argnums=(0,))
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p for canonical-limb inputs."""
    n = spec.nlimbs
    t = _carry_pp(a + b, n + 1)  # value < 2p fits n+1 limbs
    hi = t[..., n] > 0
    lo = t[..., :n]
    pb = _p_bcast(spec, lo.shape)
    diff, borrow = _sub_pp(lo, pb)
    need = hi | ~borrow  # value >= 2^(16n) or lo >= p
    return jnp.where(need[..., None], diff, lo)


@eager_jit(static_argnums=(0,))
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for canonical-limb inputs."""
    n = spec.nlimbs
    diff, borrow = _sub_pp(a, b)
    fixed = _carry_pp(diff + jnp.asarray(spec.p_limbs), n)
    return jnp.where(borrow[..., None], fixed, diff)


@eager_jit(static_argnums=(0,))
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return sub(spec, jnp.zeros_like(a), a)


def _shear_cols(M: jnp.ndarray) -> jnp.ndarray:
    """Anti-diagonal column sums: M (..., n, n) -> T (..., 2n-1) with
    T[k] = sum_{i+j=k} M[i, j].  Pure pad/reshape/sum — no gathers."""
    n = M.shape[-1]
    batch = M.shape[:-2]
    Mrev = jnp.flip(M, axis=-2)
    Mp = jnp.pad(Mrev, [(0, 0)] * (M.ndim - 2) + [(0, 0), (0, n)])
    flat = Mp.reshape(batch + (2 * n * n,))
    flat = jnp.pad(flat, [(0, 0)] * (len(batch)) + [(0, n)])
    sh = flat.reshape(batch + (n, 2 * n + 1))
    colsum = jnp.sum(sh, axis=-2)
    rolled = jnp.roll(colsum, n - 1, axis=-1)
    return rolled[..., : 2 * n - 1]


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full product in relaxed columns: (..., n) x (..., n) -> (..., 2n).

    Each output column < 2n * 2^16 < 2^21 (u32-safe).
    """
    O = a[..., :, None] * b[..., None, :]
    lo = _shear_cols(O & MASK)  # width 2n-1
    hi = _shear_cols(O >> LIMB_BITS)
    cfgl = [(0, 0)] * (lo.ndim - 1)
    return jnp.pad(lo, cfgl + [(0, 1)]) + jnp.pad(hi, cfgl + [(1, 0)])


def _pallas_enabled() -> bool:
    global _PALLAS_ENABLED
    if _PALLAS_ENABLED is None:
        import os

        if os.environ.get("TESTUDO_PALLAS", "1") != "1":
            _PALLAS_ENABLED = False
        else:
            try:
                _PALLAS_ENABLED = jax.default_backend() != "cpu"
            except Exception:
                _PALLAS_ENABLED = False
    return _PALLAS_ENABLED


_PALLAS_ENABLED = None


@eager_jit(static_argnums=(0,))
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p (non-interleaved, carry-parallel).

    Inputs/outputs canonical 16-bit limbs < p (Montgomery domain values).
    Large batches on TPU dispatch to the fused Pallas kernel
    (pallas_field.py), which is bit-identical and keeps intermediates in
    VMEM; the pure-XLA path below remains for CPU and small shapes.
    """
    n = spec.nlimbs
    batch = 1
    for d in jnp.broadcast_shapes(a.shape, b.shape)[:-1]:
        batch *= d
    if batch >= 512 and _pallas_enabled():
        from . import pallas_field

        return pallas_field.mont_mul(spec, a, b)
    T = _mul_cols(a, b)  # (..., 2n) relaxed
    Tn = _carry_pp(T, 2 * n)  # canonical 2n limbs of the full product
    # m = (T mod R) * N' mod R
    t_lo = Tn[..., :n]
    npr = jnp.asarray(spec.nprime_limbs)
    m_cols = _mul_cols(t_lo, jnp.broadcast_to(npr, t_lo.shape))[..., :n]
    m = _carry_pp(m_cols, n)  # mod R: drop carries out of limb n-1
    # U = m * p; S = T + U is divisible by R
    U = _mul_cols(m, _p_bcast(spec, m.shape))  # (..., 2n) relaxed
    S = Tn + U  # limbs < 2^16 + 2^21: relaxed, fine
    Sn = _carry_pp(S, 2 * n + 1)
    res = Sn[..., n:]  # n+1 limbs; low half is all zeros by construction
    hi = res[..., n] > 0
    lo = res[..., :n]
    pb = _p_bcast(spec, lo.shape)
    diff, borrow = _sub_pp(lo, pb)
    need = hi | ~borrow
    return jnp.where(need[..., None], diff, lo)


@eager_jit(static_argnums=(0,))
def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


@eager_jit(static_argnums=(0, 2))
def pow_fixed(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e (Montgomery domain in and out), e a static Python int; runs a
    fori_loop over exponent bits so the graph holds one square-multiply."""
    one = jnp.broadcast_to(
        jnp.asarray(_int_to_limbs(spec.r_mod_p, spec.nlimbs)), a.shape
    )
    if e == 0:
        return one
    nbits = e.bit_length()
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)

    def body(i, carry):
        res, base = carry
        hit = mont_mul(spec, res, base)
        res = jnp.where(bits[i] == 1, hit, res)
        return res, mont_sqr(spec, base)

    res, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
    return res


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse via Fermat: a^(p-2).  0 maps to 0."""
    return pow_fixed(spec, a, spec.modulus - 2)


@eager_jit(static_argnums=(0,), static_argnames=("axis",))
def reduce_sum(spec: FieldSpec, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Sum of field elements along `axis` (mod p), Montgomery-domain safe."""
    if axis != 0:
        a = jnp.moveaxis(a, axis, 0)
    nchunk = 1 << 14
    nelem = a.shape[0]
    if nelem > nchunk:
        pad = (-nelem) % nchunk
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], jnp.uint32)], axis=0
            )
        a = a.reshape(-1, nchunk, *a.shape[1:])
        partials = _fold_wide(spec, jnp.sum(a, axis=1, dtype=jnp.uint32))
        return reduce_sum(spec, partials, axis=0)
    s = jnp.sum(a, axis=0, dtype=jnp.uint32)
    return _fold_wide(spec, s)


def _fold_wide(spec: FieldSpec, t: jnp.ndarray) -> jnp.ndarray:
    """Reduce relaxed u32 limbs (each < 2^30) to canonical < p.

    value = lo + hi*2^(16 n); x mod p via mont_mul(chunk, R^(c+1) mod p)."""
    n = spec.nlimbs
    t = _carry_pp(t, n + 2)
    lo = t[..., :n]
    hi = t[..., n:]
    lo_red = mont_mul(spec, lo, jnp.broadcast_to(jnp.asarray(_int_to_limbs(spec.r_mod_p, n)), lo.shape))
    hi_ext = jnp.concatenate(
        [hi, jnp.zeros(hi.shape[:-1] + (n - 2,), jnp.uint32)], axis=-1
    )
    hi_red = mont_mul(
        spec,
        hi_ext,
        jnp.broadcast_to(jnp.asarray(_int_to_limbs(spec.r2_mod_p, n)), hi_ext.shape),
    )
    return add(spec, lo_red, hi_red)


@eager_jit
def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(cond[..., None], a, b)


def const_array(spec: FieldSpec, value, mont: bool = True) -> jnp.ndarray:
    if isinstance(value, int):
        v = spec.to_mont_int(value % spec.modulus) if mont else value % spec.modulus
        # numpy (not jnp) so cached/global constants never capture tracers
        return np.asarray(_int_to_limbs(v, spec.nlimbs))
    raise TypeError(value)


@eager_jit(static_argnums=(0,))
def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)
