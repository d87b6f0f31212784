"""Device-resident Poseidon sponge + Fiat-Shamir transcript.

Why: through the axon tunnel each host<->device round trip costs ~50 ms,
and the sumcheck provers (core/sumcheck.py) do two per round — the
transcript, not the TPU, dominates prover latency.  This module keeps the
sponge STATE on device so a whole multi-round protocol phase traces into
ONE dispatch: absorbs and squeezes become traced field ops, and only the
final proof leaves the device.

Bit-exactness: the permutation runs in the Montgomery domain (constants
pre-lifted), which commutes with the canonical-domain host sponge
(poseidon/sponge.py) — x -> x*R is a ring hom for +, and mont_mul chains
compute the same monomials.  The absorb/squeeze mode machine is STATIC
(mirrored from poseidon/sponge.py:92-155): protocol schedules are known at
trace time, so mode/index live in Python and only values are traced.

Cross-field rules mirrored (the snapshot threads an Fq transcript through
Fr sumchecks, r1csproof.rs:242):
  - absorbing an Fr value into an Fq sponge re-reads its canonical integer
    mod q  (sponge.py:115-121);
  - squeezing an Fr challenge from an Fq sponge takes the low 252 bits of
    the canonical squeezed element  (sponge.py:157-173).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import P, R
from ..poseidon import constants_377 as C
from . import field as jf
from .field import FQ, FR, FieldSpec, LIMB_BITS


@lru_cache(maxsize=None)
def _mont_consts(modulus: int):
    """ARK/MDS tables as Montgomery limb arrays for the given modulus."""
    spec = FR if modulus == R else FQ
    ark = np.stack([spec.encode([c % modulus for c in row]) for row in C.ARK])
    mds = np.stack([spec.encode([c % modulus for c in row]) for row in C.MDS])
    return ark, mds


def _spec_of(modulus: int) -> FieldSpec:
    if modulus == R:
        return FR
    if modulus == P:
        return FQ
    raise ValueError("unsupported sponge modulus")


def permute(spec: FieldSpec, state: jnp.ndarray) -> jnp.ndarray:
    """One Poseidon permutation on a (3, nlimbs) Montgomery-domain state.

    Rounds run in three lax.fori_loops (full / partial / full) with the
    round constants indexed dynamically — the emitted graph holds ONE
    round body per phase instead of 39 unrolled rounds of limb
    arithmetic, which keeps trace/compile time of fused provers sane."""
    ark, mds = _mont_consts(spec.modulus)
    ark_d = jnp.asarray(ark)  # (total, t, nlimbs)
    mds_d = jnp.asarray(mds)  # (t, t, nlimbs)
    half = C.FULL_ROUNDS // 2
    total = C.FULL_ROUNDS + C.PARTIAL_ROUNDS
    t = C.RATE + C.CAPACITY

    def sbox(x):
        # x^17 = (((x^2)^2)^2)^2 * x
        y = jf.mont_sqr(spec, x)
        y = jf.mont_sqr(spec, y)
        y = jf.mont_sqr(spec, y)
        y = jf.mont_sqr(spec, y)
        return jf.mont_mul(spec, y, x)

    def mds_apply(s):
        prods = jf.mont_mul(
            spec, mds_d, jnp.broadcast_to(s[None, :, :], mds_d.shape)
        )
        acc = prods[:, 0, :]
        for j in range(1, t):
            acc = jf.add(spec, acc, prods[:, j, :])
        return acc

    def full_round(rnd, s):
        s = jf.add(spec, s, ark_d[rnd])
        return mds_apply(sbox(s))

    def partial_round(rnd, s):
        s = jf.add(spec, s, ark_d[rnd])
        s = s.at[0].set(sbox(s[0]))
        return mds_apply(s)

    state = jax.lax.fori_loop(0, half, full_round, state)
    state = jax.lax.fori_loop(half, half + C.PARTIAL_ROUNDS, partial_round, state)
    state = jax.lax.fori_loop(half + C.PARTIAL_ROUNDS, total, full_round, state)
    return state


_ABSORBING = 0
_SQUEEZING = 1


@dataclass
class DeviceSponge:
    """Traced Poseidon duplex sponge; mode machine is static Python."""

    spec: FieldSpec
    state: jnp.ndarray  # (3, nlimbs) Montgomery domain
    mode: int = _ABSORBING
    index: int = 0

    @staticmethod
    def fresh(modulus: int) -> "DeviceSponge":
        spec = _spec_of(modulus)
        return DeviceSponge(
            spec, jnp.zeros((C.RATE + C.CAPACITY, spec.nlimbs), jnp.uint32)
        )

    # -- host sync ----------------------------------------------------------

    @staticmethod
    def from_host(sponge) -> "DeviceSponge":
        """Import a host PoseidonSponge's state (canonical ints)."""
        spec = _spec_of(sponge.params.modulus)
        state = jnp.asarray(spec.encode(list(sponge.state)))
        return DeviceSponge(spec, state, sponge.mode, sponge.index)

    def export_to_host(self, sponge, state_host: np.ndarray) -> None:
        """Write back into a host PoseidonSponge (state_host: the decoded
        (3, nlimbs) array pulled from device)."""
        sponge.state = self.spec.decode(state_host)
        sponge.mode = self.mode
        sponge.index = self.index

    # -- duplex ops (mirror poseidon/sponge.py exactly) ---------------------

    def absorb(self, elems: List[jnp.ndarray]) -> None:
        """Absorb native-field Montgomery-domain elements (each (nlimbs,))."""
        if not elems:
            return
        if self.mode == _SQUEEZING or self.index == C.RATE:
            self.state = permute(self.spec, self.state)
            self.index = 0
        self.mode = _ABSORBING
        i = self.index
        for e in elems:
            if i == C.RATE:
                self.state = permute(self.spec, self.state)
                i = 0
            row = C.CAPACITY + i
            self.state = self.state.at[row].set(
                jf.add(self.spec, self.state[row], e)
            )
            i += 1
        self.index = i

    def squeeze(self, n: int) -> List[jnp.ndarray]:
        out = []
        if self.mode == _ABSORBING or self.index == C.RATE:
            self.state = permute(self.spec, self.state)
            self.index = 0
        self.mode = _SQUEEZING
        i = self.index
        for _ in range(n):
            if i == C.RATE:
                self.state = permute(self.spec, self.state)
                i = 0
            out.append(self.state[C.CAPACITY + i])
            i += 1
        self.index = i
        return out


_FR_BITS_USED = R.bit_length() - 1  # 252: squeeze_foreign_field semantics


def fr_to_fq_mont(v_fr_mont: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-Fr (16 limbs) -> Montgomery-Fq (24 limbs) of the SAME
    canonical integer (the cross-field absorb rule)."""
    canon = jf.mont_mul(
        FR, v_fr_mont, jnp.asarray(jf._int_to_limbs(1, FR.nlimbs))
    )  # de-Montgomery: canonical 16-bit limbs
    ext = jnp.concatenate(
        [canon, jnp.zeros(canon.shape[:-1] + (FQ.nlimbs - FR.nlimbs,), jnp.uint32)],
        axis=-1,
    )
    r2 = jnp.asarray(jf._int_to_limbs(FQ.r2_mod_p, FQ.nlimbs))
    return jf.mont_mul(FQ, ext, r2)


def fq_squeeze_to_fr_mont(v_fq_mont: jnp.ndarray) -> jnp.ndarray:
    """Squeezed Montgomery-Fq element -> Fr challenge (Montgomery-Fr):
    low 252 bits of the canonical value (squeeze_foreign_field)."""
    canon = jf.mont_mul(
        FQ, v_fq_mont, jnp.asarray(jf._int_to_limbs(1, FQ.nlimbs))
    )
    nl = _FR_BITS_USED // LIMB_BITS  # 15 full limbs
    rem = _FR_BITS_USED - nl * LIMB_BITS  # 12 bits
    lo = canon[..., : FR.nlimbs]
    mask = np.asarray(
        [0xFFFF] * nl + [(1 << rem) - 1] + [0] * (FR.nlimbs - nl - 1),
        dtype=np.uint32,
    )
    canon_fr = lo & jnp.asarray(mask)
    r2 = jnp.asarray(jf._int_to_limbs(FR.r2_mod_p, FR.nlimbs))
    return jf.mont_mul(FR, canon_fr, r2)


class DeviceTranscript:
    """Traced transcript facade over DeviceSponge with the cross-field
    append/challenge rules of poseidon/transcript.py."""

    def __init__(self, sponge: DeviceSponge):
        self.sponge = sponge

    @staticmethod
    def from_host(transcript) -> "DeviceTranscript":
        return DeviceTranscript(DeviceSponge.from_host(transcript.sponge))

    def append_fr_mont(self, v: jnp.ndarray) -> None:
        """append_scalar of an Fr value (Montgomery-Fr limb vector)."""
        if self.sponge.spec is FR:
            self.sponge.absorb([v])
        else:
            self.sponge.absorb([fr_to_fq_mont(v)])

    def challenge_fr_mont(self) -> jnp.ndarray:
        """challenge_scalar(Fr) -> Montgomery-Fr limb vector."""
        e = self.sponge.squeeze(1)[0]
        if self.sponge.spec is FR:
            return e
        return fq_squeeze_to_fr_mont(e)

    def export_to_host(self, transcript, state_host: np.ndarray) -> None:
        self.sponge.export_to_host(transcript.sponge, state_host)
