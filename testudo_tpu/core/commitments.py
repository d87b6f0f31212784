"""Pedersen commitment generators and commit helpers.

Mirror of /root/reference/src/commitments.rs.  Generator derivation
follows MultiCommitGens::new exactly (commitments.rs:17-39): a Poseidon
sponge absorbs the label bytes and the compressed group generator, then
each of the n+1 generators is `G::Affine::rand(StdRng::from_seed(sponge.
squeeze_bytes(32)))` — the StdRng (ChaCha12) stream and ark's
field/point rejection sampling are ported bit-exactly in utils/ark_rng.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp

from ..fields.bls12_377 import R
from ..curves import host_curve as hc
from ..poseidon.sponge import PoseidonSponge
from ..poseidon.transcript import fr_params
from .. import serialize as ser
from ..tpu import curve as jc
from ..tpu import msm


@dataclass
class MultiCommitGens:
    n: int
    G: List  # host affine G1 points
    h: object  # host affine G1
    _dev: object = None

    def dev(self):
        if self._dev is None:
            self._dev = jc.g1_from_affine_host(self.G)
        return self._dev

    @staticmethod
    def new(n: int, label: bytes) -> "MultiCommitGens":
        from ..utils import ark_rng

        sponge = PoseidonSponge(fr_params())
        sponge.absorb_bytes(bytes(label))
        sponge.absorb_bytes(ser.g1_to_bytes(hc.g1_generator(), compress=True))
        pts = []
        while len(pts) < n + 1:
            seed = sponge.squeeze_bytes(32)
            pts.append(ark_rng.g1_affine_rand(ark_rng.std_rng_from_seed(seed)))
        return MultiCommitGens(n, pts[:n], pts[n])

    def split_at(self, mid: int):
        return (
            MultiCommitGens(mid, self.G[:mid], self.h),
            MultiCommitGens(self.n - mid, self.G[mid:], self.h),
        )


def commit_scalar(scalar: int, blind: int, gens_1: MultiCommitGens):
    """2-term Pedersen commitment (commitments.rs:70-77)."""
    assert gens_1.n == 1
    return hc.g1_add(
        hc.g1_mul(gens_1.G[0], scalar % R), hc.g1_mul(gens_1.h, blind % R)
    )


def commit_slice_dev(scalars_canon, blind: int, gens_n: MultiCommitGens):
    """MSM commitment of a vector + blind (commitments.rs:79-86).

    scalars_canon: (n, 16) canonical-form device limbs.
    """
    base = msm.msm_g1(gens_n.dev(), scalars_canon, affine=True)
    return hc.g1_add(base, hc.g1_mul(gens_n.h, blind % R))
