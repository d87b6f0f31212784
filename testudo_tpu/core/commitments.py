"""Pedersen commitment generators and commit helpers.

Mirror of /root/reference/src/commitments.rs.  Generator derivation is
deterministic from (label, group) via the Poseidon sponge, as in the
reference (MultiCommitGens::new seeds a StdRng from sponge bytes and calls
G::Affine::rand, commitments.rs:17-39).  ark's point sampling cannot be
reproduced without its exact rejection stream, so we hash-to-curve by
try-and-increment over the squeezed bytes — equally deterministic and
transcript-committed via the same sponge.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp

from ..fields.bls12_377 import P, R, H1
from ..fields import host as hf
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
        sponge = PoseidonSponge(fr_params())
        sponge.absorb_bytes(bytes(label))
        sponge.absorb_bytes(ser.g1_to_bytes(hc.g1_generator(), compress=True))
        pts = []
        while len(pts) < n + 1:
            seed = sponge.squeeze_bytes(32)
            pt = _hash_to_g1(seed)
            pts.append(pt)
        return MultiCommitGens(n, pts[:n], pts[n])

    def split_at(self, mid: int):
        return (
            MultiCommitGens(mid, self.G[:mid], self.h),
            MultiCommitGens(self.n - mid, self.G[mid:], self.h),
        )


def _hash_to_g1(seed: bytes):
    """Try-and-increment: x from seed counter stream, clear cofactor."""
    ctr = 0
    base = int.from_bytes(seed, "little")
    while True:
        x = (base + ctr) % P
        rhs = (x * x * x + 1) % P
        y = hf.fq_sqrt(rhs)
        if y is not None:
            pt = hc.g1_mul((x, min(y, P - y)), H1)
            if pt is not None:
                return pt
        ctr += 1


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
    base = msm.msm_g1(gens_n.dev(), scalars_canon)
    return hc.g1_add(base, hc.g1_mul(gens_n.h, blind % R))
