"""PST (Papamanthou-Shi-Tamassia) multilinear polynomial commitment.

TPU-native counterpart of the patched ark-poly-commit `MultilinearPC` used
by the reference (setup/trim/commit/open/check plus the G2-side variants
commit_g2/open_g1/check_2 consumed by MIPP — see SURVEY.md §2.3 and
/root/reference/src/sqrt_pst.rs:124-261, mipp.rs:133-144, 307).

Scheme (commitments in G1, masks in G2; the G2 variant mirrors it):
  - SRS: secrets t_1..t_nv; powers_of_g[i][b] = g^{prod_{j>=i} eq(t_j, b_j)}
    for b in {0,1}^(nv-i) — Lagrange bases over suffixes of t.
  - commit(p) = MSM(powers_of_g[0], evals(p)) = g^{p(t)}.
  - open at a: bind variables MSB-first (identical to Spartan's
    bound_poly_var_top order, so — unlike the reference, which had to
    reverse the point to bridge to ark-poly-commit's LSB-first binding,
    sqrt_pst.rs:221-225 — no reversal is needed anywhere): round i yields
    quotient q_i = hi - lo committed with powers_of_g[i+1].
  - check: e(C - g^v, h) == prod_i e(pi_i, h^{t_i - a_i}).

SRS generation is deterministic from a seed and runs on device via batched
fixed-base ladders over the eq(t, .) tables.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import R
from ..fields.host import Fq12
from ..curves import host_curve as hc
from ..curves import pairing as pr
from ..poly import dense
from ..tpu import curve as jc
from ..tpu import field as jf
from ..tpu import msm
from ..tpu.field import FR


@dataclass
class CommitterKey:
    nv: int
    powers_of_g: List  # device projective G1 batches, level i has 2^(nv-i)
    powers_of_h: List  # device projective G2 batches
    g: Tuple  # host affine G1 generator
    h: Tuple  # host affine G2 generator

    def trim(self, nv: int) -> "CommitterKey":
        cut = self.nv - nv
        assert cut >= 0
        return CommitterKey(
            nv, self.powers_of_g[cut:], self.powers_of_h[cut:], self.g, self.h
        )


@dataclass
class VerifierKey:
    nv: int
    g: Tuple
    h: Tuple
    g_mask: List  # [g^{t_i}] host affine
    h_mask: List  # [h^{t_i}] host affine

    def trim(self, nv: int) -> "VerifierKey":
        cut = self.nv - nv
        assert cut >= 0
        return VerifierKey(nv, self.g, self.h, self.g_mask[cut:], self.h_mask[cut:])


def _seed_scalars(seed: bytes, n: int) -> List[int]:
    out = []
    ctr = 0
    while len(out) < n:
        h = hashlib.shake_256(seed + ctr.to_bytes(8, "little")).digest(40)
        v = int.from_bytes(h, "little") % R
        if v != 0:
            out.append(v)
        ctr += 1
    return out


def ark_setup_draws(nv: int) -> Tuple[Tuple, Tuple, List[int]]:
    """The (g, h, t) draws of `MultilinearPC::setup(nv, ark_std::test_rng())`
    (dense_mlpoly.rs:193-195 -> ark-poly-commit multilinear_pc setup):
    g = G1::rand, h = G2::rand, then nv Fr::rand, all from the fixed-seed
    ChaCha12 StdRng (utils/ark_rng.py).

    The returned t vector is REVERSED: ark binds variables LSB-first while
    this package binds MSB-first (module docstring), and the reference
    bridges the orders by reversing the opening point (sqrt_pst.rs:221-225).
    Evaluating an eval table with LSB-first chi at t equals evaluating it
    with MSB-first chi at reversed t, so using reversed draws makes this
    package's commitments/openings equal the reference's group elements
    with no reversal at the call sites."""
    from ..utils import ark_rng

    rng = ark_rng.test_rng()
    g = ark_rng.g1_projective_rand(rng)
    h = ark_rng.g2_projective_rand(rng)
    ts = [ark_rng.fr_rand(rng) for _ in range(nv)]
    return g, h, list(reversed(ts))


def setup(nv: int, seed: Optional[bytes] = None) -> Tuple[CommitterKey, VerifierKey]:
    """Deterministic trusted setup.

    Default (seed=None): the reference's derivation — ark test_rng draws
    (dense_mlpoly.rs:193-195), so the SRS group elements match the Rust
    snapshot's.  With an explicit seed: a Shake256-derived stream over the
    fixed generators (useful for independent test SRS)."""
    if seed is None:
        g, h, ts = ark_setup_draws(nv)
    else:
        ts = _seed_scalars(seed, nv)
        g = hc.g1_generator()
        h = hc.g2_generator()
    # eq tables for every suffix level (level nv is the empty product = 1),
    # concatenated so the fixed-base ladder compiles and runs ONCE.
    tables = [dense.eq_evals(ts[i:]) for i in range(nv)]
    tables.append(jnp.asarray(FR.encode(1)).reshape(1, FR.nlimbs))
    sizes = [t.shape[0] for t in tables]
    total = sum(sizes)
    pad = (1 << (total - 1).bit_length()) - total
    cat = jnp.concatenate(
        tables + ([jnp.zeros((pad, FR.nlimbs), jnp.uint32)] if pad else []),
        axis=0,
    )
    cat_canon = _to_canon_scalars(cat)
    all_g = jc.fixed_base_mul_g1(cat_canon, g)
    all_h = jc.fixed_base_mul_g2(cat_canon, h)
    powers_of_g, powers_of_h = [], []
    off = 0
    for s in sizes:
        powers_of_g.append(
            jax.tree_util.tree_map(lambda c, o=off, k=s: c[o : o + k], all_g)
        )
        powers_of_h.append(
            jax.tree_util.tree_map(lambda c, o=off, k=s: c[o : o + k], all_h)
        )
        off += s
    g_mask = [hc.g1_mul(g, t) for t in ts]
    h_mask = [hc.g2_mul(h, t) for t in ts]
    ck = CommitterKey(nv, powers_of_g, powers_of_h, g, h)
    vk = VerifierKey(nv, g, h, g_mask, h_mask)
    return ck, vk


# -- conversion helpers -----------------------------------------------------


def _to_canon_scalars(evals_mont: jnp.ndarray) -> jnp.ndarray:
    ones = jnp.broadcast_to(
        jnp.asarray(jf._int_to_limbs(1, FR.nlimbs)), evals_mont.shape
    )
    return jf.mont_mul(FR, evals_mont, ones)


# -- G1 commitments ---------------------------------------------------------


def commit(ck: CommitterKey, evals_mont: jnp.ndarray):
    """Commit to a poly given its (2^nv, 16) Montgomery eval table."""
    n = evals_mont.shape[0]
    nv = n.bit_length() - 1
    level = ck.nv - nv
    return msm.msm_g1(ck.powers_of_g[level], _to_canon_scalars(evals_mont))


def open_(ck: CommitterKey, evals_mont: jnp.ndarray, point: List[int]) -> List:
    """Open at `point` (MSB-first, Spartan order).  Returns [pi_i] G1 affine."""
    n = evals_mont.shape[0]
    nv = n.bit_length() - 1
    assert len(point) == nv
    level = ck.nv - nv
    r = evals_mont
    proofs = []
    for i in range(nv):
        half = r.shape[0] // 2
        q = jf.sub(FR, r[half:], r[:half])
        rdev = dense.encode_scalar(point[i])
        r = dense.bound_top(r, rdev)
        proofs.append(msm.msm_g1(ck.powers_of_g[level + i + 1], _to_canon_scalars(q)))
    return proofs


def check(
    vk: VerifierKey,
    commitment,
    point: List[int],
    value: int,
    proofs: List,
) -> bool:
    """e(C - g^v, h) == prod e(pi_i, h^{t_i - a_i})."""
    nv = len(point)
    assert len(proofs) == nv
    vkt = vk.trim(nv) if vk.nv != nv else vk
    left_pt = hc.g1_add(commitment, hc.g1_neg(hc.g1_mul(vk.g, value % R)))
    g1s = [left_pt]
    g2s = [hc.g2_neg(vk.h)]
    for i in range(nv):
        h_term = hc.g2_add(
            vkt.h_mask[i], hc.g2_neg(hc.g2_mul(vk.h, point[i] % R))
        )
        g1s.append(proofs[i])
        g2s.append(h_term)
    # e(C - g^v, -h) * prod e(pi_i, h^{t_i - a_i}) == 1
    return pr.multi_pairing(g1s, g2s) == Fq12.one()


# -- G2 commitments (for MIPP's p_h) ---------------------------------------


def commit_g2(ck: CommitterKey, evals_mont: jnp.ndarray):
    """h^{p(t)}: MSM over powers_of_h (mirrors patched commit_g2)."""
    n = evals_mont.shape[0]
    nv = n.bit_length() - 1
    level = ck.nv - nv
    return msm.msm_g2(ck.powers_of_h[level], _to_canon_scalars(evals_mont))


def open_g2(ck: CommitterKey, evals_mont: jnp.ndarray, point: List[int]) -> List:
    """Open a G2-side commitment: proofs live in G2."""
    n = evals_mont.shape[0]
    nv = n.bit_length() - 1
    level = ck.nv - nv
    r = evals_mont
    proofs = []
    for i in range(nv):
        half = r.shape[0] // 2
        q = jf.sub(FR, r[half:], r[:half])
        rdev = dense.encode_scalar(point[i])
        r = dense.bound_top(r, rdev)
        proofs.append(msm.msm_g2(ck.powers_of_h[level + i + 1], _to_canon_scalars(q)))
    return proofs


def check_g2(
    vk: VerifierKey,
    commitment_h,
    point: List[int],
    value: int,
    proofs: List,
) -> bool:
    """e(g, C_h - h^v) == prod e(g^{t_i - a_i}, pi_i)  (mirrors check_2)."""
    nv = len(point)
    vkt = vk.trim(nv) if vk.nv != nv else vk
    right_pt = hc.g2_add(commitment_h, hc.g2_neg(hc.g2_mul(vk.h, value % R)))
    g1s = [hc.g1_neg(vk.g)]
    g2s = [right_pt]
    for i in range(nv):
        g_term = hc.g1_add(
            vkt.g_mask[i], hc.g1_neg(hc.g1_mul(vk.g, point[i] % R))
        )
        g1s.append(g_term)
        g2s.append(proofs[i])
    return pr.multi_pairing(g1s, g2s) == Fq12.one()
