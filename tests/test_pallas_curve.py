"""Tests for the fused Pallas EC kernels (tpu/pallas_curve.py) and the
packed MSM paths built on them (tpu/msm.py).

On CPU the kernels run in Pallas interpret mode (pallas_curve._interpret),
so this file exercises the PRODUCTION TPU code path bit-for-bit in CI;
TESTUDO_PACKED=1 (set here) routes msm/curve dispatchers through the
packed implementations regardless of backend.

Reference semantics: ark-ec VariableBaseMSM (sqrt_pst.rs:124, 198;
mipp.rs:77-85).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _force_packed(monkeypatch):
    """Route msm/curve dispatchers through the packed (production TPU)
    implementations for every test in this module only."""
    monkeypatch.setenv("TESTUDO_PACKED", "1")

from testudo_tpu.curves import host_curve as hc
from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.tpu import curve as jc
from testudo_tpu.tpu import msm
from testudo_tpu.tpu import pallas_curve as pcu
from testudo_tpu.tpu.field import FR

pytestmark = pytest.mark.slow  # compile-heavy: CI slow tier

RNG = np.random.default_rng(11)
_PRNG = __import__("random").Random(11)


def _rand_fr() -> int:
    return _PRNG.randrange(R)


def _rand_g1(n):
    ks = [int(RNG.integers(1, 1 << 62)) for _ in range(n)]
    return [hc.g1_mul(hc.g1_generator(), k) for k in ks]


def _rand_g2(n):
    ks = [int(RNG.integers(1, 1 << 62)) for _ in range(n)]
    return [hc.g2_mul(hc.g2_generator(), k) for k in ks]


def _scal_limbs(vals):
    return jnp.asarray(FR.to_limbs([v % R for v in vals]))


# ---------------------------------------------------------------------------
# pack/unpack round trip
# ---------------------------------------------------------------------------


def test_pack_unpack_roundtrip_g1():
    pts = jc.g1_from_affine_host(_rand_g1(4))
    packed = pcu.G1P.pack(pts)
    back = pcu.G1P.unpack(packed)
    for a, b in zip(jax.tree_util.tree_leaves(pts), jax.tree_util.tree_leaves(back)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pack_unpack_roundtrip_g2():
    pts = jc.g2_from_affine_host(_rand_g2(3))
    packed = pcu.G2P.pack(pts)
    back = pcu.G2P.unpack(packed)
    for a, b in zip(jax.tree_util.tree_leaves(pts), jax.tree_util.tree_leaves(back)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# fused kernels vs host curve
# ---------------------------------------------------------------------------


def test_add2_kernel_g1():
    n = 8
    a_h, b_h = _rand_g1(n), _rand_g1(n)
    a = pcu.G1P.pack(jc.g1_from_affine_host(a_h))
    b = pcu.G1P.pack(jc.g1_from_affine_host(b_h))
    out = jc.g1_to_affine_host(pcu.G1P.unpack(pcu.G1P.add2(a, b)))
    for i in range(n):
        assert out[i] == hc.g1_add(a_h[i], b_h[i])


def test_add2_kernel_g2():
    n = 4
    a_h, b_h = _rand_g2(n), _rand_g2(n)
    a = pcu.G2P.pack(jc.g2_from_affine_host(a_h))
    b = pcu.G2P.pack(jc.g2_from_affine_host(b_h))
    out = jc.g2_to_affine_host(pcu.G2P.unpack(pcu.G2P.add2(a, b)))
    for i in range(n):
        assert out[i] == hc.g2_add(a_h[i], b_h[i])


def test_add2_doubling_and_identity():
    # complete formulas: P+P and P+O and O+O lanes all in one launch
    p_h = _rand_g1(2)
    ident = pcu.G1P.identity_packed(4)
    pts = pcu.G1P.pack(jc.g1_from_affine_host(p_h + p_h))
    out = jc.g1_to_affine_host(pcu.G1P.unpack(pcu.G1P.add2(pts, ident)))
    assert out[0] == p_h[0] and out[1] == p_h[1]
    out2 = jc.g1_to_affine_host(pcu.G1P.unpack(pcu.G1P.add2(pts, pts)))
    assert out2[0] == hc.g1_add(p_h[0], p_h[0])


def test_add_mask_kernel():
    n = 8
    a_h, b_h = _rand_g1(n), _rand_g1(n)
    a = pcu.G1P.pack(jc.g1_from_affine_host(a_h))
    b = pcu.G1P.pack(jc.g1_from_affine_host(b_h))
    mask = jnp.asarray([1, 0] * (n // 2), jnp.uint32)
    out = jc.g1_to_affine_host(pcu.G1P.unpack(pcu.G1P.add_mask(a, b, mask)))
    for i in range(n):
        want = hc.g1_add(a_h[i], b_h[i]) if i % 2 == 0 else a_h[i]
        assert out[i] == want


def test_step_kernel():
    n = 4
    a_h, b_h = _rand_g1(n), _rand_g1(n)
    a = pcu.G1P.pack(jc.g1_from_affine_host(a_h))
    b = pcu.G1P.pack(jc.g1_from_affine_host(b_h))
    mask = jnp.asarray([1, 1, 0, 0], jnp.uint32)
    acc, dbl = pcu.G1P.step(a, b, mask)
    acc_h = jc.g1_to_affine_host(pcu.G1P.unpack(acc))
    dbl_h = jc.g1_to_affine_host(pcu.G1P.unpack(dbl))
    for i in range(n):
        want = hc.g1_add(a_h[i], b_h[i]) if mask[i] else a_h[i]
        assert acc_h[i] == want
        assert dbl_h[i] == hc.g1_add(b_h[i], b_h[i])


def test_scan2b_kernel():
    n = 4
    r_h, t_h, b_h = _rand_g1(n), _rand_g1(n), _rand_g1(n)
    run = pcu.G1P.pack(jc.g1_from_affine_host(r_h))
    tot = pcu.G1P.pack(jc.g1_from_affine_host(t_h))
    bl = pcu.G1P.pack(jc.g1_from_affine_host(b_h))
    run2, tot2 = pcu.G1P.scan2b(run, tot, bl)
    run2_h = jc.g1_to_affine_host(pcu.G1P.unpack(run2))
    tot2_h = jc.g1_to_affine_host(pcu.G1P.unpack(tot2))
    for i in range(n):
        assert run2_h[i] == hc.g1_add(r_h[i], b_h[i])
        assert tot2_h[i] == hc.g1_add(t_h[i], r_h[i])


def test_ladder_kernel():
    n = 4
    p_h = _rand_g1(n)
    ks = [3, 7, R - 1, 0]
    pts = pcu.G1P.pack(jc.g1_from_affine_host(p_h))
    scal = _scal_limbs(ks).T  # (nlimbs, n)
    out = jc.g1_to_affine_host(pcu.G1P.unpack(pcu.G1P.ladder(pts, scal)))
    for i in range(n):
        assert out[i] == hc.g1_mul(p_h[i], ks[i])


def test_tree_reduce():
    n = 8
    p_h = _rand_g1(n)
    pts = pcu.G1P.pack(jc.g1_from_affine_host(p_h))
    out = jc.g1_to_affine_host(pcu.G1P.unpack(pcu.G1P.tree_reduce(pts)))
    want = p_h[0]
    for p in p_h[1:]:
        want = hc.g1_add(want, p)
    assert out[0] == want


def test_bucket_phase_kernel():
    # 4 bucket lanes, runs of lengths [2, 3, 0, 1] padded to T=3
    pts_h = _rand_g1(6)
    dev = jc.g1_from_affine_host(pts_h)
    packed = pcu.G1P.pack(dev)  # (rows, 6)
    ident_col = pcu.G1P.identity_packed(1)
    T, L = 3, 4
    lanes = []  # runs[t][lane]
    runs_idx = [[0, 2, None, 5], [1, 3, None, None], [None, 4, None, None]]
    rows = []
    for t in range(T):
        cols = []
        for lane in range(L):
            idx = runs_idx[t][lane]
            cols.append(ident_col if idx is None else packed[:, idx : idx + 1])
        rows.append(jnp.concatenate(cols, axis=1))
    runs = jnp.stack(rows, axis=0)  # (T, rows, L)
    counts = jnp.asarray([2, 3, 0, 1], jnp.int32)
    out = jc.g1_to_affine_host(pcu.G1P.unpack(pcu.G1P.bucket_phase(runs, counts)))
    assert out[0] == hc.g1_add(pts_h[0], pts_h[1])
    assert out[1] == hc.g1_add(hc.g1_add(pts_h[2], pts_h[3]), pts_h[4])
    assert out[2] is None  # count 0 -> identity
    assert out[3] == pts_h[5]


def test_bucket_phase_all_zero_counts():
    # tlen clamps to >= 1; all-masked lanes must return the identity
    pts_h = _rand_g1(2)
    packed = pcu.G1P.pack(jc.g1_from_affine_host(pts_h))
    runs = packed[None]  # (1, rows, 2)
    counts = jnp.zeros((2,), jnp.int32)
    out = jc.g1_to_affine_host(
        pcu.G1P.unpack(pcu.G1P.bucket_phase(runs, counts, jnp.asarray([0], jnp.int32)))
    )
    assert out[0] is None and out[1] is None  # identity decodes as None


def test_wrapper_pads_non_tile_batches():
    # ADVICE r2 (high): batches that are not a multiple of the tile must
    # not return garbage tail lanes.  6 lanes with tile 1024 exercises the
    # pad+slice path in one launch.
    n = 6
    a_h, b_h = _rand_g1(n), _rand_g1(n)
    a = pcu.G1P.pack(jc.g1_from_affine_host(a_h))
    b = pcu.G1P.pack(jc.g1_from_affine_host(b_h))
    out = jc.g1_to_affine_host(pcu.G1P.unpack(pcu.G1P.add2(a, b)))
    for i in range(n):
        assert out[i] == hc.g1_add(a_h[i], b_h[i])


# ---------------------------------------------------------------------------
# packed MSM paths vs host reference
# ---------------------------------------------------------------------------


def test_msm_small_packed_vs_host():
    n = 5
    pts_h = _rand_g1(n)
    scalars = [int(RNG.integers(0, 1 << 60)) for _ in range(n)]
    got = msm._msm_small_packed("g1", jc.g1_from_affine_host(pts_h),
                                _scal_limbs(scalars))
    assert jc.g1_to_affine_host(got)[0] == hc.g1_msm(pts_h, scalars)


def test_msm_g1_packed_dispatch_vs_host():
    assert msm._use_packed()  # env forced
    n = 96  # > _SMALL_N: exercises the full packed Pippenger
    pts_h = _rand_g1(n)
    scalars = [_rand_fr() for _ in range(n)]
    got = msm.msm_g1(jc.g1_from_affine_host(pts_h), scalars, c=4)
    assert got == hc.g1_msm(pts_h, scalars)


def test_msm_g2_small_packed_vs_host():
    n = 4
    pts_h = _rand_g2(n)
    scalars = [int(RNG.integers(0, 1 << 48)) for _ in range(n)]
    got = msm.msm_g2(jc.g2_from_affine_host(pts_h), scalars)
    assert got == hc.g2_msm(pts_h, scalars)


def test_multi_msm_packed_vs_host():
    # K=3 exercises the pad-K path (ADVICE r2 medium: trim must fire)
    K, N = 3, 8
    pts_h = _rand_g1(N)
    scal = RNG.integers(0, 1 << 62, size=(K, N)).tolist()
    dev = jc.g1_from_affine_host(pts_h)
    canon = jnp.stack([_scal_limbs(row) for row in scal], axis=0)
    got = msm._multi_msm_packed("g1", dev, canon)
    got_aff = [jc.g1_to_affine_host(
        jax.tree_util.tree_map(lambda a, i=i: a[i : i + 1], got))[0]
        for i in range(K)]
    assert len(jax.tree_util.tree_leaves(got)[0]) == K
    for i in range(K):
        assert got_aff[i] == hc.g1_msm(pts_h, scal[i])


def test_multi_msm_packed_chunked_table(monkeypatch):
    # N > _TAB_NC routes the fixed-base table build through the chunked
    # scan (the Spark-scale configuration that faulted the TPU worker when
    # the in-scan add2 ran with grid > 1); patch the chunk width down so
    # the path runs at CPU-interpretable sizes.
    monkeypatch.setattr(msm, "_TAB_NC", 8)
    K, N = 2, 16
    pts_h = _rand_g1(N)
    scal = RNG.integers(0, 1 << 62, size=(K, N)).tolist()
    dev = jc.g1_from_affine_host(pts_h)
    canon = jnp.stack([_scal_limbs(row) for row in scal], axis=0)
    got = msm._multi_msm_packed("g1", dev, canon)
    for i in range(K):
        aff = jc.g1_to_affine_host(
            jax.tree_util.tree_map(lambda a, i=i: a[i : i + 1], got))[0]
        assert aff == hc.g1_msm(pts_h, scal[i])


def test_packed_vs_xla_msm_equality():
    n = 80
    pts_h = _rand_g1(n)
    scalars = [_rand_fr() for _ in range(n)]
    dev = jc.g1_from_affine_host(pts_h)
    scal = _scal_limbs(scalars)
    packed = jc.g1_to_affine_host(msm._msm_packed("g1", dev, scal, 4))[0]
    wins = msm._msm_windows("g1", dev, scal, 4)
    xla = msm._combine_windows_host(wins, 4, "g1")
    assert packed == xla == hc.g1_msm(pts_h, scalars)


def test_signed_digits_reconstruct():
    """Signed c-bit window decomposition sums back to the scalar, with
    magnitudes bounded by 2^(c-1) (incl. the production c=13)."""
    from testudo_tpu.fields.bls12_377 import R

    scalars = [0, 1, R - 1, _rand_fr(), _rand_fr(), (1 << 253) - 1]
    for c in (4, 13):
        limbs = _scal_limbs([s % R for s in scalars])
        digs = np.asarray(msm._signed_digits(limbs, c))  # (W, N)
        half = 1 << (c - 1)
        assert int(np.abs(digs).max()) <= half
        for j, s in enumerate(scalars):
            val = sum(int(digs[w, j]) << (c * w) for w in range(digs.shape[0]))
            assert val == s % R, f"c={c} scalar {j}"


def test_msm_packed_signed_vs_host(monkeypatch):
    """Signed-window packed Pippenger (c=None default path) vs host MSM,
    with edge scalars (0, 1, r-1) mixed in; c patched to 4 so interpret
    mode stays tractable — the signed machinery (neg-y table, magnitude
    buckets, +1 weights, run-aligned segment reduce) is identical at any
    c.  One n for everything: each extra shape costs minutes of CPU
    compile in interpret mode."""
    monkeypatch.setenv("TESTUDO_MSM_C", "4")
    n = 68  # > _SMALL_N: full signed Pippenger, smallest viable batch
    pts_h = _rand_g1(n)
    scalars = [0, 1, R - 1, 2] + [_rand_fr() for _ in range(n - 4)]
    dev = jc.g1_from_affine_host(pts_h)
    scal = _scal_limbs(scalars)
    got = jc.g1_to_affine_host(msm._msm_packed("g1", dev, scal, None))[0]
    assert got == hc.g1_msm(pts_h, scalars)


def test_scalar_mul_batch_packed():
    n = 5
    pts_h = _rand_g1(n)
    k = _PRNG.randrange(1, R)
    got = jc.scalar_mul_batch_g1(jc.g1_from_affine_host(pts_h),
                                 jnp.asarray(FR.to_limbs([k])[0]))
    out = jc.g1_to_affine_host(got)
    for i in range(n):
        assert out[i] == hc.g1_mul(pts_h[i], k)


def test_bucket_phase_mixed_kernel():
    """Mixed-add bucket phase (affine streamed points, Alg 8) must match
    the general kernel's semantics, including the doubling and
    identity-accumulator cases (completeness in P1)."""
    pts_h = _rand_g1(4)
    dev = jc.g1_from_affine_host(pts_h)
    packed = pcu.G1P.pack(dev)  # (rows, 4), Z = mont(1)
    # lanes: [P0+P1, P2+P2 (doubling), P3 only, masked]
    runs = jnp.stack(
        [
            jnp.concatenate(
                [packed[:, 0:1], packed[:, 2:3], packed[:, 3:4], packed[:, 0:1]],
                axis=1,
            ),
            jnp.concatenate(
                [packed[:, 1:2], packed[:, 2:3], packed[:, 0:1], packed[:, 1:2]],
                axis=1,
            ),
        ],
        axis=0,
    )  # (2, rows, 4)
    counts = jnp.asarray([2, 2, 1, 0], jnp.int32)
    out = jc.g1_to_affine_host(
        pcu.G1P.unpack(pcu.G1P.bucket_phase(runs, counts, mixed=True))
    )
    assert out[0] == hc.g1_add(pts_h[0], pts_h[1])
    assert out[1] == hc.g1_add(pts_h[2], pts_h[2])  # doubling case
    assert out[2] == pts_h[3]
    assert out[3] is None  # fully masked -> identity


def test_msm_packed_signed_affine_vs_host(monkeypatch):
    """Signed packed Pippenger with affine=True (mixed bucket adds) vs
    host MSM — the production path for SRS/affine bases."""
    monkeypatch.setenv("TESTUDO_MSM_C", "4")
    n = 68
    pts_h = _rand_g1(n)
    scalars = [0, 1, R - 1, 2] + [_rand_fr() for _ in range(n - 4)]
    dev = jc.g1_from_affine_host(pts_h)
    scal = _scal_limbs(scalars)
    got = jc.g1_to_affine_host(
        msm._msm_packed("g1", dev, scal, None, affine=True)
    )[0]
    assert got == hc.g1_msm(pts_h, scalars)


def test_bucket_phase_kernel_g2():
    """G2 bucket kernel under lazy bounds (Fq2 K_CARRY loop carry),
    general and mixed variants, incl. doubling and masked lanes."""
    pts_h = _rand_g2(4)
    packed = pcu.G2P.pack(jc.g2_from_affine_host(pts_h))
    runs = jnp.stack(
        [
            jnp.concatenate(
                [packed[:, 0:1], packed[:, 2:3], packed[:, 3:4], packed[:, 0:1]],
                axis=1,
            ),
            jnp.concatenate(
                [packed[:, 1:2], packed[:, 2:3], packed[:, 0:1], packed[:, 1:2]],
                axis=1,
            ),
        ],
        axis=0,
    )
    counts = jnp.asarray([2, 2, 1, 0], jnp.int32)
    for mixed in (False, True):
        out = jc.g2_to_affine_host(
            pcu.G2P.unpack(pcu.G2P.bucket_phase(runs, counts, mixed=mixed))
        )
        assert out[0] == hc.g2_add(pts_h[0], pts_h[1])
        assert out[1] == hc.g2_add(pts_h[2], pts_h[2])
        assert out[2] == pts_h[3]
        assert out[3] is None
