"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Same-seed sharded vs single-device computations must agree exactly
(SURVEY.md §4: "same-seed single-host vs sharded runs must produce
bit-identical proofs").  These drive the SAME dispatchers the prover
uses: msm.msm_g1 / sumcheck.prove_* consult parallel.mesh.use_mesh.
"""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.poly import dense
from testudo_tpu.tpu import curve as jc, msm
from testudo_tpu.tpu.field import FR
from testudo_tpu.curves import host_curve as hc
from testudo_tpu.parallel import mesh as pmesh
from testudo_tpu.core import sumcheck
from testudo_tpu.poseidon.transcript import PoseidonTranscript, fr_params

pytestmark = pytest.mark.slow  # compile-heavy: CI slow tier

rng = random.Random(31)


@pytest.fixture(autouse=True)
def _xla_msm_path(monkeypatch):
    """These tests validate MESH semantics through the XLA MSM path on
    the virtual CPU devices.  On hosts where an ambient TPU plugin
    ignores JAX_PLATFORMS=cpu (the axon tunnel), default_backend() says
    'tpu' while these arrays live on the CPU platform — the packed pltpu
    kernels cannot lower there, so pin the XLA path (the packed kernels
    are covered on the default backend by test_pallas_curve.py; the
    driver dryrun pins the same flags, __graft_entry__.py)."""
    monkeypatch.setenv("TESTUDO_PACKED", "0")
    monkeypatch.setenv("TESTUDO_PALLAS", "0")


@pytest.fixture(scope="module")
def cpu_mesh():
    cpus = [d for d in jax.devices("cpu")]
    assert len(cpus) >= 8, "conftest must provide 8 virtual CPU devices"
    return pmesh.make_mesh(cpus[:8])


def _cpu(x):
    return jax.device_put(x, jax.devices("cpu")[0])


def test_cyclic_split_roundtrip(cpu_mesh):
    t = dense.encode_table([rng.randrange(R) for _ in range(64)])
    with jax.default_device(jax.devices("cpu")[0]):
        td = pmesh.cyclic_split(cpu_mesh, _cpu(t))
        back = pmesh.cyclic_join(np.asarray(td))
    assert np.array_equal(np.asarray(t), back)


def test_sharded_quad_sumcheck_bit_identical(cpu_mesh):
    n = 64
    A = [rng.randrange(R) for _ in range(n)]
    B = [rng.randrange(R) for _ in range(n)]
    claim = sum(a * b for a, b in zip(A, B)) % R
    rounds = 6

    with jax.default_device(jax.devices("cpu")[0]):
        t1 = PoseidonTranscript(fr_params())
        p1, r1, c1 = sumcheck.prove_quad(
            claim, rounds, _cpu(dense.encode_table(A)),
            _cpu(dense.encode_table(B)), t1,
        )
        t2 = PoseidonTranscript(fr_params())
        with pmesh.use_mesh(cpu_mesh):
            p2, r2, c2 = sumcheck.prove_quad(
                claim, rounds, _cpu(dense.encode_table(A)),
                _cpu(dense.encode_table(B)), t2,
            )
    assert r1 == r2 and list(c1) == list(c2)
    assert [p.coeffs for p in p1.polys] == [p.coeffs for p in p2.polys]
    assert t1.sponge.state == t2.sponge.state
    # and the proof verifies
    tv = PoseidonTranscript(fr_params())
    e, rv = p2.verify(claim, rounds, 2, tv)
    assert rv == r2


def test_sharded_cubic_sumcheck_bit_identical(cpu_mesh):
    n = 32
    A = [rng.randrange(R) for _ in range(n)]
    B = [rng.randrange(R) for _ in range(n)]
    C = [rng.randrange(R) for _ in range(n)]
    claim = sum(a * b * c for a, b, c in zip(A, B, C)) % R
    rounds = 5

    with jax.default_device(jax.devices("cpu")[0]):
        t1 = PoseidonTranscript(fr_params())
        p1, r1, c1 = sumcheck.prove_cubic(
            claim, rounds, _cpu(dense.encode_table(A)),
            _cpu(dense.encode_table(B)), _cpu(dense.encode_table(C)), t1,
        )
        t2 = PoseidonTranscript(fr_params())
        with pmesh.use_mesh(cpu_mesh):
            p2, r2, c2 = sumcheck.prove_cubic(
                claim, rounds, _cpu(dense.encode_table(A)),
                _cpu(dense.encode_table(B)), _cpu(dense.encode_table(C)), t2,
            )
    assert r1 == r2 and list(c1) == list(c2)
    assert [p.coeffs for p in p1.polys] == [p.coeffs for p in p2.polys]
    assert t1.sponge.state == t2.sponge.state


def test_sharded_msm_matches_host(cpu_mesh):
    n = 80  # not a multiple of 8: exercises shard padding
    g1 = hc.g1_generator()
    pts_h = [hc.g1_mul(g1, rng.randrange(1, R)) for _ in range(n)]
    scal = [rng.randrange(R) for _ in range(n)]
    want = hc.g1_msm(pts_h, scal)

    with jax.default_device(jax.devices("cpu")[0]):
        pts = jc.g1_from_affine_host(pts_h)
        scal_dev = jnp.asarray(FR.to_limbs(scal))
        single = msm.msm_g1(pts, scal_dev, c=4)
        with pmesh.use_mesh(cpu_mesh):
            sharded = msm.msm_g1(pts, scal_dev, c=4)
    assert single == want
    assert sharded == want


def test_sharded_multi_msm_matches(cpu_mesh):
    K, N = 16, 8
    g1 = hc.g1_generator()
    basis_h = [hc.g1_mul(g1, rng.randrange(1, R)) for _ in range(N)]
    scal = [[rng.randrange(R) for _ in range(N)] for _ in range(K)]

    with jax.default_device(jax.devices("cpu")[0]):
        basis = jc.g1_from_affine_host(basis_h)
        canon = jnp.stack([jnp.asarray(FR.to_limbs(row)) for row in scal])
        got = pmesh.sharded_multi_msm(cpu_mesh, "g1", basis, canon, 4)
        for i in range(K):
            one = jax.tree_util.tree_map(lambda a, i=i: a[i : i + 1], got)
            assert jc.g1_to_affine_host(one)[0] == hc.g1_msm(
                basis_h, scal[i]
            )


def test_sharded_looped_prover_bit_identical(cpu_mesh, monkeypatch):
    """The compile-light per-round sharded prover (the driver dryrun path,
    TESTUDO_FUSED_SUMCHECK=0) must produce byte-identical transcripts to
    the single-device looped prover."""
    monkeypatch.setenv("TESTUDO_FUSED_SUMCHECK", "0")
    n = 64
    tau = [rng.randrange(R) for _ in range(n)]
    A = [rng.randrange(R) for _ in range(n)]
    B = [rng.randrange(R) for _ in range(n)]
    C = [(a * b) % R for a, b in zip(A, B)]
    claim = sum(t * (a * b - c) for t, a, b, c in zip(tau, A, B, C)) % R
    rounds = 6

    with jax.default_device(jax.devices("cpu")[0]):
        enc = lambda v: _cpu(dense.encode_table(v))
        t1 = PoseidonTranscript(fr_params())
        p1, r1, c1 = sumcheck.prove_cubic_with_additive_term(
            claim, rounds, enc(tau), enc(A), enc(B), enc(C), t1
        )
        t2 = PoseidonTranscript(fr_params())
        with pmesh.use_mesh(cpu_mesh):
            p2, r2, c2 = sumcheck.prove_cubic_with_additive_term(
                claim, rounds, enc(tau), enc(A), enc(B), enc(C), t2
            )
    assert r1 == r2 and list(c1) == list(c2)
    assert [p.coeffs for p in p1.polys] == [p.coeffs for p in p2.polys]
    assert t1.sponge.state == t2.sponge.state
