"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Same-seed sharded vs single-device computations must agree exactly
(SURVEY.md §4: "same-seed single-host vs sharded runs must produce
bit-identical proofs").
"""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.poly import dense
from testudo_tpu.tpu import curve as jc, field as jf, msm
from testudo_tpu.tpu.field import FR
from testudo_tpu.curves import host_curve as hc
from testudo_tpu.parallel import mesh as pmesh

rng = random.Random(31)


@pytest.fixture(scope="module")
def cpu_mesh():
    cpus = [d for d in jax.devices("cpu")]
    assert len(cpus) >= 8, "conftest must provide 8 virtual CPU devices"
    return pmesh.make_mesh(cpus[:8])


def test_sharded_quad_round_matches(cpu_mesh):
    n = 64
    A = [rng.randrange(R) for _ in range(2 * n)]
    B = [rng.randrange(R) for _ in range(2 * n)]
    r = rng.randrange(R)

    # expected from host math
    e0 = sum(a * b for a, b in zip(A[:n], B[:n])) % R
    a2 = [(2 * h - l) % R for l, h in zip(A[:n], A[n:])]
    b2 = [(2 * h - l) % R for l, h in zip(B[:n], B[n:])]
    e2 = sum(a * b for a, b in zip(a2, b2)) % R
    bound_A = [(l + r * (h - l)) % R for l, h in zip(A[:n], A[n:])]

    with jax.default_device(jax.devices("cpu")[0]):
        a_lo, a_hi = pmesh.shard_table(
            cpu_mesh, dense.encode_table(A[:n]), dense.encode_table(A[n:])
        )
        b_lo, b_hi = pmesh.shard_table(
            cpu_mesh, dense.encode_table(B[:n]), dense.encode_table(B[n:])
        )
        round_fn = pmesh.sharded_quad_round(cpu_mesh)
        evals, a_new, b_new = round_fn(
            a_lo, a_hi, b_lo, b_hi, dense.encode_scalar(r)
        )
        got = FR.decode(np.asarray(evals))
        assert got == [e0, e2]
        assert dense.decode_table(a_new) == bound_A


def test_sharded_msm_matches(cpu_mesh):
    n = 32
    g1 = hc.g1_generator()
    pts_h = [hc.g1_mul(g1, rng.randrange(1, R)) for _ in range(n)]
    scal = [rng.randrange(R) for _ in range(n)]
    c = 4
    want = hc.g1_msm(pts_h, scal)

    with jax.default_device(jax.devices("cpu")[0]):
        from jax.sharding import NamedSharding, PartitionSpec as P

        pts = jc.g1_from_affine_host(pts_h)
        sh = NamedSharding(cpu_mesh, P(pmesh.AXIS, None))
        pts = jax.tree_util.tree_map(lambda co: jax.device_put(co, sh), pts)
        digits = msm._digits_from_scalars(jnp.asarray(FR.to_limbs(scal)), c)
        digits = jax.device_put(
            digits, NamedSharding(cpu_mesh, P(None, pmesh.AXIS))
        )
        f = pmesh.sharded_msm_bucket_phase(cpu_mesh, c)
        wins = f(*pts, digits)
        got = msm._combine_windows_host(wins, c, "g1")
        assert got == want
