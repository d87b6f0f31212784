"""Device (JAX) field/curve/MSM kernels vs host ground truth."""
import random


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.tpu import field as jf
from testudo_tpu.tpu import curve as jc
from testudo_tpu.tpu import msm
from testudo_tpu.curves import host_curve as hc

pytestmark = pytest.mark.slow  # compile-heavy: CI slow tier

rng = random.Random(13)


@pytest.mark.parametrize("spec", [jf.FR, jf.FQ], ids=["fr", "fq"])
def test_field_ops(spec):
    mod = spec.modulus
    xs = [rng.randrange(mod) for _ in range(33)]
    ys = [rng.randrange(mod) for _ in range(33)]
    xs[0], ys[1], xs[2], ys[2], xs[3] = 0, 0, mod - 1, mod - 1, 1
    ax, ay = jnp.asarray(spec.encode(xs)), jnp.asarray(spec.encode(ys))
    assert spec.decode(np.asarray(jf.add(spec, ax, ay))) == [
        (x + y) % mod for x, y in zip(xs, ys)
    ]
    assert spec.decode(np.asarray(jf.sub(spec, ax, ay))) == [
        (x - y) % mod for x, y in zip(xs, ys)
    ]
    assert spec.decode(np.asarray(jf.mont_mul(spec, ax, ay))) == [
        x * y % mod for x, y in zip(xs, ys)
    ]


@pytest.mark.parametrize("spec", [jf.FR, jf.FQ], ids=["fr", "fq"])
def test_field_inv_reduce(spec):
    mod = spec.modulus
    xs = [rng.randrange(1, mod) for _ in range(17)]
    ax = jnp.asarray(spec.encode(xs))
    got = spec.decode(np.asarray(jax.jit(lambda a: jf.inv(spec, a))(ax)))
    assert got == [pow(x, -1, mod) for x in xs]
    zs = [rng.randrange(mod) for _ in range(1000)]
    az = jnp.asarray(spec.encode(zs))
    assert spec.decode(np.asarray(jf.reduce_sum(spec, az)))[0] == sum(zs) % mod


def test_g1_ops():
    g1 = hc.g1_generator()
    pts = [hc.g1_mul(g1, rng.randrange(1, R)) for _ in range(8)]
    dev = jc.g1_from_affine_host(pts)
    f = jax.jit(jc.g1_add)
    rolled = jc.g1_from_affine_host(pts[1:] + pts[:1])
    assert jc.g1_to_affine_host(f(dev, rolled)) == [
        hc.g1_add(pts[i], pts[(i + 1) % 8]) for i in range(8)
    ]
    assert jc.g1_to_affine_host(f(dev, dev)) == [hc.g1_add(p, p) for p in pts]
    assert jc.g1_to_affine_host(f(dev, jc.g1_identity((8,)))) == pts


def test_msm_g1_small():
    g1 = hc.g1_generator()
    n = 16
    pts = [hc.g1_mul(g1, rng.randrange(1, R)) for _ in range(n)]
    scal = [rng.randrange(R) for _ in range(n)]
    scal[0] = 0
    dev = jc.g1_from_affine_host(pts)
    assert msm.msm_g1(dev, scal, 4) == hc.g1_msm(pts, scal)
