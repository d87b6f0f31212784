"""Device (generic FpGroup) BW6-761 MSM vs host reference."""
import pytest

import random

from testudo_tpu.fields.bw6_761 import R as R761
from testudo_tpu.curves import bw6_761 as bw
from testudo_tpu.tpu import curve_generic as cg, msm
from testudo_tpu.tpu.field import FQ

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy: CI slow tier

rng = random.Random(13)


def _host_msm(add, mul, pts, scl):
    acc = None
    for p, s in zip(pts, scl):
        acc = add(acc, mul(p, s))
    return acc


def test_bw6_g1_device_msm():
    n = 8
    g = bw.g1_generator()
    pts = [bw.g1_mul(g, rng.randrange(1, R761)) for _ in range(n)]
    scl = [rng.randrange(R761) for _ in range(n)]
    G = cg.bw6_g1()
    dev = G.from_affine_host(pts)
    scal_canon = jnp.asarray(FQ.to_limbs(scl))  # BW6 scalars are 377-bit
    got = msm.msm_fp(G, bw.g1_add, dev, scal_canon, c=4)
    assert got == _host_msm(bw.g1_add, bw.g1_mul, pts, scl)


def test_bw6_g2_device_msm():
    n = 4
    g = bw.g2_generator()
    pts = [bw.g2_mul(g, rng.randrange(1, R761)) for _ in range(n)]
    scl = [rng.randrange(R761) for _ in range(n)]
    G = cg.bw6_g2()
    dev = G.from_affine_host(pts)
    scal_canon = jnp.asarray(FQ.to_limbs(scl))
    got = msm.msm_fp(G, bw.g2_add, dev, scal_canon, c=4)
    assert got == _host_msm(bw.g2_add, bw.g2_mul, pts, scl)
