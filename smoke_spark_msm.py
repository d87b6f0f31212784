"""Smoke: multi-MSM at the Spark comb_ops kernel configuration.

The full 2^20 SNARK reaches Spark's shared-basis multi-MSM at K=4096 rows
x N=2048 basis and (pre-fix) faulted the TPU worker in the fixed-base
table scan (grid-2 add2 inside lax.scan).  This runs the same kernel
configurations — N=2048 (chunked table build), 1024-lane bucket phase
with 2048-step counts, 8192-lane Horner ladder — at K=256 so it
completes in minutes, and checks two rows against the host MSM.
"""
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from testudo_tpu.curves import host_curve as hc
from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.tpu import curve as jc, msm
from testudo_tpu.tpu.field import FR

K, N = 256, 2048
prng = random.Random(3)

t0 = time.time()
ks = [prng.randrange(1, R) for _ in range(N)]
pts_h = [hc.g1_mul(hc.g1_generator(), k) for k in ks]
pts = jc.g1_from_affine_host(pts_h)
print(f"basis gen: {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(3)
vals = rng.integers(0, 1 << 62, size=(K, N), dtype=np.uint64)
nl = FR.nlimbs
limbs = np.zeros((K, N, nl), dtype=np.uint32)
for i in range(4):  # 62-bit values occupy the low 4 x 16-bit limbs
    limbs[:, :, i] = ((vals >> (16 * i)) & 0xFFFF).astype(np.uint32)

t0 = time.time()
out = msm._multi_msm_packed("g1", pts, jnp.asarray(limbs))
jax.block_until_ready(jax.tree_util.tree_leaves(out))
print(f"multi-MSM K={K} N={N} first pass: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
out = msm._multi_msm_packed("g1", pts, jnp.asarray(limbs))
jax.block_until_ready(jax.tree_util.tree_leaves(out))
print(f"multi-MSM warm pass: {time.time()-t0:.1f}s", flush=True)

for i in (0, K - 1):
    aff = jc.g1_to_affine_host(
        jax.tree_util.tree_map(lambda a, i=i: a[i : i + 1], out))[0]
    exp = hc.g1_msm(pts_h, [int(v) for v in vals[i]])
    print(f"row {i} ok: {aff == exp}", flush=True)
    assert aff == exp, f"multi-MSM row {i} mismatch vs host reference"
print("smoke OK", flush=True)
