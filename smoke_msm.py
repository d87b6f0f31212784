import time, numpy as np, jax, jax.numpy as jnp, random

from testudo_tpu.curves import host_curve as hc
from testudo_tpu.tpu import curve as jc, msm
from testudo_tpu.tpu.field import FR
from testudo_tpu.fields.bls12_377 import R

prng = random.Random(7)
N = 512
ks = [prng.randrange(1, R) for _ in range(N)]
pts_h = [hc.g1_mul(hc.g1_generator(), k) for k in ks]
pts = jc.g1_from_affine_host(pts_h)
scals = [prng.randrange(R) for _ in range(N)]

t0 = time.time()
got = msm.msm_g1(pts, scals)
print("msm_g1 packed time", time.time() - t0, flush=True)
exp = hc.g1_msm(pts_h, scals)
print("msm_g1 ok:", got == exp, flush=True)

# small MSM (ladder path)
t0 = time.time()
got = msm.msm_g1(pts[0][:32] if False else jc.g1_from_affine_host(pts_h[:32]), scals[:32])
print("small msm time", time.time() - t0, flush=True)
print("small msm ok:", got == hc.g1_msm(pts_h[:32], scals[:32]), flush=True)

# multi-MSM
K, M = 8, 256
basis = jc.g1_from_affine_host(pts_h[:M])
mscal = np.zeros((K, M, FR.nlimbs), dtype=np.uint32)
vals = [[prng.randrange(R) for _ in range(M)] for _ in range(K)]
for k in range(K):
    mscal[k] = FR.to_limbs(vals[k])
t0 = time.time()
out = msm._multi_msm_device("g1", basis, jnp.asarray(mscal), 8)
outs = jc.g1_to_affine_host(out)
print("multi msm time", time.time() - t0, flush=True)
ok = all(outs[k] == hc.g1_msm(pts_h[:M], vals[k]) for k in range(K))
print("multi msm ok:", ok, flush=True)

# scalar_mul_batch
cv = prng.randrange(R)
t0 = time.time()
sm = jc.g1_to_affine_host(jc.scalar_mul_batch_g1(basis, jnp.asarray(FR.to_limbs(cv))))
print("scalar_mul_batch time", time.time() - t0, flush=True)
print("scalar_mul_batch ok:", sm == [hc.g1_mul(p, cv) for p in pts_h[:M]], flush=True)

# G2 small check
g2h = [hc.g2_mul(hc.g2_generator(), k) for k in ks[:32]]
g2d = jc.g2_from_affine_host(g2h)
got2 = msm.msm_g2(g2d, scals[:32])
print("msm_g2 small ok:", got2 == hc.g2_msm(g2h, scals[:32]), flush=True)
