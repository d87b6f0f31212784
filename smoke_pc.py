import time, numpy as np, jax, jax.numpy as jnp, random

t0 = time.time()
from testudo_tpu.curves import host_curve as hc
from testudo_tpu.tpu import curve as jc, pallas_curve as pc
from testudo_tpu.fields.bls12_377 import R

print("imports", time.time() - t0, flush=True)
prng = random.Random(1)
L = 128
ks = [prng.randrange(1, R) for _ in range(2 * L)]
pts_h = [hc.g1_mul(hc.g1_generator(), k) for k in ks]
Ah, Bh = pts_h[:L], pts_h[L:]
A = jc.g1_from_affine_host(Ah)
B = jc.g1_from_affine_host(Bh)
G = pc.G1P
Ap, Bp = G.pack(A), G.pack(B)
mask_np = (np.arange(L) % 2).astype(np.uint32)
mask = jnp.asarray(mask_np)


def aff(packed):
    return jc.g1_to_affine_host(G.unpack(packed))


t0 = time.time()
out = aff(G.add_mask(Ap, Bp, mask))
print("add_mask call", time.time() - t0, flush=True)
ref = [hc.g1_add(a, b) if m else a for a, b, m in zip(Ah, Bh, mask_np)]
print("add_mask ok:", out == ref, flush=True)

t0 = time.time()
oa, ob = G.step(Ap, Bp, mask)
print("step acc ok:", aff(oa) == ref,
      "dbl ok:", aff(ob) == [hc.g1_add(b, b) for b in Bh],
      time.time() - t0, flush=True)

t0 = time.time()
s = aff(G.add2(Ap, Bp))
print("add2 ok:", s == [hc.g1_add(a, b) for a, b in zip(Ah, Bh)],
      time.time() - t0, flush=True)

r2, t2 = G.scan2b(Ap, Bp, G.pack(A))
print("scan2b run ok:", aff(r2) == [hc.g1_add(a, a) for a in Ah],
      "tot ok:", aff(t2) == [hc.g1_add(b, a) for a, b in zip(Ah, Bh)], flush=True)

t0 = time.time()
tr = G.tree_reduce(Ap)
hsum = None
for p in Ah:
    hsum = hc.g1_add(hsum, p) if hsum else p
print("tree_reduce ok:", aff(tr)[0] == hsum, time.time() - t0, flush=True)

# ladder: per-lane scalar mul
sc = np.zeros((L, 16), dtype=np.uint32)
svals = [prng.randrange(R) for _ in range(L)]
for i, v in enumerate(svals):
    for j in range(16):
        sc[i, j] = (v >> (16 * j)) & 0xFFFF
t0 = time.time()
lad = aff(G.ladder(Ap, jnp.asarray(sc.T)))
print("ladder ok:", lad == [hc.g1_mul(a, v) for a, v in zip(Ah, svals)],
      time.time() - t0, flush=True)
