"""Experiment: combined-key digit sort vs per-window argsort.

The signed MSM plan argsorts a (W, N) magnitude array along axis=1
(_digit_counts_signed).  Lever #2 from PERF.md r4: ONE argsort over a
combined key (window << c | magnitude) of W*N elements may beat W row
sorts.  Keys fit i32 comfortably (W=20, c=13 -> max ~168k).

Run on TPU: python tools/exp_digit_sort.py [log2 N]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

sys.path.insert(0, ".")
from testudo_tpu.tpu import msm  # noqa: E402
from testudo_tpu.tpu.field import FR  # noqa: E402


@partial(jax.jit, static_argnums=(1,))
def combined(scal, c):
    d = msm._signed_digits(scal, c)
    sign = (d < 0).astype(jnp.int32)
    mag = jnp.abs(d)
    W, N = mag.shape
    keys = (jnp.arange(W, dtype=jnp.int32)[:, None] * (1 << c)) | mag
    og = jnp.argsort(keys.reshape(-1))
    order = (og % N).reshape(W, N)
    sgn_sorted = jnp.take_along_axis(sign, order, axis=1)
    sd = jnp.take_along_axis(mag, order, axis=1)
    B = (1 << (c - 1)) + 1
    rng = jnp.arange(B, dtype=sd.dtype)
    starts = jax.vmap(lambda row: jnp.searchsorted(row, rng))(sd)
    ends = jax.vmap(lambda row: jnp.searchsorted(row, rng, side="right"))(sd)
    counts = (ends - starts).at[:, 0].set(0)
    return order, sgn_sorted, starts, counts


def _sync(out):
    # block_until_ready is unreliable on the axon backend (PERF.md r4);
    # a device_get of a reduction is the only trustworthy sync
    return jax.device_get(jnp.sum(out[3]))


def t(label, fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        ts.append(time.time() - t0)
    print(f"{label:24s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = 1 << lg
    c = 13
    rng = np.random.default_rng(7)
    scal = rng.integers(0, 1 << 16, size=(N, FR.nlimbs), dtype=np.uint32)
    scal[:, -1] &= 0x0FFF
    scal = jnp.asarray(scal)

    o1 = t("per-window argsort", msm._digit_counts_signed, scal, c)
    o2 = t("combined-key argsort", combined, scal, c)

    # bucket sums must agree: same starts/counts, and each window's order
    # segment must contain the same index multiset per bucket
    s1, c1 = np.asarray(o1[2]), np.asarray(o1[3])
    s2, c2 = np.asarray(o2[2]), np.asarray(o2[3])
    print("starts equal:", bool((s1 == s2).all()),
          "counts equal:", bool((c1 == c2).all()), flush=True)


if __name__ == "__main__":
    main()
