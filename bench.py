"""Benchmark driver: MSM throughput on one chip (the north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is reported
against a 1.0e6 points/sec anchor — the ballpark of a well-tuned multicore
CPU Pippenger (arkworks/blst class) on BLS12-377 G1, the reference's
execution environment.

Auxiliary timings (sqrt-PST commit/open path pieces) go to stderr.
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    devs = jax.devices()
    log(f"devices: {devs} (init {time.time()-t0:.1f}s)")

    from testudo_tpu.curves import host_curve as hc
    from testudo_tpu.tpu import curve as jc, msm
    from testudo_tpu.tpu.field import FR
    from testudo_tpu.fields.bls12_377 import R

    N = 1 << 16
    c = 16
    rng = np.random.default_rng(7)

    # generate N pseudorandom points on device via one fixed-base ladder
    t0 = time.time()
    scal_gen = rng.integers(0, 1 << 16, size=(N, FR.nlimbs), dtype=np.uint32)
    scal_gen[:, -1] &= 0x0FFF
    pts = jc.fixed_base_mul_g1(jnp.asarray(scal_gen), hc.g1_generator())
    jax.block_until_ready(pts)
    log(f"point generation ({N} pts): {time.time()-t0:.1f}s")

    scalars = rng.integers(0, 1 << 16, size=(N, FR.nlimbs), dtype=np.uint32)
    scalars[:, -1] &= 0x0FFF
    scal_dev = jnp.asarray(scalars)

    # compile + warm up
    t0 = time.time()
    wins = msm._msm_windows("g1", pts, scal_dev, c)
    jax.block_until_ready(wins)
    log(f"MSM compile+first: {time.time()-t0:.1f}s")

    # timed runs (device phase only; host Horner is O(bits) and excluded
    # from the throughput metric but reported separately)
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        wins = msm._msm_windows("g1", pts, scal_dev, c)
        jax.block_until_ready(wins)
    dt = (time.time() - t0) / iters
    pps = N / dt

    t0 = time.time()
    res = msm._combine_windows_host(wins, c, "g1")
    log(f"host window combine: {time.time()-t0:.2f}s; device MSM {dt:.2f}s/run")
    log(f"throughput: {pps:,.0f} points/s/chip")

    baseline = 1.0e6  # documented anchor (see module docstring)
    print(
        json.dumps(
            {
                "metric": "msm_g1_points_per_sec_per_chip",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / baseline, 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
