"""Per-phase profile of the packed MSM (segment-plan design, round 3)."""
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t(label, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    log(f"{label:32s} {min(times)*1000:9.1f} ms")
    return out


def main():
    from testudo_tpu.tpu import msm, pallas_curve as pcu
    from testudo_tpu.tpu.field import FR

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    c = 8
    log(f"N={N} c={c} backend={jax.default_backend()}")

    import bench
    t0 = time.time()
    pts = bench.gen_points(min(N, 1 << 13), N)
    jax.block_until_ready(pts)
    log(f"gen_points: {time.time()-t0:.1f}s")

    rng = np.random.default_rng(7)
    scalars = rng.integers(0, 1 << 16, size=(N, FR.nlimbs), dtype=np.uint32)
    scalars[:, -1] &= 0x0FFF
    scal = jnp.asarray(scalars)

    Gp = pcu.G1P
    t0 = time.time()
    msm.msm_g1(pts, scal)
    log(f"warmup full msm_g1: {time.time()-t0:.1f}s")

    ptcat = msm._cat_points("g1", pts)
    jax.block_until_ready(ptcat)
    order, starts, counts = t("digit_counts", msm._digit_counts, scal, c)
    W, B = starts.shape
    starts_np = np.asarray(jax.device_get(starts))
    counts_np = np.asarray(jax.device_get(counts))
    T_cap = msm._pick_t_cap(counts_np, W, B)
    t0 = time.time()
    wnd, seg_start, seg_count, lane_off, nseg, L = msm._plan_segments(
        starts_np, counts_np, T_cap
    )
    s_max = max(1, int(nseg.max()) if nseg.size else 1)
    S_cap = 1 << (s_max - 1).bit_length()
    log(
        f"plan: T_cap={T_cap} L={L} S_cap={S_cap} "
        f"(host plan {1000*(time.time()-t0):.1f} ms)"
    )
    L_pad, lc = msm._plan_lanes(T_cap, Gp.rows, L, S_cap)
    pad = L_pad - L
    wnd = np.pad(wnd, (0, pad))
    seg_start = np.pad(seg_start, (0, pad))
    seg_count = np.pad(seg_count, (0, pad))
    log(f"L_pad={L_pad} lc={lc} runs tensor/chunk: "
        f"{T_cap*Gp.rows*lc*4/2**20:.0f} MiB, lane-steps {T_cap*L_pad/1e6:.1f}M")

    seg_sums = t(
        "seg_buckets (gather+kernel)",
        partial(msm._msm_seg_buckets, "g1"),
        ptcat, order.reshape(-1), jnp.asarray(wnd), jnp.asarray(seg_start),
        jnp.asarray(seg_count), T_cap, lc,
    )
    buckets = t(
        "seg_reduce", partial(msm._seg_reduce, "g1"),
        seg_sums, (jnp.asarray(lane_off), jnp.asarray(nseg)), S_cap,
    )
    wins = t("weighted_sum", partial(msm._weighted_sum_packed_jit, "g1"),
             buckets, W, c)
    out = t("horner_ladder", partial(msm._horner_ladder_packed, "g1"), wins, c)

    from testudo_tpu.tpu import curve as jc
    t0 = time.time()
    jc.g1_to_affine_host(Gp.unpack(out))
    log(f"{'to_affine_host':32s} {(time.time()-t0)*1000:9.1f} ms")

    t0 = time.time()
    msm.msm_g1(pts, scal)
    full_s = time.time() - t0
    log(f"{'FULL msm_g1':32s} {full_s*1000:9.1f} ms  -> {N/full_s:.0f} pts/s")


if __name__ == "__main__":
    main()
