"""Per-phase profile of the SIGNED packed MSM (r4 plan).

Usage: python tools/prof_signed.py [log2N]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


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
    log(f"{label:34s} {min(times)*1000:9.1f} ms")
    return out


def main():
    from testudo_tpu.tpu import msm, pallas_curve as pcu
    from testudo_tpu.tpu.field import FR

    logN = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = 1 << logN
    c = msm._SIGNED_C
    log(f"N=2^{logN} signed c={c} backend={jax.default_backend()}")

    import bench

    pts = bench.gen_points(min(N, 1 << 13), N)
    jax.block_until_ready(pts)

    rng = np.random.default_rng(7)
    scal = rng.integers(0, 1 << 16, size=(N, FR.nlimbs), dtype=np.uint32)
    scal[:, -1] &= 0x0FFF
    scal = jnp.asarray(scal)

    Gp = pcu.G1P
    t0 = time.time()
    msm.msm_g1(pts, scal)
    log(f"warmup full signed msm_g1: {time.time()-t0:.1f}s")

    ptcat = t("cat_points", lambda: msm._cat_points("g1", pts))
    table = t(
        "neg_y table",
        lambda: msm._with_neg_y_table(ptcat, Gp.spec.nlimbs, Gp.ncomp),
    )
    o_s_s_c = t("digit_counts_signed", msm._digit_counts_signed, scal, c)
    order, sgn_sorted, starts, counts = o_s_s_c
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
        f"(host {1000*(time.time()-t0):.1f} ms)"
    )
    L_pad, lc = msm._plan_lanes(T_cap, Gp.rows, L, S_cap)
    pad = L_pad - L
    wnd = np.pad(wnd, (0, pad))
    seg_start = np.pad(seg_start, (0, pad))
    seg_count = np.pad(seg_count, (0, pad))
    log(
        f"L_pad={L_pad} lc={lc} chunks={L_pad//lc} "
        f"lane-steps {T_cap*L_pad/1e6:.1f}M (ideal {N*W/1e6:.1f}M)"
    )
    order_flat = t(
        "order+sign flatten",
        jax.jit(lambda o, s: (o + s * N).reshape(-1)),
        order,
        sgn_sorted,
    )
    seg_sums = t(
        "seg_buckets (gather+kernel)",
        lambda: msm._msm_seg_buckets(
            "g1", table, order_flat, jnp.asarray(wnd), jnp.asarray(seg_start),
            jnp.asarray(seg_count), T_cap, lc, N,
        ),
    )
    buckets = t(
        "seg_reduce",
        lambda: msm._seg_reduce(
            "g1", seg_sums, (jnp.asarray(lane_off), jnp.asarray(nseg)), S_cap
        ),
    )
    mag = t(
        "drop_mag0", lambda: msm._drop_mag0(buckets, Gp.rows, W, B)
    )
    wins = t(
        "weighted_sum (+1)",
        lambda: msm._weighted_sum_packed_jit("g1", mag, W, c - 1, True),
    )
    out = t(
        "horner_ladder",
        lambda: msm._horner_ladder_packed("g1", wins, c),
    )
    from testudo_tpu.tpu import curve as jc

    t0 = time.time()
    jc.g1_to_affine_host(Gp.unpack(out))
    log(f"{'to_affine_host':34s} {(time.time()-t0)*1000:9.1f} ms")

    t0 = time.time()
    msm.msm_g1(pts, scal)
    full = time.time() - t0
    log(f"{'FULL signed msm_g1':34s} {full*1000:9.1f} ms -> {N/full:.0f} pts/s")


if __name__ == "__main__":
    main()
