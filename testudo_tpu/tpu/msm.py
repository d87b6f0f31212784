"""Multi-scalar multiplication (Pippenger) for TPU.

Replaces ark-ec VariableBaseMSM (SURVEY.md §2.3) with a fully vectorized
design — the reference's hot MSMs are the sqrt-PST column commitments
(sqrt_pst.rs:124), the U-fold (sqrt_pst.rs:198), MIPP cross-commitments
(mipp.rs:77-85) and Groth16's proving MSMs.

Algorithm (per c-bit window):
  1. digits = window slice of each (canonical-form) scalar;
  2. sort point indices by digit (XLA sort — no data-dependent control
     flow, batch-parallel);
  3. bucket accumulation: run-aligned gather loop — step t adds the t-th
     point of every bucket's run simultaneously (one complete EC add over
     all 2^c buckets per step).  Bucket loads concentrate around N/2^c, so
     a lax.while_loop on the true max run length does ~(N/2^c + tail)
     vectorized steps;
  4. weighted bucket reduction sum_j j*B_j via a grouped suffix scan
     (lax.scan), a shared double-and-add chain for the group offsets, and a
     two-stage loop reduction — everything stays wide on the VPU.
Window results are combined host-side with a Horner chain (c doublings per
window, O(bits) tiny host ops).

G1 and G2 share one implementation: points are pytrees (G1: 3 limb arrays;
G2: 3 pairs of limb arrays) and the group law comes from tpu.curve's
complete RCB16 formulas, so every lane runs identical straight-line code.

Sharding: for multi-chip MSM the point/scalar arrays are sharded along the
batch axis; each chip runs steps 1-3 on its shard and the (W, nbuckets)
bucket partials are psum-folded before step 4 (see parallel/).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import R
from . import cache as _cache  # noqa: F401  (enables persistent compile cache)
from . import curve as jc
from .field import FR, MASK

tree_map = jax.tree_util.tree_map


class _G1:
    add = staticmethod(jc.g1_add)
    double = staticmethod(jc.g1_double)
    neg = staticmethod(jc.g1_neg)
    select = staticmethod(jc.g1_select)
    identity = staticmethod(jc.g1_identity)


class _G2:
    add = staticmethod(jc.g2_add)
    double = staticmethod(jc.g2_double)
    neg = staticmethod(jc.g2_neg)
    select = staticmethod(jc.g2_select)
    identity = staticmethod(jc.g2_identity)


def _pick_window(n: int) -> int:
    # Measured on TPU v5e: c=16 (65536 bucket lanes) generates enormous
    # padded intermediates in the bucket/weighted-sum phases and runs ~26x
    # SLOWER than c=8 at n=2^14 (30.7s vs 1.2s), besides tripping tunnel
    # deadlines on large batches.  c=8 is the sweet spot for every n that
    # fits one chip; revisit when the Pallas bucket kernel lands.
    if n <= 1 << 6:
        return 4
    return 8


def _digits_from_scalars(scalars_canon: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, nlimbs) canonical 16-bit-limb scalars -> (W, N) int32 digits
    (any scalar width: 16 limbs for Fr, 24 for BW6-761's Fq scalars)."""
    nbits = 16 * scalars_canon.shape[1]
    w = nbits // c
    limbs = scalars_canon.astype(jnp.int32)
    outs = []
    per = 16 // c  # digits per limb (c in {4, 8, 16})
    for wi in range(w):
        limb_idx = wi // per
        shift = (wi % per) * c
        outs.append((limbs[:, limb_idx] >> shift) & ((1 << c) - 1))
    return jnp.stack(outs, axis=0)


def _bucket_accumulate(G, points, dig: jnp.ndarray, nbuckets: int):
    """Sort-by-digit then run-aligned accumulation into per-bucket sums."""
    buckets = _bucket_accumulate_all(G, points, dig[None, :], nbuckets)
    return tree_map(lambda c: c[0], buckets)


def _bucket_accumulate_all(G, points, digits: jnp.ndarray, nbuckets: int):
    """All windows at once: digits (W, N) -> bucket sums (W, nbuckets).

    One while_loop over the global max run length; each iteration adds
    W * nbuckets lanes in one batched group add (wide enough to engage the
    Pallas field kernel), instead of W sequential window passes.
    """
    W, n = digits.shape
    order = jnp.argsort(digits, axis=1)
    sd = jnp.take_along_axis(digits, order, axis=1)
    pts = tree_map(lambda coord: coord[order], points)  # (W, N, limbs)
    rng = jnp.arange(nbuckets, dtype=sd.dtype)
    starts = jax.vmap(lambda row: jnp.searchsorted(row, rng))(sd)
    ends = jax.vmap(lambda row: jnp.searchsorted(row, rng, side="right"))(sd)
    counts = (ends - starts).at[:, 0].set(0)  # bucket 0 has weight 0: skip
    max_run = jnp.max(counts)
    lane = jnp.arange(nbuckets)[None, :]
    widx = jnp.arange(W)[:, None]

    def cond(state):
        t, _ = state
        return t < max_run

    def body(state):
        t, acc = state
        idx = jnp.clip(starts + t, 0, n - 1)  # (W, nbuckets)
        pt = tree_map(lambda coord: coord[widx, idx], pts)
        valid = (t < counts) & (lane > 0)
        acc = G.select(valid, G.add(acc, pt), acc)
        return t + 1, acc

    _, buckets = jax.lax.while_loop(
        cond, body, (jnp.int32(0), G.identity((W, nbuckets)))
    )
    return buckets


def _weighted_bucket_sum(G, buckets, c: int):
    """sum_{j=1}^{2^c-1} j * B_j with grouped suffix scans (all loop-based).

    Buckets reshape to (groups, h).  A lax.scan over local index l = h-1..0
    maintains run_g = suffix sum and tot_g = sum_l (l+1) B_{g,l}; then
      sum_j j B_j = sum_g [ g*h*U_g + tot_g - U_g ],   U_g = run_g.
    The g*h*U_g terms share one double-and-add chain over the bits of g*h.
    """
    nbuckets = 1 << c
    h = min(nbuckets, 32)
    groups = nbuckets // h
    bg = tree_map(lambda coord: coord.reshape(groups, h, *coord.shape[1:]), buckets)
    # (h, groups, ...) with l reversed so scan goes h-1 .. 0
    xs = tree_map(lambda coord: jnp.flip(coord, axis=1).swapaxes(0, 1), bg)

    def scan_body(carry, bl):
        run, tot = carry
        run = G.add(run, bl)
        tot = G.add(tot, run)
        return (run, tot), 0

    (run, tot), _ = jax.lax.scan(
        scan_body, (G.identity((groups,)), G.identity((groups,))), xs
    )

    # acc_g = (g*h) * U_g via shared double chain
    weights = jnp.asarray([g * h for g in range(groups)], dtype=jnp.uint32)
    maxbits = max(1, (max((groups - 1) * h, 1)).bit_length())

    def chain_body(bit, state):
        acc, addend = state
        sel = ((weights >> bit) & 1) == 1
        acc = G.select(sel, G.add(acc, addend), acc)
        return acc, G.double(addend)

    acc, _ = jax.lax.fori_loop(
        0, maxbits, chain_body, (G.identity((groups,)), run)
    )
    res = G.add(G.add(acc, tot), G.neg(run))  # per-group totals

    # two-stage loop reduction over groups (keeps HLO small)
    if groups > 32:
        inner = groups // 32
        res2 = tree_map(lambda coord: coord.reshape(32, inner, *coord.shape[1:]), res)

        def red_body(i, acc):
            sl = tree_map(lambda coord: coord[:, i], res2)
            return G.add(acc, sl)

        res = jax.lax.fori_loop(1, inner, red_body, tree_map(lambda coord: coord[:, 0], res2))
        groups_left = 32
    else:
        groups_left = groups

    def red2_body(i, acc):
        sl = tree_map(lambda coord: coord[i], res)
        return G.add(acc, sl)

    first = tree_map(lambda coord: coord[0], res)
    return jax.lax.fori_loop(1, groups_left, red2_body, first)


_SMALL_N = 64  # below this, Pippenger's graph costs more to trace than to run


@partial(jax.jit, static_argnums=(0,))
def _msm_small_device(group_name, points, scalars_canon: jnp.ndarray):
    """Tiny-batch MSM: per-lane double-and-add ladder + tree reduction.

    One small graph for ALL small MSMs (inputs are padded to _SMALL_N), so
    the protocol's many tiny MSMs (MIPP halving rounds, PST opening
    quotients) never re-trace the full Pippenger pipeline — on this host
    tracing that graph costs ~25 s per shape, far more than running it.
    """
    G = _resolve_group(group_name)
    n = jax.tree_util.tree_leaves(points)[0].shape[0]
    nbits = 16 * scalars_canon.shape[1]

    def body(i, state):
        acc, base = state
        bit = jc._bit_of(scalars_canon, i)
        acc = G.select(bit == 1, G.add(acc, base), acc)
        return acc, G.double(base)

    acc, _ = jax.lax.fori_loop(
        0, nbits, body, (G.identity((n,)), points)
    )
    while n > 1:
        half = n // 2
        acc = G.add(
            tree_map(lambda c: c[:half], acc),
            tree_map(lambda c: c[half:], acc),
        )
        n = half
    return tree_map(lambda c: c[0], acc)


def _pad_to(points, scal: jnp.ndarray, target: int):
    n = scal.shape[0]
    if n == target:
        return points, scal
    padn = target - n
    scal = jnp.concatenate(
        [scal, jnp.zeros((padn, scal.shape[1]), scal.dtype)], axis=0
    )
    points = tree_map(
        lambda coord: jnp.concatenate(
            [coord, jnp.zeros((padn,) + coord.shape[1:], coord.dtype)], axis=0
        ),
        points,
    )
    return points, scal


def _resolve_group(group):
    """A group key: 'g1'/'g2' (BLS12-377), or any hashable object with the
    G interface (e.g. curve_generic.FpGroup for BW6-761)."""
    if group == "g1":
        return _G1
    if group == "g2":
        return _G2
    return group


def _msm_windows_impl(group_name, points, scalars_canon: jnp.ndarray, c: int):
    G = _resolve_group(group_name)
    digits = _digits_from_scalars(scalars_canon, c)  # (W, N)
    nbuckets = 1 << c
    buckets = _bucket_accumulate_all(G, points, digits, nbuckets)
    return jax.vmap(lambda b: _weighted_bucket_sum(G, b, c))(buckets)


_msm_windows = partial(jax.jit, static_argnums=(0, 3))(_msm_windows_impl)


def _horner_combine_device(G, wins, c: int):
    """Combine per-window sums on device: acc = sum_w 2^(c*w) * S_w."""
    W = jax.tree_util.tree_leaves(wins)[0].shape[0]

    def body(i, acc):
        w = W - 2 - i
        for _ in range(c):
            acc = G.double(acc)
        return G.add(acc, tree_map(lambda coord: coord[w], wins))

    acc0 = tree_map(lambda coord: coord[W - 1], wins)
    return jax.lax.fori_loop(0, W - 1, body, acc0)


def _multi_msm_device(group_name, points, scalars_canon: jnp.ndarray, c: int):
    """Many MSMs over one shared basis: scalars (K, N, limbs) -> K
    projective points, fully on device (used by the sqrt-PST column
    commitments, sqrt_pst.rs:120-126)."""
    if _use_packed() and scalars_canon.shape[1] > _SMALL_N:
        return _multi_msm_packed(group_name, points, scalars_canon, c)
    return _multi_msm_xla(group_name, points, scalars_canon, c)


@partial(jax.jit, static_argnums=(0, 3))
def _multi_msm_xla(group_name, points, scalars_canon: jnp.ndarray, c: int):
    G = _resolve_group(group_name)
    if scalars_canon.shape[1] <= _SMALL_N:
        padn = _SMALL_N - scalars_canon.shape[1]
        if padn:
            scalars_canon = jnp.pad(scalars_canon, ((0, 0), (0, padn), (0, 0)))
            points = tree_map(
                lambda coord: jnp.concatenate(
                    [coord, jnp.zeros((padn,) + coord.shape[1:], coord.dtype)],
                    axis=0,
                ),
                points,
            )
        # lax.map, not vmap: the curve layer's stacked-mul batching assumes
        # unbatched lane layouts; map traces the ladder once, unbatched.
        return jax.lax.map(
            lambda s: _msm_small_device(group_name, points, s), scalars_canon
        )

    def one(scal):
        wins = _msm_windows_impl(group_name, points, scal, c)
        return _horner_combine_device(G, wins, c)

    return jax.lax.map(one, scalars_canon)


def _combine_windows_host(windows, c: int, group: str):
    """Horner-combine per-window sums on the host (O(bits) tiny muls)."""
    from ..curves import host_curve as hc

    if group == "g1":
        pts = jc.g1_to_affine_host(windows)
        add = hc.g1_add
    else:
        pts = jc.g2_to_affine_host(windows)
        add = hc.g2_add
    acc = None
    for pt in reversed(pts):
        if acc is not None:
            for _ in range(c):
                acc = add(acc, acc)
        acc = add(acc, pt)
    return acc


def _prep_scalars(scalars) -> jnp.ndarray:
    if isinstance(scalars, (list, tuple)):
        return jnp.asarray(FR.to_limbs([s % R for s in scalars]))
    return scalars


def _pad_pow2(points, scal: jnp.ndarray):
    """Pad batch to the next power of two (bounds jit-shape variety).

    Padding scalars are 0, so the extra lanes land in bucket 0, which has
    weight zero and is skipped by the accumulation loop.
    """
    n = scal.shape[0]
    target = 1 << max(1, (n - 1).bit_length())
    if target == n:
        return points, scal
    padn = target - n
    scal = jnp.concatenate(
        [scal, jnp.zeros((padn, scal.shape[1]), scal.dtype)], axis=0
    )
    points = tree_map(
        lambda coord: jnp.concatenate(
            [coord, jnp.zeros((padn,) + coord.shape[1:], coord.dtype)], axis=0
        ),
        points,
    )
    return points, scal


# ---------------------------------------------------------------------------
# Fused-Pallas packed path (TPU): one pallas_call per MSM phase
# ---------------------------------------------------------------------------
#
# Round-1's bucket phase ran each RCB16 add as ~100 XLA dispatches; this
# path materializes the run-aligned point tensor with one XLA row-gather
# and hands the ENTIRE bucket accumulation to pallas_curve's `bucket`
# kernel (acc blocks resident in VMEM across all steps), then does the
# weighted bucket reduction and the 2^{cw} window combine with fused
# scan/step/ladder kernels.  Matches ark-ec VariableBaseMSM semantics
# (sqrt_pst.rs:198, mipp.rs:77-85).


def _use_packed() -> bool:
    """True when the fused-Pallas packed MSM path should run.

    Gated on the TPU backend specifically (the kernels are pltpu-only);
    TESTUDO_PACKED=1 forces it on (CPU runs them in interpret mode — how
    tests/test_pallas_curve.py exercises the production path in CI) and
    TESTUDO_PACKED=0 forces the legacy XLA path.
    """
    env = os.environ.get("TESTUDO_PACKED")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_T(t: int) -> int:
    """Round the max bucket run length up (pow2 below 512, then multiples
    of 512) to bound the set of bucket-kernel executables.  The floor is
    16: signed windows at mid sizes have mean runs ~16-32, and a 32 floor
    would force 2x step padding on every lane."""
    if t <= 512:
        return max(16, 1 << max(0, (t - 1).bit_length()))
    return -(-t // 512) * 512


@partial(jax.jit, static_argnums=(1,))
def _digit_counts(scal: jnp.ndarray, c: int):
    digits = _digits_from_scalars(scal, c)  # (W, N)
    order = jnp.argsort(digits, axis=1)
    sd = jnp.take_along_axis(digits, order, axis=1)
    rng = jnp.arange(1 << c, dtype=sd.dtype)
    starts = jax.vmap(lambda row: jnp.searchsorted(row, rng))(sd)
    ends = jax.vmap(lambda row: jnp.searchsorted(row, rng, side="right"))(sd)
    counts = (ends - starts).at[:, 0].set(0)  # bucket 0 has weight 0
    return order, starts, counts


# -- signed digits ----------------------------------------------------------
#
# Signed c-bit windows cut Pippenger's work by W_unsigned/W_signed: digits
# land in [-(2^(c-1)-1), 2^(c-1)] so c=13 covers a 253-bit scalar in 20
# windows (vs 32 c=8 windows) at 2^12 magnitude buckets per window; the
# sign rides on the POINT (negating y is free: a second table with y
# negated, indexed by sorted-sign offset).  This also removes the
# top-window digit skew that forced the r2/r3 segment plan's worst padding
# (253-bit scalars leave a c=8 top window with 16 distinct values).


def _signed_digits(scal: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, nlimbs) canonical 16-bit limbs -> (W, N) int32 signed digits
    with borrow propagation; W = ceil(16*nlimbs / c).

    Requires the top window's raw digit + borrow <= 2^(c-1), which holds
    whenever the scalar bit-length is at least 2 below W*c (true for Fr
    253-bit scalars at c=13: top window holds bits 247..255 < 2^6)."""
    nbits = 16 * scal.shape[1]
    W = -(-nbits // c)
    limbs = scal.astype(jnp.int32)
    nl = scal.shape[1]
    mask = (1 << c) - 1
    raws = []
    for w in range(W):
        lo = (w * c) // 16
        sh = (w * c) % 16
        v = limbs[:, lo] >> sh
        if lo + 1 < nl and sh + c > 16:
            v = v | (limbs[:, lo + 1] << (16 - sh))
        raws.append(v & mask)
    half = 1 << (c - 1)
    digs = []
    borrow = jnp.zeros_like(raws[0])
    for w in range(W):
        d = raws[w] + borrow
        hi = (d > half).astype(jnp.int32)
        digs.append(d - (hi << c))
        borrow = hi
    return jnp.stack(digs, axis=0)


@partial(jax.jit, static_argnums=(1,))
def _digit_counts_signed(scal: jnp.ndarray, c: int):
    """Signed-window bucket plan: sort |digit| per window, carry the sign
    through the sort as a table offset (0 -> P, 1 -> -P)."""
    d = _signed_digits(scal, c)  # (W, N)
    sign = (d < 0).astype(jnp.int32)
    mag = jnp.abs(d)
    order = jnp.argsort(mag, axis=1)
    sgn_sorted = jnp.take_along_axis(sign, order, axis=1)
    sd = jnp.take_along_axis(mag, order, axis=1)
    B = (1 << (c - 1)) + 1  # magnitudes 0..2^(c-1)
    rng = jnp.arange(B, dtype=sd.dtype)
    starts = jax.vmap(lambda row: jnp.searchsorted(row, rng))(sd)
    ends = jax.vmap(lambda row: jnp.searchsorted(row, rng, side="right"))(sd)
    counts = (ends - starts).at[:, 0].set(0)  # magnitude 0: no work
    return order, sgn_sorted, starts, counts


@partial(jax.jit, static_argnums=(1, 2))
def _with_neg_y_table(ptcat: jnp.ndarray, n: int, ncomp: int) -> jnp.ndarray:
    """(N, rows) packed points -> (2N, rows) table with [P..., -P...]:
    row N+i holds P_i with y negated (per Fq component: p - y, 0 -> 0)."""
    from .pallas_field import _limbs_of
    from ..fields.bls12_377 import P as _Pmod

    p_limbs = _limbs_of(_Pmod, n)
    y0, y1 = ncomp * n, 2 * ncomp * n
    comps = []
    for comp in range(ncomp):
        yc = ptcat[:, y0 + comp * n : y0 + (comp + 1) * n]  # (N, n)
        outs = []
        borrow = jnp.zeros(yc.shape[:1], jnp.uint32)
        for k in range(n):
            v = np.uint32(p_limbs[k] + (1 << 16)) - yc[:, k] - borrow
            outs.append(v & jnp.uint32(MASK))
            borrow = 1 - (v >> 16)
        neg = jnp.stack(outs, axis=1)
        nz = (yc != 0).any(axis=1, keepdims=True)
        comps.append(jnp.where(nz, neg, yc))
    neg_pt = jnp.concatenate(
        [ptcat[:, :y0]] + comps + [ptcat[:, y1:]], axis=1
    )
    return jnp.concatenate([ptcat, neg_pt], axis=0)


# -- bucket splitting -------------------------------------------------------
#
# The bucket kernel's step count is the MAX run length over all lanes in a
# launch, so one overloaded bucket pads every lane's loop.  Skew is
# structural, not incidental: 253-bit scalars leave the top c=8 window
# with only 16 distinct digit values, so its buckets carry 16x the mean
# load (measured r3: max_run 4241 vs mean 256 at 2^16 — a 13x padded loop,
# and the direct cause of the r2 2^20 OOM/crash: T=65536 run tensors).
# Fix: cap the step count at T_cap and split each overloaded bucket into
# ceil(count / T_cap) SEGMENT lanes; segment partial sums are then folded
# back into per-bucket sums with a dense (W*B, S) gather + log2(S) fused
# adds.  T_cap is chosen on the host to minimize T_cap * num_lanes over
# rounded classes, so every launch shape stays in a small set.

_LANE_CLASS = 1024  # segment-lane padding granularity


def _plan_segments(starts_np: np.ndarray, counts_np: np.ndarray, T_cap: int):
    """Host-side split of (window, bucket) runs into <= T_cap segments.

    Returns (wnd, seg_start, seg_count, lane_off, nseg, L) numpy arrays:
    lane l sums points order[wnd[l], seg_start[l] : seg_start[l]+seg_count[l]];
    bucket j's segments are the CONSECUTIVE lanes [lane_off[j],
    lane_off[j]+nseg[j]) — the segment reduce is itself a run-aligned
    accumulation over lanes.  Empty buckets get no lanes (nseg 0)."""
    W, B = counts_np.shape
    nseg = (-(-counts_np.astype(np.int64) // T_cap)).reshape(-1)
    lane_off = np.concatenate([[0], np.cumsum(nseg)])
    L = int(lane_off[-1])
    flat_ids = np.repeat(np.arange(W * B), nseg)
    seg_in_bucket = (np.arange(L) - lane_off[flat_ids]).astype(np.int64)
    wnd = (flat_ids // B).astype(np.int32)
    b = flat_ids % B
    seg_start = (starts_np[wnd, b] + seg_in_bucket * T_cap).astype(np.int32)
    seg_count = np.clip(
        counts_np[wnd, b] - seg_in_bucket * T_cap, 0, T_cap
    ).astype(np.int32)
    return (
        wnd,
        seg_start,
        seg_count,
        lane_off[:-1].astype(np.int32),
        nseg.astype(np.int32),
        L,
    )


def _pick_t_cap(counts_np: np.ndarray, W: int, B: int) -> int:
    """Minimize GATHER volume over rounded T classes.

    With per-tile loop bounds the kernel's add count is ~sum(counts)
    regardless of T, so the tunable cost is materialized gather rows:
    the bucket-phase runs tensor (T * lanes) plus the segment-reduce runs
    tensor (W * B * s_pad)."""
    best, best_cost = None, None
    nz = max(1, int(np.count_nonzero(counts_np)))
    mean = max(1, int(counts_np.sum()) // nz)
    cands = {_round_T(mean), _round_T(2 * mean), _round_T(4 * mean),
             _round_T(8 * mean), _round_T(max(16, mean // 2)),
             _round_T(int(counts_np.max()))}
    nseg_all = counts_np.astype(np.int64)
    for T in sorted(cands):
        nseg = -(-nseg_all // T)
        lanes = -(-int(nseg.sum()) // _LANE_CLASS) * _LANE_CLASS
        s_max = max(1, int(nseg.max()))
        s_pad = 1 << (s_max - 1).bit_length()
        cost = T * lanes + W * B * s_pad
        if best_cost is None or cost < best_cost:
            best, best_cost = T, cost
    return best


def _plan_lanes(T_cap: int, rows: int, L: int, s_pad: int):
    """Lane-chunk plan: one power-of-two chunk when it fits the ~2 GB run
    tensor budget, else the largest in-budget power-of-two chunk.
    Minimizing CHUNKS matters more than minimizing padding: each lax.map
    chunk pays fixed gather/dispatch overhead (the r4 signed plan at 2^16
    produced 81 serial 1024-lane chunks and tripled the bucket phase),
    and padded lanes are cheap thanks to the kernel's per-tile bound."""
    budget = 2 << 30
    per_lane = max(1, T_cap * rows * 4)
    need = L + 1  # room for the identity pad lane (empty-bucket dense rows)
    # lc classes are powers of two (executable variety stays bounded:
    # data-dependent lane counts quantize to at most a handful of (T_cap,
    # lc) pairs); the per-tile loop bound in the bucket kernel makes the
    # rounded-up padding lanes nearly free
    lc = _LANE_CLASS
    while lc < need and lc * 2 * per_lane <= budget:
        lc *= 2
    return -(-need // lc) * lc, lc


@partial(jax.jit, static_argnums=(0, 6, 7, 8, 9))
def _msm_seg_buckets(
    group_name, ptcat, order_flat, wnd, seg_start, seg_count, T_cap: int,
    lc: int, n_sorted: int | None = None, mixed: bool = False,
):
    """Segment-lane bucket accumulation: gather run-aligned points for each
    segment lane and run the fused bucket kernel, in lane chunks of `lc`
    so the materialized tensor stays under the memory budget.

    order_flat: (W*n_sorted,) flattened sorted-index table (values may
    index a table larger than n_sorted, e.g. the [P, -P] signed table);
    wnd/seg_start/seg_count: (L_pad,) per-lane plans.  Returns (rows,
    L_pad) sums."""
    from . import pallas_curve as pcu

    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    N = n_sorted if n_sorted is not None else ptcat.shape[0]
    L_pad = wnd.shape[0]
    tlen = jnp.max(seg_count)[None].astype(jnp.int32)

    def chunk(args):
        wnd_c, start_c, count_c = args  # (lc,)
        pos = start_c[None, :] + jnp.arange(T_cap, dtype=jnp.int32)[:, None]
        pos = jnp.clip(pos, 0, N - 1)
        idx = order_flat[(wnd_c[None, :] * N + pos).reshape(-1)]
        entries = ptcat[idx]  # (T_cap*lc, rows) row gather
        runs = entries.reshape(T_cap, lc, Gp.rows).transpose(0, 2, 1)
        return Gp.bucket_phase(runs, count_c, tlen, mixed=mixed)

    if lc >= L_pad:
        return chunk((wnd, seg_start, seg_count))
    nch = L_pad // lc
    parts = jax.lax.map(
        chunk,
        (
            wnd.reshape(nch, lc),
            seg_start.reshape(nch, lc),
            seg_count.reshape(nch, lc),
        ),
    )  # (nch, rows, lc)
    return parts.transpose(1, 0, 2).reshape(Gp.rows, L_pad)


@partial(jax.jit, static_argnums=(0, 3))
def _seg_reduce(group_name, seg_sums, lane_off_nseg, S_cap: int):
    """Fold segment partial sums back into (rows, W*B) bucket sums.

    Each bucket's segments are CONSECUTIVE lanes of seg_sums, so this is
    a second run-aligned accumulation: gather runs2[t, :, j] =
    seg_sums[:, lane_off[j] + t] and run the per-tile-bounded bucket
    kernel with counts = nseg.  Skewed buckets (the top signed window has
    few distinct digits, so counts up to ~N/64) cost only their own
    steps — the r4 dense-gather tree reduce paid s_pad rounds over EVERY
    bucket and dominated the whole MSM at 2^16 (1.15 s of 1.96 s)."""
    from . import pallas_curve as pcu

    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    lane_off, nseg = lane_off_nseg
    WB = lane_off.shape[0]
    L_pad = seg_sums.shape[1]
    if S_cap == 1:
        # exactly one segment per (nonempty) bucket: plain gather, empty
        # buckets pick an arbitrary lane but are overwritten downstream
        # only via weights... they must be identity: gather the pad lane
        idx = jnp.where(nseg > 0, lane_off, L_pad - 1)
        return seg_sums[:, idx]
    pos = lane_off[None, :] + jnp.arange(S_cap, dtype=jnp.int32)[:, None]
    pos = jnp.clip(pos, 0, L_pad - 1)  # (S_cap, WB)
    seg_T = seg_sums.T  # (L_pad, rows)
    entries = seg_T[pos.reshape(-1)]  # (S_cap*WB, rows)
    runs = entries.reshape(S_cap, WB, Gp.rows).transpose(0, 2, 1)
    tlen = jnp.asarray([S_cap], jnp.int32)
    return Gp.bucket_phase(runs, nseg, tlen)[:, :WB]


def _weighted_sum_packed(Gp, buckets, W: int, c: int, plus_one: bool = False):
    """sum_j w(j)*B_j per window on packed buckets (rows, W*2^c) ->
    (rows, W); w(j) = j, or j+1 when plus_one (signed windows store
    magnitude m at slot m-1)."""
    B = 1 << c
    h = min(B, 32)
    groups = B // h
    lanes = W * groups
    lanes_p = lanes + (-lanes) % 128
    bg = buckets.reshape(Gp.rows, W, groups, h)

    run = Gp.identity_packed(lanes_p)
    tot = Gp.identity_packed(lanes_p)
    # scan l = h-1..0 with tot-before-run update => tot = sum_l l*B_l
    def scan_body(carry, bl):
        run, tot = carry
        run, tot = Gp.scan2b(run, tot, bl)
        return (run, tot), 0

    xs = jnp.flip(bg, axis=3).transpose(3, 0, 1, 2).reshape(h, Gp.rows, lanes)
    xs = jnp.pad(xs, ((0, 0), (0, 0), (0, lanes_p - lanes)))
    (run, tot), _ = jax.lax.scan(scan_body, (run, tot), xs)

    # acc = (g*h) * run_g via shared double-and-add chain (static masks)
    weights = np.tile(np.arange(groups, dtype=np.uint64) * h, W)
    weights = np.pad(weights, (0, lanes_p - lanes))
    maxbits = max(1, int((groups - 1) * h).bit_length())
    acc = Gp.identity_packed(lanes_p)
    run0 = run  # step() doubles its base operand; keep sum_l B_l per group
    for bit in range(maxbits):
        sel = jnp.asarray(((weights >> bit) & 1).astype(np.uint32))
        acc, run = Gp.step(acc, run, sel)
    res = Gp.add2(acc, tot)
    if plus_one:  # + sum_l B_l per group shifts every weight by one
        res = Gp.add2(res, run0)
    res = res[:, :lanes]  # (rows, W*groups)

    # fold groups per window
    res = res.reshape(Gp.rows, W, groups)
    while groups > 1:
        half = groups // 2
        a = res[:, :, :half].reshape(Gp.rows, W * half)
        b = res[:, :, half:].reshape(Gp.rows, W * half)
        pad = (-(W * half)) % 128
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
            b = jnp.pad(b, ((0, 0), (0, pad)))
        res = Gp.add2(a, b)[:, : W * half].reshape(Gp.rows, W, half)
        groups = half
    return res.reshape(Gp.rows, W)


@partial(jax.jit, static_argnums=(0, 2))
def _horner_ladder_packed(group_name, wins, c: int):
    """sum_w 2^{c w} S_w via one fused ladder + tree reduction."""
    from . import pallas_curve as pcu
    from .field import FR

    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    W = wins.shape[1]
    pows = np.zeros((W, FR.nlimbs), dtype=np.uint32)
    for w in range(W):
        v = 1 << (c * w)
        for i in range(FR.nlimbs):
            pows[w, i] = (v >> (16 * i)) & 0xFFFF
    pad = (-W) % 128
    winsp = jnp.pad(wins, ((0, 0), (0, pad)))
    scal = jnp.pad(jnp.asarray(pows), ((0, pad), (0, 0))).T  # (nlimbs, W+pad)
    acc = Gp.ladder(winsp, scal)
    return Gp.tree_reduce(acc)


def _cat_points(group_name, points):
    if group_name == "g1":
        return jnp.concatenate(points, axis=1)
    flat = [points[c][i] for c in range(3) for i in range(2)]
    return jnp.concatenate(flat, axis=1)


_SIGNED_C = 13  # default signed window width (W = 20 for 253-bit Fr)


def _msm_packed(group_name, points, scal: jnp.ndarray, c: int | None,
                affine: bool = False):
    """Packed-kernel Pippenger.  c=None (the protocol default) uses signed
    c=13 windows — 20 windows instead of 32 at c=8, i.e. 1.6x fewer
    bucket adds; an explicit c keeps the legacy unsigned plan."""
    return _drive_one(_msm_packed_gen(group_name, points, scal, c, affine))


def _drive_one(gen):
    """Run a pipeline generator to completion, returning its value."""
    while True:
        try:
            next(gen)
        except StopIteration as stop:
            return stop.value


def _msm_packed_gen(group_name, points, scal: jnp.ndarray, c: int | None,
                    affine: bool = False):
    """Generator form of the packed Pippenger pipeline.

    affine=True asserts every input point has Z = mont(1) (fresh lifts of
    affine bases, the reference VariableBaseMSM contract): the bucket
    phase then runs complete MIXED adds (Alg 8, one fewer mul and half
    the adds per step).  The [P, -P] signed table only negates Y, so it
    preserves the property.

    Yields at the two host-sync boundaries (after the digit-count dispatch,
    and after the heavy kernels are dispatched) so a multi-device caller
    (parallel/mesh.sharded_msm) can interleave: dispatch stage k on EVERY
    device before any device's stage-(k+1) sync — the serial r4 loop
    instead blocked each device's full pipeline before starting the next.
    """
    from . import pallas_curve as pcu

    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    ptcat = _cat_points(group_name, points)
    N = ptcat.shape[0]
    signed = c is None
    if signed:
        c = _validated_signed_c()
        order, sgn_sorted, starts, counts = _digit_counts_signed(scal, c)
        # table row N+i = -P_i; the sorted sign picks the half
        table = _with_neg_y_table(ptcat, Gp.spec.nlimbs, Gp.ncomp)
        order_flat = (order + sgn_sorted * N).reshape(-1)
    else:
        order, starts, counts = _digit_counts(scal, c)
        table = ptcat
        order_flat = order.reshape(-1)
    W, B = starts.shape

    yield  # digit/sort work dispatched; sync follows on resume

    # host-side segment plan (counts/starts are (W, B) i32 — a cheap sync)
    starts_np = np.asarray(jax.device_get(starts))
    counts_np = np.asarray(jax.device_get(counts))
    T_cap = _pick_t_cap(counts_np, W, B)
    wnd, seg_start, seg_count, lane_off, nseg, L = _plan_segments(
        starts_np, counts_np, T_cap
    )
    s_max = max(1, int(nseg.max()) if nseg.size else 1)
    S_cap = 1 << (s_max - 1).bit_length()

    L_pad, lc = _plan_lanes(T_cap, Gp.rows, L, S_cap)
    pad = L_pad - L
    wnd = np.pad(wnd, (0, pad))
    seg_start = np.pad(seg_start, (0, pad))
    seg_count = np.pad(seg_count, (0, pad))

    seg_sums = _msm_seg_buckets(
        group_name,
        table,
        order_flat,
        jnp.asarray(wnd),
        jnp.asarray(seg_start),
        jnp.asarray(seg_count),
        T_cap,
        lc,
        N,
        affine,
    )
    buckets = _seg_reduce(
        group_name,
        seg_sums,
        (jnp.asarray(lane_off), jnp.asarray(nseg)),
        S_cap,
    )
    if signed:
        # drop the magnitude-0 slot: slot m-1 holds magnitude m, weight m
        wins = _weighted_sum_packed_jit(
            group_name, _drop_mag0(buckets, Gp.rows, W, B), W, c - 1, True
        )
    else:
        wins = _weighted_sum_packed_jit(group_name, buckets, W, c)
    out = _horner_ladder_packed(group_name, wins, c)

    yield  # heavy kernels dispatched; result sync happens in the caller

    return Gp.unpack(out)


def _validated_signed_c() -> int:
    """TESTUDO_MSM_C override, bounds-checked: _signed_digits merges at
    most two 16-bit limbs per window, so c > 16 silently drops bits, and
    c < 2 is degenerate (ADVICE r4)."""
    c = int(os.environ.get("TESTUDO_MSM_C", _SIGNED_C))
    if not 2 <= c <= 16:
        raise ValueError(
            f"TESTUDO_MSM_C={c} out of range: signed windows support "
            f"2 <= c <= 16 (digit extraction reads at most two 16-bit limbs)"
        )
    return c


@partial(jax.jit, static_argnums=(1, 2, 3))
def _drop_mag0(buckets, rows: int, W: int, B: int):
    return buckets.reshape(rows, W, B)[:, :, 1:].reshape(rows, W * (B - 1))


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _weighted_sum_packed_jit(group_name, buckets, W: int, c: int,
                             plus_one: bool = False):
    from . import pallas_curve as pcu

    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    return _weighted_sum_packed(Gp, buckets, W, c, plus_one)


def _msm_small_packed(group_name, points, scal: jnp.ndarray):
    """<=128-lane MSM: one fused ladder + log tree reduction."""
    from . import pallas_curve as pcu

    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    points, scal = _pad_to(points, scal, 128)
    acc = Gp.ladder(Gp.pack(points), scal.T)
    return Gp.unpack(Gp.tree_reduce(acc))


def msm_segmented(group_name, points, scal: jnp.ndarray, n_segments: int):
    """n_segments equal-length MSMs in ONE fused ladder launch.

    The batch splits into n_segments contiguous equal slices; returns the
    list of per-segment host affine sums.  One device dispatch instead of
    n_segments — MIPP's per-round (u_l, u_r) cross-MSMs (mipp.rs:77-85)
    are the motivating caller: u_l/u_r share the full a vector, so one
    ladder over it with swapped y halves computes both."""
    from . import pallas_curve as pcu
    from . import curve as jc_

    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    to_aff = (
        jc_.g1_to_affine_host if group_name == "g1" else jc_.g2_to_affine_host
    )
    n = scal.shape[0]
    assert n % n_segments == 0
    seg = n // n_segments
    if seg > 1024:
        # the fused ladder pays ~253 double-add steps per lane regardless
        # of segment size; above ~1k lanes per segment Pippenger's
        # per-point cost wins, so run each segment through the full
        # pipeline instead (ADVICE r4).  The MIPP caller's sqrt-sized
        # halving vectors stay on the ladder.
        fn = msm_g1 if group_name == "g1" else msm_g2
        return [
            fn(
                tree_map(lambda c: c[s * seg : (s + 1) * seg], points),
                scal[s * seg : (s + 1) * seg],
            )
            for s in range(n_segments)
        ]
    # pad each segment independently to a 128 multiple so slices stay
    # aligned after packing
    seg_pad = max(128, seg + (-seg) % 128)
    if seg_pad != seg:
        scatter = _seg_scatter_idx(n_segments, seg, seg_pad)
        points = tree_map(
            lambda coord: jnp.zeros(
                (n_segments * seg_pad,) + coord.shape[1:], coord.dtype
            ).at[scatter].set(coord),
            points,
        )
        scal = (
            jnp.zeros((n_segments * seg_pad, scal.shape[1]), scal.dtype)
            .at[scatter].set(scal)
        )
        seg = seg_pad
    if not _use_packed():
        outs = []
        for s in range(n_segments):
            sl = slice(s * seg, (s + 1) * seg)
            pts_s = tree_map(lambda c: c[sl], points)
            fn = msm_g1 if group_name == "g1" else msm_g2
            outs.append(fn(pts_s, scal[sl]))
        return outs
    acc = Gp.ladder(Gp.pack(points), scal.T)  # (rows, n_segments*seg)
    outs = []
    for s in range(n_segments):
        red = Gp.tree_reduce(acc[:, s * seg : (s + 1) * seg])
        outs.append(to_aff(Gp.unpack(red))[0])
    return outs


def _seg_scatter_idx(n_segments: int, seg: int, seg_pad: int) -> np.ndarray:
    return np.concatenate(
        [np.arange(s * seg_pad, s * seg_pad + seg) for s in range(n_segments)]
    )


def msm_multi_small(group_name, parts):
    """Many small MSMs in one fused ladder dispatch.

    parts: list of (points_pytree, scal (n_i, nlimbs)) with differing
    lengths.  Each part pads to a 128-lane multiple, all concatenate into
    ONE ladder launch, and per-part tree reductions return host affine
    sums.  Motivating caller: the PST opening's log(nv) quotient MSMs
    (ark MultilinearPC::open's per-variable witness commitments), which
    previously cost one device round trip each."""
    from . import pallas_curve as pcu
    from . import curve as jc_

    if not _use_packed() or any(p[1].shape[0] > 1024 for p in parts):
        fn = msm_g1 if group_name == "g1" else msm_g2
        return [fn(pts, scal) for pts, scal in parts]
    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    to_aff = (
        jc_.g1_to_affine_host if group_name == "g1" else jc_.g2_to_affine_host
    )
    padded_pts, padded_scal, bounds = [], [], []
    off = 0
    for pts, scal in parts:
        n = scal.shape[0]
        tgt = max(128, n + (-n) % 128)
        pts, scal = _pad_to(pts, scal, tgt)
        padded_pts.append(pts)
        padded_scal.append(scal)
        bounds.append((off, off + tgt))
        off += tgt
    cat_pts = tree_map(
        lambda *cs: jnp.concatenate(cs, axis=0), *padded_pts
    )
    cat_scal = jnp.concatenate(padded_scal, axis=0)
    acc = Gp.ladder(Gp.pack(cat_pts), cat_scal.T)
    outs = []
    for lo, hi in bounds:
        red = Gp.tree_reduce(acc[:, lo:hi])
        outs.append(to_aff(Gp.unpack(red))[0])
    return outs


# -- multi-MSM over one shared basis: fixed-base shared-table design --------
#
# sqrt-PST commits K column polys against ONE basis (sqrt_pst.rs:120-126).
# Pippenger per column would copy every point W times through HBM (small
# N => large W) and pay heavy bucket-run padding.  Instead precompute
# T[j][d] = d*G_j for d < 2^c once (B-1 fused adds, reused by ALL columns),
# then each (column, window) sum is a straight N-step masked accumulation
# of gathered table rows — work-optimal W*N adds per column, no sort, no
# padding, digit-0 lanes land on the stored identity row.

# Lane-chunk width for the fixed-base table scan (patched down in tests so
# the chunked path runs at CPU-interpretable sizes).
_TAB_NC = 1024


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _multi_msm_packed_impl(group_name, ptcat, scal: jnp.ndarray, c: int, kc: int,
                           tab_nc: int = 1024):
    from . import pallas_curve as pcu

    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    K, N, nl = scal.shape
    B = 1 << c
    W = (16 * nl) // c

    # table[j*B + d] = d * G_j (standard row layout, identity at d = 0).
    # Empirically the fused add2 kernel at TWO grid steps inside this
    # lax.scan body (first reached at Spark scale, N = 2048) faulted the
    # TPU worker; chunking the scan to <=tab_nc-lane column blocks keeps
    # the in-loop launch at grid=1, which is the configuration validated
    # on hardware.  (Whether grid>1 launches fault in OTHER loop bodies
    # was not established — only this scan's add2 was observed to fault.)
    base = ptcat.T  # (rows, N) packed

    def tab_build(base_c):
        identc = Gp.identity_packed(base_c.shape[1])

        def tab_step(prev, _):
            nxt = Gp.add2(prev, base_c)
            return nxt, prev

        _, tabc = jax.lax.scan(tab_step, identc, None, length=B)
        return tabc  # (B, rows, Nc)

    NC = tab_nc
    if N > NC:
        tab = jnp.concatenate(
            [tab_build(base[:, off : off + NC]) for off in range(0, N, NC)],
            axis=2,
        )
    else:
        tab = tab_build(base)
    # tab: (B, rows, N) with tab[d] = d * G; -> (N*B, rows) standard rows
    table_std = tab.transpose(2, 0, 1).reshape(N * B, Gp.rows)

    digits = _digits_from_scalars(scal.reshape(K * N, nl), c)  # (W, K*N)
    digits = digits.reshape(W, K, N)
    counts = jnp.full((kc * W,), N, dtype=jnp.int32)

    def chunk(dig_c):
        # dig_c: (W, kc, N) -> runs (N, rows, kc*W) lanes k-major
        idx = dig_c.transpose(2, 1, 0) + (jnp.arange(N, dtype=jnp.int32) * B)[
            :, None, None
        ]  # (N, kc, W)
        entries = table_std[idx.reshape(-1)]  # (N*kc*W, rows)
        runs = (
            entries.reshape(N, kc * W, Gp.rows).transpose(0, 2, 1)
        )  # (N, rows, kc*W)
        return Gp.bucket_phase(runs, counts)  # (rows, kc*W)

    nchunks = K // kc
    dig_chunks = digits.reshape(W, nchunks, kc, N).transpose(1, 0, 2, 3)
    accs = jax.lax.map(chunk, dig_chunks)  # (nchunks, rows, kc*W)
    wins = accs.transpose(1, 0, 2).reshape(Gp.rows, K, W)
    return wins


@partial(jax.jit, static_argnums=(0, 2))
def _multi_horner_packed(group_name, wins, c: int):
    """wins (rows, K, W) -> (rows, K): 2^{cw} ladder + fold over W."""
    from . import pallas_curve as pcu
    from .field import FR

    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    rows, K, W = wins.shape
    pows = np.zeros((W, FR.nlimbs), dtype=np.uint32)
    for w in range(W):
        v = 1 << (c * w)
        for i in range(FR.nlimbs):
            pows[w, i] = (v >> (16 * i)) & 0xFFFF
    lanes = K * W
    lanes_p = lanes + (-lanes) % 128
    flat = jnp.pad(wins.reshape(rows, lanes), ((0, 0), (0, lanes_p - lanes)))
    scal = jnp.tile(jnp.asarray(pows), (K, 1))
    scal = jnp.pad(scal, ((0, lanes_p - lanes), (0, 0))).T  # (nl, lanes_p)
    acc = Gp.ladder(flat, scal)[:, :lanes].reshape(rows, K, W)
    while W > 1:
        half = W // 2
        a = acc[:, :, :half].reshape(rows, K * half)
        b = acc[:, :, half:].reshape(rows, K * half)
        pad = (-(K * half)) % 128
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
            b = jnp.pad(b, ((0, 0), (0, pad)))
        acc = Gp.add2(a, b)[:, : K * half].reshape(rows, K, half)
        W = half
    return acc.reshape(rows, K)


def _multi_msm_packed(group_name, points, scalars_canon: jnp.ndarray, c: int = 8):
    """K MSMs over one shared basis -> standard projective pytree (K, ...)."""
    from . import pallas_curve as pcu

    Gp = pcu.G1P if group_name == "g1" else pcu.G2P
    k_orig, N, nl = scalars_canon.shape
    K = k_orig
    W = (16 * nl) // c
    # chunk K so the gathered runs tensor stays under ~600 MB, then grow
    # the chunk until its lane count (kc*W) is a 128 multiple; pad K with
    # zero-scalar columns so kc divides it (sliced back off below)
    budget = 600 * (1 << 20)
    kc = max(1, budget // (W * N * Gp.rows * 4))
    kc = min(kc, K)
    while (kc * W) % 128:
        kc += 1
    padk = (-K) % kc
    if padk:
        scalars_canon = jnp.pad(scalars_canon, ((0, padk), (0, 0), (0, 0)))
        K = K + padk
    ptcat = _cat_points(group_name, points)
    # _TAB_NC read at call time and passed as a static arg, so tests that
    # patch it get their own jit cache entry (ADVICE r3: the patch used to
    # bypass the cache key)
    wins = _multi_msm_packed_impl(
        group_name, ptcat, scalars_canon, c, kc, _TAB_NC
    )
    # Horner-combine in K-chunks: one giant ladder (K*W lanes, 131k at
    # Spark 2^20 sizes) faulted the TPU worker — and so did 16k-lane
    # chunks; 256 columns = 8192 lanes is the configuration every other
    # ladder launch runs at and is hardware-validated.
    KH = 256
    if K > KH:
        parts = []
        for off in range(0, K, KH):
            parts.append(
                _multi_horner_packed(
                    group_name, wins[:, off : off + KH], c
                )
            )
        out = jnp.concatenate(parts, axis=1)
    else:
        out = _multi_horner_packed(group_name, wins, c)
    res = Gp.unpack(out)
    if K != k_orig:
        res = tree_map(lambda a: a[:k_orig], res)
    return res


def _mesh_for_batch(n: int):
    """The ambient prover mesh, when the batch is worth sharding."""
    from ..parallel import mesh as pmesh

    mesh = pmesh.active_mesh()
    if mesh is None:
        return None
    D = int(mesh.devices.size)
    if D < 2 or n <= _SMALL_N or n < 2 * D:
        return None
    return mesh


def msm_pipeline(group_name, points, scal: jnp.ndarray, c: int | None = None,
                 affine: bool = False):
    """Single-device MSM as a resumable pipeline (generator).

    Yields at host-sync boundaries; the generator's return value is the
    host affine result.  parallel/mesh.sharded_msm drives one pipeline per
    device round-robin so every device's kernels are dispatched before any
    device's sync blocks the host."""
    to_aff = (
        jc.g1_to_affine_host if group_name == "g1" else jc.g2_to_affine_host
    )
    if scal.shape[0] <= _SMALL_N:
        if _use_packed():
            res = _msm_small_packed(group_name, points, scal)
        else:
            points, scal = _pad_to(points, scal, _SMALL_N)
            res = _msm_small_device(group_name, points, scal)
        yield
        return to_aff(res)[0]
    points, scal = _pad_pow2(points, scal)
    if _use_packed():
        # c=None -> signed-window default inside _msm_packed_gen
        res = yield from _msm_packed_gen(group_name, points, scal, c, affine)
        return to_aff(res)[0]
    if c is None:
        c = _pick_window(scal.shape[0])
    windows = _msm_windows(group_name, points, scal, c)
    yield
    return _combine_windows_host(windows, c, group_name)


def msm_g1(points, scalars: Sequence[int] | jnp.ndarray, c: int | None = None,
           affine: bool = False):
    """MSM over G1: device projective point pytree x scalars -> host affine.

    `scalars` are host ints or canonical-form (non-Montgomery) Fr limbs.
    `affine=True` asserts every point has Z = mont(1) (a fresh lift of
    affine bases — the reference VariableBaseMSM contract) and enables
    mixed adds in the bucket phase.  With an ambient mesh
    (parallel.mesh.use_mesh) the batch shards across devices
    (result-level DP, see parallel/mesh.py).
    """
    scal = _prep_scalars(scalars)
    mesh = _mesh_for_batch(scal.shape[0])
    if mesh is not None:
        from ..parallel import mesh as pmesh

        return pmesh.sharded_msm(mesh, "g1", points, scal, c, affine)
    return _drive_one(msm_pipeline("g1", points, scal, c, affine))


def msm_g2(points, scalars: Sequence[int] | jnp.ndarray, c: int | None = None,
           affine: bool = False):
    scal = _prep_scalars(scalars)
    mesh = _mesh_for_batch(scal.shape[0])
    if mesh is not None:
        from ..parallel import mesh as pmesh

        return pmesh.sharded_msm(mesh, "g2", points, scal, c, affine)
    return _drive_one(msm_pipeline("g2", points, scal, c, affine))


# ---------------------------------------------------------------------------
# Generic prime-field groups (BW6-761 etc., tpu/curve_generic.py)
# ---------------------------------------------------------------------------


def msm_fp(G, host_add, points, scalars_canon: jnp.ndarray, c: int | None = None):
    """MSM for a generic FpGroup: device projective points x canonical
    16-bit-limb scalars (any width) -> host affine result.

    `G` must be hashable (it keys the jit cache); `host_add` is the host
    affine addition for the final O(bits) Horner combine."""
    if scalars_canon.shape[0] <= _SMALL_N:
        points, scal = _pad_to(points, scalars_canon, _SMALL_N)
        return G.to_affine_host(_msm_small_device(G, points, scal))[0]
    if c is None:
        c = _pick_window(scalars_canon.shape[0])
    points, scal = _pad_pow2(points, scalars_canon)
    windows = _msm_windows(G, points, scal, c)
    pts = G.to_affine_host(windows)
    acc = None
    for pt in reversed(pts):
        if acc is not None:
            for _ in range(c):
                acc = host_add(acc, acc)
        acc = host_add(acc, pt)
    return acc
