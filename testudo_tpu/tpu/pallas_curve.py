"""Fused Pallas TPU kernels for complete EC group operations.

Round-1 measured the MSM at 0.72% of target: every RCB16 point add ran as
~100 separate XLA/Pallas dispatches (one pallas_call per mont_mul, XLA ops
for adds/carries) with an HBM round trip between every field op.  These
kernels execute ENTIRE group operations — 12 Montgomery muls plus all the
adds/subs/selects of the complete-addition formulas — in one pallas_call,
with every intermediate in VMEM.

Layout: "packed rows".  A batch of L points is one (3*ncomp*n, L) uint32
array — coordinate-major, limb rows on sublanes, batch on lanes — so each
limb row is a fully occupied (8, 128)-tiled VPU vector and no transposes
happen anywhere inside a kernel.  ncomp = 1 for G1 (Fq coords), 2 for G2
(Fq2 coords as (c0, c1)).

Kernels (each one launch per batch tile):
  add_mask(acc, pts, mask)   -> mask ? acc+pts : acc        [bucket phase]
  step(acc, base, mask)      -> (mask ? acc+base : acc, 2*base)
                                                  [double-and-add chains]
  scan2(run, tot, bl)        -> (run+bl, tot+run+bl)  [weighted bucket scan]
  add2(a, b)                 -> a+b                        [tree reductions]
  ladder(points, scalars)    -> full 256-bit per-lane MSM ladder
                                                  [small MSMs, batch muls]

The field math reuses pallas_field's row helpers (ripple carries, constant
conditional subtract) and the group law reuses tpu.curve's staged RCB16
`_complete_add`/`_complete_double` evaluated over a row-ops namespace, so
results are bit-identical to the XLA path (tested in tests/test_pallas_curve).

Reference hot sites these serve: ark-ec VariableBaseMSM (sqrt_pst.rs:124,
198; mipp.rs:77-85), MIPP compression folds (mipp.rs:110-114).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field import LIMB_BITS, MASK, FieldSpec
from .pallas_field import _carry_ripple_rows, _cond_sub_p_rows, _limbs_of, _mont_mul_rows
from . import curve as jc


def _interpret() -> bool:
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return True


def _vmem_params(interp: bool) -> dict:
    """Raise the kernels' scoped-VMEM budget (v5e has 128 MB/core; the
    default 16 MB rejects the wide-group block mont-mul's (2n+1, 6L)
    accumulators at full lane width).  No-op in interpret mode."""
    if interp:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        )
    }


# ---------------------------------------------------------------------------
# Row-layout modular arithmetic with lazy reduction
#
# A field value inside a kernel is an `RV`: n canonical 16-bit limb rows
# plus a STATIC bound k meaning value < k*p.  Adds/subs ripple their
# carries but skip the conditional subtract entirely (the dominant cost
# of the old _add_rows_mod: ~120 of ~216 IR ops); Montgomery muls skip
# their final conditional subtract too (output < 2p whenever
# k(a)*k(b)*p <= R, which `mul_many` enforces by reducing operands only
# when needed).  Values are reduced to canonical (< p) exactly once, at
# kernel output boundaries (`finalize`), so packed arrays in HBM remain
# bit-identical to the strict path.  Bounds are tracked at trace time —
# zero runtime cost.  This removes ~35 conditional subtracts (~4,000 IR
# ops, each paying Mosaic's ~2.8-cycle per-op overhead) from every
# complete-add step.
# ---------------------------------------------------------------------------

_MASK_I = int(MASK)


class RV:
    """Limb rows + static integer bound: 0 <= value < k * p."""

    __slots__ = ("rows", "k")

    def __init__(self, rows, k):
        self.rows = list(rows)
        self.k = int(k)


jax.tree_util.register_pytree_node(
    RV,
    lambda v: (tuple(v.rows), v.k),
    lambda k, rows: RV(list(rows), k),
)


def _select_rows(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _mul_rows(a, b, n, p_limbs, npr_limbs):
    return _mont_mul_rows(
        jnp.stack(a), jnp.stack(b), n, p_limbs, npr_limbs, lazy=True
    )


# Wide-group multiplication: the RCB16 formulas' independent muls (groups
# of 6 for the complete add) lane-concatenate into ONE block mont-mul.
# Measured 1.35x per mul in an isolated kernel at 256 lanes
# (tools/exp_mulmany_wide.py, seq 1.05 us vs wide 0.78 us on top of the
# block formulation) — but a REGRESSION in the production kernels at 1024
# lanes (bench 2^20: 3.67 s vs 3.27 s block-only): the operand
# concatenations and result slices are real vreg copies there, and the
# 6-wide width overflows the 16 MB scoped-VMEM budget (raising it needs
# an --xla_tpu_scoped_vmem_limit_kib XLA flag deployment envs won't
# have).  Default OFF; kept for narrower-lane kernels and future tiles.
_WIDE_MULMANY = os.environ.get("TESTUDO_WIDE_MULMANY", "0") == "1"
_WIDE_MAX = 3072  # max concatenated lane width per fused mul


def _mul_rows_many(pairs, n, p_limbs, npr_limbs):
    """[(a_rows, b_rows), ...] -> [result_rows, ...], lane-concatenated
    into as few block mont-muls as the width cap allows."""
    if not _WIDE_MULMANY or len(pairs) == 1:
        return [_mul_rows(a, b, n, p_limbs, npr_limbs) for a, b in pairs]
    k = len(pairs)
    L = pairs[0][0][0].shape[-1]
    if k * L > _WIDE_MAX:
        mid = k // 2
        return _mul_rows_many(pairs[:mid], n, p_limbs, npr_limbs) + \
            _mul_rows_many(pairs[mid:], n, p_limbs, npr_limbs)
    A = jnp.concatenate([jnp.stack(a) for a, _ in pairs], axis=-1)
    B = jnp.concatenate([jnp.stack(b) for _, b in pairs], axis=-1)
    rows = _mont_mul_rows(A, B, n, p_limbs, npr_limbs, lazy=True)
    return [
        [r[..., i * L : (i + 1) * L] for r in rows] for i in range(k)
    ]


class _RowOpsFq:
    """curve._complete_add/_complete_double ops namespace over RV values
    (lazy-bound limb rows).  K_CARRY is the stable per-coordinate bound
    of complete-add/double outputs, used for loop-carried accumulators."""

    K_CARRY = 4

    def __init__(self, n, p_limbs, npr_limbs):
        self.n = n
        self.p = p_limbs
        self.npr = npr_limbs
        self.p_int = sum(int(l) << (LIMB_BITS * i) for i, l in enumerate(p_limbs))
        self.r_int = 1 << (LIMB_BITS * n)

    # -- bound bookkeeping --------------------------------------------------

    def _cap_ok(self, ka, kb):
        # Montgomery requirement T = a*b < R*p  =>  ka*kb*p <= R
        return ka * kb * self.p_int <= self.r_int

    def _reduce_once(self, v):
        """One conditional subtract of m*p: bound k -> ceil(k/2)."""
        m = max((v.k + 1) // 2, 1)
        rows = _cond_sub_p_rows(v.rows, None, _limbs_of(m * self.p_int, self.n))
        return RV(rows, m)

    def reduce_to(self, v, target):
        while v.k > target:
            m = max((v.k + 1) // 2, target)
            rows = _cond_sub_p_rows(
                v.rows, None, _limbs_of(m * self.p_int, self.n)
            )
            v = RV(rows, m)
        return v

    def clamp(self, v, k=None):
        """Normalize to an exact static bound (for loop-carry stability):
        reduce if above, relax the label if below."""
        k = self.K_CARRY if k is None else k
        v = self.reduce_to(v, k)
        return RV(v.rows, k) if v.k < k else v

    def finalize(self, v):
        """Kernel-boundary reduction to canonical (< p) rows."""
        return self.reduce_to(v, 1).rows

    # -- field ops ----------------------------------------------------------

    def add(self, a, b):
        k = a.k + b.k
        if k * self.p_int >= self.r_int:  # pragma: no cover - static guard
            raise ValueError(f"lazy add bound overflow: k={k}")
        rows, _ = _carry_ripple_rows(
            [x + y for x, y in zip(a.rows, b.rows)], self.n
        )
        return RV(rows, k)

    def smul(self, a, c):
        """Small-constant multiple (c <= 15): one scaled ripple."""
        k = a.k * c
        if k * self.p_int >= self.r_int:  # pragma: no cover - static guard
            raise ValueError(f"lazy smul bound overflow: k={k}")
        rows, _ = _carry_ripple_rows([np.uint32(c) * r for r in a.rows], self.n)
        return RV(rows, k)

    def sub(self, a, b):
        """a - b + k(b)*p via two's complement; single ripple, no fix-up."""
        k = a.k + b.k
        if k * self.p_int >= self.r_int:  # pragma: no cover - static guard
            raise ValueError(f"lazy sub bound overflow: k={k}")
        kbp = _limbs_of(b.k * self.p_int, self.n)
        rows = [
            a.rows[i] + (np.uint32(int(kbp[i]) + _MASK_I) - b.rows[i])
            for i in range(self.n)
        ]
        rows[0] = rows[0] + np.uint32(1)
        rows, _ = _carry_ripple_rows(rows, self.n)  # drops the 2^384 term
        return RV(rows, k)

    def mul_many(self, pairs):
        prepped = []
        for a, b in pairs:
            while not self._cap_ok(a.k, b.k):
                if a.k >= b.k:
                    a = self._reduce_once(a)
                else:
                    b = self._reduce_once(b)
            prepped.append((a, b))
        outs = _mul_rows_many(
            [(a.rows, b.rows) for a, b in prepped], self.n, self.p, self.npr
        )
        return [RV(o, 2) for o in outs]

    def mul_b3(self, x):
        # b = 1 for BLS12-377 G1: 3x in one scaled ripple
        return self.smul(x, 3)

    def mul_b3_pair(self, x, y):
        return self.mul_b3(x), self.mul_b3(y)

    def select(self, c, a, b):
        return RV(_select_rows(c, a.rows, b.rows), max(a.k, b.k))


class _RowOpsFq2:
    """Fq2 = Fq[u]/(u^2 + 5) row ops over (RV, RV) component pairs
    (matches tpu.curve fq2_* semantics)."""

    K_CARRY = 8

    def __init__(self, n, p_limbs, npr_limbs, b3_k_limbs):
        self.fq = _RowOpsFq(n, p_limbs, npr_limbs)
        self.b3_k = b3_k_limbs  # k = -3/5 mod p, Montgomery form (curve.py:_B3_K)

    def add(self, a, b):
        return (self.fq.add(a[0], b[0]), self.fq.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.fq.sub(a[0], b[0]), self.fq.sub(a[1], b[1]))

    def clamp(self, v, k=None):
        k = self.K_CARRY if k is None else k
        return (self.fq.clamp(v[0], k), self.fq.clamp(v[1], k))

    def mul_many(self, pairs):
        # batch the 3 Karatsuba Fq muls of EVERY pair into wide groups
        fq = self.fq
        fq_pairs = []
        for a, b in pairs:
            for x, y in (
                (a[0], b[0]),
                (a[1], b[1]),
                (fq.add(a[0], a[1]), fq.add(b[0], b[1])),
            ):
                while not fq._cap_ok(x.k, y.k):
                    if x.k >= y.k:
                        x = fq._reduce_once(x)
                    else:
                        y = fq._reduce_once(y)
                fq_pairs.append((x, y))
        res = _mul_rows_many(
            [(x.rows, y.rows) for x, y in fq_pairs], fq.n, fq.p, fq.npr
        )
        outs = []
        for i in range(len(pairs)):
            t0, t1, s = (RV(r, 2) for r in res[3 * i : 3 * i + 3])
            c1 = fq.sub(fq.sub(s, t0), t1)  # k = 6
            c0 = fq.sub(t0, fq.smul(t1, 5))  # c0 = t0 - 5 t1 (qnr -5), k = 12
            outs.append((fq.reduce_to(c0, 4), fq.reduce_to(c1, 4)))
        return outs

    def _mul1(self, a, b):
        return self.mul_many([(a, b)])[0]

    def mul_b3(self, x):
        # b3 * (a0 + a1 u) = (3 a1, k a0), k = -3/5 (curve.py:_G2Ops.mul_b3)
        fq = self.fq
        shape = x[0].rows[0].shape
        kc = RV([jnp.full(shape, np.uint32(l)) for l in self.b3_k], 1)
        a0 = x[0]
        while not fq._cap_ok(a0.k, 1):
            a0 = fq._reduce_once(a0)
        ka0 = RV(_mul_rows(a0.rows, kc.rows, fq.n, fq.p, fq.npr), 2)
        t3 = fq.smul(x[1], 3)
        return (t3, ka0)

    def mul_b3_pair(self, x, y):
        return self.mul_b3(x), self.mul_b3(y)

    def select(self, c, a, b):
        return (self.fq.select(c, a[0], b[0]), self.fq.select(c, a[1], b[1]))


# ---------------------------------------------------------------------------
# Kernel factories
# ---------------------------------------------------------------------------


def _spec_consts(modulus: int, n: int):
    p_limbs = _limbs_of(modulus, n)
    mont_r = 1 << (LIMB_BITS * n)
    npr = (-pow(modulus, -1, mont_r)) % mont_r
    return p_limbs, _limbs_of(npr, n)


def _point_rows(ref, ncomp, n, coord, comp=0):
    # rows are 1-D (tn,): Mosaic packs 1-D vectors densely across sublanes
    # ((1, tn) 2-D rows would waste 7/8 of every vreg)
    base = (coord * ncomp + comp) * n
    return [ref[base + k] for k in range(n)]


def _read_point(ref, ncomp, n, k=1):
    """HBM/VMEM packed point -> RV coordinates (canonical inputs: k=1)."""
    if ncomp == 1:
        return tuple(RV(_point_rows(ref, 1, n, c), k) for c in range(3))
    return tuple(
        (
            RV(_point_rows(ref, 2, n, c, 0), k),
            RV(_point_rows(ref, 2, n, c, 1), k),
        )
        for c in range(3)
    )


def _write_point(ref, pt, ncomp, n, F):
    """Reduce coordinates to canonical (< p) and write: packed arrays in
    HBM stay bit-identical to the strict-reduction path."""
    for c in range(3):
        if ncomp == 1:
            rows = F.finalize(pt[c])
            for k in range(n):
                ref[c * n + k] = rows[k]
        else:
            for comp in range(2):
                rows = F.fq.finalize(pt[c][comp])
                for k in range(n):
                    ref[(c * 2 + comp) * n + k] = rows[k]


def _clamp_point(F, pt):
    """Normalize all coordinate bounds to F.K_CARRY (loop-carry typing)."""
    return tuple(F.clamp(c) for c in pt)


def _ident_point(shape, ncomp, r_mod_p_limbs):
    nl = len(r_mod_p_limbs)
    z = lambda: RV([jnp.zeros(shape, jnp.uint32) for _ in range(nl)], 1)
    one = RV([jnp.full(shape, np.uint32(l)) for l in r_mod_p_limbs], 1)
    if ncomp == 1:
        return (z(), one, z())
    return ((z(), z()), (one, z()), (z(), z()))


def _make_ops(modulus: int, n: int, ncomp: int, b3_k: int | None):
    p_limbs, npr_limbs = _spec_consts(modulus, n)
    if ncomp == 1:
        return _RowOpsFq(n, p_limbs, npr_limbs)
    return _RowOpsFq2(n, p_limbs, npr_limbs, _limbs_of(b3_k, n))


@functools.lru_cache(maxsize=None)
def _ec_call(op: str, modulus: int, n: int, ncomp: int, b3_k, tn: int, nscal: int = 0):
    """Build the jitted pallas_call wrapper for one EC kernel variant."""
    F = _make_ops(modulus, n, ncomp, b3_k)
    rows = 3 * ncomp * n
    interp = _interpret()

    def pt_spec():
        return pl.BlockSpec((rows, tn), lambda i: (0, i), memory_space=pltpu.VMEM)

    def mask_spec():
        return pl.BlockSpec((8, tn), lambda i: (0, i), memory_space=pltpu.VMEM)

    if op == "add_mask":

        def kernel(acc_ref, pts_ref, mask_ref, o_ref):
            acc = _read_point(acc_ref, ncomp, n)
            pts = _read_point(pts_ref, ncomp, n)
            s = jc._complete_add(F, acc, pts)
            m = mask_ref[0] != 0
            out = tuple(F.select(m, s[c], acc[c]) for c in range(3))
            _write_point(o_ref, out, ncomp, n, F)

        in_specs = [pt_spec(), pt_spec(), mask_spec()]
        n_out = 1
    elif op == "add2":

        def kernel(a_ref, b_ref, o_ref):
            a = _read_point(a_ref, ncomp, n)
            b = _read_point(b_ref, ncomp, n)
            _write_point(o_ref, jc._complete_add(F, a, b), ncomp, n, F)

        in_specs = [pt_spec(), pt_spec()]
        n_out = 1
    elif op == "step":

        def kernel(acc_ref, base_ref, mask_ref, oa_ref, ob_ref):
            acc = _read_point(acc_ref, ncomp, n)
            base = _read_point(base_ref, ncomp, n)
            s = jc._complete_add(F, acc, base)
            m = mask_ref[0] != 0
            out = tuple(F.select(m, s[c], acc[c]) for c in range(3))
            _write_point(oa_ref, out, ncomp, n, F)
            _write_point(ob_ref, jc._complete_double(F, base), ncomp, n, F)

        in_specs = [pt_spec(), pt_spec(), mask_spec()]
        n_out = 2
    elif op == "scan2":

        def kernel(run_ref, tot_ref, bl_ref, or_ref, ot_ref):
            run = _read_point(run_ref, ncomp, n)
            tot = _read_point(tot_ref, ncomp, n)
            bl = _read_point(bl_ref, ncomp, n)
            run2 = jc._complete_add(F, run, bl)
            tot2 = jc._complete_add(F, tot, run2)
            _write_point(or_ref, run2, ncomp, n, F)
            _write_point(ot_ref, tot2, ncomp, n, F)

        in_specs = [pt_spec(), pt_spec(), pt_spec()]
        n_out = 2
    elif op == "scan2b":
        # run' = run + bl ; tot' = tot + run (old run): two independent adds
        def kernel(run_ref, tot_ref, bl_ref, or_ref, ot_ref):
            run = _read_point(run_ref, ncomp, n)
            tot = _read_point(tot_ref, ncomp, n)
            bl = _read_point(bl_ref, ncomp, n)
            _write_point(or_ref, jc._complete_add(F, run, bl), ncomp, n, F)
            _write_point(ot_ref, jc._complete_add(F, tot, run), ncomp, n, F)

        in_specs = [pt_spec(), pt_spec(), pt_spec()]
        n_out = 2
    elif op in ("bucket", "bucket_mixed"):
        # Whole bucket-accumulation phase in ONE pallas_call: for every
        # bucket lane, sequentially add its run-aligned points (step t adds
        # point t where t < counts[lane]).  The true step count arrives as
        # a scalar-prefetch arg and the run tensor stays in HBM, streamed
        # in with double-buffered DMA — so ONE compiled executable serves
        # every run length (the T axis is only padded in memory, never in
        # compute).  Accumulators live in registers/VMEM for the whole loop.
        # "bucket_mixed": the streamed points are affine (Z = mont(1)),
        # so each step runs the cheaper complete mixed add (Alg 8); the
        # caller guarantees no identity point is ever UNMASKED in a run.
        mixed = op == "bucket_mixed"
        r_mod_p = _limbs_of((1 << (LIMB_BITS * n)) % modulus, n)

        def kernel(tlen_ref, counts_ref, runs_hbm, o_ref, buf, sem):
            j = pl.program_id(0)
            # Per-TILE loop bound: lanes are sorted by (window, bucket), so
            # neighboring lanes have similar run lengths and most tiles
            # finish far before the global max — padding lanes (count 0)
            # and short-run tiles cost (almost) nothing.  This is what
            # makes power-of-two lane rounding affordable (bounded
            # executable variety without paying T_cap * pad lane-steps).
            T = jnp.minimum(tlen_ref[0], jnp.max(counts_ref[:]))
            T = jnp.maximum(T, 1)

            def get_dma(slot, t):
                return pltpu.make_async_copy(
                    runs_hbm.at[t, :, pl.ds(j * tn, tn)],
                    buf.at[slot],
                    sem.at[slot],
                )

            get_dma(0, 0).start()
            # The loop-carried accumulator keeps the lazy bound K_CARRY:
            # every iteration's complete-add output lands exactly there,
            # so NO conditional subtracts run inside the loop at all —
            # one boundary reduction per tile after the loop.
            acc0 = _clamp_point(F, _ident_point((tn,), ncomp, r_mod_p))

            def body(t, acc):
                slot = t % 2

                @pl.when(t + 1 < T)
                def _():
                    get_dma((t + 1) % 2, t + 1).start()

                get_dma(slot, t).wait()
                pts = _read_point(buf.at[slot], ncomp, n)
                if mixed:
                    s = jc._complete_add_mixed(F, acc, (pts[0], pts[1]))
                else:
                    s = jc._complete_add(F, acc, pts)
                m = jnp.broadcast_to(t < counts_ref[0], (tn,))
                out = tuple(F.select(m, s[c], acc[c]) for c in range(3))
                return _clamp_point(F, out)

            acc = jax.lax.fori_loop(0, T, body, acc0)
            _write_point(o_ref, acc, ncomp, n, F)

        @jax.jit
        def bucket_call(tlen, counts8, runs):
            _, _, L_in = runs.shape
            pad = (-L_in) % tn  # pad tail lanes to a whole tile, slice back
            if pad:
                runs = jnp.pad(runs, ((0, 0), (0, 0), (0, pad)))
                counts8 = jnp.pad(counts8, ((0, 0), (0, pad)))
            L = L_in + pad
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(L // tn,),
                in_specs=[
                    pl.BlockSpec((8, tn), lambda j, *_: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((rows, tn), lambda j, *_: (0, j),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, rows, tn), jnp.uint32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            out = pl.pallas_call(
                kernel,
                grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((rows, L), jnp.uint32),
                interpret=interp,
                **_vmem_params(interp),
            )(tlen, counts8, runs)
            return out[:, :L_in] if pad else out

        return bucket_call
    else:  # pragma: no cover
        raise ValueError(op)

    out_spec = pt_spec()
    if n_out == 2:
        out_spec = (pt_spec(), pt_spec())

    @jax.jit
    def call(*args):
        L_in = args[0].shape[1]
        pad = (-L_in) % tn  # pad tail lanes to a whole tile, slice back
        if pad:
            args = tuple(jnp.pad(a, ((0, 0), (0, pad))) for a in args)
        L = L_in + pad
        grid = L // tn
        out_shape = jax.ShapeDtypeStruct((rows, L), jnp.uint32)
        if n_out == 2:
            out_shape = (out_shape, jax.ShapeDtypeStruct((rows, L), jnp.uint32))
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interp,
            **_vmem_params(interp),
        )(*args)
        if pad:
            out = jax.tree_util.tree_map(lambda o: o[:, :L_in], out)
        return out

    return call


# ---------------------------------------------------------------------------
# Public packed-layout API
# ---------------------------------------------------------------------------

_TN = 1024


def _tile(L: int) -> int:
    return min(_TN, L)


def _pad_lanes(a: jnp.ndarray, mult: int) -> jnp.ndarray:
    L = a.shape[-1]
    pad = (-L) % mult
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    return a


class PackedGroup:
    """One EC group in packed-rows layout (G1: ncomp=1, G2: ncomp=2)."""

    def __init__(self, name: str, spec: FieldSpec, ncomp: int, b3_k: int | None):
        self.name = name
        self.spec = spec
        self.ncomp = ncomp
        self.b3_k = b3_k
        self.rows = 3 * ncomp * spec.nlimbs

    def _key(self):
        return (self.spec.modulus, self.spec.nlimbs, self.ncomp, self.b3_k)

    # -- layout ------------------------------------------------------------

    def pack(self, p):
        """Standard pytree point batch (leading batch axis, trailing limb
        axis) -> (rows, L) packed array."""
        coords = []
        for c in range(3):
            if self.ncomp == 1:
                coords.append(p[c].reshape(-1, self.spec.nlimbs).T)
            else:
                coords.append(p[c][0].reshape(-1, self.spec.nlimbs).T)
                coords.append(p[c][1].reshape(-1, self.spec.nlimbs).T)
        return jnp.concatenate(coords, axis=0)

    def unpack(self, a: jnp.ndarray):
        n = self.spec.nlimbs
        outs = []
        for c in range(3):
            if self.ncomp == 1:
                outs.append(a[c * n : (c + 1) * n].T)
            else:
                outs.append(
                    (
                        a[(2 * c) * n : (2 * c + 1) * n].T,
                        a[(2 * c + 1) * n : (2 * c + 2) * n].T,
                    )
                )
        return tuple(outs)

    def identity_packed(self, L: int) -> jnp.ndarray:
        n = self.spec.nlimbs
        r1 = np.asarray(_limbs_of(self.spec.r_mod_p, n), dtype=np.uint32)
        a = np.zeros((self.rows, L), dtype=np.uint32)
        ybase = self.ncomp * n  # Y coordinate c0 rows
        a[ybase : ybase + n] = r1[:, None]
        return jnp.asarray(a)

    # -- fused ops ---------------------------------------------------------

    def _mask8(self, mask: jnp.ndarray) -> jnp.ndarray:
        return jnp.broadcast_to(mask[None, :].astype(jnp.uint32), (8, mask.shape[0]))

    def add_mask(self, acc, pts, mask):
        L = acc.shape[1]
        call = _ec_call("add_mask", *self._key(), _tile(L))
        return call(acc, pts, self._mask8(mask))

    def add2(self, a, b):
        L = a.shape[1]
        return _ec_call("add2", *self._key(), _tile(L))(a, b)

    def step(self, acc, base, mask):
        L = acc.shape[1]
        call = _ec_call("step", *self._key(), _tile(L))
        return call(acc, base, self._mask8(mask))

    def scan2(self, run, tot, bl):
        L = run.shape[1]
        return _ec_call("scan2", *self._key(), _tile(L))(run, tot, bl)

    def scan2b(self, run, tot, bl):
        L = run.shape[1]
        return _ec_call("scan2b", *self._key(), _tile(L))(run, tot, bl)

    def ladder(self, pts, scal_rows):
        """pts (rows, L) x canonical scalars (nscal_limbs, L) -> [s_l]P_l.

        LSB-first masked double-and-add: one fori_loop around the fused
        `step` kernel with XLA-extracted bit masks (an all-in-kernel ladder
        reliably crashes Mosaic's layout inference on 1-D loop carries)."""
        return _ladder_chain(self.name, pts, scal_rows)

    def bucket_phase(self, runs, counts, tlen=None, mixed=False):
        """runs (T_pad, rows, L) run-aligned points + counts (L,) ->
        (rows, L) per-bucket-lane sums.  One pallas_call; `tlen` (i32 (1,))
        bounds the actual step count so the padded T axis costs nothing.
        mixed=True: streamed points are affine (Z = mont(1)) and the
        kernel runs the cheaper complete mixed add (Z rows ignored)."""
        T, _, L = runs.shape
        # DMA lane slices must be 128-aligned (Mosaic memref_slice rule),
        # so the bucket tile is always a multiple of 128; the call wrapper
        # pads the lane axis up to the tile and slices back.  G2's 144
        # limb rows double the per-tile VMEM footprint (accumulators +
        # double-buffered DMA scratch + output block), which blows the
        # 16 MB scoped-vmem limit at tile 1024 — halve the tile for it.
        tn_max = _TN if self.ncomp == 1 else _TN // 2
        tn = min(tn_max, -(-L // 128) * 128)
        call = _ec_call("bucket_mixed" if mixed else "bucket", *self._key(), tn)
        counts8 = jnp.broadcast_to(
            counts[None, :].astype(jnp.int32), (8, counts.shape[0])
        )
        if tlen is None:
            tlen = jnp.asarray([T], jnp.int32)
        # clamp to >= 1: the kernel unconditionally starts the slot-0 DMA,
        # and tlen == 0 (all-zero scalars) would leave it unawaited
        tlen = jnp.maximum(tlen, 1)
        return call(tlen, counts8, runs)

    def tree_reduce(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fold (rows, L) down to (rows, 1) with log2(L) fused adds."""
        L = a.shape[1]
        while L > 1:
            half = L // 2
            lo = a[:, :half]
            hi = a[:, half : 2 * half]
            s = self.add2(_pad_lanes(lo, 128), _pad_lanes(hi, 128))[:, :half]
            if L % 2:
                s = jnp.concatenate([s, a[:, -1:]], axis=1)
                half += 1
            a = s
            L = half
        return a


@functools.partial(jax.jit, static_argnums=(0,))
def _ladder_chain(gname: str, pts: jnp.ndarray, scal_rows: jnp.ndarray):
    G = G1P if gname == "g1" else G2P
    nl = scal_rows.shape[0]
    masks = jnp.stack(
        [(scal_rows[k] >> b) & 1 for k in range(nl) for b in range(LIMB_BITS)],
        axis=0,
    )  # (nbits, L) LSB-first
    acc0 = G.identity_packed(pts.shape[1])

    def body(i, st):
        acc, base = st
        m = jax.lax.dynamic_index_in_dim(masks, i, 0, keepdims=False)
        return G.step(acc, base, m)

    acc, _ = jax.lax.fori_loop(0, nl * LIMB_BITS, body, (acc0, pts))
    return acc


from ..fields.bls12_377 import P as _P  # noqa: E402
from ..curves.host_curve import B2 as _B2  # noqa: E402
from .field import FQ as _FQ  # noqa: E402

_B3_K_INT = _FQ.to_mont_int((_B2.c1 * 3) % _P)

G1P = PackedGroup("g1", _FQ, 1, None)
G2P = PackedGroup("g2", _FQ, 2, _B3_K_INT)
