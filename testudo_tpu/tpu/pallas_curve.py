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
# Row-layout modular arithmetic (field element = list of n (L,) u32 rows)
# ---------------------------------------------------------------------------


def _add_rows_mod(a, b, p_limbs):
    n = len(p_limbs)
    rows, carry = _carry_ripple_rows([a[k] + b[k] for k in range(n)], n)
    return _cond_sub_p_rows(rows, carry, p_limbs)


def _sub_rows_mod(a, b, p_limbs):
    n = len(p_limbs)
    diff = []
    borrow = None
    for k in range(n):
        v = a[k] + np.uint32(1 << LIMB_BITS) - b[k]
        if borrow is not None:
            v = v - borrow
        diff.append(v & MASK)
        borrow = 1 - (v >> LIMB_BITS)  # 1 if a borrow was taken
    fixed, _ = _carry_ripple_rows(
        [diff[k] + np.uint32(p_limbs[k]) for k in range(n)], n
    )
    need = borrow != 0
    return [jnp.where(need, f, d) for f, d in zip(fixed, diff)]


def _select_rows(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _mul_rows(a, b, n, p_limbs, npr_limbs):
    return _mont_mul_rows(jnp.stack(a), jnp.stack(b), n, p_limbs, npr_limbs)


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
    rows = _mont_mul_rows(A, B, n, p_limbs, npr_limbs)
    return [
        [r[..., i * L : (i + 1) * L] for r in rows] for i in range(k)
    ]


class _RowOpsFq:
    """curve._complete_add/_complete_double ops namespace over limb rows."""

    def __init__(self, n, p_limbs, npr_limbs):
        self.n = n
        self.p = p_limbs
        self.npr = npr_limbs

    def add(self, a, b):
        return _add_rows_mod(a, b, self.p)

    def sub(self, a, b):
        return _sub_rows_mod(a, b, self.p)

    def mul_many(self, pairs):
        return _mul_rows_many(pairs, self.n, self.p, self.npr)

    def mul_b3(self, x):
        # b = 1 for BLS12-377 G1: 3x via two additions
        return _add_rows_mod(_add_rows_mod(x, x, self.p), x, self.p)

    def mul_b3_pair(self, x, y):
        return self.mul_b3(x), self.mul_b3(y)

    def select(self, c, a, b):
        return _select_rows(c, a, b)


class _RowOpsFq2:
    """Fq2 = Fq[u]/(u^2 + 5) row ops (matches tpu.curve fq2_* semantics)."""

    def __init__(self, n, p_limbs, npr_limbs, b3_k_limbs):
        self.fq = _RowOpsFq(n, p_limbs, npr_limbs)
        self.b3_k = b3_k_limbs  # k = -3/5 mod p, Montgomery form (curve.py:_B3_K)

    def add(self, a, b):
        return (self.fq.add(a[0], b[0]), self.fq.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.fq.sub(a[0], b[0]), self.fq.sub(a[1], b[1]))

    def _mul1(self, a, b):
        fq = self.fq
        t0 = _mul_rows(a[0], b[0], fq.n, fq.p, fq.npr)
        t1 = _mul_rows(a[1], b[1], fq.n, fq.p, fq.npr)
        s = _mul_rows(fq.add(a[0], a[1]), fq.add(b[0], b[1]), fq.n, fq.p, fq.npr)
        c1 = fq.sub(fq.sub(s, t0), t1)
        # c0 = t0 - 5 t1  (qnr = -5)
        t1_2 = fq.add(t1, t1)
        t1_4 = fq.add(t1_2, t1_2)
        c0 = fq.sub(t0, fq.add(t1_4, t1))
        return (c0, c1)

    def mul_many(self, pairs):
        # batch the 3 Karatsuba Fq muls of EVERY pair into wide groups
        fq = self.fq
        fq_pairs = []
        for a, b in pairs:
            fq_pairs.append((a[0], b[0]))
            fq_pairs.append((a[1], b[1]))
            fq_pairs.append(
                (fq.add(a[0], a[1]), fq.add(b[0], b[1]))
            )
        res = _mul_rows_many(fq_pairs, fq.n, fq.p, fq.npr)
        outs = []
        for i in range(len(pairs)):
            t0, t1, s = res[3 * i], res[3 * i + 1], res[3 * i + 2]
            c1 = fq.sub(fq.sub(s, t0), t1)
            t1_2 = fq.add(t1, t1)
            t1_4 = fq.add(t1_2, t1_2)
            c0 = fq.sub(t0, fq.add(t1_4, t1))
            outs.append((c0, c1))
        return outs

    def mul_b3(self, x):
        # b3 * (a0 + a1 u) = (3 a1, k a0), k = -3/5 (curve.py:_G2Ops.mul_b3)
        fq = self.fq
        shape = x[0][0].shape
        kc = [jnp.full(shape, np.uint32(l)) for l in self.b3_k]
        ka0 = _mul_rows(x[0], kc, fq.n, fq.p, fq.npr)
        t3 = fq.add(fq.add(x[1], x[1]), x[1])
        return (t3, ka0)

    def mul_b3_pair(self, x, y):
        return self.mul_b3(x), self.mul_b3(y)

    def select(self, c, a, b):
        return (_select_rows(c, a[0], b[0]), _select_rows(c, a[1], b[1]))


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


def _read_point(ref, ncomp, n):
    if ncomp == 1:
        return tuple(_point_rows(ref, 1, n, c) for c in range(3))
    return tuple(
        (_point_rows(ref, 2, n, c, 0), _point_rows(ref, 2, n, c, 1))
        for c in range(3)
    )


def _write_point(ref, pt, ncomp, n):
    for c in range(3):
        if ncomp == 1:
            for k in range(n):
                ref[c * n + k] = pt[c][k]
        else:
            for comp in range(2):
                for k in range(n):
                    ref[(c * 2 + comp) * n + k] = pt[c][comp][k]


def _ident_point(shape, ncomp, r_mod_p_limbs):
    z = [jnp.zeros(shape, jnp.uint32) for _ in range(len(r_mod_p_limbs))]
    one = [jnp.full(shape, np.uint32(l)) for l in r_mod_p_limbs]
    if ncomp == 1:
        return (list(z), one, list(z))
    zz = lambda: [jnp.zeros(shape, jnp.uint32) for _ in range(len(r_mod_p_limbs))]
    return ((zz(), zz()), (one, zz()), (zz(), zz()))


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
            _write_point(o_ref, out, ncomp, n)

        in_specs = [pt_spec(), pt_spec(), mask_spec()]
        n_out = 1
    elif op == "add2":

        def kernel(a_ref, b_ref, o_ref):
            a = _read_point(a_ref, ncomp, n)
            b = _read_point(b_ref, ncomp, n)
            _write_point(o_ref, jc._complete_add(F, a, b), ncomp, n)

        in_specs = [pt_spec(), pt_spec()]
        n_out = 1
    elif op == "step":

        def kernel(acc_ref, base_ref, mask_ref, oa_ref, ob_ref):
            acc = _read_point(acc_ref, ncomp, n)
            base = _read_point(base_ref, ncomp, n)
            s = jc._complete_add(F, acc, base)
            m = mask_ref[0] != 0
            out = tuple(F.select(m, s[c], acc[c]) for c in range(3))
            _write_point(oa_ref, out, ncomp, n)
            _write_point(ob_ref, jc._complete_double(F, base), ncomp, n)

        in_specs = [pt_spec(), pt_spec(), mask_spec()]
        n_out = 2
    elif op == "scan2":

        def kernel(run_ref, tot_ref, bl_ref, or_ref, ot_ref):
            run = _read_point(run_ref, ncomp, n)
            tot = _read_point(tot_ref, ncomp, n)
            bl = _read_point(bl_ref, ncomp, n)
            run2 = jc._complete_add(F, run, bl)
            tot2 = jc._complete_add(F, tot, run2)
            _write_point(or_ref, run2, ncomp, n)
            _write_point(ot_ref, tot2, ncomp, n)

        in_specs = [pt_spec(), pt_spec(), pt_spec()]
        n_out = 2
    elif op == "scan2b":
        # run' = run + bl ; tot' = tot + run (old run): two independent adds
        def kernel(run_ref, tot_ref, bl_ref, or_ref, ot_ref):
            run = _read_point(run_ref, ncomp, n)
            tot = _read_point(tot_ref, ncomp, n)
            bl = _read_point(bl_ref, ncomp, n)
            _write_point(or_ref, jc._complete_add(F, run, bl), ncomp, n)
            _write_point(ot_ref, jc._complete_add(F, tot, run), ncomp, n)

        in_specs = [pt_spec(), pt_spec(), pt_spec()]
        n_out = 2
    elif op == "bucket":
        # Whole bucket-accumulation phase in ONE pallas_call: for every
        # bucket lane, sequentially add its run-aligned points (step t adds
        # point t where t < counts[lane]).  The true step count arrives as
        # a scalar-prefetch arg and the run tensor stays in HBM, streamed
        # in with double-buffered DMA — so ONE compiled executable serves
        # every run length (the T axis is only padded in memory, never in
        # compute).  Accumulators live in registers/VMEM for the whole loop.
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
            acc0 = _ident_point((tn,), ncomp, r_mod_p)

            def body(t, acc):
                slot = t % 2

                @pl.when(t + 1 < T)
                def _():
                    get_dma((t + 1) % 2, t + 1).start()

                get_dma(slot, t).wait()
                pts = _read_point(buf.at[slot], ncomp, n)
                s = jc._complete_add(F, acc, pts)
                m = jnp.broadcast_to(t < counts_ref[0], (tn,))
                return tuple(F.select(m, s[c], acc[c]) for c in range(3))

            acc = jax.lax.fori_loop(0, T, body, acc0)
            _write_point(o_ref, acc, ncomp, n)

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
                    pl.BlockSpec(memory_space=pltpu.ANY),
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

    def bucket_phase(self, runs, counts, tlen=None):
        """runs (T_pad, rows, L) run-aligned points + counts (L,) ->
        (rows, L) per-bucket-lane sums.  One pallas_call; `tlen` (i32 (1,))
        bounds the actual step count so the padded T axis costs nothing."""
        T, _, L = runs.shape
        # DMA lane slices must be 128-aligned (Mosaic memref_slice rule),
        # so the bucket tile is always a multiple of 128; the call wrapper
        # pads the lane axis up to the tile and slices back.  G2's 144
        # limb rows double the per-tile VMEM footprint (accumulators +
        # double-buffered DMA scratch + output block), which blows the
        # 16 MB scoped-vmem limit at tile 1024 — halve the tile for it.
        tn_max = _TN if self.ncomp == 1 else _TN // 2
        tn = min(tn_max, -(-L // 128) * 128)
        call = _ec_call("bucket", *self._key(), tn)
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
