"""Multi-chip sharding for the prover's hot paths.

The reference's only parallelism is single-host rayon (SURVEY.md §2.4);
here the same axes become first-class mesh shardings:

  - sumcheck tables: the fold pairs (i, i + n/2) are kept device-local by
    storing tables as (lo, hi) halves sharded along the element axis, so a
    round needs NO communication for the fold and one psum of the 3 (or 2)
    round evaluations;
  - MSM: points/scalars shard along the batch axis; each chip sorts and
    accumulates its own bucket partials, which are then combined with a
    log-depth EC tree over an all_gather (EC addition is not a psum-able
    reduction — coordinates don't add pointwise);
  - sqrt-PST column commitments: columns shard across chips (each column's
    MSM is chip-local), mirroring the rayon par_iter at sqrt_pst.rs:120.

All functions work on any jax.sharding.Mesh with axis "shard" — ICI on a
real slice, the virtual CPU mesh in tests.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _shard_map(fn, mesh, in_specs, out_specs):
    # check_vma=False: bucket/window accumulators are created inside loops
    # from constants, which trips the varying-manual-axes typer; collective
    # structure here is explicit (psum / all_gather), so the check is
    # safely disabled.
    try:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except TypeError:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )

from ..tpu import curve as jc
from ..tpu import field as jf
from ..tpu import msm
from ..tpu.field import FR

tree_map = jax.tree_util.tree_map

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (AXIS,))


def shard_table(mesh: Mesh, lo: jnp.ndarray, hi: jnp.ndarray):
    """Place the (lo, hi) halves of a sumcheck table on the mesh."""
    sh = NamedSharding(mesh, P(AXIS, None))
    return jax.device_put(lo, sh), jax.device_put(hi, sh)


def sharded_quad_round(mesh: Mesh):
    """Returns a jitted fn: one phase-2 sumcheck round over sharded halves.

    (A_lo, A_hi, B_lo, B_hi) -> (evals (2, 16), A_lo', A_hi', B_lo', B_hi')
    where evals are the full (psum-reduced) evaluations at {0, 2} and the
    primed tables are the r-bound halves re-split for the next round.
    """

    def per_shard(a_lo, a_hi, b_lo, b_hi, r):
        e0_part = _partial_sum(jf.mont_mul(FR, a_lo, b_lo))
        a2 = jf.sub(FR, jf.add(FR, a_hi, a_hi), a_lo)
        b2 = jf.sub(FR, jf.add(FR, b_hi, b_hi), b_lo)
        e2_part = _partial_sum(jf.mont_mul(FR, a2, b2))
        # psum adds limb vectors coordinate-wise (relaxed limbs); fold back
        # into canonical residues afterwards
        evals = jf._fold_wide(
            FR, jax.lax.psum(jnp.stack([e0_part, e2_part]), AXIS)
        )
        # fold with r (broadcast (16,) canonical Montgomery scalar)
        a_new = jf.add(FR, a_lo, jf.mont_mul(FR, jf.sub(FR, a_hi, a_lo), r))
        b_new = jf.add(FR, b_lo, jf.mont_mul(FR, jf.sub(FR, b_hi, b_lo), r))
        return evals, a_new, b_new

    spec = P(AXIS, None)
    return jax.jit(
        _shard_map(per_shard, mesh, (spec, spec, spec, spec, P(None)),
                   (P(None), spec, spec))
    )


def _partial_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Local mod-p sum of a (n, 16) table -> (16,)."""
    return jf.reduce_sum(FR, x)


def sharded_msm_bucket_phase(mesh: Mesh, c: int):
    """Returns a jitted fn computing per-window MSM sums over sharded points.

    (points (X, Y, Z) sharded on batch, digit matrix (W, N) sharded on N)
    -> (W,) projective sums, combined across chips with a log-depth EC tree
    over an all_gather of per-chip bucket partials.
    """
    nbuckets = 1 << c

    def per_shard(px, py, pz, digits):
        points = (px, py, pz)

        def one_window(dig):
            buckets = msm._bucket_accumulate(msm._G1, points, dig, nbuckets)
            return msm._weighted_bucket_sum(msm._G1, buckets, c)

        local = jax.lax.map(one_window, digits)  # (W,) points, local partials
        # combine partials across chips: gather then tree-add
        gathered = tree_map(
            lambda coord: jax.lax.all_gather(coord, AXIS), local
        )  # (D, W, ...)
        ndev = mesh.devices.size
        acc = tree_map(lambda coord: coord[0], gathered)
        for d in range(1, ndev):
            acc = jc.g1_add(acc, tree_map(lambda coord, dd=d: coord[dd], gathered))
        return acc

    spec_pt = P(AXIS, None)
    return jax.jit(
        _shard_map(per_shard, mesh, (spec_pt, spec_pt, spec_pt, P(None, AXIS)),
                   (P(None), P(None), P(None)))
    )


def sharded_column_commit(mesh: Mesh):
    """sqrt-PST column commitments: columns sharded across chips; each chip
    runs the shared-basis Pippenger over its columns (basis replicated)."""

    def per_shard(cols_canon, bx, by, bz):
        basis = (bx, by, bz)
        c = 4

        def one_col(scal):
            wins = msm._msm_windows_impl("g1", basis, scal, c)
            W = wins[0].shape[0]

            # on-device Horner combine (loop-rolled to keep the graph small)
            def horner(i, acc):
                w = W - 2 - i
                for _ in range(c):
                    acc = jc.g1_double(acc)
                step = tree_map(lambda coord: coord[w], wins)
                return jc.g1_add(acc, step)

            acc0 = tree_map(lambda coord: coord[-1], wins)
            return jax.lax.fori_loop(0, W - 1, horner, acc0)

        return jax.lax.map(one_col, cols_canon)

    return jax.jit(
        _shard_map(per_shard, mesh,
                   (P(AXIS, None, None), P(None, None), P(None, None), P(None, None)),
                   (P(AXIS, None), P(AXIS, None), P(AXIS, None)))
    )
