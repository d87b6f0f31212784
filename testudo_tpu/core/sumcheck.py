"""Sumcheck protocol: vectorized provers + host verifier.

TPU-native counterpart of /root/reference/src/sumcheck.rs.  Each round's
inner loop (evaluations at X = 0, 2, 3 over the half-table) is one
vectorized device computation followed by a 3-4 element host transfer; the
round loop itself is sequential by Fiat-Shamir necessity.  Tables halve via
poly.dense.bound_top, exactly mirroring the reference's
bound_poly_var_top-based folding.

Transcript behavior matches the reference:
  - prove_cubic_with_additive_term / prove_quad absorb every round
    polynomial coefficient with append_scalar (sumcheck.rs:127-129,
    423-425) and squeeze one challenge per round; they work with either an
    Fr- or Fq-sponge transcript (the snapshot threads an Fq transcript,
    r1csproof.rs:242; the upstream SNARK pipeline an Fr one).
  - prove_cubic (Spark/product-tree path) uses the same coefficient
    encoding (unipoly.rs:101-109).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import R
from ..poly import dense
from ..poly.unipoly import UniPoly
from ..tpu import field as jf
from ..tpu.field import FR


@dataclass
class SumcheckInstanceProof:
    polys: List[UniPoly]

    def verify(self, claim: int, num_rounds: int, degree_bound: int, transcript):
        """Host verifier (sumcheck.rs:29-63).  Returns (final_eval, r)."""
        m = self.polys[0].modulus if self.polys else R
        e = claim % m
        r: List[int] = []
        assert len(self.polys) == num_rounds
        for poly in self.polys:
            assert poly.degree() == degree_bound, "degree bound"
            assert (poly.eval_at_zero() + poly.eval_at_one()) % m == e, (
                "sumcheck round check failed"
            )
            poly.write_to_transcript(transcript)
            r_i = transcript.challenge_scalar(m)
            r.append(r_i)
            e = poly.evaluate(r_i)
        return e, r


# -- device round kernels ---------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def _round_evals_cubic_tau_s(spec, tau, A, B, C):
    """Evals at {0,2,3} of sum_i tau(X,i) (A(X,i) B(X,i) - C(X,i))."""
    n = tau.shape[0] // 2

    def comb(t, a, b, c):
        return jf.mont_mul(
            spec, t, jf.sub(spec, jf.mont_mul(spec, a, b), c)
        )

    los = [x[:n] for x in (tau, A, B, C)]
    his = [x[n:] for x in (tau, A, B, C)]
    e0 = jf.reduce_sum(spec, comb(*los))
    p2 = [jf.sub(spec, jf.add(spec, h, h), l) for l, h in zip(los, his)]
    e2 = jf.reduce_sum(spec, comb(*p2))
    p3 = [
        jf.add(spec, x2, jf.sub(spec, h, l)) for x2, l, h in zip(p2, los, his)
    ]
    e3 = jf.reduce_sum(spec, comb(*p3))
    return jnp.stack([e0, e2, e3])


@partial(jax.jit, static_argnums=(0,))
def _round_evals_cubic_prod_s(spec, A, B, C):
    """Evals at {0,2,3} of sum_i A B C (Spark product layer comb)."""
    n = A.shape[0] // 2

    def comb(a, b, c):
        return jf.mont_mul(spec, jf.mont_mul(spec, a, b), c)

    los = [x[:n] for x in (A, B, C)]
    his = [x[n:] for x in (A, B, C)]
    e0 = jf.reduce_sum(spec, comb(*los))
    p2 = [jf.sub(spec, jf.add(spec, h, h), l) for l, h in zip(los, his)]
    e2 = jf.reduce_sum(spec, comb(*p2))
    p3 = [jf.add(spec, x2, jf.sub(spec, h, l)) for x2, l, h in zip(p2, los, his)]
    e3 = jf.reduce_sum(spec, comb(*p3))
    return jnp.stack([e0, e2, e3])


@partial(jax.jit, static_argnums=(0,))
def _round_evals_quad_s(spec, A, B):
    n = A.shape[0] // 2
    los = [x[:n] for x in (A, B)]
    his = [x[n:] for x in (A, B)]
    e0 = jf.reduce_sum(spec, jf.mont_mul(spec, *los))
    p2 = [jf.sub(spec, jf.add(spec, h, h), l) for l, h in zip(los, his)]
    e2 = jf.reduce_sum(spec, jf.mont_mul(spec, *p2))
    return jnp.stack([e0, e2])


_round_evals_cubic_tau = partial(_round_evals_cubic_tau_s, FR)
_round_evals_cubic_prod = partial(_round_evals_cubic_prod_s, FR)
_round_evals_quad = partial(_round_evals_quad_s, FR)


def _pull(evals_dev, spec=FR) -> List[int]:
    return spec.decode(np.asarray(evals_dev))


# -- fused single-dispatch provers ------------------------------------------
#
# Through the axon tunnel every host<->device round trip costs ~50 ms and
# the looped provers below do two per round.  The fused variants run ALL
# rounds — round kernels, table folds, and the Poseidon transcript itself
# (tpu/sponge.py) — inside one jit, so a whole sumcheck is one dispatch.
# Transcript bit-exactness with the host path is guaranteed by the
# Montgomery-domain permutation equivalence and is covered by tests.

import os as _os

from ..tpu import sponge as dsponge

_TWO_INV = pow(2, -1, R)
_SIX_INV = pow(6, -1, R)


def _fused_enabled() -> bool:
    return _os.environ.get("TESTUDO_FUSED_SUMCHECK", "1") == "1"


def _fused_spark_enabled() -> bool:
    """Fused-prover gate for the Spark product-layer sumchecks
    (prove_cubic_batched).  Each GKR layer's fused graph is keyed by
    (num_rounds, k_par, k_seq, sponge mode/index) — no reuse across the
    ~2 log2(nnz) layers — so a COLD full-SNARK run pays one multi-minute
    remote compile per layer (~40 modules at 2^20).  The looped batched
    prover instead reuses the per-shape round kernels shared with the
    whole protocol.  TESTUDO_FUSED_SPARK=1/0 overrides; the default
    follows TESTUDO_FUSED_SUMCHECK (fused on), so long-lived provers
    keep best warm throughput and cold benches can opt out."""
    v = _os.environ.get("TESTUDO_FUSED_SPARK")
    if v is not None:
        return v == "1"
    return _fused_enabled()


def _mont_const(x: int) -> jnp.ndarray:
    return jnp.asarray(FR.encode(x % R))


def _unipoly_coeffs_dev(evals: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Device mirror of UniPoly.from_evals (unipoly.rs:26-49)."""
    fadd = lambda a, b: jf.add(FR, a, b)
    fsub = lambda a, b: jf.sub(FR, a, b)
    fmul = lambda a, b: jf.mont_mul(FR, a, b)
    if len(evals) == 3:
        e0, e1, e2 = evals
        c = e0
        a = fmul(_mont_const(_TWO_INV), fsub(fadd(fsub(e2, e1), c), e1))
        b = fsub(fsub(e1, c), a)
        return [c, b, a]
    e0, e1, e2, e3 = evals
    d = e0
    t3 = lambda x: fadd(fadd(x, x), x)
    a = fmul(
        _mont_const(_SIX_INV), fsub(fadd(t3(e1), e3), fadd(t3(e2), e0))
    )
    b = fmul(
        _mont_const(_TWO_INV),
        fsub(fadd(fadd(e0, e0), fadd(t3(e2), e2)), fadd(fadd(t3(e1), fadd(e1, e1)), e3)),
    )
    c = fsub(fsub(fsub(e1, d), a), b)
    return [d, c, b, a]


def _horner_dev(coeffs: List[jnp.ndarray], r: jnp.ndarray) -> jnp.ndarray:
    acc = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = jf.add(FR, jf.mont_mul(FR, acc, r), c)
    return acc


def _simulate_schedule(mode: int, index: int, num_rounds: int, ncoeffs: int):
    """Static replay of the sponge mode machine for the sumcheck schedule
    (absorb ncoeffs elems then squeeze 1, per round)."""
    from ..poseidon import constants_377 as C

    for _ in range(num_rounds):
        # absorb ncoeffs
        if mode == 1 or index == C.RATE:
            index = 0
        mode = 0
        for _ in range(ncoeffs):
            if index == C.RATE:
                index = 0
            index += 1
        # squeeze 1
        if mode == 0 or index == C.RATE:
            index = 0
        mode = 1
        if index == C.RATE:
            index = 0
        index += 1
    return mode, index


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _fused_prover_fn(kind: str, num_rounds: int, modulus: int, mode0: int,
                     index0: int):
    """One-dispatch sumcheck prover: returns a jitted fn taking
    (tables..., state0, e0) -> (coeffs, rs, claims, final_state)."""
    ntab = {"quad": 2, "cubic_tau": 4, "cubic": 3}[kind]
    ncoeffs = 3 if kind == "quad" else 4

    def fn(tables, state0, e0):
        tables = list(tables)
        sp = dsponge.DeviceSponge(
            dsponge._spec_of(modulus), state0, mode0, index0
        )
        dt = dsponge.DeviceTranscript(sp)
        e = e0
        all_coeffs, all_rs = [], []
        for _ in range(num_rounds):
            if kind == "quad":
                ev = _round_evals_quad(tables[0], tables[1])
                evals = [ev[0], jf.sub(FR, e, ev[0]), ev[1]]
            elif kind == "cubic_tau":
                ev = _round_evals_cubic_tau(*tables)
                evals = [ev[0], jf.sub(FR, e, ev[0]), ev[1], ev[2]]
            else:
                ev = _round_evals_cubic_prod(*tables)
                evals = [ev[0], jf.sub(FR, e, ev[0]), ev[1], ev[2]]
            coeffs = _unipoly_coeffs_dev(evals)
            for c in coeffs:
                dt.append_fr_mont(c)
            r = dt.challenge_fr_mont()
            tables = [dense.bound_top(t, r) for t in tables]
            e = _horner_dev(coeffs, r)
            all_coeffs.append(jnp.stack(coeffs))
            all_rs.append(r)
        claims = jnp.stack([t[0] for t in tables])
        return (
            jnp.stack(all_coeffs),  # (rounds, ncoeffs, nlimbs)
            jnp.stack(all_rs),  # (rounds, nlimbs)
            claims,  # (ntab, nlimbs)
            dt.sponge.state,
        )

    jitted = jax.jit(fn)
    final_mode, final_index = _simulate_schedule(
        mode0, index0, num_rounds, ncoeffs
    )
    return jitted, final_mode, final_index


def _prove_fused(kind: str, claim: int, num_rounds: int, tables, transcript):
    modulus = transcript.params.modulus
    sp = transcript.sponge
    fn, fmode, findex = _fused_prover_fn(
        kind, num_rounds, modulus, sp.mode, sp.index
    )
    spec = dsponge._spec_of(modulus)
    state0 = jnp.asarray(spec.encode(list(sp.state)))
    e0 = jnp.asarray(FR.encode(claim % R))
    coeffs_d, rs_d, claims_d, state_d = fn(tuple(tables), state0, e0)
    ncoeffs = coeffs_d.shape[1]
    coeffs = FR.decode(np.asarray(coeffs_d).reshape(-1, FR.nlimbs))
    rs = FR.decode(np.asarray(rs_d))
    claims = FR.decode(np.asarray(claims_d))
    sp.state = spec.decode(np.asarray(state_d))
    sp.mode, sp.index = fmode, findex
    polys = [
        UniPoly(coeffs[i * ncoeffs : (i + 1) * ncoeffs])
        for i in range(num_rounds)
    ]
    return SumcheckInstanceProof(polys), rs, claims


@_lru_cache(maxsize=None)
def _fused_prover_fn_sharded(kind: str, num_rounds: int, modulus: int,
                             mode0: int, index0: int, mesh):
    """Sharded one-dispatch sumcheck prover (parallel/mesh.py design):
    tables arrive in cyclic (D, n/D, limbs) layout sharded on axis 0, so
    every fold pair (i, i + n/2) is device-local; each round psums the
    2-3 round evaluations and runs the transcript replicated.  The last
    log2(D) rounds run on an all_gathered D-element remnant."""
    from ..parallel import mesh as pmesh

    ntab = {"quad": 2, "cubic_tau": 4, "cubic": 3}[kind]
    D = int(mesh.devices.size)
    num_global = D.bit_length() - 1
    num_local = num_rounds - num_global
    assert num_local >= 0

    def kernel(tables):
        if kind == "quad":
            return _round_evals_quad(tables[0], tables[1])
        if kind == "cubic_tau":
            return _round_evals_cubic_tau(*tables)
        return _round_evals_cubic_prod(*tables)

    def per_shard(*args):
        tables = [t.reshape(t.shape[1], t.shape[2]) for t in args[:ntab]]
        state0, e0 = args[ntab], args[ntab + 1]
        sp = dsponge.DeviceSponge(
            dsponge._spec_of(modulus), state0, mode0, index0
        )
        dt = dsponge.DeviceTranscript(sp)
        e = e0
        all_coeffs, all_rs = [], []
        for i in range(num_rounds):
            if i == num_local:
                # remnant: D elements, one per device -> replicate
                tables = [
                    jax.lax.all_gather(t, pmesh.AXIS).reshape(D, FR.nlimbs)
                    for t in tables
                ]
            ev = kernel(tables)
            if i < num_local:
                ev = jf._fold_wide(FR, jax.lax.psum(ev, pmesh.AXIS))
            if kind == "quad":
                evals = [ev[0], jf.sub(FR, e, ev[0]), ev[1]]
            else:
                evals = [ev[0], jf.sub(FR, e, ev[0]), ev[1], ev[2]]
            coeffs = _unipoly_coeffs_dev(evals)
            for c in coeffs:
                dt.append_fr_mont(c)
            r = dt.challenge_fr_mont()
            tables = [dense.bound_top(t, r) for t in tables]
            e = _horner_dev(coeffs, r)
            all_coeffs.append(jnp.stack(coeffs))
            all_rs.append(r)
        claims = jnp.stack([t[0] for t in tables])
        return (
            jnp.stack(all_coeffs),
            jnp.stack(all_rs),
            claims,
            dt.sponge.state,
        )

    from jax.sharding import PartitionSpec as P

    spec_t = P(pmesh.AXIS, None, None)
    rep = P(None)
    fn = jax.jit(
        pmesh._shard_map(
            per_shard,
            mesh,
            tuple([spec_t] * ntab + [rep, rep]),
            (rep, rep, rep, rep),
        )
    )
    ncoeffs = 3 if kind == "quad" else 4
    fmode, findex = _simulate_schedule(mode0, index0, num_rounds, ncoeffs)
    return fn, fmode, findex


def _prove_fused_sharded(kind: str, claim: int, num_rounds: int, tables,
                         transcript, mesh):
    from ..parallel import mesh as pmesh

    modulus = transcript.params.modulus
    sp = transcript.sponge
    fn, fmode, findex = _fused_prover_fn_sharded(
        kind, num_rounds, modulus, sp.mode, sp.index, mesh
    )
    spec = dsponge._spec_of(modulus)
    state0 = jnp.asarray(spec.encode(list(sp.state)))
    e0 = jnp.asarray(FR.encode(claim % R))
    tabs = [pmesh.cyclic_split(mesh, t) for t in tables]
    coeffs_d, rs_d, claims_d, state_d = fn(*tabs, state0, e0)
    ncoeffs = coeffs_d.shape[1]
    coeffs = FR.decode(np.asarray(coeffs_d).reshape(-1, FR.nlimbs))
    rs = FR.decode(np.asarray(rs_d))
    claims = FR.decode(np.asarray(claims_d))
    sp.state = spec.decode(np.asarray(state_d))
    sp.mode, sp.index = fmode, findex
    polys = [
        UniPoly(coeffs[i * ncoeffs : (i + 1) * ncoeffs])
        for i in range(num_rounds)
    ]
    return SumcheckInstanceProof(polys), rs, claims


def _sharded_mesh_for(tables, num_rounds: int):
    """The ambient mesh, if the tables divide evenly across it."""
    from ..parallel import mesh as pmesh

    mesh = pmesh.active_mesh()
    if mesh is None:
        return None
    D = int(mesh.devices.size)
    n = tables[0].shape[0]
    if D < 2 or n < D or n % D or (1 << num_rounds) != n:
        return None
    return mesh


# -- per-round sharded prover (compile-light) -------------------------------
#
# The fused sharded prover above runs a WHOLE sumcheck (round kernels +
# device Poseidon transcript) as one shard_map jit — one dispatch, but a
# huge unrolled graph whose compile cost is minutes on a small CPU host
# (the driver dryrun budget).  This variant keeps the mesh semantics —
# cyclic table layout, per-round psum of the 2-3 round evaluations,
# device-local folds — but runs the transcript on the host and compiles
# only two tiny graphs per table size (evals + fold), so a sharded
# sumcheck costs ~2*log(n) dispatches and seconds of cold compile.  It is
# the path the driver's dryrun_multichip validates; the fused path's
# byte-equality is covered by tests/test_sharding.py.


@_lru_cache(maxsize=None)
def _sharded_round_fns(kind: str, mesh):
    from jax.sharding import PartitionSpec as P

    from ..parallel import mesh as pmesh

    ntab = {"quad": 2, "cubic_tau": 4, "cubic": 3}[kind]
    spec_t = P(pmesh.AXIS, None, None)

    def kernel(tabs):
        if kind == "quad":
            return _round_evals_quad(tabs[0], tabs[1])
        if kind == "cubic_tau":
            return _round_evals_cubic_tau(*tabs)
        return _round_evals_cubic_prod(*tabs)

    def evals(*tabs):
        local = [t.reshape(t.shape[1], t.shape[2]) for t in tabs]
        ev = kernel(local)
        return jf._fold_wide(FR, jax.lax.psum(ev, pmesh.AXIS))

    ev_fn = jax.jit(
        pmesh._shard_map(evals, mesh, (spec_t,) * ntab, P(None, None))
    )

    def fold(r, *tabs):
        return tuple(
            dense.bound_top(t.reshape(t.shape[1], t.shape[2]), r)[None]
            for t in tabs
        )

    fold_fn = jax.jit(
        pmesh._shard_map(
            fold, mesh, (P(None),) + (spec_t,) * ntab, (spec_t,) * ntab
        )
    )
    return ev_fn, fold_fn


def _prove_looped_sharded(kind: str, claim: int, num_rounds: int, tables,
                          transcript, mesh):
    """Per-round sharded prover: sharded round kernels + psum on device,
    transcript on host.  Tail rounds (table of D elements) run on the
    default device via the plain kernels."""
    from ..parallel import mesh as pmesh

    D = int(mesh.devices.size)
    num_local = num_rounds - (D.bit_length() - 1)
    m = R  # coefficients live in Fr regardless of the sponge field
    kernel_single = {
        "quad": lambda t: _round_evals_quad(*t),
        "cubic_tau": lambda t: _round_evals_cubic_tau(*t),
        "cubic": lambda t: _round_evals_cubic_prod(*t),
    }[kind]
    ev_fn, fold_fn = _sharded_round_fns(kind, mesh)
    tabs = [pmesh.cyclic_split(mesh, t) for t in tables]
    tables = None
    e = claim % R
    rs: List[int] = []
    polys: List[UniPoly] = []
    for i in range(num_rounds):
        if i == num_local:
            # remnant has one element per device: join to natural order on
            # the default device and finish with the single-device kernels
            tables = [
                jnp.asarray(np.asarray(t).reshape(D, FR.nlimbs)[_cyclic_perm(D)])
                for t in tabs
            ]
            tabs = None
        if tabs is not None:
            ev = _pull(ev_fn(*tabs))
        else:
            ev = _pull(kernel_single(tables))
        if kind == "quad":
            evals = [ev[0], (e - ev[0]) % R, ev[1]]
        else:
            evals = [ev[0], (e - ev[0]) % R, ev[1], ev[2]]
        poly = UniPoly.from_evals(evals)
        for c in poly.coeffs:
            transcript.append_scalar(c, m)
        r_j = transcript.challenge_scalar(m)
        rs.append(r_j)
        rdev = dense.encode_scalar(r_j)
        if tabs is not None:
            tabs = list(fold_fn(rdev, *tabs))
        else:
            tables = [dense.bound_top(t, rdev) for t in tables]
        e = poly.evaluate(r_j)
        polys.append(poly)
    if tabs is not None:  # num_local == num_rounds: remnant never gathered
        tables = [
            jnp.asarray(np.asarray(t).reshape(D, FR.nlimbs)[_cyclic_perm(D)])
            for t in tabs
        ]
    claims = [dense.decode_scalar(t[0]) for t in tables]
    return SumcheckInstanceProof(polys), rs, claims


def _cyclic_perm(D: int) -> np.ndarray:
    """Permutation mapping cyclic (D, 1) layout rows to natural order.

    With q = 1 the cyclic layout [d, 0] holds global index d, so rows are
    already natural — kept as an explicit identity for clarity."""
    return np.arange(D)


@_lru_cache(maxsize=None)
def _fused_batched_fn(num_rounds: int, k_par: int, k_seq: int, modulus: int,
                      mode0: int, index0: int):
    """One-dispatch batched product sumcheck (sumcheck.rs:220-385): `par`
    instances share poly_C, `seq` instances carry their own; all instance
    round evaluations are vmapped and random-linear-combined on device."""

    def rl_combine(coeffs, evs):
        # evs (k, 16) Montgomery -> sum_i coeffs_i * evs_i  (16,)
        return jf.reduce_sum(FR, jf.mont_mul(FR, coeffs, evs))

    def fn(A_par, B_par, C_par, A_seq, B_seq, C_seq, coeffs, state0, e0):
        sp = dsponge.DeviceSponge(
            dsponge._spec_of(modulus), state0, mode0, index0
        )
        dt = dsponge.DeviceTranscript(sp)
        e = e0
        all_coeffs, all_rs = [], []
        vround = jax.vmap(_round_evals_cubic_prod, in_axes=(0, 0, None))
        vround_seq = jax.vmap(_round_evals_cubic_prod, in_axes=(0, 0, 0))
        for _ in range(num_rounds):
            ev_par = vround(A_par, B_par, C_par)  # (k_par, 3, 16)
            evs = ev_par
            if k_seq:
                evs = jnp.concatenate(
                    [ev_par, vround_seq(A_seq, B_seq, C_seq)], axis=0
                )
            comb = [rl_combine(coeffs, evs[:, j]) for j in range(3)]
            evals = [comb[0], jf.sub(FR, e, comb[0]), comb[1], comb[2]]
            cs = _unipoly_coeffs_dev(evals)
            for c in cs:
                dt.append_fr_mont(c)
            r = dt.challenge_fr_mont()
            vbind = jax.vmap(dense.bound_top, in_axes=(0, None))
            A_par = vbind(A_par, r)
            B_par = vbind(B_par, r)
            C_par = dense.bound_top(C_par, r)
            if k_seq:
                A_seq = vbind(A_seq, r)
                B_seq = vbind(B_seq, r)
                C_seq = vbind(C_seq, r)
            e = _horner_dev(cs, r)
            all_coeffs.append(jnp.stack(cs))
            all_rs.append(r)
        claims_par = jnp.stack([A_par[:, 0], B_par[:, 0]])  # (2, k_par, 16)
        c_final = C_par[0]
        if k_seq:
            claims_seq = jnp.stack([A_seq[:, 0], B_seq[:, 0], C_seq[:, 0]])
        else:
            claims_seq = jnp.zeros((3, 0, FR.nlimbs), jnp.uint32)
        return (
            jnp.stack(all_coeffs),
            jnp.stack(all_rs),
            claims_par,
            c_final,
            claims_seq,
            dt.sponge.state,
        )

    jitted = jax.jit(fn)
    fmode, findex = _simulate_schedule(mode0, index0, num_rounds, 4)
    return jitted, fmode, findex


def _prove_cubic_batched_fused(claim, num_rounds, poly_vec_par, poly_vec_seq,
                               coeffs, transcript):
    A_par, B_par, C_par = poly_vec_par
    A_seq, B_seq, C_seq = poly_vec_seq
    k_par, k_seq = len(A_par), len(A_seq)
    modulus = transcript.params.modulus
    sp = transcript.sponge
    fn, fmode, findex = _fused_batched_fn(
        num_rounds, k_par, k_seq, modulus, sp.mode, sp.index
    )
    spec = dsponge._spec_of(modulus)
    state0 = jnp.asarray(spec.encode(list(sp.state)))
    e0 = jnp.asarray(FR.encode(claim % R))
    coeffs_mont = jnp.asarray(
        FR.encode([c % R for c in coeffs])
    ).reshape(k_par + k_seq, FR.nlimbs)
    zt = jnp.zeros((0,) + tuple(C_par.shape), jnp.uint32)
    stack = lambda ts: jnp.stack(ts) if ts else zt
    coeffs_d, rs_d, claims_par_d, c_final_d, claims_seq_d, state_d = fn(
        stack(list(A_par)), stack(list(B_par)), C_par,
        stack(list(A_seq)), stack(list(B_seq)), stack(list(C_seq)),
        coeffs_mont, state0, e0,
    )
    ncoeffs = coeffs_d.shape[1]
    cs = FR.decode(np.asarray(coeffs_d).reshape(-1, FR.nlimbs))
    rs = FR.decode(np.asarray(rs_d))
    sp.state = spec.decode(np.asarray(state_d))
    sp.mode, sp.index = fmode, findex
    polys = [
        UniPoly(cs[i * ncoeffs : (i + 1) * ncoeffs]) for i in range(num_rounds)
    ]
    cp = FR.decode(np.asarray(claims_par_d).reshape(-1, FR.nlimbs))
    claims_prod = (
        cp[:k_par],
        cp[k_par : 2 * k_par],
        FR.decode(np.asarray(c_final_d).reshape(1, FR.nlimbs))[0],
    )
    if k_seq:
        sq = FR.decode(np.asarray(claims_seq_d).reshape(-1, FR.nlimbs))
        claims_dotp = (sq[:k_seq], sq[k_seq : 2 * k_seq], sq[2 * k_seq :])
    else:
        claims_dotp = ([], [], [])
    return SumcheckInstanceProof(polys), rs, claims_prod, claims_dotp


# -- provers ----------------------------------------------------------------


def prove_cubic_with_additive_term(
    claim: int,
    num_rounds: int,
    tau: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    transcript,
    spec=FR,
) -> Tuple[SumcheckInstanceProof, List[int], List[int]]:
    """Phase-1 Spartan sumcheck over tau * (A*B - C) (sumcheck.rs:67-148)."""
    if _fused_enabled() and num_rounds > 0 and spec is FR:
        mesh = _sharded_mesh_for((tau, A, B, C), num_rounds)
        if mesh is not None:
            return _prove_fused_sharded(
                "cubic_tau", claim, num_rounds, (tau, A, B, C), transcript,
                mesh,
            )
        return _prove_fused(
            "cubic_tau", claim, num_rounds, (tau, A, B, C), transcript
        )
    if spec is FR:
        mesh = _sharded_mesh_for((tau, A, B, C), num_rounds)
        if mesh is not None:
            return _prove_looped_sharded(
                "cubic_tau", claim, num_rounds, (tau, A, B, C), transcript,
                mesh,
            )
    m = spec.modulus
    e = claim % m
    rs: List[int] = []
    polys: List[UniPoly] = []
    for _ in range(num_rounds):
        e0, e2, e3 = _pull(_round_evals_cubic_tau_s(spec, tau, A, B, C), spec)
        poly = UniPoly.from_evals([e0, (e - e0) % m, e2, e3], m)
        for c in poly.coeffs:
            transcript.append_scalar(c, m)
        r_j = transcript.challenge_scalar(m)
        rs.append(r_j)
        rdev = dense.encode_scalar(r_j, spec)
        tau, A, B, C = (dense.bound_top(x, rdev, spec) for x in (tau, A, B, C))
        e = poly.evaluate(r_j)
        polys.append(poly)
    claims = [dense.decode_scalar(x[0], spec) for x in (tau, A, B, C)]
    return SumcheckInstanceProof(polys), rs, claims


def prove_quad(
    claim: int,
    num_rounds: int,
    A: jnp.ndarray,
    B: jnp.ndarray,
    transcript,
    spec=FR,
) -> Tuple[SumcheckInstanceProof, List[int], List[int]]:
    """Phase-2 Spartan sumcheck over A*B (sumcheck.rs:387-443)."""
    if _fused_enabled() and num_rounds > 0 and spec is FR:
        mesh = _sharded_mesh_for((A, B), num_rounds)
        if mesh is not None:
            return _prove_fused_sharded(
                "quad", claim, num_rounds, (A, B), transcript, mesh
            )
        return _prove_fused("quad", claim, num_rounds, (A, B), transcript)
    if spec is FR:
        mesh = _sharded_mesh_for((A, B), num_rounds)
        if mesh is not None:
            return _prove_looped_sharded(
                "quad", claim, num_rounds, (A, B), transcript, mesh
            )
    m = spec.modulus
    e = claim % m
    rs: List[int] = []
    polys: List[UniPoly] = []
    for _ in range(num_rounds):
        e0, e2 = _pull(_round_evals_quad_s(spec, A, B), spec)
        poly = UniPoly.from_evals([e0, (e - e0) % m, e2], m)
        for c in poly.coeffs:
            transcript.append_scalar(c, m)
        r_j = transcript.challenge_scalar(m)
        rs.append(r_j)
        rdev = dense.encode_scalar(r_j, spec)
        A, B = (dense.bound_top(x, rdev, spec) for x in (A, B))
        e = poly.evaluate(r_j)
        polys.append(poly)
    claims = [dense.decode_scalar(x[0], spec) for x in (A, B)]
    return SumcheckInstanceProof(polys), rs, claims


def prove_cubic(
    claim: int,
    num_rounds: int,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    transcript,
) -> Tuple[SumcheckInstanceProof, List[int], List[int]]:
    """Product sumcheck over A*B*C (sumcheck.rs:149-218)."""
    if _fused_enabled() and num_rounds > 0:
        mesh = _sharded_mesh_for((A, B, C), num_rounds)
        if mesh is not None:
            return _prove_fused_sharded(
                "cubic", claim, num_rounds, (A, B, C), transcript, mesh
            )
        return _prove_fused("cubic", claim, num_rounds, (A, B, C), transcript)
    mesh = _sharded_mesh_for((A, B, C), num_rounds)
    if mesh is not None:
        return _prove_looped_sharded(
            "cubic", claim, num_rounds, (A, B, C), transcript, mesh
        )
    e = claim % R
    rs: List[int] = []
    polys: List[UniPoly] = []
    for _ in range(num_rounds):
        e0, e2, e3 = _pull(_round_evals_cubic_prod(A, B, C))
        poly = UniPoly.from_evals([e0, (e - e0) % R, e2, e3])
        poly.write_to_transcript(transcript)
        r_j = transcript.challenge_scalar(R)
        rs.append(r_j)
        rdev = dense.encode_scalar(r_j)
        A, B, C = (dense.bound_top(x, rdev) for x in (A, B, C))
        e = poly.evaluate(r_j)
        polys.append(poly)
    claims = [dense.decode_scalar(x[0]) for x in (A, B, C)]
    return SumcheckInstanceProof(polys), rs, claims


def prove_cubic_batched(
    claim: int,
    num_rounds: int,
    poly_vec_par,  # (list[A], list[B], shared C) device tables
    poly_vec_seq,  # (list[A], list[B], list[C]) device tables
    coeffs: List[int],
    transcript,
):
    """Batched product sumcheck (sumcheck.rs:220-385): `par` instances share
    poly_C (the eq polynomial); `seq` instances carry their own weights.
    Instances are random-linear-combined by `coeffs`.

    Returns (proof, r, claims_prod, claims_dotp) with
    claims_prod = (A_finals, B_finals, C_final) and claims_dotp the seq
    finals.
    """
    if _fused_spark_enabled() and num_rounds > 0:
        return _prove_cubic_batched_fused(
            claim, num_rounds, poly_vec_par, poly_vec_seq, coeffs, transcript
        )
    A_par, B_par, C_par = poly_vec_par
    A_seq, B_seq, C_seq = poly_vec_seq
    A_par, B_par = list(A_par), list(B_par)
    A_seq, B_seq, C_seq = list(A_seq), list(B_seq), list(C_seq)

    e = claim % R
    rs: List[int] = []
    polys: List[UniPoly] = []
    for _ in range(num_rounds):
        evals = []
        for a, b in zip(A_par, B_par):
            evals.append(_pull(_round_evals_cubic_prod(a, b, C_par)))
        for a, b, c in zip(A_seq, B_seq, C_seq):
            evals.append(_pull(_round_evals_cubic_prod(a, b, c)))
        comb0 = sum(ev[0] * cf for ev, cf in zip(evals, coeffs)) % R
        comb2 = sum(ev[1] * cf for ev, cf in zip(evals, coeffs)) % R
        comb3 = sum(ev[2] * cf for ev, cf in zip(evals, coeffs)) % R
        poly = UniPoly.from_evals([comb0, (e - comb0) % R, comb2, comb3])
        poly.write_to_transcript(transcript)
        r_j = transcript.challenge_scalar(R)
        rs.append(r_j)
        rdev = dense.encode_scalar(r_j)
        A_par = [dense.bound_top(x, rdev) for x in A_par]
        B_par = [dense.bound_top(x, rdev) for x in B_par]
        C_par = dense.bound_top(C_par, rdev)
        A_seq = [dense.bound_top(x, rdev) for x in A_seq]
        B_seq = [dense.bound_top(x, rdev) for x in B_seq]
        C_seq = [dense.bound_top(x, rdev) for x in C_seq]
        e = poly.evaluate(r_j)
        polys.append(poly)

    claims_prod = (
        [dense.decode_scalar(x[0]) for x in A_par],
        [dense.decode_scalar(x[0]) for x in B_par],
        dense.decode_scalar(C_par[0]),
    )
    claims_dotp = (
        [dense.decode_scalar(x[0]) for x in A_seq],
        [dense.decode_scalar(x[0]) for x in B_seq],
        [dense.decode_scalar(x[0]) for x in C_seq],
    )
    return SumcheckInstanceProof(polys), rs, claims_prod, claims_dotp
