"""Reference-scale Spark test + MIPP structural checks.

check_sparse_polyeval_proof at the reference's ACTUAL size (256x256,
nnz=256, batch of 3 — sparse_mlpoly.rs:1630-1688), and the
commit_g2(p_h) == final_h invariant the reference debug-asserts at
mipp.rs:133-134.
"""
import random

import numpy as np
import pytest

from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.core import r1cs, spark
from testudo_tpu.poseidon.transcript import PoseidonTranscript, fq_params, fr_params

pytestmark = pytest.mark.slow  # compile-heavy: CI slow tier

rng = random.Random(43)


def test_spark_sparse_polyeval_reference_scale():
    """256x256, nnz=256, batch 3 (sparse_mlpoly.rs:1630-1688)."""
    nx = ny = 8
    nnz = 256
    mats = []
    for _ in range(3):
        entries = [
            (rng.randrange(1 << nx), rng.randrange(1 << ny), rng.randrange(R))
            for _ in range(nnz)
        ]
        mats.append(
            r1cs.SparseMatPolynomial(
                nx,
                ny,
                np.asarray([e[0] for e in entries], dtype=np.int32),
                np.asarray([e[1] for e in entries], dtype=np.int32),
                [e[2] for e in entries],
            )
        )
    gens = spark.SparseMatPolyCommitmentGens.setup(
        b"spark-scale", nx, ny, nnz, 3
    )
    comm, dense_rep = spark.multi_commit(mats, gens)

    rx = [rng.randrange(R) for _ in range(nx)]
    ry = [rng.randrange(R) for _ in range(ny)]
    evals = [m.evaluate(rx, ry) for m in mats]

    tp = PoseidonTranscript(fr_params())
    proof = spark.prove(dense_rep, rx, ry, evals, gens, tp)
    tv = PoseidonTranscript(fr_params())
    assert spark.verify(proof, comm, rx, ry, evals, gens, tv)
    tv2 = PoseidonTranscript(fr_params())
    bad = [(evals[0] + 1) % R, evals[1], evals[2]]
    assert spark.verify(proof, comm, rx, ry, bad, gens, tv2) is False


def test_mipp_commit_g2_ph_equals_final_h():
    """The MIPP prover's structured polynomial p_h must PST-G2-commit to
    exactly final_h (mipp.rs:133-134 debug-asserts this; here it is a
    real test).  Also round-trips the MIPP proof."""
    import jax.numpy as jnp

    from testudo_tpu.core import mipp, pst
    from testudo_tpu.curves import host_curve as hc
    from testudo_tpu.curves import pairing as pr
    from testudo_tpu.poly import dense
    from testudo_tpu.tpu import curve as jc, field as jf, msm
    from testudo_tpu.tpu.field import FR

    m = 2  # 4 columns
    n = 1 << m
    ck, vk = pst.setup(m, seed=b"mipp-ph-test")
    # a_i = random G1 points (stand-ins for column commitments), y = chi(b)
    a_h = [hc.g1_mul(hc.g1_generator(), rng.randrange(1, R)) for _ in range(n)]
    a_dev = jc.g1_from_affine_host(a_h)
    b_pt = [rng.randrange(R) for _ in range(m)]
    chis = dense.eq_evals(b_pt)  # (n, 16) Montgomery
    y_host = [dense.decode_scalar(chis[i]) for i in range(n)]
    h_dev = ck.powers_of_h[0]
    h_h = jc.g2_to_affine_host(h_dev)
    T = pr.multi_pairing(a_h, h_h)
    U = hc.g1_msm(a_h, y_host)

    tp = PoseidonTranscript(fq_params())
    proof = mipp.prove(tp, ck, a_dev, chis, h_dev, U, T)

    # recompute the challenges exactly as the verifier does, rebuild p_h,
    # commit it in G2 and compare against final_h
    tv = PoseidonTranscript(fq_params())
    tv.append_g1_uncompressed(U)
    xs_inv = []
    for (u_l, u_r), (t_l, t_r) in zip(proof.comms_u, proof.comms_t):
        tv.append_g1_uncompressed(u_l)
        tv.append_g1_uncompressed(u_r)
        tv.append_gt_uncompressed(t_l)
        tv.append_gt_uncompressed(t_r)
        xs_inv.append(tv.challenge_scalar(R))
    evals = mipp._ph_evals(xs_inv)
    table = dense.encode_table(evals)
    comm_h = pst.commit_g2(ck, table)
    assert comm_h == proof.final_h, "commit_g2(p_h) != final_h"

    # full verify round-trip + reject
    tv3 = PoseidonTranscript(fq_params())
    assert mipp.verify(vk, tv3, proof, b_pt, U, T)
    tv4 = PoseidonTranscript(fq_params())
    bad_U = hc.g1_add(U, hc.g1_generator())
    assert not mipp.verify(vk, tv4, proof, b_pt, bad_U, T)
