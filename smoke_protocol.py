"""Verify drive: sqrt-PST commit -> open -> verify on the TPU kernel path,
plus a tampered-claim REJECT probe (verify skill, commitment-layer flow).

Mirrors tests/test_protocol.py::test_sqrt_pst_commit_open_verify but runs
on the real device backend so the fused Pallas MSM/ladder kernels carry
the whole flow.
"""
import random
import time

t0 = time.time()
from testudo_tpu.core import pst, sqrt_pst
from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.poly import dense
from testudo_tpu.poseidon.transcript import PoseidonTranscript, fq_params

print("imports", time.time() - t0, flush=True)
rng = random.Random(1234)

t0 = time.time()
ck, vk = pst.setup(3)
print("setup", time.time() - t0, flush=True)

for nv in (5, 6):
    Z = [rng.randrange(R) for _ in range(1 << nv)]
    r = [rng.randrange(R) for _ in range(nv)]
    table = dense.encode_table(Z)
    pl = sqrt_pst.Polynomial.from_evaluations(table)
    v = pl.eval(r)
    t0 = time.time()
    comm_dev, t = pl.commit(ck)
    print(f"nv={nv} commit", time.time() - t0, flush=True)
    t0 = time.time()
    tp = PoseidonTranscript(fq_params())
    U, pst_proof, mipp_proof = pl.open(tp, comm_dev, ck, r, t)
    print(f"nv={nv} open", time.time() - t0, flush=True)
    t0 = time.time()
    tv = PoseidonTranscript(fq_params())
    ok = sqrt_pst.verify(tv, vk, U, r, v, pst_proof, mipp_proof, t)
    print(f"nv={nv} verify accept: {ok}", time.time() - t0, flush=True)
    assert ok, "honest proof rejected"
    tv2 = PoseidonTranscript(fq_params())
    bad = sqrt_pst.verify(tv2, vk, U, r, (v + 1) % R, pst_proof, mipp_proof, t)
    print(f"nv={nv} reject tampered: {not bad}", flush=True)
    assert not bad, "tampered claim accepted"

print("PROTOCOL DRIVE OK", flush=True)
