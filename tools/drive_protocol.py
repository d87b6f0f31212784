"""Protocol drive for /verify: sqrt-PST commit->open->verify round trip
(incl. REJECT path) + tiny NIZK prove/verify through the public API.

Exercises the r4 open-path changes end to end: signed MSMs, fused
segmented MIPP cross-MSMs, threaded native cross-pairings, fused PST
quotient-MSM ladders (G1 + G2 sides).
"""
import random
import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from testudo_tpu.core import pst, sqrt_pst, r1cs, snark  # noqa: E402
from testudo_tpu.fields.bls12_377 import R  # noqa: E402
from testudo_tpu.poly import dense  # noqa: E402
from testudo_tpu.poseidon.transcript import (  # noqa: E402
    PoseidonTranscript, fq_params, fr_params,
)
from testudo_tpu.tpu.field import FR  # noqa: E402


def main():
    rng = random.Random(99)

    # --- sqrt-PST commit -> open -> verify (nv = 6, even) --------------
    nv = 6
    evals = [rng.randrange(R) for _ in range(1 << nv)]
    t0 = time.time()
    ck, vk = pst.setup(nv // 2 + (nv % 2))
    table = dense.encode_table(evals)
    poly = sqrt_pst.Polynomial.from_evaluations(table)
    comm_repr, T = poly.commit(ck)
    print(f"commit: {time.time()-t0:.1f}s", flush=True)

    point = [rng.randrange(R) for _ in range(nv)]
    v = poly.eval(point)

    t0 = time.time()
    tp = PoseidonTranscript(fq_params())
    U, pst_proof, mipp_proof = poly.open(tp, comm_repr, ck, point, T)
    print(f"open: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    tv = PoseidonTranscript(fq_params())
    ok = sqrt_pst.verify(tv, vk, U, point, v, pst_proof, mipp_proof, T)
    print(f"verify: {ok} ({time.time()-t0:.1f}s)", flush=True)
    assert ok, "sqrt-PST verify failed"

    # REJECT: wrong claimed value must fail
    tv2 = PoseidonTranscript(fq_params())
    bad = sqrt_pst.verify(
        tv2, vk, U, point, (v + 1) % R, pst_proof, mipp_proof, T
    )
    print(f"reject wrong value: {not bad}", flush=True)
    assert not bad, "sqrt-PST verifier accepted a wrong value"

    # --- tiny NIZK end-to-end ------------------------------------------
    t0 = time.time()
    inst, vars_, inputs = r1cs.Instance.produce_synthetic_r1cs(16, 16, 3)
    gens = snark.TestudoNizkGens.setup(16, 16, 3)
    tpz = PoseidonTranscript(fr_params())
    proof = snark.nizk_prove(inst, vars_, inputs, gens, tpz)
    tvz = PoseidonTranscript(fr_params())
    assert snark.nizk_verify(proof, gens, inst, inputs, tvz), "NIZK failed"
    print(f"NIZK round trip ok ({time.time()-t0:.1f}s)", flush=True)
    print("DRIVE OK", flush=True)


if __name__ == "__main__":
    main()
