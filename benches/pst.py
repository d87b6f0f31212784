"""sqrt-PST benchmark: commit / open / verify timings + sizes.

Mirror of /root/reference/benches/pst.rs: CSV columns commit_time,
opening_time, verification_time, proof_size, commiter_key_size, written to
sqrt_pst.csv.  Sizes default to small-but-meaningful; pass exponents, e.g.
  python benches/pst.py 10 14

TESTUDO_BENCH_WARM=1 runs each flow once untimed first, so the recorded
times exclude one-time XLA compilation (production deployments amortize
it via the persistent compile cache; the first-run cost is reported to
stderr either way).
"""
import os
import csv
import random
import sys
import time

sys.path.insert(0, ".")


def main():
    nvs = [int(a) for a in sys.argv[1:]] or [10]
    from testudo_tpu.core import pst, sqrt_pst
    from testudo_tpu.poly import dense
    from testudo_tpu.poseidon.transcript import PoseidonTranscript, fq_params
    from testudo_tpu import proofs, serialize as ser
    from testudo_tpu.fields.bls12_377 import R

    rng = random.Random(0)

    def flush_rows(rows):
        # Incremental write so a completed size survives a later failure.
        with open("sqrt_pst.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(
                ["num_vars", "commit_time", "opening_time",
                 "verification_time", "proof_size", "commiter_key_size"]
            )
            w.writerows(rows)

    rows = []
    for nv in nvs:
        m_row = nv // 2 + (nv % 2)
        ck, vk = pst.setup(m_row)
        ck_size = sum(
            (1 << (m_row - i)) * (96 + 192) for i in range(m_row + 1)
        )
        Z = [rng.randrange(R) for _ in range(1 << nv)]
        r = [rng.randrange(R) for _ in range(nv)]
        table = dense.encode_table(Z)
        pl = sqrt_pst.Polynomial.from_evaluations(table)
        v = pl.eval(r)

        warm = os.environ.get("TESTUDO_BENCH_WARM") == "1"
        reps = 2 if warm else 1
        for rep in range(reps):
            t0 = time.time()
            comm_dev, t = pl.commit(ck)
            commit_ms = (time.time() - t0) * 1000

            tp = PoseidonTranscript(fq_params())
            t0 = time.time()
            U, pst_proof, mipp_proof = pl.open(tp, comm_dev, ck, r, t)
            open_ms = (time.time() - t0) * 1000

            tv = PoseidonTranscript(fq_params())
            t0 = time.time()
            ok = sqrt_pst.verify(tv, vk, U, r, v, pst_proof, mipp_proof, t)
            verify_ms = (time.time() - t0) * 1000
            assert ok
            if warm and rep == 0:
                print(
                    f"nv=2^{nv} first pass (incl. compile): commit "
                    f"{commit_ms:.0f}ms open {open_ms:.0f}ms",
                    flush=True,
                )

        proof_size = len(proofs.ser_pst_proof(pst_proof)) + len(
            proofs.ser_mipp(mipp_proof)
        )
        rows.append([nv, commit_ms, open_ms, verify_ms, proof_size, ck_size])
        flush_rows(rows)
        print(
            f"nv=2^{nv}: commit {commit_ms:.0f}ms open {open_ms:.0f}ms "
            f"verify {verify_ms:.0f}ms proof {proof_size}B ck {ck_size}B",
            flush=True,
        )

    flush_rows(rows)
    print("wrote sqrt_pst.csv")


if __name__ == "__main__":
    main()
