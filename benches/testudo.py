"""End-to-end TestudoSNARK benchmark.

Mirror of /root/reference/benches/testudo.rs (commented in the snapshot):
CSV columns proving_time, verification_time, sat_proof_size,
eval_proof_size, total_proof_size for 2^s constraints, written to
testudo.csv.  Pass exponents: python benches/testudo.py 8 10
"""
import csv
import sys
import time

sys.path.insert(0, ".")


def main():
    args = sys.argv[1:]
    nizk = "--nizk" in args  # BASELINE config #3: sumcheck + PST, no Groth16
    exps = [int(a) for a in args if not a.startswith("-")] or [8]
    from testudo_tpu.core import r1cs, snark
    from testudo_tpu.poseidon.transcript import PoseidonTranscript, fr_params
    from testudo_tpu import proofs

    name = "testudo_nizk.csv" if nizk else "testudo.csv"

    def flush_rows(rows):
        # Incremental write so a completed size survives a later failure.
        with open(name, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["num_cons", "proving_time", "verification_time",
                        "sat_proof_size", "eval_proof_size",
                        "total_proof_size"])
            w.writerows(rows)

    rows = []
    for s in exps:
        n = 1 << s
        t0 = time.time()
        inst, vars_, inputs = r1cs.Instance.produce_synthetic_r1cs(n, n, 10)
        print(f"2^{s}: synthetic instance {time.time()-t0:.1f}s", flush=True)

        if nizk:
            t0 = time.time()
            gens = snark.TestudoNizkGens.setup(n, n, 10)
            print(f"2^{s}: gens setup {time.time()-t0:.1f}s", flush=True)
            import os

            reps = 2 if os.environ.get("TESTUDO_BENCH_WARM") == "1" else 1
            for rep in range(reps):
                t0 = time.time()
                tp = PoseidonTranscript(fr_params())
                proof = snark.nizk_prove(inst, vars_, inputs, gens, tp)
                prove_ms = (time.time() - t0) * 1000
                t0 = time.time()
                tv = PoseidonTranscript(fr_params())
                ok = snark.nizk_verify(proof, gens, inst, inputs, tv)
                verify_ms = (time.time() - t0) * 1000
                assert ok
                if reps == 2 and rep == 0:
                    print(
                        f"2^{s} NIZK first pass (incl. executable load): "
                        f"prove {prove_ms:.0f}ms",
                        flush=True,
                    )
            sat_size = len(proofs.ser_r1cs_proof(proof.r1cs_sat_proof))
            rows.append([n, prove_ms, verify_ms, sat_size, 0, sat_size])
            flush_rows(rows)
            print(
                f"2^{s} cons NIZK: prove {prove_ms:.0f}ms verify "
                f"{verify_ms:.0f}ms sat {sat_size}B",
                flush=True,
            )
            continue

        t0 = time.time()
        gens = snark.TestudoSnarkGens.setup(n, n, 10, n, with_groth16=True)
        print(f"2^{s}: gens setup {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        comm, decomm = snark.snark_encode(inst, gens)
        print(f"2^{s}: spark encode {time.time()-t0:.1f}s", flush=True)

        import os

        reps = 2 if os.environ.get("TESTUDO_BENCH_WARM") == "1" else 1
        for rep in range(reps):
            t0 = time.time()
            tp = PoseidonTranscript(fr_params())
            proof = snark.snark_prove(inst, comm, decomm, vars_, inputs, gens, tp)
            prove_ms = (time.time() - t0) * 1000

            t0 = time.time()
            tv = PoseidonTranscript(fr_params())
            ok = snark.snark_verify(proof, gens, comm, inputs, tv)
            verify_ms = (time.time() - t0) * 1000
            assert ok
            if reps == 2 and rep == 0:
                print(
                    f"2^{s} SNARK first pass (incl. executable load): "
                    f"prove {prove_ms:.0f}ms verify {verify_ms:.0f}ms",
                    flush=True,
                )

        sat_size = len(proofs.ser_r1cs_proof(proof.r1cs_sat_proof))
        eval_size = len(proofs.ser_spark_proof(proof.r1cs_eval_proof.proof))
        total = len(proofs.ser_testudo_snark(proof))
        rows.append([n, prove_ms, verify_ms, sat_size, eval_size, total])
        flush_rows(rows)
        print(
            f"2^{s} cons: prove {prove_ms:.0f}ms verify {verify_ms:.0f}ms "
            f"sat {sat_size}B eval {eval_size}B total {total}B",
            flush=True,
        )

    flush_rows(rows)
    print(f"wrote {name}")


if __name__ == "__main__":
    main()
