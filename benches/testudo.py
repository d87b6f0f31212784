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
    exps = [int(a) for a in sys.argv[1:]] or [8]
    from testudo_tpu.core import r1cs, snark
    from testudo_tpu.poseidon.transcript import PoseidonTranscript, fr_params
    from testudo_tpu import proofs

    rows = []
    for s in exps:
        n = 1 << s
        inst, vars_, inputs = r1cs.Instance.produce_synthetic_r1cs(n, n, 10)
        gens = snark.TestudoSnarkGens.setup(n, n, 10, n, with_groth16=True)
        comm, decomm = snark.snark_encode(inst, gens)

        t0 = time.time()
        tp = PoseidonTranscript(fr_params())
        proof = snark.snark_prove(inst, comm, decomm, vars_, inputs, gens, tp)
        prove_ms = (time.time() - t0) * 1000

        t0 = time.time()
        tv = PoseidonTranscript(fr_params())
        ok = snark.snark_verify(proof, gens, comm, inputs, tv)
        verify_ms = (time.time() - t0) * 1000
        assert ok

        sat_size = len(proofs.ser_r1cs_proof(proof.r1cs_sat_proof))
        eval_size = len(proofs.ser_spark_proof(proof.r1cs_eval_proof.proof))
        total = len(proofs.ser_testudo_snark(proof))
        rows.append([n, prove_ms, verify_ms, sat_size, eval_size, total])
        print(
            f"2^{s} cons: prove {prove_ms:.0f}ms verify {verify_ms:.0f}ms "
            f"sat {sat_size}B eval {eval_size}B total {total}B",
            flush=True,
        )

    with open("testudo.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["num_cons", "proving_time", "verification_time",
                    "sat_proof_size", "eval_proof_size", "total_proof_size"])
        w.writerows(rows)
    print("wrote testudo.csv")


if __name__ == "__main__":
    main()
