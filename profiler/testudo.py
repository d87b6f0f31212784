"""Proof-size profiler (mirror of /root/reference/profiler/testudo.rs):
prints per-component proof sizes for 2^s-constraint instances.
Usage: python profiler/testudo.py [s_min s_max]
"""
import sys

sys.path.insert(0, ".")


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from testudo_tpu.core import r1cs, snark
    from testudo_tpu.poseidon.transcript import PoseidonTranscript, fr_params
    from testudo_tpu import proofs

    for s in range(lo, hi + 1, 2):
        n = 1 << s
        inst, vars_, inputs = r1cs.Instance.produce_synthetic_r1cs(n, n, 10)
        gens = snark.TestudoSnarkGens.setup(n, n, 10, n, with_groth16=False)
        comm, decomm = snark.snark_encode(inst, gens)
        tp = PoseidonTranscript(fr_params())
        proof = snark.snark_prove(inst, comm, decomm, vars_, inputs, gens, tp)
        sat = len(proofs.ser_r1cs_proof(proof.r1cs_sat_proof))
        ev = len(proofs.ser_spark_proof(proof.r1cs_eval_proof.proof))
        print(f"2^{s} constraints: sat_proof {sat}B  eval_proof {ev}B  "
              f"total {sat + ev}B", flush=True)


if __name__ == "__main__":
    main()
