"""The canonical cubic-equation example: prove knowledge of x such that
x^3 + x + 5 = y.

Mirror of /root/reference/examples/cubic.rs (commented in the snapshot but
canonical): four constraints over (Z0..Z3, I0):

    Z0 * Z0 - Z1 = 0        (Z1 = x^2)
    Z1 * Z0 - Z2 = 0        (Z2 = x^3)
    (Z2 + Z0) * 1 - Z3 = 0  (Z3 = x^3 + x)
    (Z3 + 5) * 1 - I0 = 0   (I0 = y)

Run: python examples/cubic.py
"""
import sys
import time

sys.path.insert(0, ".")

from testudo_tpu import serialize as ser
from testudo_tpu.fields.bls12_377 import R
from testudo_tpu.core import r1cs, snark
from testudo_tpu.poseidon.transcript import PoseidonTranscript, fr_params


def produce_cubic_r1cs():
    num_cons = 4
    num_vars = 4
    num_inputs = 1

    one = ser.fr_to_bytes(1)
    five = ser.fr_to_bytes(5)

    # (row, col, value_bytes); columns: vars 0..3, ONE at num_vars,
    # inputs from num_vars + 1
    A = [(0, 0, one), (1, 1, one), (2, 2, one), (2, 0, one), (3, 3, one),
         (3, 4, five)]
    B = [(0, 0, one), (1, 0, one), (2, 4, one), (3, 4, one)]
    C = [(0, 1, one), (1, 2, one), (2, 3, one), (3, 5, one)]

    inst = r1cs.Instance.new(num_cons, num_vars, num_inputs, A, B, C)

    x = 3
    z1 = x * x % R
    z2 = z1 * x % R
    z3 = (z2 + x) % R
    y = (z3 + 5) % R
    vars_ = r1cs.Assignment([x, z1, z2, z3])
    inputs = r1cs.Assignment([y])
    assert inst.is_sat(vars_, inputs)
    return inst, vars_, inputs


def main():
    inst, vars_, inputs = produce_cubic_r1cs()
    print("cubic R1CS satisfiable; building gens...")

    t0 = time.time()
    gens = snark.TestudoSnarkGens.setup(4, 4, 1, 8, with_groth16=True)
    print(f"setup: {time.time()-t0:.1f}s")

    comm, decomm = snark.snark_encode(inst, gens)

    t0 = time.time()
    prover_t = PoseidonTranscript(fr_params())
    proof = snark.snark_prove(inst, comm, decomm, vars_, inputs, gens, prover_t)
    print(f"prove: {time.time()-t0:.1f}s")

    t0 = time.time()
    verifier_t = PoseidonTranscript(fr_params())
    ok = snark.snark_verify(proof, gens, comm, inputs, verifier_t)
    print(f"verify: {time.time()-t0:.1f}s -> {ok}")
    assert ok, "cubic proof rejected"
    print("cubic SNARK verified")


if __name__ == "__main__":
    main()
