"""Generate tests/fixtures/vectors.json — the bit-exactness contract file.

Records transcript-challenge vectors (the prova.rs:154-183 /
prova2.rs:165-194 / prova3.rs absorb-encoding contracts), ark-RNG stream
values (ark_std::test_rng, StdRng=ChaCha12), deterministic Pedersen
generators (commitments.rs:17-39) and PST SRS draws
(dense_mlpoly.rs:193-195), as produced by this package.

These are the vectors a Rust cross-check run consumes: the reference
snapshot executed with the same inputs must produce the same values
(`cargo test` helpers would print them).  In this environment (no Rust
toolchain, no network) the file also locks the implementation against
regressions via tests/test_fixtures.py.

Run: python tools/gen_fixtures.py  (writes the JSON; host-only, ~seconds)
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from testudo_tpu.curves import host_curve as hc
from testudo_tpu.fields.bls12_377 import P, R
from testudo_tpu.poseidon.transcript import (
    PoseidonTranscript,
    fq_params,
    fr_params,
)
from testudo_tpu.utils import ark_rng


def hx(v: int) -> str:
    return hex(v)


def g1_json(pt):
    return None if pt is None else [hx(pt[0]), hx(pt[1])]


def g2_json(pt):
    return (
        None
        if pt is None
        else [[hx(pt[0].c0), hx(pt[0].c1)], [hx(pt[1].c0), hx(pt[1].c1)]]
    )


def main():
    out = {}

    # -- prova.rs contract: Fq sponge, generic append of Fr scalar 5,
    #    squeeze a nonnative Fr challenge ---------------------------------
    t = PoseidonTranscript(fq_params())
    t.append_serialized_scalar(5, R)
    out["prova_fr5_challenge_fr"] = hx(t.challenge_scalar(R))

    # -- prova2.rs contract: absorb a G1 point's uncompressed bytes ------
    pt = hc.g1_mul(hc.g1_generator(), 123456789)
    t = PoseidonTranscript(fq_params())
    t.append_g1_uncompressed(pt)
    out["prova2_g1_challenge_fr"] = hx(t.challenge_scalar(R))

    # -- prova3.rs contract: absorb a GT element --------------------------
    from testudo_tpu.curves import pairing as pr

    gt = pr.pairing(hc.g1_generator(), hc.g2_generator())
    t = PoseidonTranscript(fq_params())
    t.append_gt_uncompressed(gt)
    out["prova3_gt_challenge_fr"] = hx(t.challenge_scalar(R))

    # -- Fr transcript basics + state re-keying ---------------------------
    t = PoseidonTranscript(fr_params())
    t.append_scalar(7, R)
    c1 = t.challenge_scalar(R)
    out["fr_scalar7_challenge"] = hx(c1)
    t.new_from_state(c1)
    out["fr_new_from_state_challenge"] = hx(t.challenge_scalar(R))
    t2 = PoseidonTranscript(fr_params())
    t2.append_scalar(7, R)
    c1b = t2.challenge_scalar(R)
    t2.new_from_state2_scalar(c1b, R)
    out["fr_new_from_state2_challenge"] = hx(t2.challenge_scalar(R))

    # -- ark RNG stream (ark_std::test_rng = StdRng(ChaCha12), fixed seed)
    rng = ark_rng.test_rng()
    out["test_rng_first_u64s"] = ["%016x" % rng.next_u64() for _ in range(4)]
    out["test_rng_seed"] = ark_rng.ARK_TEST_RNG_SEED.hex()
    out["fr_rand_first"] = hx(ark_rng.fr_rand(ark_rng.test_rng()))
    out["fq_rand_first"] = hx(ark_rng.fq_rand(ark_rng.test_rng()))
    out["g1_affine_rand_first"] = g1_json(
        ark_rng.g1_affine_rand(ark_rng.test_rng())
    )
    out["g2_affine_rand_first"] = g2_json(
        ark_rng.g2_affine_rand(ark_rng.test_rng())
    )

    # -- PST SRS draws (MultilinearPC::setup(4, test_rng()),
    #    dense_mlpoly.rs:193-195; ts reported in ark (LSB-first) order ----
    from testudo_tpu.core.pst import ark_setup_draws

    g, h, ts_rev = ark_setup_draws(4)
    out["pst_srs_g"] = g1_json(g)
    out["pst_srs_h"] = g2_json(h)
    out["pst_srs_ts_ark_order"] = [hx(v) for v in reversed(ts_rev)]

    # -- Pedersen generators (commitments.rs:17-39) -----------------------
    from testudo_tpu.core.commitments import MultiCommitGens

    gens = MultiCommitGens.new(2, b"test-gens")
    out["pedersen_gens_test-gens_2"] = [g1_json(p) for p in gens.G + [gens.h]]

    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "vectors.json"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path} ({len(out)} entries)")


if __name__ == "__main__":
    main()
