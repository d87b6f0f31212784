"""Layered product circuits (GKR-style) for offline memory checking.

Mirror of /root/reference/src/product_tree.rs: ProductCircuit stores
left/right halves per layer; evaluation proofs run one batched cubic
sumcheck per layer with an eq-weight polynomial, folding claims by a layer
challenge claim <- L + r (R - L).  The batched variant additionally joins
DotProductCircuits at the last layer (product_tree.rs:254-377).

All layer tables are device arrays; claims/challenges are host ints.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax.numpy as jnp

from ..fields.bls12_377 import R
from ..poly import dense
from ..tpu import field as jf
from ..tpu.field import FR
from . import sumcheck


class ProductCircuit:
    def __init__(self, poly: jnp.ndarray):
        """poly: (2^k, 16) device table; builds log2 layers of halves."""
        self.left_vec: List[jnp.ndarray] = []
        self.right_vec: List[jnp.ndarray] = []
        n = poly.shape[0]
        num_layers = n.bit_length() - 1
        half = n // 2
        self.left_vec.append(poly[:half])
        self.right_vec.append(poly[half:])
        for i in range(num_layers - 1):
            prod = jf.mont_mul(FR, self.left_vec[i], self.right_vec[i])
            h = prod.shape[0] // 2
            self.left_vec.append(prod[:h])
            self.right_vec.append(prod[h:])

    def evaluate(self) -> int:
        l = dense.decode_scalar(self.left_vec[-1][0])
        r_ = dense.decode_scalar(self.right_vec[-1][0])
        return l * r_ % R


class DotProductCircuit:
    def __init__(self, left, right, weight):
        self.left, self.right, self.weight = left, right, weight

    def evaluate(self) -> int:
        prods = jf.mont_mul(
            FR, jf.mont_mul(FR, self.left, self.right), self.weight
        )
        return dense.decode_scalar(jf.reduce_sum(FR, prods))

    def split(self) -> Tuple["DotProductCircuit", "DotProductCircuit"]:
        idx = self.left.shape[0] // 2
        return (
            DotProductCircuit(self.left[:idx], self.right[:idx], self.weight[:idx]),
            DotProductCircuit(self.left[idx:], self.right[idx:], self.weight[idx:]),
        )


@dataclass
class LayerProofBatched:
    proof: sumcheck.SumcheckInstanceProof
    claims_prod_left: List[int]
    claims_prod_right: List[int]


@dataclass
class ProductCircuitEvalProofBatched:
    proof: List[LayerProofBatched]
    claims_dotp: Tuple[List[int], List[int], List[int]]

    @staticmethod
    def prove(
        prod_circuits: List[ProductCircuit],
        dotp_circuits: List[DotProductCircuit],
        transcript,
    ):
        """product_tree.rs:255-377.  Returns (proof, rand)."""
        assert prod_circuits
        claims_dotp_final = ([], [], [])
        proof_layers: List[LayerProofBatched] = []
        num_layers = len(prod_circuits[0].left_vec)
        claims_to_verify = [c.evaluate() for c in prod_circuits]
        rand: List[int] = []
        for layer_id in range(num_layers - 1, -1, -1):
            poly_C_par = dense.eq_evals(rand)
            num_rounds_prod = poly_C_par.shape[0].bit_length() - 1

            A_par = [c.left_vec[layer_id] for c in prod_circuits]
            B_par = [c.right_vec[layer_id] for c in prod_circuits]

            A_seq, B_seq, C_seq = [], [], []
            if layer_id == 0 and dotp_circuits:
                for item in dotp_circuits:
                    claims_to_verify.append(item.evaluate())
                for d in dotp_circuits:
                    A_seq.append(d.left)
                    B_seq.append(d.right)
                    C_seq.append(d.weight)

            coeffs = transcript.challenge_scalar_vec(R, len(claims_to_verify))
            claim = sum(c * f for c, f in zip(claims_to_verify, coeffs)) % R

            (proof, rand_prod, claims_prod, claims_dotp) = (
                sumcheck.prove_cubic_batched(
                    claim,
                    num_rounds_prod,
                    (A_par, B_par, poly_C_par),
                    (A_seq, B_seq, C_seq),
                    coeffs,
                    transcript,
                )
            )
            claims_prod_left, claims_prod_right, _claims_eq = claims_prod
            for l, r_ in zip(claims_prod_left, claims_prod_right):
                transcript.append_scalar(l, R)
                transcript.append_scalar(r_, R)

            if layer_id == 0 and dotp_circuits:
                dl, dr, dw = claims_dotp
                for l, r_, w in zip(dl, dr, dw):
                    transcript.append_scalar(l, R)
                    transcript.append_scalar(r_, R)
                    transcript.append_scalar(w, R)
                claims_dotp_final = (dl, dr, dw)

            r_layer = transcript.challenge_scalar(R)
            claims_to_verify = [
                (l + r_layer * (r_ - l)) % R
                for l, r_ in zip(claims_prod_left, claims_prod_right)
            ]
            rand = [r_layer] + rand_prod
            proof_layers.append(
                LayerProofBatched(proof, claims_prod_left, claims_prod_right)
            )
        return (
            ProductCircuitEvalProofBatched(proof_layers, claims_dotp_final),
            rand,
        )

    def verify(
        self,
        claims_prod_vec: List[int],
        claims_dotp_vec: List[int],
        length: int,
        transcript,
    ):
        """product_tree.rs:379-476.  Returns (claims, claims_dotp, rand)."""
        num_layers = length.bit_length() - 1
        rand: List[int] = []
        assert len(self.proof) == num_layers
        claims_to_verify = list(claims_prod_vec)
        claims_to_verify_dotp: List[int] = []
        for num_rounds, i in enumerate(range(num_layers)):
            if i == num_layers - 1:
                claims_to_verify = claims_to_verify + list(claims_dotp_vec)
            coeffs = transcript.challenge_scalar_vec(R, len(claims_to_verify))
            claim = sum(c * f for c, f in zip(claims_to_verify, coeffs)) % R
            claim_last, rand_prod = self.proof[i].proof.verify(
                claim, num_rounds, 3, transcript
            )
            claims_prod_left = self.proof[i].claims_prod_left
            claims_prod_right = self.proof[i].claims_prod_right
            assert len(claims_prod_left) == len(claims_prod_vec)
            for l, r_ in zip(claims_prod_left, claims_prod_right):
                transcript.append_scalar(l, R)
                transcript.append_scalar(r_, R)
            assert len(rand) == len(rand_prod)
            eq = 1
            for a, b in zip(rand, rand_prod):
                eq = eq * (a * b + (1 - a) * (1 - b)) % R
            claim_expected = (
                sum(
                    cf * (l * r_ % R * eq)
                    for cf, l, r_ in zip(coeffs, claims_prod_left, claims_prod_right)
                )
                % R
            )
            if i == num_layers - 1:
                npi = len(claims_prod_vec)
                dl, dr, dw = self.claims_dotp
                for k in range(len(dl)):
                    transcript.append_scalar(dl[k], R)
                    transcript.append_scalar(dr[k], R)
                    transcript.append_scalar(dw[k], R)
                    claim_expected = (
                        claim_expected + coeffs[k + npi] * dl[k] * dr[k] * dw[k]
                    ) % R
            assert claim_expected == claim_last % R, "product layer check"
            r_layer = transcript.challenge_scalar(R)
            claims_to_verify = [
                (l + r_layer * (r_ - l)) % R
                for l, r_ in zip(claims_prod_left, claims_prod_right)
            ]
            if i == num_layers - 1:
                dl, dr, dw = self.claims_dotp
                for k in range(len(claims_dotp_vec) // 2):
                    cl = (dl[2 * k] + r_layer * (dl[2 * k + 1] - dl[2 * k])) % R
                    cr = (dr[2 * k] + r_layer * (dr[2 * k + 1] - dr[2 * k])) % R
                    cw = (dw[2 * k] + r_layer * (dw[2 * k + 1] - dw[2 * k])) % R
                    claims_to_verify_dotp.extend([cl, cr, cw])
            rand = [r_layer] + rand_prod
        return claims_to_verify, claims_to_verify_dotp, rand
