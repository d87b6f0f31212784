"""Univariate round polynomials (host ints over Fr).

Mirror of /root/reference/src/unipoly.rs: degree-2/3 polynomials recovered
from evaluations at 0,1,2(,3) via the hardcoded inverse Vandermonde
(two_inv/six_inv, unipoly.rs:26-49); coefficients stored low-to-high.
Proofs carry FULL coefficient vectors (CompressedUniPoly is dead code in
the reference, unipoly.rs:84-99).
"""
from __future__ import annotations

from typing import List

from ..fields.bls12_377 import R

_TWO_INV = pow(2, -1, R)
_SIX_INV = pow(6, -1, R)


class UniPoly:
    __slots__ = ("coeffs",)

    def __init__(self, coeffs: List[int]):
        self.coeffs = [c % R for c in coeffs]

    @staticmethod
    def from_evals(evals: List[int]) -> "UniPoly":
        assert len(evals) in (3, 4)
        if len(evals) == 3:
            c = evals[0]
            a = _TWO_INV * (evals[2] - evals[1] - evals[1] + c) % R
            b = (evals[1] - c - a) % R
            return UniPoly([c, b, a])
        d = evals[0]
        a = _SIX_INV * (
            evals[3] - 3 * evals[2] + 3 * evals[1] - evals[0]
        ) % R
        b = _TWO_INV * (
            2 * evals[0] - 5 * evals[1] + 4 * evals[2] - evals[3]
        ) % R
        c = (evals[1] - d - a - b) % R
        return UniPoly([d, c, b, a])

    def degree(self) -> int:
        return len(self.coeffs) - 1

    def eval_at_zero(self) -> int:
        return self.coeffs[0]

    def eval_at_one(self) -> int:
        return sum(self.coeffs) % R

    def evaluate(self, r: int) -> int:
        acc, power = self.coeffs[0], r
        for c in self.coeffs[1:]:
            acc = (acc + power * c) % R
            power = power * r % R
        return acc

    def write_to_transcript(self, transcript) -> None:
        """Absorb all coefficients (sumcheck.rs:127-129, unipoly.rs:101-109)."""
        for c in self.coeffs:
            transcript.append_scalar(c, R)
