"""Comparison circuits: sign, step, min, max on encrypted reals.

TPU-native analog of ``circuits/ckks/comparison`` + ``circuits/ckks/minimax``.
Sign is evaluated as a composite of the closed-form odd polynomial

    f₃(x) = (35x − 35x³ + 21x⁵ − 5x⁷)/16

(the f_n family of Cheon–Kim–Kim "Numerical Method for Comparison on
Homomorphically Encrypted Numbers", derived from f_n' ∝ (1−x²)^n — no
minimax tables needed), composed k times: sign(x) ≈ f₃∘…∘f₃(x) for
x ∈ [−1, −ε] ∪ [ε, 1]. The reference instead evaluates hardcoded minimax
composite polynomials (``minimax_composite_polynomial.go``); a Remez
generator is the planned upgrade path for >30-bit precision.
"""

from __future__ import annotations

from lattigo_tpu.circuits.polynomial import Polynomial, PolynomialEvaluator
from lattigo_tpu.rlwe.elements import Ciphertext

F3 = Polynomial([0.0, 35.0 / 16, 0.0, -35.0 / 16, 0.0, 21.0 / 16, 0.0, -5.0 / 16])


class ComparisonEvaluator:
    """ref circuits/ckks/comparison/comparison.go:16."""

    def __init__(self, ckks_eval, iterations: int = 3):
        self.ev = ckks_eval
        self.poly_eval = PolynomialEvaluator(ckks_eval)
        self.iterations = iterations

    def sign(self, ct: Ciphertext) -> Ciphertext:
        """sign(x) for slots in [−1, −ε] ∪ [ε, 1] (ref Sign:75)."""
        out = ct
        for _ in range(self.iterations):
            out = self.poly_eval.evaluate(out, F3)
        return out

    def step(self, ct: Ciphertext) -> Ciphertext:
        """(sign(x)+1)/2 ∈ {0, 1} (ref Step:81)."""
        ev = self.ev
        s = self.sign(ct)
        half = ev.rescale(ev.mul_const(s, 0.5))
        return ev.add(half, 0.5)

    def max(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """max(a,b) = (a+b)/2 + |a−b|/2 via sign (ref Max:111)."""
        ev = self.ev
        diff = ev.sub(a, b)
        s = self.sign(diff)
        avg = ev.rescale(ev.mul_const(ev.add(a, b), 0.5))
        half_diff = ev.rescale(ev.mul_const(diff, 0.5))
        prod = ev.rescale(ev.mul_relin(
            half_diff.at_level(min(half_diff.level, s.level)),
            s.at_level(min(half_diff.level, s.level))))
        return ev.add(avg.at_level(min(avg.level, prod.level)),
                      prod.at_level(min(avg.level, prod.level)))

    def min(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """min(a,b) = (a+b)/2 − |a−b|/2 (ref Min:133)."""
        ev = self.ev
        diff = ev.sub(a, b)
        s = self.sign(diff)
        avg = ev.rescale(ev.mul_const(ev.add(a, b), 0.5))
        half_diff = ev.rescale(ev.mul_const(diff, 0.5))
        prod = ev.rescale(ev.mul_relin(
            half_diff.at_level(min(half_diff.level, s.level)),
            s.at_level(min(half_diff.level, s.level))))
        return ev.sub(avg.at_level(min(avg.level, prod.level)),
                      prod.at_level(min(avg.level, prod.level)))
