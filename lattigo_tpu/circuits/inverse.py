"""Homomorphic inverse 1/x via Goldschmidt division.

TPU-native analog of ``circuits/ckks/inverse`` (GoldschmidtDivisionNew,
inverse.go:208): for x ∈ [2^{−log_min}, 1],

    a₀ = 2 − x,  b₀ = 1 − x
    repeat: bᵢ₊₁ = bᵢ²,  aᵢ₊₁ = aᵢ·(1 + bᵢ₊₁)

then aᵢ → 1/x quadratically; ``iterations ≈ log_min + log2(precision_bits)``.
"""

from __future__ import annotations

from lattigo_tpu.rlwe.elements import Ciphertext


class InverseEvaluator:
    """ref circuits/ckks/inverse/inverse.go:18."""

    def __init__(self, ckks_eval):
        self.ev = ckks_eval

    def goldschmidt_division(self, ct: Ciphertext, iterations: int) -> Ciphertext:
        ev = self.ev
        a = ev.sub(ev.neg(ct), -2.0)   # 2 − x
        b = ev.sub(ev.neg(ct), -1.0)   # 1 − x
        for _ in range(iterations):
            b = ev.rescale(ev.mul_relin(b, b))
            one_plus_b = ev.add(b, 1.0)
            lvl = min(a.level, one_plus_b.level)
            a = ev.rescale(ev.mul_relin(a.at_level(lvl), one_plus_b.at_level(lvl)))
        return a
