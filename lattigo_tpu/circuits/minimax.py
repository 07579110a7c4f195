"""Minimax composite polynomial evaluator.

TPU-native analog of ``circuits/ckks/minimax`` (evaluator ref
minimax_composite_polynomial_evaluator.go:15): evaluates
P(x) = p_k ∘ p_{k-1} ∘ … ∘ p_1(x) stage by stage on a ciphertext,
bootstrapping between stages whenever the remaining levels cannot cover
the next polynomial's depth, and cleaning the imaginary part after every
stage on the standard ring (evaluate each stage at half the target scale,
then add the conjugate — ref evaluator lines 54-84).

The composite polynomials themselves come from the host-side Remez
generator (:func:`lattigo_tpu.utils.minimax.gen_minimax_composite_sign`,
ref GenMinimaxCompositePolynomial) or from the published X2/X4 precision-
doubling cleanup polynomials of ia.cr/2019/1234 (ref CoeffsSignX2Cheby /
CoeffsSignX4Cheby, minimax_composite_polynomial.go:58-73).
"""

from __future__ import annotations

from fractions import Fraction

from lattigo_tpu.circuits.polynomial import (
    CHEBYSHEV,
    Polynomial,
    PolynomialEvaluator,
    simulate,
)
from lattigo_tpu.ring.ring import STANDARD
from lattigo_tpu.rlwe.elements import Ciphertext

# 1.5x − 0.5x³ in Chebyshev basis: ~doubles the number of correct digits
# of values already close to ±1 (ia.cr/2019/1234; ref CoeffsSignX2Cheby).
SIGN_X2_CHEBY = Polynomial(
    [0.0, 1.125, 0.0, -0.125], basis=CHEBYSHEV, interval=(-1.0, 1.0))

# (35x − 35x³ + 21x⁵ − 5x⁷)/16 in Chebyshev basis: ~quadruples the number
# of correct digits (ia.cr/2019/1234; ref CoeffsSignX4Cheby).
SIGN_X4_CHEBY = Polynomial(
    [0.0, 1.1962890625, 0.0, -0.2392578125, 0.0, 0.0478515625, 0.0,
     -0.0048828125], basis=CHEBYSHEV, interval=(-1.0, 1.0))


class MinimaxCompositeEvaluator:
    """Stage-wise composite evaluation with inter-stage bootstrapping
    (ref minimax_composite_polynomial_evaluator.go:15)."""

    def __init__(self, ckks_eval, bootstrapper=None):
        self.ev = ckks_eval
        self.params = ckks_eval.params
        self.poly_eval = PolynomialEvaluator(ckks_eval)
        self.btp = bootstrapper

    def evaluate(self, ct: Ciphertext, mcp: list[Polynomial]) -> Ciphertext:
        """P(ct) for P = mcp[-1] ∘ … ∘ mcp[0] (ref Evaluate:29)."""
        p = self.params
        standard = p.ring_type == STANDARD
        min_lvl = self.btp.minimum_input_level if self.btp is not None else 0

        res = ct
        for poly in mcp:
            if standard:
                # evaluate at Δ/2 so res + conj(res) lands exactly at Δ
                target = p.default_scale_fraction / 2
            else:
                target = p.default_scale_fraction
            # exact per-stage depth from the level/scale planner (the
            # reference's SimEvaluator pre-plan, polynomial_evaluator_sim.go)
            sim = simulate(p, p.max_level, p.default_scale_fraction, poly,
                           target)
            depth = p.max_level - sim.level
            if res.level < depth + min_lvl:
                if self.btp is None:
                    raise ValueError(
                        f"level {res.level} < stage depth {depth} and no "
                        "bootstrapper was provided")
                res = self.btp.bootstrap(res)
            res = self.poly_eval.evaluate(res, poly, target)

            if standard:
                # clean the imaginary part (it explodes under composition)
                res = res.replace(scale=Fraction(res.scale) * 2)
                res = self.ev.add(res, self.ev.conjugate(res))

        # the composite maps back into [-1, 1]: restore the input scale
        # label to avoid drift from float bookkeeping (ref evaluator :86)
        return res.replace(scale=ct.scale)

    def galois_elements(self) -> list[int]:
        """Galois elements needed by :meth:`evaluate` (conjugation only)."""
        if self.params.ring_type == STANDARD:
            return [self.params.galois_element_order_two]
        return []
