"""Depth-optimal polynomial evaluation (Paterson–Stockmeyer).

TPU-native analog of ``circuits/common/polynomial`` + the CKKS binding.
The reference pre-plans every rescaling with a big-float SimEvaluator
(``polynomial_evaluator_sim.go``); here scales are exact Fractions, so the
plan IS the evaluation: constants are encoded at exactly the scale that
makes every branch land on its target (ref UpdateLevelAndScaleGiantStep),
and branch scales match by construction.

Supports monomial and Chebyshev bases; Chebyshev factorization follows
T_{n+j} division: q_j = 2·c_{n+j}, r_{n-j} −= c_{n+j}
(ref utils/bignum/polynomial.go:258 Factorize).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from fractions import Fraction

import numpy as np

from lattigo_tpu.rlwe.elements import Ciphertext

MONOMIAL = "monomial"
CHEBYSHEV = "chebyshev"


@dataclass
class Polynomial:
    """Polynomial in monomial or Chebyshev basis (ref bignum/polynomial.go)."""

    coeffs: list[complex]
    basis: str = MONOMIAL
    interval: tuple[float, float] = (-1.0, 1.0)

    @property
    def degree(self) -> int:
        return len(self.coeffs) - 1

    def factorize(self, n: int):
        """p = q·B_n + r with B the basis element (ref Factorize:258)."""
        c = list(self.coeffs)
        r = c[:n] + [0] * max(0, n - len(c))
        q = [0] * (self.degree - n + 1)
        if self.degree >= n:
            q[0] = c[n]
        if self.basis == MONOMIAL:
            for i in range(n + 1, self.degree + 1):
                q[i - n] = c[i]
        else:  # Chebyshev: T_a·T_n = (T_{a+n} + T_{|a-n|})/2
            for i, j in zip(range(n + 1, self.degree + 1), range(1, 10**9)):
                q[i - n] = 2 * c[i]
                r[n - j] = r[n - j] - c[i]
        return (Polynomial(q, self.basis, self.interval),
                Polynomial(r, self.basis, self.interval))


def chebyshev_approximate(fn, degree: int, interval=(-1.0, 1.0)) -> Polynomial:
    """Chebyshev interpolation at Chebyshev nodes (ref bignum/chebyshev_approximation.go)."""
    a, b = interval
    n = degree + 1
    nodes = np.cos(np.pi * (np.arange(n) + 0.5) / n)
    x = 0.5 * (b - a) * nodes + 0.5 * (b + a)
    y = np.array([fn(v) for v in x], dtype=np.complex128)
    coeffs = []
    for k in range(n):
        ck = (2.0 / n) * np.sum(y * np.cos(np.pi * k * (np.arange(n) + 0.5) / n))
        coeffs.append(ck)
    coeffs[0] = coeffs[0] / 2
    return Polynomial(coeffs, basis=CHEBYSHEV, interval=interval)


def optimal_split(log_degree: int) -> int:
    """ref bignum.OptimalSplit: logSplit = logDegree>>1 (+1 heuristic)."""
    log_split = log_degree >> 1
    if log_degree - log_split > log_split:
        log_split += 1
    return max(1, log_split)


class PowerBasis:
    """X^n (or T_n) ladder with relinearized, rescaled squaring chains
    (ref circuits/common/polynomial/power_basis.go:17)."""

    def __init__(self, ct: Ciphertext, basis: str = MONOMIAL):
        self.basis = basis
        self.powers: dict[int, Ciphertext] = {1: ct}

    def gen_power(self, n: int, ev) -> Ciphertext:
        if n in self.powers:
            return self.powers[n]
        if self.basis == MONOMIAL:
            a = 1 << (n.bit_length() - 1)
            if a == n:
                a = b = n // 2
            else:
                b = n - a
            xa, xb = self.gen_power(a, ev), self.gen_power(b, ev)
            out = ev.rescale(ev.mul_relin(xa, xb.at_level(min(xa.level, xb.level))))
        else:
            a, b = (n + 1) // 2, n // 2
            xa, xb = self.gen_power(a, ev), self.gen_power(b, ev)
            prod = ev.mul_relin(xa, xb.at_level(min(xa.level, xb.level)))
            prod = ev.add(prod, prod)             # 2·T_a·T_b
            out = ev.rescale(prod)
            c = abs(a - b)
            if c == 0:
                out = ev.sub(out, 1.0)            # T_0 = 1
            else:
                tc = self.gen_power(c, ev)
                out = ev.sub(out, tc.at_level(out.level))
        self.powers[n] = out
        return out


class SimCiphertext:
    """Metadata-only ciphertext: (level, scale) for evaluation planning.

    The reference pre-plans every rescaling with a big-float SimEvaluator
    (ref polynomial_evaluator_sim.go:7); this is its TPU-build analog —
    running the *same* evaluation code against metadata-only objects to
    learn output levels/scales without touching device data.
    """

    __slots__ = ("level", "scale", "value")

    def __init__(self, level: int, scale):
        self.level = level
        self.scale = Fraction(scale)
        self.value = np.zeros(0, dtype=np.uint64)  # placates zero-ct paths

    def at_level(self, level: int) -> "SimCiphertext":
        return SimCiphertext(min(self.level, level), self.scale)

    def replace(self, value=None, scale=None) -> "SimCiphertext":
        return SimCiphertext(self.level,
                             self.scale if scale is None else scale)


class SimEvaluator:
    """Level/scale shadow of the CKKS evaluator (ref polynomial_evaluator_sim.go)."""

    def __init__(self, params):
        self.params = params

    def add(self, ct, op):
        if isinstance(op, SimCiphertext):
            return SimCiphertext(min(ct.level, op.level),
                                 max(ct.scale, op.scale))
        return ct

    sub = add

    def mul_relin(self, ct0, ct1):
        return SimCiphertext(min(ct0.level, ct1.level), ct0.scale * ct1.scale)

    def mul_const(self, ct, c, const_scale=None):
        cs = (Fraction(self.params.q_moduli[ct.level])
              if const_scale is None else Fraction(const_scale))
        return SimCiphertext(ct.level, ct.scale * cs)

    def rescale(self, ct):
        return SimCiphertext(ct.level - 1,
                             ct.scale / Fraction(self.params.q_moduli[ct.level]))


def simulate(params, level: int, scale, poly: "Polynomial",
             target_scale=None) -> SimCiphertext:
    """Dry-run a P-S evaluation: returns the output (level, scale)."""
    sim = PolynomialEvaluator.__new__(PolynomialEvaluator)
    sim.ev = SimEvaluator(params)
    sim.params = params
    return sim.evaluate(SimCiphertext(level, scale), poly, target_scale)


class PolynomialEvaluator:
    """P-S evaluation on CKKS ciphertexts (ref polynomial_evaluator.go:23)."""

    def __init__(self, ckks_eval):
        self.ev = ckks_eval
        self.params = ckks_eval.params

    def evaluate(self, ct: Ciphertext, poly: Polynomial,
                 target_scale: Fraction | None = None) -> Ciphertext:
        p = self.params
        target_scale = (p.default_scale_fraction if target_scale is None
                        else Fraction(target_scale))
        d = poly.degree
        if d < 0:
            raise ValueError("empty polynomial")

        log_degree = (d + 1).bit_length() - 1 if (d + 1) & d == 0 else (d + 1).bit_length()
        log_degree = max(1, (d).bit_length())
        log_split = optimal_split(log_degree)
        n1 = 1 << log_split

        pb = PowerBasis(ct, poly.basis)
        # giants
        m = n1
        while m <= d:
            pb.gen_power(m, self.ev)
            m <<= 1
        # babies
        for i in range(2, min(n1, d + 1)):
            pb.gen_power(i, self.ev)

        out = self._recurse(pb, poly, n1, target_scale)
        return out

    # -- recursion ------------------------------------------------------------

    def _recurse(self, pb: PowerBasis, poly: Polynomial, n1: int,
                 target_scale: Fraction) -> Ciphertext:
        d = poly.degree
        if d < n1:
            return self._eval_baby(pb, poly, target_scale)

        m = n1
        while m < (d >> 1) + 1:
            m <<= 1
        xm = pb.powers[m]
        q, r = poly.factorize(m)

        # plan the q branch so rescale(q_res·X^m) lands at target_scale
        lvl_assumed = None
        # q branch result level: we can't know exactly beforehand; assume the
        # product happens at xm's level (q_res is at least as high).
        lvl_assumed = xm.level
        q_target = target_scale * Fraction(self.params.q_moduli[lvl_assumed]) \
            / Fraction(xm.scale)
        q_ct = self._recurse(pb, q, n1, q_target)
        prod = self.ev.rescale(
            self.ev.mul_relin(q_ct.at_level(min(q_ct.level, xm.level)),
                              xm.at_level(min(q_ct.level, xm.level))))
        r_ct = self._recurse(pb, r, n1, Fraction(prod.scale))
        return self.ev.add(prod, r_ct.at_level(min(prod.level, r_ct.level)))

    def _eval_baby(self, pb: PowerBasis, poly: Polynomial,
                   target_scale: Fraction) -> Ciphertext:
        """Σ_i c_i·B_i + c_0 with constants encoded to land at target_scale."""
        ev = self.ev
        nz = [i for i, c in enumerate(poly.coeffs) if i > 0 and c != 0]
        if not nz:
            # constant polynomial: c_0 at target_scale on a zero ciphertext
            base = pb.powers[1]
            zero = base.replace(
                value=base.value * np.uint64(0), scale=target_scale)
            return ev.add(zero, complex(poly.coeffs[0])) if poly.coeffs[0] else zero
        lb = min(pb.powers[i].level for i in nz)
        q_lb = Fraction(self.params.q_moduli[lb])
        acc = None
        for i in nz:
            xi = pb.powers[i].at_level(lb)
            cs = target_scale * q_lb / Fraction(xi.scale)
            # pass coefficients through unconverted: Fraction coeffs
            # (CosDiscrete) quantise exactly inside mul_const
            term = ev.mul_const(xi, poly.coeffs[i], const_scale=cs)
            acc = term if acc is None else ev.add(acc, term)
        acc = ev.rescale(acc)
        if poly.coeffs[0]:
            acc = ev.add(acc, poly.coeffs[0])
        return acc
