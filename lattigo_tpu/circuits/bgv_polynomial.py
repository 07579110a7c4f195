"""Exact polynomial evaluation on BGV/BFV ciphertexts (Paterson–Stockmeyer).

TPU-native analog of ``circuits/bgv/polynomial`` (+ the uint64
CoefficientGetter) and ``ring/interpolation.go`` (Lagrange interpolation
over Z_T). Unlike the CKKS evaluator, no scale planning is needed: BGV
scales live in Z_T and adds re-align them exactly by scalar
multiplication (ref schemes/bgv/evaluator.go:1542 MatchScalesAndLevel),
so the recursion is plain integer arithmetic.
"""

from __future__ import annotations

import math

from lattigo_tpu.rlwe.elements import Ciphertext


def interpolate_mod_t(xs: list[int], ys: list[int], t: int) -> list[int]:
    """Coefficients of the unique deg<|xs| polynomial through (x_i, y_i) mod t.

    t must be prime and the x_i distinct mod t (ref ring/interpolation.go:12).
    """
    n = len(xs)
    assert len(ys) == n
    coeffs = [0] * n
    for i in range(n):
        # Lagrange basis l_i(x) = Π_{j≠i} (x − x_j)/(x_i − x_j), little-endian
        num = [1]
        denom = 1
        for j in range(n):
            if j == i:
                continue
            new = [0] * (len(num) + 1)
            for k, c in enumerate(num):
                new[k] = (new[k] - xs[j] * c) % t
                new[k + 1] = (new[k + 1] + c) % t
            num = new
            denom = denom * (xs[i] - xs[j]) % t
        s = ys[i] * pow(denom, -1, t) % t
        for k, c in enumerate(num):
            coeffs[k] = (coeffs[k] + s * c) % t
    return coeffs


def function_mod_t(fn, t: int) -> list[int]:
    """Interpolate an arbitrary function Z_t → Z_t (degree t−1; t prime)."""
    xs = list(range(t))
    ys = [fn(x) % t for x in xs]
    return interpolate_mod_t(xs, ys, t)


class BGVPolynomialEvaluator:
    """Monomial-basis P-S evaluation with exact Z_T coefficients."""

    def __init__(self, bgv_eval):
        self.ev = bgv_eval
        self.params = bgv_eval.params

    def evaluate(self, ct: Ciphertext, coeffs: list[int]) -> Ciphertext:
        """p(ct) for p = Σ coeffs[i]·x^i over Z_T (ref polynomial_evaluator.go)."""
        t = self.params.t
        coeffs = [c % t for c in coeffs]
        d = len(coeffs) - 1
        while d > 0 and coeffs[d] == 0:
            d -= 1
        if d == 0:
            zero = ct.replace(value=ct.value * 0)
            return self.ev.add(zero, coeffs[0]) if coeffs[0] else zero

        log_degree = max(1, d.bit_length())
        log_split = max(1, log_degree >> 1)
        if log_degree - log_split > log_split:
            log_split += 1
        n1 = 1 << log_split

        powers: dict[int, Ciphertext] = {1: ct}

        def gen_power(n: int) -> Ciphertext:
            if n in powers:
                return powers[n]
            a = 1 << (n.bit_length() - 1)
            if a == n:
                a = b = n // 2
            else:
                b = n - a
            xa, xb = gen_power(a), gen_power(b)
            out = self.ev.rescale(self.ev.mul_relin(
                xa, xb.at_level(min(xa.level, xb.level))))
            powers[n] = out
            return out

        m = n1
        while m <= d:
            gen_power(m)
            m <<= 1
        for i in range(2, min(n1, d + 1)):
            gen_power(i)

        def recurse(cs: list[int]) -> Ciphertext | None:
            """Evaluate Σ cs[i]·x^i; None for the zero polynomial."""
            dd = len(cs) - 1
            while dd > 0 and cs[dd] == 0:
                dd -= 1
            cs = cs[: dd + 1]
            if dd < n1:
                acc = None
                for i in range(1, dd + 1):
                    if cs[i] == 0:
                        continue
                    term = self.ev.mul_scalar(powers[i], cs[i])
                    acc = term if acc is None else self.ev.add(acc, term)
                if cs[0]:
                    acc = (self.ev.add(acc, cs[0]) if acc is not None
                           else self.ev.add(
                               ct.replace(value=ct.value * 0), cs[0]))
                return acc
            mm = n1
            while mm < (dd >> 1) + 1:
                mm <<= 1
            q_ct = recurse(cs[mm:])
            r_ct = recurse(cs[:mm])
            xm = powers[mm]
            if q_ct is None:
                return r_ct
            prod = self.ev.rescale(self.ev.mul_relin(
                q_ct.at_level(min(q_ct.level, xm.level)),
                xm.at_level(min(q_ct.level, xm.level))))
            if r_ct is None:
                return prod
            return self.ev.add(prod, r_ct.at_level(min(prod.level, r_ct.level)))

        out = recurse(coeffs)
        assert out is not None
        return out
