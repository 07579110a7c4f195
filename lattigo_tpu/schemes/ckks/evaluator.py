"""CKKS evaluator: approximate arithmetic with exact scale bookkeeping.

TPU-native analog of ``schemes/ckks/evaluator.go``. Scales are exact
Fractions resolved at trace time (the functional analog of the reference's
SimEvaluator-style pre-planning, SURVEY.md §7 risk 4): every (shape, scale)
pair is a distinct compiled program and no scale arithmetic happens on
device.

Scale policy (matching the reference):
* Add/Sub: operands are brought to the max of the two scales by integer
  scalar multiplication when the ratio is integral (ref evaluator.go:51-219).
* Mul: out.scale = s0·s1 (tensoring, ref mulRelin:764).
* Rescale: drop q_l, scale /= q_l (ref Rescale:477).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring import modops, scaling
from lattigo_tpu.rlwe.elements import Ciphertext, Plaintext, ciphertext_from_polys
from lattigo_tpu.rlwe.evaluator import Evaluator as RlweEvaluator
from lattigo_tpu.rlwe.keys import EvaluationKeySet
from lattigo_tpu.schemes.ckks.params import Parameters


class Evaluator(RlweEvaluator):
    """CKKS arithmetic (ref schemes/ckks/evaluator.go:16)."""

    def __init__(self, params: Parameters, evk: EvaluationKeySet | None = None):
        super().__init__(params, evk)
        self.params: Parameters = params

    # -- scale management ---------------------------------------------------------

    def _match_scales(self, ct0: Ciphertext, ct1: Ciphertext):
        """Bring both operands to the larger scale.

        The smaller-scale operand is multiplied by round(s_big/s_small) and
        then RELABELED to s_big; the residual relative mismatch (e.g.
        q_i·q_j/2^90 − 1 ≈ 1e-9 after two rescales) is folded into the
        message error. NOTE the deliberate delta from the reference's
        big-float TRUNCATION (ref evaluator.go:246 ratioFlo.Int): with
        exact-Fraction scale labels, planned scales divide by the actual
        chain primes (2^b ± δ) so ratios land just below exact powers —
        flooring would multiply by e.g. 1023 instead of 1024 and fold a
        2^-10 relative error into the message, while rounding leaves ~δ.
        A large mismatch indicates a circuit bug and raises.
        """
        s0, s1 = Fraction(ct0.scale), Fraction(ct1.scale)
        if s0 == s1:
            return ct0, ct1
        if s1 < s0:
            ct1m, ct0m = self._match_scales(ct1, ct0)
            return ct0m, ct1m
        # ROUND the integer ratio: planned scales divide by the actual chain
        # primes (2^b + δ), so ratios systematically land just below exact
        # powers (e.g. 1024·(1−2^-41)); flooring would multiply by 1023 and
        # fold a 2^-10 relative error into the message, rounding leaves ~δ.
        ri = int(s1 / s0 + Fraction(1, 2))
        if ri > 1:
            v = self.params.ring_q.mul_scalar(ct0.value, ri, ct0.level)
            ct0 = ct0.replace(value=v, scale=s0 * ri)
            s0 = s0 * ri
        rel = float(s1 / s0)
        if not (0.99 < rel < 1.01):
            raise ValueError(f"scale mismatch too large to fold: {s0} vs {s1}")
        return ct0.replace(scale=s1), ct1

    # -- linear ops --------------------------------------------------------------------

    def add(self, ct0: Ciphertext, op1) -> Ciphertext:
        p = self.params
        if isinstance(op1, Ciphertext):
            ct0, ct1 = self._match_scales(ct0, op1)
            level = min(ct0.level, ct1.level)
            d = max(ct0.degree, ct1.degree)
            return ct0.replace(value=p.ring_q.add(
                self._resize(ct0, d, level), self._resize(ct1, d, level), level))
        if isinstance(op1, Plaintext):
            ct0, pt = self._match_pt_scale(ct0, op1)
            level = min(ct0.level, pt.level)
            v = ct0.value[..., : level + 1, :]
            c0 = p.ring_q.add(v[..., 0, :, :], pt.value[..., : level + 1, :], level)
            return ct0.replace(value=v.at[..., 0, :, :].set(c0))
        return self._add_const(ct0, op1, negate=False)

    def sub(self, ct0: Ciphertext, op1) -> Ciphertext:
        p = self.params
        if isinstance(op1, Ciphertext):
            ct0, ct1 = self._match_scales(ct0, op1)
            level = min(ct0.level, ct1.level)
            d = max(ct0.degree, ct1.degree)
            return ct0.replace(value=p.ring_q.sub(
                self._resize(ct0, d, level), self._resize(ct1, d, level), level))
        if isinstance(op1, Plaintext):
            ct0, pt = self._match_pt_scale(ct0, op1)
            level = min(ct0.level, pt.level)
            v = ct0.value[..., : level + 1, :]
            c0 = p.ring_q.sub(v[..., 0, :, :], pt.value[..., : level + 1, :], level)
            return ct0.replace(value=v.at[..., 0, :, :].set(c0))
        return self._add_const(ct0, op1, negate=True)

    def neg(self, ct: Ciphertext) -> Ciphertext:
        return ct.replace(value=self.params.ring_q.neg(ct.value, ct.level))

    def _match_pt_scale(self, ct: Ciphertext, pt: Plaintext):
        s0, s1 = Fraction(ct.scale), Fraction(pt.scale)
        if s0 == s1:
            return ct, pt
        # round, not floor — see _match_scales
        if s1 > s0:
            ri = int(s1 / s0 + Fraction(1, 2))
            if ri > 1:
                v = self.params.ring_q.mul_scalar(ct.value, ri, ct.level)
                ct = ct.replace(value=v, scale=s0 * ri)
                s0 = s0 * ri
        else:
            ri = int(s0 / s1 + Fraction(1, 2))
            if ri > 1:
                v = self.params.ring_q.mul_scalar(pt.value, ri, pt.level)
                pt = pt.replace(value=v, scale=s1 * ri)
                s1 = s1 * ri
        rel = float(max(s0, s1) / min(s0, s1))
        if not (0.99 < rel < 1.01):
            raise ValueError(f"ct/pt scale mismatch too large to fold: {s0} vs {s1}")
        hi = max(s0, s1)
        return ct.replace(scale=hi), pt.replace(scale=hi)

    def _resize(self, ct: Ciphertext, degree: int, level: int):
        v = ct.value[..., : level + 1, :]
        if ct.degree < degree:
            pad = v.shape[:-3] + (degree - ct.degree,) + v.shape[-2:]
            v = jnp.concatenate([v, jnp.zeros(pad, dtype=v.dtype)], axis=-3)
        return v

    def _add_const(self, ct: Ciphertext, c, negate: bool) -> Ciphertext:
        """ct ± c for real/complex scalar c, encoded at ct.scale.

        Real part adds to the constant coefficient; imaginary part rides on
        X^{N/2}, which equals i in every slot (5^j ≡ 1 mod 4).
        """
        p = self.params
        level = ct.level
        scale = Fraction(ct.scale)
        if isinstance(c, complex):
            cre = int(round(c.real * float(scale)))
            cim = int(round(c.imag * float(scale)))
        else:
            cre = round(Fraction(c) * scale)  # exact for Fraction/int/float
            cim = 0
        if negate:
            cre, cim = -cre, -cim
        Q = p.q_big_int(level)
        # constant polynomial cre + cim·X^{N/2} in NTT domain
        coeffs = np.zeros(p.n, dtype=object)
        coeffs[0] = cre % Q
        if cim:
            coeffs[p.n // 2] = cim % Q
        poly = p.ring_q.ntt(p.ring_q.from_int_coeffs(list(coeffs), level), level)
        c0 = p.ring_q.add(ct.value[..., 0, :, :], poly, level)
        return ct.replace(value=ct.value.at[..., 0, :, :].set(c0))

    def mul_scalar_int(self, ct: Ciphertext, k: int) -> Ciphertext:
        """Exact integer scalar multiply (scale unchanged)."""
        return ct.replace(value=self.params.ring_q.mul_scalar(ct.value, k, ct.level))

    def scale_up(self, ct: Ciphertext, factor: int) -> Ciphertext:
        """Multiply value AND scale by an integer: the message is unchanged
        but the scale grows (ref evaluator.go:427 ScaleUp)."""
        factor = int(factor)
        return ct.replace(
            value=self.params.ring_q.mul_scalar(ct.value, factor, ct.level),
            scale=Fraction(ct.scale) * factor)

    def set_scale(self, ct: Ciphertext, scale) -> Ciphertext:
        """Bring the ciphertext to exactly `scale`: one constant mul at the
        quantised ratio + rescale; the ratio quantisation error becomes
        noise, as in the reference (ref evaluator.go:445 SetScale)."""
        scale = Fraction(scale)
        q_l = Fraction(self.params.q_moduli[ct.level])
        r = round(scale * q_l / Fraction(ct.scale))
        out = self.rescale(ct.replace(
            value=self.params.ring_q.mul_scalar(ct.value, r, ct.level),
            scale=Fraction(ct.scale) * r))
        return out.replace(scale=scale)

    def mul_const(self, ct: Ciphertext, c,
                  const_scale: Fraction | None = None) -> Ciphertext:
        """Multiply by a real/complex constant scaled to ~one prime.

        The constant is quantised at const_scale (default: q_level, so one
        rescale restores the input scale — ref evaluateWithScalar:410).
        """
        p = self.params
        level = ct.level
        cs = Fraction(p.q_moduli[level]) if const_scale is None else Fraction(const_scale)
        if isinstance(c, complex):
            cre = int(round(c.real * float(cs)))
            cim = int(round(c.imag * float(cs)))
        else:
            # real constants quantise exactly (Fraction/int/float are all
            # exact rationals) — needed by CosDiscrete EvalMod, whose
            # coefficients must survive at ≫53-bit precision
            cre = round(Fraction(c) * cs)
            cim = 0
        l = level + 1
        rq = p.ring_q
        out = rq.mul_scalar(ct.value, cre, level)
        if cim:
            # i = X^{N/2}: multiply by cim·X^{N/2} = negacyclic half-rotation.
            # In NTT domain X^{N/2} is the diagonal of its NTT — cheap poly mul.
            xn2 = np.zeros(p.n, dtype=object)
            xn2[p.n // 2] = cim % p.q_big_int(level)
            poly = rq.mform(rq.ntt(rq.from_int_coeffs(list(xn2), level), level), level)
            out2 = rq.mul_mont(ct.value, poly, level)
            out = rq.add(out, out2, level)
        return ct.replace(value=out, scale=Fraction(ct.scale) * cs)

    # -- multiplication -------------------------------------------------------------------

    def mul(self, ct0: Ciphertext, op1, relin: bool = False) -> Ciphertext:
        p = self.params
        rq = p.ring_q
        if isinstance(op1, Plaintext):
            level = min(ct0.level, op1.level)
            l = level + 1
            ptm = rq.mform(op1.value[..., :l, :], level)
            v = modops.mred(ct0.value[..., :l, :], ptm[..., None, :, :],
                            rq.q[:l], rq.qinv[:l])
            return ct0.replace(value=v,
                               scale=Fraction(ct0.scale) * Fraction(op1.scale))
        ct1: Ciphertext = op1
        assert ct0.degree == 1 and ct1.degree == 1, "mul expects degree-1 inputs"
        level = min(ct0.level, ct1.level)
        l = level + 1
        a = ct0.value[..., :l, :]
        b = ct1.value[..., :l, :]
        am = rq.mform(a, level)
        a0, a1 = am[..., 0, :, :], am[..., 1, :, :]
        b0, b1 = b[..., 0, :, :], b[..., 1, :, :]
        c0 = modops.mred(a0, b0, rq.q[:l], rq.qinv[:l])
        c1 = modops.add_mod(
            modops.mred(a0, b1, rq.q[:l], rq.qinv[:l]),
            modops.mred(a1, b0, rq.q[:l], rq.qinv[:l]), rq.q[:l])
        c2 = modops.mred(a1, b1, rq.q[:l], rq.qinv[:l])
        out = ciphertext_from_polys(
            [c0, c1, c2], is_ntt=True,
            scale=Fraction(ct0.scale) * Fraction(ct1.scale))
        if relin:
            out = self.relinearize(out)
        return out

    def mul_relin(self, ct0: Ciphertext, op1) -> Ciphertext:
        return self.mul(ct0, op1, relin=True)

    def mul_then_add(self, ct0: Ciphertext, op1, acc: Ciphertext) -> Ciphertext:
        """acc + ct0·op1 (ref mulRelinThenAdd:1081 — fusion is XLA's job
        here; the method exists for API parity and scale-match checking)."""
        return self.add(acc, self.mul(ct0, op1))

    def mul_relin_then_add(self, ct0: Ciphertext, op1,
                           acc: Ciphertext) -> Ciphertext:
        return self.add(acc, self.mul(ct0, op1, relin=True))

    def drop_level(self, ct: Ciphertext, levels: int = 1) -> Ciphertext:
        """Discard the top `levels` moduli without scaling (ref DropLevel)."""
        return ct.at_level(ct.level - levels)

    def rotate_and_add(self, ct: Ciphertext, batch: int, n: int) -> Ciphertext:
        """Σ_{i<n} rot(ct, i·batch) (ref evaluator.go:1315 RotateAndAdd —
        same log-depth ladder as InnerSum)."""
        return self.inner_sum(ct, batch, n)

    # -- rescaling -------------------------------------------------------------------------

    def rescale(self, ct: Ciphertext) -> Ciphertext:
        p = self.params
        level = ct.level
        assert level >= 1, "cannot rescale at level 0"
        v = scaling.div_by_last_modulus(p.ring_q, ct.value, level,
                                        ntt_domain=ct.is_ntt, round_div=True)
        return ct.replace(value=v,
                          scale=Fraction(ct.scale) / Fraction(p.q_moduli[level]))

    def rescale_to(self, ct: Ciphertext, target: Fraction) -> Ciphertext:
        """Rescale while scale / q_l stays ≥ target (ref RescaleTo:523)."""
        while ct.level > 0 and Fraction(ct.scale) / self.params.q_moduli[ct.level] >= target:
            ct = self.rescale(ct)
        return ct

    # -- monomial tricks ----------------------------------------------------------------------

    def _i_monomial(self, level: int):
        """MForm(NTT(X^{N/2})) — X^{N/2} = i in every slot (5^j ≡ 1 mod 4)."""
        cache = getattr(self, "_i_monomial_cache", None)
        if cache is None:
            cache = self._i_monomial_cache = {}
        if level not in cache:
            p = self.params
            coeffs = [0] * p.n
            coeffs[p.n // 2] = 1
            # constant computation must stay concrete even mid-trace
            # (jax >= 0.9 turns constant ops into tracers otherwise), and
            # must bypass the engine NTT: its weight tables may be TRACERS
            # when a pipeline threads them through the jit boundary
            # (bootstrapping.jitted big_state)
            import jax
            from lattigo_tpu.ring import ntt as ntt_mod
            with jax.ensure_compile_time_eval():
                poly = p.ring_q.from_int_coeffs(coeffs, level)
                l = level + 1
                x = ntt_mod.ntt(poly, p.ring_q.roots[:l], p.ring_q.q[:l],
                                p.ring_q.qinv[:l], p.ring_q.log_n)
                cache[level] = np.asarray(p.ring_q.mform(x, level))
        return cache[level]

    def mul_by_i(self, ct: Ciphertext) -> Ciphertext:
        """Multiply all slots by i: exact, depth-free, scale-preserving."""
        p = self.params
        level = ct.level
        return ct.replace(value=p.ring_q.mul_mont(
            ct.value, self._i_monomial(level), level))

    def mul_by_minus_i(self, ct: Ciphertext) -> Ciphertext:
        """Multiply all slots by −i (X^{3N/2} = −X^{N/2}: exact monomial,
        ref the CI bootstrap's Mul(ct, -1i), bootstrapping/evaluator.go:505)."""
        p = self.params
        level = ct.level
        return ct.replace(value=p.ring_q.neg(p.ring_q.mul_mont(
            ct.value, self._i_monomial(level), level), level))

    # -- rotations ----------------------------------------------------------------------------

    def rotate(self, ct: Ciphertext, k: int) -> Ciphertext:
        """Cyclic left rotation of the N/2 slots by k (ref :1197)."""
        return self.automorphism(ct, self.params.galois_element(k))

    def conjugate(self, ct: Ciphertext) -> Ciphertext:
        """Slot-wise complex conjugation (ref :1206)."""
        return self.automorphism(ct, self.params.galois_element_order_two)

    def rotate_hoisted(self, ct: Ciphertext, ks: list[int]) -> dict:
        """{k: rot(ct, k)}: the gadget decomposition of c1 is computed ONCE
        and shared across all rotations (ref :1228 RotateHoisted)."""
        assert ct.degree == 1 and ct.is_ntt
        digits = self.decompose_ntt(ct.value[..., 1, :, :], ct.level)
        return {k: (ct if k == 0 else self.automorphism_hoisted(
            ct, digits, self.params.galois_element(k))) for k in ks}
