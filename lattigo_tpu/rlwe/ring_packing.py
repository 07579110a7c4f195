"""Ring packing: Expand (1 ct → 2^k cts) and Pack (2^k cts → 1 ct).

TPU-native analog of ``core/rlwe/ring_packing.go`` (Expand:457, Pack:600,
ia.cr/2020/015 alg. 2). Both operate within one ring degree using the
X^{±2^i} monomial masking tree:

* Expand: repeatedly split even/odd coefficients with the automorphism
  X → X^{N/n+1} (sign-flips odd powers), shifting odd parts down by
  X^{-2^i}; the input is pre-multiplied by 2^{-logN}.
* Pack: the inverse tree — interleave pairs with X^{N/2^{i}} masks and the
  automorphisms σ_{5^{2^{i-1}}} (σ_{2N-1} at the last step).

Cross-ring-degree Split/Merge (N ↔ N/2 with ring-swap keys,
ref ring_packing.go:175/:378) are not yet implemented.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.rlwe.params import Parameters
from lattigo_tpu.rlwe.elements import Ciphertext
from lattigo_tpu.rlwe.evaluator import Evaluator


class RingPackingEvaluator:
    """ref ring_packing.go:13 (single-ring-degree subset)."""

    def __init__(self, rlwe_eval: Evaluator):
        self.ev = rlwe_eval
        self.params = rlwe_eval.params

    # -- helpers ---------------------------------------------------------------

    @functools.lru_cache(maxsize=None)
    def _x_pow_mont(self, power: int, level: int):
        """MForm(NTT(X^power)) for power mod 2N (ref GenXPow2NTT:773)."""
        p = self.params
        k = power % (2 * p.n)
        coeffs = [0] * p.n
        if k < p.n:
            coeffs[k] = 1
            poly = p.ring_q.from_int_coeffs(coeffs, level)
        else:
            coeffs[k - p.n] = 1
            poly = p.ring_q.neg(p.ring_q.from_int_coeffs(coeffs, level), level)
        # numpy: this lru cache may first fire inside a jit trace, where a
        # jnp result would be a leaked tracer
        return np.asarray(p.ring_q.mform(p.ring_q.ntt(poly, level), level))

    def _mul_xpow(self, ct: Ciphertext, power: int) -> Ciphertext:
        p = self.params
        return ct.replace(value=p.ring_q.mul_mont(
            ct.value, self._x_pow_mont(power, ct.level), ct.level))

    def galois_elements_for_expand(self, log_n: int | None = None) -> list[int]:
        p = self.params
        log_n = p.log_n if log_n is None else log_n
        return [p.n // (1 << i) + 1 for i in range(log_n)]

    def galois_elements_for_pack(self, log_start: int = 0) -> list[int]:
        p = self.params
        els = [p.galois_element(1 << (i - 1))
               for i in range(max(1, log_start), p.log_n)]
        if log_start == 0:
            els.append(p.galois_element_order_two)
        return sorted(set(els))

    # -- Expand ------------------------------------------------------------------

    def expand(self, ct: Ciphertext, log_gap: int = 0) -> dict[int, Ciphertext]:
        """cts[i·2^logGap] encrypts coefficient i·2^logGap of ct in slot 0
        of its coefficient embedding, scaled ×1 (ref Expand:457)."""
        p = self.params
        assert ct.degree == 1 and ct.is_ntt
        level = ct.level
        log_n = p.log_n
        n_inv = pow(1 << log_n, -1, p.q_big_int(level))
        cts = {0: ct.replace(value=p.ring_q.mul_scalar(ct.value, n_inv, level))}
        gap = 1 << log_gap
        for i in range(log_n):
            n = 1 << i
            gal = p.n // n + 1
            for j in range(0, n, gap):
                c0 = cts[j]
                tmp = self.ev.automorphism(c0, gal)
                if (j + n) % gap == 0:
                    # odd part, shifted down by X^{-2^i}
                    c1 = c0.replace(value=p.ring_q.sub(
                        c0.value, tmp.value, level))
                    cts[j + n] = self._mul_xpow(c1, -(1 << i))
                cts[j] = c0.replace(value=p.ring_q.add(c0.value, tmp.value, level))
        return {k: v for k, v in cts.items() if k % gap == 0}

    # -- Pack --------------------------------------------------------------------

    def pack(self, cts: dict[int, Ciphertext],
             input_log_gap: int | None = None) -> Ciphertext:
        """Interleave cts[i] into one ciphertext (ref Pack:600).

        input_log_gap = log2 spacing of meaningful coefficients inside each
        input (default logN: only coefficient multiples of... i.e. each ct
        contributes its coefficients at multiples of 2^logN ⇒ full pack with
        garbage zeroing, the bootstrapping use case).
        """
        p = self.params
        cts = dict(cts)
        keys = sorted(cts.keys())
        level = cts[keys[0]].level
        log_n = p.log_n
        input_log_gap = log_n if input_log_gap is None else input_log_gap
        log_start = log_n - input_log_gap
        log_end = log_n
        n_inv = pow(1 << (log_end - log_start), -1, p.q_big_int(level))
        for k in keys:
            cts[k] = cts[k].replace(
                value=p.ring_q.mul_scalar(cts[k].value, n_inv, level))

        for i in range(log_start, log_end):
            t = 1 << (log_n - 1 - i)
            for jx in range(t):
                jy = jx + t
                a = cts.get(jx)
                b = cts.get(jy)
                gal = (p.galois_element_order_two if i == 0
                       else p.galois_element(1 << (i - 1)))
                if b is not None:
                    # X^{N/2^{i+1}} (ref Pack:703 xPow2[logN-1-i])
                    b = self._mul_xpow(b, p.n >> (i + 1))
                    cts[jy] = None
                    if a is not None:
                        diff = a.replace(value=p.ring_q.sub(a.value, b.value, level))
                        asum = a.replace(value=p.ring_q.add(a.value, b.value, level))
                        rot = self.ev.automorphism(diff, gal)
                        cts[jx] = asum.replace(
                            value=p.ring_q.add(asum.value, rot.value, level))
                    else:
                        rot = self.ev.automorphism(b, gal)
                        cts[jx] = b.replace(
                            value=p.ring_q.sub(b.value, rot.value, level))
                elif a is not None:
                    rot = self.ev.automorphism(a, gal)
                    cts[jx] = a.replace(
                        value=p.ring_q.add(a.value, rot.value, level))
        return cts[0]
