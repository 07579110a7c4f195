"""LMKCDEY blind rotation: programmable bootstrapping / LUT evaluation.

TPU-native analog of ``core/rgsw/blindrot`` (ia.cr/2022/198, Algorithms 3
and 7; ref evaluator.go:29-282, keys.go:21-120, blindrot.go:12).

Algorithm sketch. An LWE sample ``(b, a) ∈ Z_{2N}^{n+1}`` is extracted from
a (coefficient-domain) RLWE ciphertext over the small "LWE" ring; the
accumulator in the large "BR" ring starts at ``(f(X^{-g})·X^{-g·b}, 0)``
and is multiplied by ``RGSW(X^{s_j})`` for every LWE secret coefficient,
grouped by the discrete log of ``a_j = ±g^k mod 2N`` so that one
automorphism by ``g^v`` serves a whole group (window ``w``, ref Algorithm
3). The result encrypts ``f(X)·X^{b+⟨a,s⟩}``, i.e. ``f`` evaluated at the
phase — a programmable LUT.

Device/host split (TPU design note): the discrete-log grouping is
*data-dependent* — it derives from the mod-switched ciphertext
coefficients — so the schedule cannot be traced statically. The tiny
``a`` vector (n_lwe u64 values) is pulled to host once per blind rotation
and drives a host-side loop of jitted device steps (external products +
automorphisms). All heavy arithmetic stays on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from lattigo_tpu.ring import automorphism as auto_mod
from lattigo_tpu.rlwe.params import Parameters
from lattigo_tpu.rlwe.elements import Ciphertext
from lattigo_tpu.rlwe.evaluator import Evaluator as RlweEvaluator
from lattigo_tpu.rlwe.keys import EvaluationKeySet, KeyGenerator, SecretKey
from lattigo_tpu.rgsw import rgsw as rgsw_mod

WINDOW_SIZE = 10  # parameter w of Algorithm 3 (ref keys.go:14)


# ---------------------------------------------------------------------------
# Test polynomial (the LUT; ref blindrot.go:12 InitTestPolynomial)
# ---------------------------------------------------------------------------

def init_test_polynomial(g, scale: float, params_br: Parameters,
                         a: float, b: float, level: int | None = None):
    """NTT-domain test polynomial F with F[X^{-phase}]·X^{phase} = g(phase).

    Negacyclic layout: coefficients i ∈ [0, N/2] hold g on [-1, 0], the top
    half holds −g on ]0, 1[ (monomial sign wrap). Inputs are assumed
    normalised by (2x − a − b)/(b − a).
    """
    p = params_br
    level = p.max_level if level is None else level
    n = p.n
    interval = 2.0 / n
    coeffs = [0] * n
    for i in range(n // 2 + 1):
        x = (-interval * i * (b - a) + b + a) / 2.0
        coeffs[i] = int(round(g(x) * scale))
    for i in range(n // 2 + 1, n):
        x = (interval * (n - i) * (b - a) + b + a) / 2.0
        coeffs[i] = -int(round(g(x) * scale))
    return p.ring_q.ntt(p.ring_q.from_int_coeffs(coeffs, level), level)


# ---------------------------------------------------------------------------
# Keys (ref keys.go:32 MemBlindRotationEvaluationKeySet / :46 GenEvaluationKeyNew)
# ---------------------------------------------------------------------------

@dataclass
class BlindRotationKeySet:
    """RGSW(X^{s_i}) per LWE secret coefficient + the automorphism keys."""

    brk: list  # list[rgsw_mod.Ciphertext], one per LWE sk coefficient
    evk: EvaluationKeySet  # Galois keys for g^v (v=1..w) and 2N−g


def gen_evaluation_keys(key, params_br: Parameters, sk_br: SecretKey,
                        params_lwe: Parameters, sk_lwe: SecretKey,
                        window: int = WINDOW_SIZE) -> BlindRotationKeySet:
    """ref keys.go:46 GenEvaluationKeyNew."""
    p_lwe, p_br = params_lwe, params_br
    # recover the centered integer coefficients of the LWE secret
    s_ntt_m = sk_lwe.value.q[..., :1, :]
    s_coeff = p_lwe.ring_q.imform(p_lwe.ring_q.intt(s_ntt_m, 0), 0)
    s_int = p_lwe.ring_q.to_int_coeffs(np.asarray(s_coeff), 0, centered=True)

    enc = rgsw_mod.Encryptor(p_br, sk_br)
    keys = jax.random.split(key, p_lwe.n + 1)
    brk = [enc.encrypt_monomial(keys[i], int(s_int[i]))
           for i in range(p_lwe.n)]

    g = p_br.galois_gen
    gal_els = sorted({pow(g, v, 2 * p_br.n) for v in range(1, window + 1)}
                     | {2 * p_br.n - g})
    kgen = KeyGenerator(p_br)
    gks = kgen.gen_galois_keys(keys[-1], gal_els, sk_br)
    return BlindRotationKeySet(brk=brk, evk=EvaluationKeySet(galois_keys=gks))


# ---------------------------------------------------------------------------
# Evaluator (ref evaluator.go:29)
# ---------------------------------------------------------------------------

class BlindRotationEvaluator:
    """LWE extraction + LMKCDEY blind rotation (ref evaluator.go:47 Evaluate)."""

    def __init__(self, params_br: Parameters, params_lwe: Parameters):
        self.p_br = params_br
        self.p_lwe = params_lwe
        # map[±g^k mod 2N] → ±k  (ref getGaloisElementInverseMap:229)
        two_n = 2 * params_br.n
        self.dlog = {}
        pow_g = 1
        for i in range(params_br.n // 2):
            self.dlog[pow_g] = i
            self.dlog[two_n - pow_g] = -i
            pow_g = pow_g * params_br.galois_gen % two_n

    # -- mod switch Q → 2N (ref modSwitchRLWETo2NLvl:293) -------------------------

    def _mod_switch_to_2n(self, poly, level: int, make_odd: bool) -> np.ndarray:
        p = self.p_lwe
        two_n = 2 * self.p_br.n
        ints = p.ring_q.to_int_coeffs(np.asarray(poly), level, centered=False)
        q_big = p.q_big_int(level)
        out = np.empty(p.n, dtype=np.uint64)
        for i, x in enumerate(ints):
            v = ((int(x) * two_n + q_big // 2) // q_big) % two_n
            if make_odd and v & 1 == 0 and v != 0:
                v ^= 1
            out[i] = v
        return out

    # -- blind rotation core (ref BlindRotateCore:135) ------------------------------

    def _core(self, a_2n: np.ndarray, acc: Ciphertext, ev: RlweEvaluator,
              brk: BlindRotationKeySet, window: int) -> Ciphertext:
        p = self.p_br
        two_n = 2 * p.n
        g = p.galois_gen

        # map[±k] → [j...] with a_j = ±g^k (ref getDiscreteLogSets:253)
        sets: dict[int, list[int]] = {}
        for j, aj in enumerate(a_2n):
            aj = int(aj)
            if aj == 0:
                continue  # zero coefficients contribute X^0 — skip entirely
            if aj & 1 != 1:
                raise ValueError("a[j] not odd: not in Z_2N^*")
            sets.setdefault(self.dlog[aj], []).append(j)

        def gal(v: int) -> int:
            return pow(g, v, two_n)

        def step(k: int, v: int, acc: Ciphertext) -> tuple[int, Ciphertext]:
            """One iteration of lines 3-9 / 13-19 of Algorithm 3."""
            if k in sets:
                if v != 0:
                    acc = ev.automorphism(acc, gal(v))
                    v = 0
                for j in sets[k]:
                    acc = rgsw_mod.external_product(ev, acc, brk.brk[j])
            v += 1
            if v == window or k == 1:
                acc = ev.automorphism(acc, gal(v))
                v = 0
            return v, acc

        n_half = p.n // 2
        v = 0
        for i in range(n_half - 1, 0, -1):       # negative set: a_j = −g^i
            v, acc = step(-i, v, acc)
        # ±0 buckets. dlog can't distinguish +g^0 (a_j = 1) from −g^0
        # (a_j = 2N−1) — both have discrete log 0 — so they are rebuilt by
        # value. The −0 bucket must be applied *before* the line-12 σ_{-g}
        # (after flushing pending rotations) so its factors pick up exactly
        # −g^{N/2} = −1; the +0 bucket goes last with no rotation at all.
        # (The reference instead folds −0 into the +0 bucket via its dlog
        # map collision — a small phase-noise bug we do not replicate.)
        neg_zero = [j for j, aj in enumerate(a_2n) if int(aj) == two_n - 1]
        pos_zero = [j for j, aj in enumerate(a_2n) if int(aj) == 1]
        if neg_zero:
            if v != 0:
                acc = ev.automorphism(acc, gal(v))
                v = 0
            for j in neg_zero:
                acc = rgsw_mod.external_product(ev, acc, brk.brk[j])
        if v != 0:
            acc = ev.automorphism(acc, gal(v))
            v = 0
        # line 12: acc = acc(X^{-g})
        acc = ev.automorphism(acc, two_n - g)
        for i in range(n_half - 1, 0, -1):       # positive set: a_j = g^i
            v, acc = step(i, v, acc)
        if pos_zero:
            if v != 0:
                acc = ev.automorphism(acc, gal(v))
                v = 0
            for j in pos_zero:
                acc = rgsw_mod.external_product(ev, acc, brk.brk[j])
        elif v != 0:
            acc = ev.automorphism(acc, gal(v))
        return acc

    # -- public API (ref Evaluate:47) -------------------------------------------------

    def evaluate(self, ct: Ciphertext, test_polys: dict[int, jax.Array],
                 brk: BlindRotationKeySet,
                 window: int = WINDOW_SIZE) -> dict[int, Ciphertext]:
        """Blind-rotate the LWE samples extracted at the given slot indices.

        ct: RLWE ciphertext over params_lwe. test_polys[i]: NTT-domain test
        polynomial (from :func:`init_test_polynomial`) for slot i. Returns
        {i: RLWE_br(f_i(X)·X^{phase_i})} with phase ≈ round(2N·m_i/q).
        """
        p_lwe, p_br = self.p_lwe, self.p_br
        two_n = 2 * p_br.n
        mask = two_n - 1
        level = ct.level
        ev = RlweEvaluator(p_br, brk.evk)

        v = ct.value
        if ct.is_ntt:
            v = p_lwe.ring_q.intt(v, level)
        b_2n = self._mod_switch_to_2n(v[..., 0, :, :], level, make_odd=False)
        a_q = self._mod_switch_to_2n(v[..., 1, :, :], level, make_odd=True)
        # convolution → dot product: a'_0 = a_0, a'_j = −a_{N−j} (ref :80-88)
        a_2n = np.empty_like(a_q)
        a_2n[0] = a_q[0]
        for j in range(1, p_lwe.n):
            a_2n[j] = (-int(a_q[p_lwe.n - j])) & mask

        out: dict[int, Ciphertext] = {}
        prev = 0
        for index in sorted(test_polys.keys()):
            # shift a by X^{index−prev} mod 2N (ref mulBySmallMonomialMod2N)
            shift = index - prev
            if shift:
                a_2n = np.roll(a_2n, shift)
                a_2n[:shift] = (-a_2n[:shift].astype(np.int64)) & mask
            prev = index
            b = int(b_2n[index])

            # acc = (f(X^{-g})·X^{-g·b}, 0) (ref Evaluate:108-115)
            f = test_polys[index]
            lvl_br = f.shape[-2] - 1
            xb = [0] * p_br.n
            kb = b % two_n
            if kb < p_br.n:
                xb[kb] = 1
                xb_poly = p_br.ring_q.from_int_coeffs(xb, lvl_br)
            else:
                xb[kb - p_br.n] = 1
                xb_poly = p_br.ring_q.neg(
                    p_br.ring_q.from_int_coeffs(xb, lvl_br), lvl_br)
            xb_m = p_br.ring_q.mform(p_br.ring_q.ntt(xb_poly, lvl_br), lvl_br)
            c0 = p_br.ring_q.mul_mont(f, xb_m, lvl_br)
            idx = auto_mod.ntt_index(p_br.n, two_n - p_br.galois_gen)
            c0 = auto_mod.apply_ntt(c0, idx)
            acc = Ciphertext(
                value=jnp.stack([c0, jnp.zeros_like(c0)], axis=-3), is_ntt=True)

            out[index] = self._core(a_2n, acc, ev, brk, window)
        return out
