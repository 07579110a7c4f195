"""Ring packing: Expand/Pack within a ring degree, Split/Merge across them.

TPU-native analog of ``core/rlwe/ring_packing.go`` (Extract:56, Split:175,
Merge:378, Expand:457, Pack:600, ia.cr/2020/015 alg. 2).

* Expand: repeatedly split even/odd coefficients with the automorphism
  X → X^{N/n+1} (sign-flips odd powers), shifting odd parts down by
  X^{-2^i}; the input is pre-multiplied by 2^{-logN}.
* Pack: the inverse tree — interleave pairs with X^{N/2^{i}} masks and the
  automorphisms σ_{5^{2^{i-1}}} (σ_{2N-1} at the last step).
* Split: ctN[X] = ctEven[Y] + X·ctOdd[Y] with Y = X²: key-switch to the
  image of the half-degree secret, then subsample coefficients
  (ref Split:175 + element.go:250 SwitchCiphertextRingDegreeNTT).
* Merge: the inverse — map both halves up in the NTT domain (a pure
  repeat: exponents of the 2N-th roots agree mod n-ring periodicity),
  combine, key-switch back to the full-degree secret (ref Merge:378).

Standard ring type only (as in the reference).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.rlwe.params import Parameters
from lattigo_tpu.rlwe.elements import Ciphertext
from lattigo_tpu.rlwe.evaluator import Evaluator
from lattigo_tpu.rlwe.keys import EvaluationKey, KeyGenerator, SecretKey
from lattigo_tpu.ring.ringqp import QPPoly


def map_small_to_large_ntt(x, gap: int = 2):
    """NTT-domain Y=X^gap ring-degree raise: each small value repeats gap
    times (large position j evaluates at ζ^{E(j)} with E(j) mod 2n constant
    over gap-blocks; ref ring/operations.go:380)."""
    return jnp.repeat(x, gap, axis=-1)


def switch_large_to_small_ntt(value, params_large: Parameters,
                              params_small: Parameters, level: int):
    """NTT-domain X^N → Y^{N/gap} switch: INTT, keep every gap-th
    coefficient, NTT in the small ring (ref element.go:250)."""
    gap = params_large.n // params_small.n
    coeff = params_large.ring_q.intt(value, level)
    return params_small.ring_q.ntt(coeff[..., ::gap], level)


def map_secret_to_large(params_large: Parameters, sk_small: SecretKey,
                        gap: int = 2) -> SecretKey:
    """Image of a small-ring secret in the large ring (NTT+Montgomery
    values; ref keygenerator.go:269 MapSmallDimensionToLargerDimensionNTT)."""
    q = map_small_to_large_ntt(sk_small.value.q, gap)
    p = (None if sk_small.value.p is None
         else map_small_to_large_ntt(sk_small.value.p, gap))
    return SecretKey(QPPoly(q, p))


class RingSwitchingKeys:
    """EVKs between adjacent ring degrees (ref ring_packing_keys.go:14).

    params: {log_n: Parameters} over the SAME moduli chain.
    down[l]: sk_l → mapped(sk_{l-1}) in ring 2^l;
    up[l]:   mapped(sk_{l-1}) → sk_l in ring 2^l.
    """

    def __init__(self, params: dict[int, Parameters],
                 down: dict[int, EvaluationKey], up: dict[int, EvaluationKey]):
        self.params = params
        self.down = down
        self.up = up

    @property
    def min_log_n(self) -> int:
        return min(self.params)

    @property
    def max_log_n(self) -> int:
        return max(self.params)


def gen_ring_switching_keys(key, params: dict[int, Parameters],
                            sks: dict[int, SecretKey]) -> RingSwitchingKeys:
    """Generate adjacent-degree switching keys (ref ring_packing_keys.go:59)."""
    import jax

    logs = sorted(params)
    down, up = {}, {}
    for l in logs[1:]:
        assert params[l].n == 2 * params[l - 1].n
        assert params[l].q_moduli == params[l - 1].q_moduli
        kgen = KeyGenerator(params[l])
        mapped = map_secret_to_large(params[l], sks[l - 1])
        key, k1, k2 = jax.random.split(key, 3)
        down[l] = kgen.gen_evaluation_key(k1, sks[l], mapped)
        up[l] = kgen.gen_evaluation_key(k2, mapped, sks[l])
    return RingSwitchingKeys(params, down, up)


class RingPackingEvaluator:
    """ref ring_packing.go:13.

    ``rlwe_eval`` drives Expand/Pack in its own ring degree (it must hold
    the Galois keys from :meth:`galois_elements_for_expand` /
    :meth:`galois_elements_for_pack`). ``switching`` (plus per-degree
    ``evaluators`` holding pack keys for smaller degrees, optional) enables
    the cross-degree Split/Merge/Extract/Repack family.
    """

    def __init__(self, rlwe_eval: Evaluator,
                 switching: RingSwitchingKeys | None = None,
                 evaluators: dict[int, Evaluator] | None = None):
        self.ev = rlwe_eval
        self.params = rlwe_eval.params
        self.switching = switching
        self.evaluators = dict(evaluators or {})
        self.evaluators[self.params.log_n] = rlwe_eval
        if switching is not None:
            for l, p in switching.params.items():
                self.evaluators.setdefault(l, Evaluator(p))

    def _params(self, log_n: int) -> Parameters:
        if log_n == self.params.log_n:
            return self.params
        return self.switching.params[log_n]

    # -- helpers ---------------------------------------------------------------

    @functools.lru_cache(maxsize=None)
    def _x_pow_mont(self, power: int, level: int, log_n: int | None = None):
        """MForm(NTT(X^power)) for power mod 2N (ref GenXPow2NTT:773)."""
        import jax
        p = self._params(self.params.log_n if log_n is None else log_n)
        k = power % (2 * p.n)
        coeffs = [0] * p.n
        # constant computation stays concrete even mid-trace (jax >= 0.9
        # turns constant ops into tracers otherwise)
        # bypass the engine NTT: its weight tables may be tracers when a
        # pipeline threads them through the jit boundary (see
        # ckks.Evaluator._i_monomial)
        from lattigo_tpu.ring import ntt as ntt_mod
        with jax.ensure_compile_time_eval():
            if k < p.n:
                coeffs[k] = 1
                poly = p.ring_q.from_int_coeffs(coeffs, level)
            else:
                coeffs[k - p.n] = 1
                poly = p.ring_q.neg(p.ring_q.from_int_coeffs(coeffs, level), level)
            rq = p.ring_q
            l = level + 1
            x = ntt_mod.ntt(poly, rq.roots[:l], rq.q[:l], rq.qinv[:l], rq.log_n)
            return np.asarray(rq.mform(x, level))

    def _mul_xpow(self, ct: Ciphertext, power: int,
                  log_n: int | None = None) -> Ciphertext:
        p = self._params(self.params.log_n if log_n is None else log_n)
        return ct.replace(value=p.ring_q.mul_mont(
            ct.value, self._x_pow_mont(power, ct.level, p.log_n), ct.level))

    def galois_elements_for_expand(self, log_n: int | None = None) -> list[int]:
        p = self.params
        log_n = p.log_n if log_n is None else log_n
        return [p.n // (1 << i) + 1 for i in range(log_n)]

    def galois_elements_for_pack(self, log_start: int = 0,
                                 log_n: int | None = None) -> list[int]:
        p = self._params(self.params.log_n if log_n is None else log_n)
        els = [p.galois_element(1 << (i - 1))
               for i in range(max(1, log_start), p.log_n)]
        if log_start == 0:
            els.append(p.galois_element_order_two)
        return sorted(set(els))

    # -- Expand ------------------------------------------------------------------

    def expand(self, ct: Ciphertext, log_gap: int = 0) -> dict[int, Ciphertext]:
        """cts[i·2^logGap] encrypts coefficient i·2^logGap of ct in slot 0
        of its coefficient embedding, scaled ×1 (ref Expand:457)."""
        assert ct.degree == 1 and ct.is_ntt
        log_n = ct.n.bit_length() - 1
        p = self._params(log_n)
        ev = self.evaluators[log_n]
        level = ct.level
        n_inv = pow(1 << log_n, -1, p.q_big_int(level))
        cts = {0: ct.replace(value=p.ring_q.mul_scalar(ct.value, n_inv, level))}
        gap = 1 << log_gap
        for i in range(log_n):
            n = 1 << i
            gal = p.n // n + 1
            for j in range(0, n, gap):
                c0 = cts[j]
                tmp = ev.automorphism(c0, gal)
                if (j + n) % gap == 0:
                    # odd part, shifted down by X^{-2^i}
                    c1 = c0.replace(value=p.ring_q.sub(
                        c0.value, tmp.value, level))
                    cts[j + n] = self._mul_xpow(c1, -(1 << i), log_n)
                cts[j] = c0.replace(value=p.ring_q.add(c0.value, tmp.value, level))
        return {k: v for k, v in cts.items() if k % gap == 0}

    def unpack(self, ct: Ciphertext, log_pack: int) -> list[Ciphertext]:
        """Partial Expand: the exact inverse of ``pack(cts,
        input_log_gap=log_pack)``. Runs only the first ``log_pack``
        even/odd rounds of the Expand tree, so out[j] keeps the WHOLE
        coefficient class ≡ j (mod 2^log_pack), shifted down by X^{-j} —
        i.e. a sparse ciphertext with meaningful coefficients at stride
        2^log_pack starting at 0 (ref bootstrapping/evaluator.go:942
        unpack — the sparse-slot batch bootstrapping path)."""
        assert ct.degree == 1 and ct.is_ntt
        log_n = ct.n.bit_length() - 1
        assert 0 < log_pack <= log_n
        p = self._params(log_n)
        ev = self.evaluators[log_n]
        level = ct.level
        n_inv = pow(1 << log_pack, -1, p.q_big_int(level))
        cts = {0: ct.replace(value=p.ring_q.mul_scalar(ct.value, n_inv, level))}
        for i in range(log_pack):
            n = 1 << i
            gal = p.n // n + 1
            for j in list(cts):
                c0 = cts[j]
                tmp = ev.automorphism(c0, gal)
                odd = c0.replace(value=p.ring_q.sub(c0.value, tmp.value, level))
                cts[j + n] = self._mul_xpow(odd, -(1 << i), log_n)
                cts[j] = c0.replace(
                    value=p.ring_q.add(c0.value, tmp.value, level))
        return [cts[j] for j in range(1 << log_pack)]

    def galois_elements_for_unpack(self, log_pack: int,
                                   log_n: int | None = None) -> list[int]:
        p = self.params
        log_n = p.log_n if log_n is None else log_n
        return [(1 << log_n) // (1 << i) + 1 for i in range(log_pack)]

    # -- Pack --------------------------------------------------------------------

    def pack(self, cts: dict[int, Ciphertext],
             input_log_gap: int | None = None) -> Ciphertext:
        """Interleave cts[i] into one ciphertext (ref Pack:600).

        input_log_gap = log2 spacing of meaningful coefficients inside each
        input (default logN: only the constant coefficient is meaningful;
        everything else is zeroed — the Extract/Repack use case).
        """
        cts = dict(cts)
        keys = sorted(cts.keys())
        log_n = cts[keys[0]].n.bit_length() - 1
        p = self._params(log_n)
        ev = self.evaluators[log_n]
        level = cts[keys[0]].level
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
                    b = self._mul_xpow(b, p.n >> (i + 1), log_n)
                    cts[jy] = None
                    if a is not None:
                        diff = a.replace(value=p.ring_q.sub(a.value, b.value, level))
                        asum = a.replace(value=p.ring_q.add(a.value, b.value, level))
                        rot = ev.automorphism(diff, gal)
                        cts[jx] = asum.replace(
                            value=p.ring_q.add(asum.value, rot.value, level))
                    else:
                        rot = ev.automorphism(b, gal)
                        cts[jx] = b.replace(
                            value=p.ring_q.sub(b.value, rot.value, level))
                elif a is not None:
                    rot = ev.automorphism(a, gal)
                    cts[jx] = a.replace(
                        value=p.ring_q.add(a.value, rot.value, level))
        return cts[0]

    # -- Split / Merge (cross ring degree) ----------------------------------------

    def split(self, ct: Ciphertext) -> tuple[Ciphertext, Ciphertext]:
        """ctN[X] = even[Y] + X·odd[Y], Y = X² (ref Split:175)."""
        assert self.switching is not None, "split requires RingSwitchingKeys"
        assert ct.degree == 1 and ct.is_ntt
        log_n = ct.n.bit_length() - 1
        assert log_n > self.switching.min_log_n
        p_large = self._params(log_n)
        p_small = self._params(log_n - 1)
        ev = self.evaluators[log_n]
        # skN → image of skNHalf
        tmp = ev.apply_evaluation_key(ct, self.switching.down[log_n])
        even = ct.replace(value=switch_large_to_small_ntt(
            tmp.value, p_large, p_small, ct.level))
        odd_large = self._mul_xpow(tmp, -1, log_n)
        odd = ct.replace(value=switch_large_to_small_ntt(
            odd_large.value, p_large, p_small, ct.level))
        return even, odd

    def merge(self, ct_even: Ciphertext | None,
              ct_odd: Ciphertext | None) -> Ciphertext:
        """even[Y] + X·odd[Y] → ctN[X] (ref Merge:378)."""
        assert self.switching is not None, "merge requires RingSwitchingKeys"
        some = ct_even if ct_even is not None else ct_odd
        log_n = some.n.bit_length()  # small log_n + 1
        p_large = self._params(log_n)
        level = some.level
        v = None
        if ct_even is not None:
            v = map_small_to_large_ntt(ct_even.value)
        if ct_odd is not None:
            up = some.replace(value=map_small_to_large_ntt(ct_odd.value))
            up = self._mul_xpow(up, 1, log_n)
            v = up.value if v is None else p_large.ring_q.add(v, up.value, level)
        ctn = some.replace(value=v)
        # image of skNHalf → skN
        return self.evaluators[log_n].apply_evaluation_key(
            ctn, self.switching.up[log_n])

    # -- Extract / Repack ---------------------------------------------------------

    def extract(self, ct: Ciphertext, idx: list[int]) -> dict[int, Ciphertext]:
        """cts[i] (ring degree min_log_n) encrypts coefficient i of ct in
        its constant slot, for i in idx; other coefficients zeroed
        (ref Extract:56)."""
        log_max = ct.n.bit_length() - 1
        log_min = self.switching.min_log_n if self.switching else log_max
        n_factor = 1 << (log_max - log_min)

        # recursively halve the ring degree; original coefficient k lands in
        # small ct (k mod NFactor) at position k // NFactor (ref :92-117)
        tmp = {0: ct}
        for i in range(log_max - log_min):
            t = 1 << i
            needed = {k & (2 * t - 1) for k in idx}
            for j in list(tmp):
                if j in needed or (j + t) in needed:
                    even, odd = self.split(tmp[j])
                    tmp[j] = even
                    tmp[j + t] = odd

        out = {}
        by_res = {}
        for k in idx:
            by_res.setdefault(k & (n_factor - 1), []).append(k)
        for res, ks in by_res.items():
            inner = sorted(k >> (log_max - log_min) for k in ks)
            gaps = {g for g in inner if g}
            log_gap = min((g & -g).bit_length() - 1 for g in gaps) if gaps else log_min
            small = self.expand(tmp[res], min(log_gap, log_min))
            for k in ks:
                out[k] = small[k >> (log_max - log_min)]
        return out

    def repack(self, cts: dict[int, Ciphertext]) -> Ciphertext:
        """Inverse of extract: repack constant coefficients of small cts
        into coefficient i of one max-degree ct (ref Repack:253)."""
        keys = sorted(cts)
        log_min = cts[keys[0]].n.bit_length() - 1
        log_max = (self.params.log_n if self.switching is None
                   else self.switching.max_log_n)
        n_factor = 1 << (log_max - log_min)

        # bucket by residue (future merge interleaving), pack each bucket
        buckets = [dict() for _ in range(n_factor)]
        for k in keys:
            buckets[k & (n_factor - 1)][k >> (log_max - log_min)] = cts[k]
        merged = {i: (self.pack(b) if b else None)
                  for i, b in enumerate(buckets)}

        # base-2 merge tree (ref :355-374)
        for i in range(log_max - log_min - 1, -1, -1):
            t = 1 << i
            for j in range(t):
                if merged.get(j) is not None or merged.get(j + t) is not None:
                    merged[j] = self.merge(merged.get(j), merged.get(j + t))
                    merged[j + t] = None
        return merged[0]
