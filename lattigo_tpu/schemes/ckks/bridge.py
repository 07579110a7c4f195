"""DomainSwitcher: standard ↔ conjugate-invariant CKKS bridging.

TPU-native analog of ``schemes/ckks/bridge.go`` + the ring-swap keys of
``core/rlwe/keygenerator.go:211``. The standard ring has degree 2N and the
CI ring degree N over the SAME modulus chain (both cyclotomics share
NthRoot = 4N, so one prime set serves both):

* ComplexToReal: key-switch the standard ct to (the unfolded image of) the
  CI secret, then fold x ↦ (x + σ_{4N−1}(x)) and keep the first N NTT
  values — enc(Re(m)) with scale doubled (ref bridge.go:58).
* RealToComplex: unfold the CI ct's NTT values palindromically into the
  2N ring (CI values are symmetric under conjugation), then key-switch
  back to the standard secret (ref bridge.go:100).

Slot correspondence is index-for-index: both rings order slots along the
5-orbit of the 4N-th roots.
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp

from lattigo_tpu.ring import automorphism as auto_mod
from lattigo_tpu.ring.ringqp import QPPoly
from lattigo_tpu.rlwe.elements import Ciphertext
from lattigo_tpu.rlwe.evaluator import Evaluator as RlweEvaluator
from lattigo_tpu.rlwe.keys import EvaluationKey, KeyGenerator, SecretKey


def _unfold_values(x):
    """Palindromic NTT-value extension [..., N] → [..., 2N]:
    std[2N−1−j] = ci[j] (conjugate positions carry equal CI values)."""
    return jnp.concatenate([x, jnp.flip(x, axis=-1)], axis=-1)


def unfold_secret(params_std, sk_ci: SecretKey) -> SecretKey:
    """Map a CI secret into the standard 2N ring (NTT+Montgomery values;
    ref keygenerator.go:216 UnfoldConjugateInvariantToStandard)."""
    q = _unfold_values(sk_ci.value.q)
    p = None if sk_ci.value.p is None else _unfold_values(sk_ci.value.p)
    return SecretKey(QPPoly(q, p))


def gen_ring_swap_keys(key, params_std, sk_std: SecretKey,
                       sk_ci: SecretKey) -> tuple[EvaluationKey, EvaluationKey]:
    """(std→ci, ci→std) keys, both living in the standard 2N ring
    (ref GenEvaluationKeysForRingSwapNew:211)."""
    kgen = KeyGenerator(params_std)
    sk_map = unfold_secret(params_std, sk_ci)
    k1, k2 = jax.random.split(key)
    return (kgen.gen_evaluation_key(k1, sk_std, sk_map),
            kgen.gen_evaluation_key(k2, sk_map, sk_std))


class DomainSwitcher:
    """ref bridge.go:13."""

    def __init__(self, params_std, params_ci, std_to_ci: EvaluationKey,
                 ci_to_std: EvaluationKey):
        assert params_std.n == 2 * params_ci.n
        assert params_std.q_moduli == params_ci.q_moduli
        self.params_std = params_std
        self.params_ci = params_ci
        self.std_to_ci = std_to_ci
        self.ci_to_std = ci_to_std
        self.ev = RlweEvaluator(params_std)

    def complex_to_real(self, ct: Ciphertext) -> Ciphertext:
        """standard enc(m) → CI enc(Re(m)), scale ×2 (ref :58)."""
        p = self.params_std
        level = ct.level
        assert ct.degree == 1 and ct.is_ntt
        d = self.ev.gadget_product(ct.value[..., 1, :, :],
                                   self.std_to_ci.gadget, level)
        c0 = p.ring_q.add(d[..., 0, :, :], ct.value[..., 0, :, :], level)
        c1 = d[..., 1, :, :]
        # fold: x + σ_{4N−1}(x), keep the first N values (ref
        # FoldStandardToConjugateInvariant, conjugate_invariant.go:28)
        idx = auto_mod.ntt_index(p.n, p.nth_root - 1)
        n_ci = self.params_ci.n
        f0 = p.ring_q.add(c0, auto_mod.apply_ntt(c0, idx), level)[..., :n_ci]
        f1 = p.ring_q.add(c1, auto_mod.apply_ntt(c1, idx), level)[..., :n_ci]
        return Ciphertext(value=jnp.stack([f0, f1], axis=-3), is_ntt=True,
                          scale=Fraction(ct.scale) * 2)

    def real_to_complex(self, ct: Ciphertext) -> Ciphertext:
        """CI enc(r) → standard enc(r + 0i) (ref :100)."""
        p = self.params_std
        level = ct.level
        assert ct.degree == 1 and ct.is_ntt
        u0 = _unfold_values(ct.value[..., 0, :, :])
        u1 = _unfold_values(ct.value[..., 1, :, :])
        d = self.ev.gadget_product(u1, self.ci_to_std.gadget, level)
        c0 = p.ring_q.add(u0, d[..., 0, :, :], level)
        return Ciphertext(value=jnp.stack([c0, d[..., 1, :, :]], axis=-3),
                          is_ntt=True, scale=ct.scale)
