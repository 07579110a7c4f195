"""RGSW encryption + external product (ref core/rgsw/{elements,encryptor,evaluator}.go)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from lattigo_tpu.ring.ringqp import QPPoly
from lattigo_tpu.rlwe.params import Parameters
from lattigo_tpu.rlwe.elements import Ciphertext as RlweCiphertext
from lattigo_tpu.rlwe.keys import GadgetCiphertext, KeyGenerator, SecretKey
from lattigo_tpu.rlwe.evaluator import Evaluator as RlweEvaluator


@struct.dataclass
class Ciphertext:
    """RGSW(m) = (gadget[m·g on c0], gadget[m·g on c1]) (ref elements.go:12)."""

    c0: GadgetCiphertext
    c1: GadgetCiphertext


class Encryptor:
    """ref core/rgsw/encryptor.go:25."""

    def __init__(self, params: Parameters, sk: SecretKey):
        self.params = params
        self.sk = sk
        self.kgen = KeyGenerator(params)

    def encrypt(self, key, m_q, level_q: int | None = None) -> Ciphertext:
        """Encrypt m (Q part, NTT+Montgomery u64[lq+1, N]) as RGSW."""
        k0, k1 = jax.random.split(key)
        return Ciphertext(
            c0=self.kgen.gadget_encrypt(k0, m_q, self.sk, level_q, row=0),
            c1=self.kgen.gadget_encrypt(k1, m_q, self.sk, level_q, row=1),
        )

    def encrypt_monomial(self, key, power: int,
                         level_q: int | None = None) -> Ciphertext:
        """RGSW(X^power) — the blind-rotation workhorse."""
        p = self.params
        level_q = p.max_level if level_q is None else level_q
        k = power % (2 * p.n)
        coeffs = [0] * p.n
        if k < p.n:
            coeffs[k] = 1
            poly = p.ring_q.from_int_coeffs(coeffs, level_q)
        else:
            coeffs[k - p.n] = 1
            poly = p.ring_q.neg(p.ring_q.from_int_coeffs(coeffs, level_q), level_q)
        m = p.ring_q.mform(p.ring_q.ntt(poly, level_q), level_q)
        return self.encrypt(key, m, level_q)


def external_product(ev: RlweEvaluator, ct: RlweCiphertext,
                     rgsw: Ciphertext) -> RlweCiphertext:
    """RLWE(μ) ⊠ RGSW(m) → RLWE(μ·m) (ref evaluator.go:39 ExternalProduct).

    Both RLWE components are RNS-decomposed and MAC'd against the matching
    gadget half; the two QP accumulators merge before a single ModDown.
    """
    p = ev.params
    assert ct.degree == 1 and ct.is_ntt
    level = ct.level
    d0 = ev.decompose_ntt(ct.value[..., 0, :, :], level)
    d1 = ev.decompose_ntt(ct.value[..., 1, :, :], level)
    acc0 = ev.gadget_product_hoisted_lazy(d0, rgsw.c0, level)
    acc1 = ev.gadget_product_hoisted_lazy(d1, rgsw.c1, level)
    acc = QPPoly(p.ring_q.add(acc0.q, acc1.q, level),
                 p.ring_p.add(acc0.p, acc1.p))
    out = p.basis_extender.mod_down_qp_to_q(acc.q, acc.p, level, ntt_domain=True)
    return ct.replace(value=out)
