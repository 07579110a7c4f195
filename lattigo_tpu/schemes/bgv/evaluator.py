"""Unified BGV/BFV evaluator.

TPU-native analog of ``schemes/bgv/evaluator.go``. The unified scheme
(schemes/bgv/README.md) keeps plaintexts MSB-encoded as m·T^{-1} mod Q:

* Add/Sub require equal scales; scales are matched by scalar multiplication
  (ref matchScaleThenEvaluateInPlace:227).
* BGV tensoring multiplies the product by T once (tensorStandard:592),
  keeping the m·T^{-1} invariant: (m1·s1/T)·(m2·s2/T)·T = m1m2·s1s2/T.
* Rescale is a CKKS-style DivRound by q_l with scale ← scale·q_l^{-1} mod T
  (ref Rescale:1363).

All ciphertext ops broadcast over leading batch axes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring import modops
from lattigo_tpu.ring import scaling
from lattigo_tpu.rlwe.elements import Ciphertext, Plaintext, ciphertext_from_polys
from lattigo_tpu.rlwe.evaluator import Evaluator as RlweEvaluator
from lattigo_tpu.rlwe.keys import EvaluationKeySet
from lattigo_tpu.schemes.bgv.params import Parameters


def _align(a: Ciphertext, b: Ciphertext | Plaintext):
    level = min(a.level, b.level)
    return a.at_level(level) if a.level != level else a, level


class Evaluator(RlweEvaluator):
    """BGV/BFV arithmetic (ref schemes/bgv/evaluator.go:18)."""

    def __init__(self, params: Parameters, evk: EvaluationKeySet | None = None):
        super().__init__(params, evk)
        self.params: Parameters = params

    # -- scale management -------------------------------------------------------

    def match_scales(self, ct0: Ciphertext, ct1: Ciphertext):
        """Equalise scales by scalar mult (ref MatchScalesAndLevel:1542)."""
        p = self.params
        if ct0.scale == ct1.scale:
            return ct0, ct1
        # multiply each by the other's missing ratio mod T
        r0 = ct1.scale * pow(ct0.scale, -1, p.t) % p.t
        # scale ct0 by r0 so both sit at scale lcm-ish ct1.scale
        v = p.ring_q.mul_scalar(ct0.value, r0, ct0.level)
        return ct0.replace(value=v, scale=ct1.scale), ct1

    # -- linear ops ----------------------------------------------------------------

    def add(self, ct0: Ciphertext, op1) -> Ciphertext:
        p = self.params
        if isinstance(op1, Ciphertext):
            ct0, ct1 = self.match_scales(ct0, op1)
            level = min(ct0.level, ct1.level)
            d = max(ct0.degree, ct1.degree)
            v0 = self._resize(ct0, d, level)
            v1 = self._resize(ct1, d, level)
            return ct0.replace(value=p.ring_q.add(v0, v1, level))
        if isinstance(op1, Plaintext):
            level = min(ct0.level, op1.level)
            ptv = op1.value[..., : level + 1, :]
            if op1.scale != ct0.scale:
                r = ct0.scale * pow(op1.scale, -1, p.t) % p.t
                ptv = p.ring_q.mul_scalar(ptv, r, level)
            v = ct0.value[..., : level + 1, :]
            c0 = p.ring_q.add(v[..., 0, :, :], ptv, level)
            return ct0.replace(value=v.at[..., 0, :, :].set(c0))
        # integer scalar: encode as constant·T^{-1}·scale
        return self._add_scalar(ct0, int(op1), negate=False)

    def sub(self, ct0: Ciphertext, op1) -> Ciphertext:
        p = self.params
        if isinstance(op1, Ciphertext):
            ct0, ct1 = self.match_scales(ct0, op1)
            level = min(ct0.level, ct1.level)
            d = max(ct0.degree, ct1.degree)
            v0 = self._resize(ct0, d, level)
            v1 = self._resize(ct1, d, level)
            return ct0.replace(value=p.ring_q.sub(v0, v1, level))
        if isinstance(op1, Plaintext):
            level = min(ct0.level, op1.level)
            ptv = op1.value[..., : level + 1, :]
            if op1.scale != ct0.scale:
                r = ct0.scale * pow(op1.scale, -1, p.t) % p.t
                ptv = p.ring_q.mul_scalar(ptv, r, level)
            v = ct0.value[..., : level + 1, :]
            c0 = p.ring_q.sub(v[..., 0, :, :], ptv, level)
            return ct0.replace(value=v.at[..., 0, :, :].set(c0))
        return self._add_scalar(ct0, int(op1), negate=True)

    def neg(self, ct: Ciphertext) -> Ciphertext:
        return ct.replace(value=self.params.ring_q.neg(ct.value, ct.level))

    def _resize(self, ct: Ciphertext, degree: int, level: int):
        v = ct.value[..., : level + 1, :]
        if ct.degree < degree:
            pad_shape = v.shape[:-3] + (degree - ct.degree,) + v.shape[-2:]
            v = jnp.concatenate([v, jnp.zeros(pad_shape, dtype=v.dtype)], axis=-3)
        return v

    def _add_scalar(self, ct: Ciphertext, scalar: int, negate: bool) -> Ciphertext:
        """ct ± scalar: the constant is lifted as scalar·scale·T^{-1} mod Q."""
        p = self.params
        level = ct.level
        c = scalar % p.t * ct.scale % p.t * pow(p.t, -1, p.q_big_int(level)) % p.q_big_int(level)
        const = p.ring_q.rns_scalar(c, level, mont=False)  # [l+1, 1] broadcast over N
        v0 = ct.value[..., 0, :, :]
        # constant polynomial c·(1,1,...,1) in NTT domain is c in EVERY slot:
        # NTT of constant c is c in all evaluation points, so broadcasting works.
        new0 = (modops.sub_mod(v0, const, p.ring_q.q[: level + 1])
                if negate else modops.add_mod(v0, const, p.ring_q.q[: level + 1]))
        return ct.replace(value=ct.value.at[..., 0, :, :].set(new0))

    def mul_scalar(self, ct: Ciphertext, scalar: int) -> Ciphertext:
        p = self.params
        return ct.replace(value=p.ring_q.mul_scalar(ct.value, scalar % p.t, ct.level))

    # -- multiplication -----------------------------------------------------------------

    def mul(self, ct0: Ciphertext, op1, relin: bool = False) -> Ciphertext:
        """BGV tensoring ct0 ⊗ op1 (·T), optional relinearization (ref :592)."""
        p = self.params
        rq = p.ring_q
        if isinstance(op1, Plaintext):
            level = min(ct0.level, op1.level)
            l = level + 1
            ptm = modops.mred(op1.value[..., :l, :], p.t_mont2[:l],
                              rq.q[:l], rq.qinv[:l])  # M-form of T·pt
            v = modops.mred(ct0.value[..., :l, :], ptm[..., None, :, :],
                            rq.q[:l], rq.qinv[:l])
            return ct0.replace(value=v,
                               scale=p.scale_mul(ct0.scale, op1.scale))
        ct1: Ciphertext = op1
        assert ct0.degree == 1 and ct1.degree == 1, "mul expects degree-1 inputs"
        level = min(ct0.level, ct1.level)
        l = level + 1
        a = ct0.value[..., :l, :]
        b = ct1.value[..., :l, :]
        # a· T in Montgomery form (one mred against T·2^128)
        am = modops.mred(a, p.t_mont2[:l], rq.q[:l], rq.qinv[:l])
        a0, a1 = am[..., 0, :, :], am[..., 1, :, :]
        b0, b1 = b[..., 0, :, :], b[..., 1, :, :]
        c0 = modops.mred(a0, b0, rq.q[:l], rq.qinv[:l])
        c1 = modops.add_mod(
            modops.mred(a0, b1, rq.q[:l], rq.qinv[:l]),
            modops.mred(a1, b0, rq.q[:l], rq.qinv[:l]), rq.q[:l])
        c2 = modops.mred(a1, b1, rq.q[:l], rq.qinv[:l])
        out = ciphertext_from_polys([c0, c1, c2], is_ntt=True,
                                    scale=p.scale_mul(ct0.scale, ct1.scale))
        if relin:
            out = self.relinearize(out)
        return out

    def mul_relin(self, ct0: Ciphertext, op1) -> Ciphertext:
        return self.mul(ct0, op1, relin=True)

    def mul_then_add(self, ct0: Ciphertext, op1, acc: Ciphertext) -> Ciphertext:
        """acc + ct0·op1 (ref MulThenAdd — API parity; XLA fuses)."""
        return self.add(acc, self.mul(ct0, op1))

    def mul_relin_then_add(self, ct0: Ciphertext, op1,
                           acc: Ciphertext) -> Ciphertext:
        return self.add(acc, self.mul(ct0, op1, relin=True))

    def drop_level(self, ct: Ciphertext, levels: int = 1) -> Ciphertext:
        """Discard the top `levels` moduli without scaling (ref DropLevel)."""
        return ct.at_level(ct.level - levels)

    def rotate_and_add(self, ct: Ciphertext, batch: int, n: int) -> Ciphertext:
        """Σ_{i<n} rot(ct, i·batch) (ref RotateAndAdd — same ladder as
        InnerSum)."""
        return self.inner_sum(ct, batch, n)

    def rotate_hoisted(self, ct: Ciphertext,
                       ks: list[int]) -> dict[int, Ciphertext]:
        """Column rotations by every k in ks, one shared decomposition
        (ref RotateHoistedLazyNew)."""
        return self.rotate_columns_hoisted(ct, ks)

    # -- BFV-style scale-invariant tensoring (ref tensorScaleInvariant:898) -----

    def _qmul_tables(self, level: int):
        """Lazily built double-basis conversion tables for this level."""
        cache = getattr(self, "_qmul_cache", None)
        if cache is None:
            cache = self._qmul_cache = {}
        if level not in cache:
            from lattigo_tpu.ring.basis_extension import ModUpConstants
            p = self.params
            lq = level + 1
            qm = p.ring_qmul.moduli[:lq]
            cache[level] = (
                ModUpConstants(p.q_moduli[:lq], qm),   # Q → QMul lift
                ModUpConstants(p.q_moduli[:lq], qm),   # for ModDown ÷Q → QMul
                ModUpConstants(qm, p.q_moduli[:lq]),   # QMul → Q
            )
        return cache[level]

    def mul_scale_invariant(self, ct0: Ciphertext, ct1: Ciphertext,
                            relin: bool = False) -> Ciphertext:
        """(ct0 ⊗ ct1)·(T/Q): BFV tensoring — noise independent of operand
        noise, no rescale needed (ref MulScaleInvariant, quantize:1050)."""
        from lattigo_tpu.ring.basis_extension import mod_up
        p = self.params
        rq = p.ring_q
        assert ct0.degree == 1 and ct1.degree == 1
        level = min(ct0.level, ct1.level)
        l = level + 1
        rqm = p.ring_qmul
        qm_q, qm_qinv, qm_bhi = rqm.q[:l], rqm.qinv[:l], rqm.bred_hi[:l]
        up_c, down_c, back_c = self._qmul_tables(level)

        def to_qmul(x_ntt):
            coeff = rq.intt(x_ntt, level)
            ext = mod_up(coeff, up_c, qm_q, qm_qinv, qm_bhi, centered=True)
            return rqm.ntt(ext, level)

        a_q = ct0.value[..., :l, :]
        b_q = ct1.value[..., :l, :]
        a_m = to_qmul(a_q)
        b_m = to_qmul(b_q)

        def tensor(a, b, q, qinv, bhi, mf):
            am = mf(a)
            a0, a1 = am[..., 0, :, :], am[..., 1, :, :]
            b0, b1 = b[..., 0, :, :], b[..., 1, :, :]
            c0 = modops.mred(a0, b0, q, qinv)
            c1 = modops.add_mod(modops.mred(a0, b1, q, qinv),
                                modops.mred(a1, b0, q, qinv), q)
            c2 = modops.mred(a1, b1, q, qinv)
            return jnp.stack([c0, c1, c2], axis=-3)

        t_q = tensor(a_q, b_q, rq.q[:l], rq.qinv[:l], rq.bred_hi[:l],
                     lambda x: rq.mform(x, level))
        t_m = tensor(a_m, b_m, qm_q, qm_qinv, qm_bhi,
                     lambda x: modops.mform(x, qm_q, qm_bhi, rqm.bred_lo[:l]))

        # quantize: round(x/Q)·T back in basis Q (ref quantize:1050)
        t_q_c = rq.intt(t_q, level)
        t_m_c = rqm.intt(t_m, level)
        # round(x/Q) mod QMul = (x_QMul − [x]_Q lifted) · Q^{-1} mod QMul
        lift = mod_up(t_q_c, down_c, qm_q, qm_qinv, qm_bhi, centered=True)
        diff = modops.sub_mod(t_m_c, lift, qm_q)
        qinv_qmul = np.array(
            [(pow(p.q_big_int(level) % m, -1, m) << 64) % m
             for m in rqm.moduli[:l]], dtype=np.uint64).reshape(l, 1)
        rounded = modops.mred(diff, jnp.asarray(qinv_qmul), qm_q, qm_qinv)
        # back to Q basis, ×T, NTT
        back = mod_up(rounded, back_c, rq.q[:l], rq.qinv[:l], rq.bred_hi[:l],
                      centered=True)
        back = rq.mul_scalar(back, p.t, level)
        out_v = rq.ntt(back, level)

        q_mod_t_neg = (p.t - p.q_big_int(level) % p.t) % p.t
        scale = ct0.scale * ct1.scale % p.t * pow(q_mod_t_neg, -1, p.t) % p.t
        out = Ciphertext(value=out_v, is_ntt=True, scale=scale)
        if relin:
            out = self.relinearize(out)
        return out

    # -- rescaling --------------------------------------------------------------------------

    def rescale(self, ct: Ciphertext) -> Ciphertext:
        """Divide by q_level, scale ← scale·q_l^{-1} mod T (ref :1363)."""
        p = self.params
        level = ct.level
        assert level >= 1, "cannot rescale at level 0"
        v = scaling.div_by_last_modulus(p.ring_q, ct.value, level,
                                        ntt_domain=ct.is_ntt, round_div=True)
        return ct.replace(value=v, scale=p.scale_div_q(ct.scale, level))

    # -- rotations -----------------------------------------------------------------------------

    def rotate_columns(self, ct: Ciphertext, k: int) -> Ciphertext:
        """Cyclic column rotation by k slots (ref :1413)."""
        return self.automorphism(ct, self.params.galois_element(k))

    def rotate_rows(self, ct: Ciphertext) -> Ciphertext:
        """Swap the two slot rows (conjugation element, ref :1442)."""
        return self.automorphism(ct, self.params.galois_element_order_two)
