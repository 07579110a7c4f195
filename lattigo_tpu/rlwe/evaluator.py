"""Scheme-generic RLWE evaluator: gadget product, relinearize, automorphism.

TPU-native analog of ``core/rlwe/evaluator.go`` + the gadget-product hot
loop (``evaluator_gadget_product.go:16-527``) and automorphism machinery
(``evaluator_automorphism.go``). The gadget product is expressed as a
digit-unrolled MAC over NTT-domain QP tensors with the reference's lazy-
reduction cadence (flush every ``margin`` accumulations), ending in one
ModDown by P. Decomposition is hoistable: :meth:`Evaluator.decompose_ntt`
returns the digit tensor once, and every rotation/key-switch against it is
pure MACs + gather.
"""

from __future__ import annotations

import jax.numpy as jnp

from lattigo_tpu.ring import modops
from lattigo_tpu.ring import automorphism as auto_mod
from lattigo_tpu.ring.ringqp import QPPoly, stack as qp_stack
from lattigo_tpu.rlwe.params import Parameters
from lattigo_tpu.rlwe.elements import Ciphertext
from lattigo_tpu.rlwe.keys import (
    EvaluationKeySet, GadgetCiphertext, GaloisKey, RelinearizationKey,
)


class Evaluator:
    """Shared key-switch machinery for scheme evaluators (ref evaluator.go:12)."""

    def __init__(self, params: Parameters, evk: EvaluationKeySet | None = None):
        self.params = params
        self.evk = evk or EvaluationKeySet()

    def with_keys(self, evk: EvaluationKeySet) -> "Evaluator":
        return Evaluator(self.params, evk)

    # -- gadget decomposition (the hoistable half) -------------------------------

    def decompose_ntt(self, c2_ntt, level_q: int) -> QPPoly:
        """RNS-decompose an NTT poly into QP-extended digits.

        c2_ntt: u64[..., lq+1, N] NTT plain. Returns QPPoly with digit axis:
        q: [..., beta, lq+1, N], p: [..., beta, LP, N], NTT plain
        (ref DecomposeNTT, evaluator_gadget_product.go:459).
        """
        p = self.params
        dec = p.decomposer
        coeff = p.ring_q.intt(c2_ntt, level_q)
        # extend ALL digits in coeff domain in one broadcast program, then
        # ONE batched NTT per ring over the stacked digit axis (the NTT and
        # the per-digit ModUps dominate the op count)
        yq, yp = dec.decompose_all(coeff, level_q)
        return QPPoly(p.ring_q.ntt(yq, level_q), p.ring_p.ntt(yp))

    # -- gadget product -------------------------------------------------------------

    def gadget_product_hoisted_lazy(self, digits: QPPoly,
                                    gadget: GadgetCiphertext,
                                    level_q: int) -> QPPoly:
        """MAC digits against gadget rows; result lazy QP (ref :348).

        digits: q [..., beta, lq+1, N] / p [..., beta, LP, N], NTT plain.
        Returns QPPoly of shape [..., 2, lq+1, N] / [..., 2, LP, N] in NTT
        plain form, reduced to [0, q).
        """
        p = self.params
        rq, rp = p.ring_q, p.ring_p
        lq = level_q + 1
        beta = digits.q.shape[-3]
        evq = gadget.value.q  # [beta_full, 2, LQ, N]
        evp = gadget.value.p  # [beta_full, 2, LP, N]
        # level-scoped keys (gen_galois_keys(levels=...)) must cover the
        # use level — a short key would slice to garbage silently
        assert evq.shape[-2] >= lq and evq.shape[-4] >= beta, (
            f"evaluation key generated at level {evq.shape[-2] - 1} "
            f"used at level {level_q}")

        qmax = max(max(p.q_moduli[:lq]), max(p.p_moduli))
        margin = max(1, ((1 << 64) - 1) // (2 * qmax) - 1)

        # one broadcast Montgomery MAC over all digits, then a lazy tree
        # reduction over the digit axis (margin terms per round) — a single
        # fused XLA op chain instead of a per-digit Python accumulate
        tq = modops.mred_lazy(
            digits.q[..., :, None, :, :], evq[:beta, :, :lq, :],
            rq.q[:lq], rq.qinv[:lq])               # [..., beta, 2, lq, N]
        tp = modops.mred_lazy(
            digits.p[..., :, None, :, :], evp[:beta], rp.q, rp.qinv)
        acc_q = modops.lazy_tree_sum(
            jnp.moveaxis(tq, -4, 0), rq.q[:lq], rq.bred_hi[:lq], margin)
        acc_p = modops.lazy_tree_sum(
            jnp.moveaxis(tp, -4, 0), rp.q, rp.bred_hi, margin)
        acc_q = modops.bred_add(acc_q, rq.q[:lq], rq.bred_hi[:lq])
        acc_p = modops.bred_add(acc_p, rp.q, rp.bred_hi)
        return QPPoly(acc_q, acc_p)

    def gadget_product_hoisted(self, digits: QPPoly, gadget: GadgetCiphertext,
                               level_q: int):
        """Hoisted gadget product ending in ModDown: u64[..., 2, lq+1, N]."""
        acc = self.gadget_product_hoisted_lazy(digits, gadget, level_q)
        return self.params.basis_extender.mod_down_qp_to_q(
            acc.q, acc.p, level_q, ntt_domain=True)

    def gadget_product_base2(self, c2_ntt, gadget: GadgetCiphertext,
                             level_q: int):
        """Power-of-two gadget product (ref :203
        gadgetProductSinglePAndBitDecompLazy): digits are plain bit-slices
        of each limb's coefficients, broadcast-NTT'd over all limbs, then
        MAC'd against the (limb, digit)-indexed gadget rows. ModDown by P
        only when the gadget has a P part."""
        p = self.params
        rq = p.ring_q
        lq = level_q + 1
        w = gadget.base2
        mask = jnp.uint64((1 << w) - 1)
        rows = gadget.value.q.shape[-4]
        max_dig = rows // lq

        cx = rq.intt(c2_ntt, level_q)  # [..., lq, N] coefficients
        shifts = jnp.arange(max_dig, dtype=jnp.uint64) * jnp.uint64(w)
        # [..., lq, max_dig, N] plain digits < 2^w
        digits = (cx[..., :, None, :] >> shifts[None, :, None]) & mask
        dflat = digits.reshape(digits.shape[:-3] + (rows, 1, digits.shape[-1]))

        evq = gadget.value.q  # [rows, 2, LQ, N]
        # lift each digit to every Q limb (values < 2^w < q_i: the residue
        # is the value itself) and NTT per limb
        dq = jnp.broadcast_to(
            dflat, dflat.shape[:-2] + (lq, dflat.shape[-1]))
        dq = rq.ntt(dq, level_q)                    # [..., rows, lq, N]
        tq = modops.mred_lazy(dq[..., :, None, :, :], evq[:, :, :lq, :],
                              rq.q[:lq], rq.qinv[:lq])
        acc_q = modops.bred_add(tq.sum(axis=-4), rq.q[:lq], rq.bred_hi[:lq])

        if gadget.value.p is not None:
            rp = p.ring_p
            lp = rp.q.shape[0]
            evp = gadget.value.p
            dp = jnp.broadcast_to(
                dflat, dflat.shape[:-2] + (lp, dflat.shape[-1]))
            dp = rp.ntt(dp)
            tp = modops.mred_lazy(dp[..., :, None, :, :], evp,
                                  rp.q, rp.qinv)
            acc_p = modops.bred_add(tp.sum(axis=-4), rp.q, rp.bred_hi)
            return p.basis_extender.mod_down_qp_to_q(
                acc_q, acc_p, level_q, ntt_domain=True)
        return acc_q

    def gadget_product(self, c2_ntt, gadget: GadgetCiphertext, level_q: int):
        """(d0, d1) ← c2 ⊛ gadget (ref GadgetProduct, :16).

        c2_ntt: u64[..., lq+1, N] NTT plain → u64[..., 2, lq+1, N] NTT plain.
        """
        if gadget.base2:
            return self.gadget_product_base2(c2_ntt, gadget, level_q)
        digits = self.decompose_ntt(c2_ntt, level_q)
        return self.gadget_product_hoisted(digits, gadget, level_q)

    # -- relinearization ---------------------------------------------------------------

    def relinearize(self, ct: Ciphertext,
                    rlk: RelinearizationKey | None = None) -> Ciphertext:
        """Degree-d → degree-1 via iterated key switch (ref :120 Relinearize)."""
        rlk = rlk if rlk is not None else self.evk.relinearization_key
        if rlk is None:
            from lattigo_tpu.rlwe.errors import MissingRelinearizationKeyError
            raise MissingRelinearizationKeyError()
        assert ct.is_ntt, "relinearize expects NTT-domain ciphertexts"
        level = ct.level
        v = ct.value
        while v.shape[-3] > 2:
            d = self.gadget_product(v[..., -1, :, :], rlk.gadget, level)
            v = v[..., :-1, :, :]
            v = v.at[..., 0, :, :].set(
                self.params.ring_q.add(v[..., 0, :, :], d[..., 0, :, :], level))
            v = v.at[..., 1, :, :].set(
                self.params.ring_q.add(v[..., 1, :, :], d[..., 1, :, :], level))
        return ct.replace(value=v)

    # -- key switching -------------------------------------------------------------------

    def apply_evaluation_key(self, ct: Ciphertext, evk) -> Ciphertext:
        """Re-encrypt a degree-1 ct under another key (ref evaluator_evaluationkey.go:36)."""
        assert ct.degree == 1 and ct.is_ntt
        level = ct.level
        gadget = evk.gadget if hasattr(evk, "gadget") else evk
        d = self.gadget_product(ct.value[..., 1, :, :], gadget, level)
        d0 = self.params.ring_q.add(d[..., 0, :, :], ct.value[..., 0, :, :], level)
        return ct.replace(value=jnp.stack([d0, d[..., 1, :, :]], axis=-3))

    # -- automorphisms ----------------------------------------------------------------------

    def automorphism(self, ct: Ciphertext, gal_el: int) -> Ciphertext:
        """σ_{gal_el}(ct): key-switch c1, then NTT-permute (ref :13)."""
        if gal_el == 1:
            return ct
        gk = self.evk.galois_key(gal_el)
        ks = self.apply_evaluation_key(ct, gk)
        return ct.replace(value=auto_mod.automorphism_ntt(
            ks.value, self.params.n, gal_el, self.params.ring_type))

    def automorphism_hoisted(self, ct: Ciphertext, digits: QPPoly,
                             gal_el: int) -> Ciphertext:
        """σ with a precomputed decomposition of c1 (ref :62)."""
        if gal_el == 1:
            return ct
        gk = self.evk.galois_key(gal_el)
        level = ct.level
        d = self.gadget_product_hoisted(digits, gk.gadget, level)
        d0 = self.params.ring_q.add(d[..., 0, :, :], ct.value[..., 0, :, :], level)
        v = jnp.stack([d0, d[..., 1, :, :]], axis=-3)
        return ct.replace(value=auto_mod.automorphism_ntt(v, self.params.n, gal_el, self.params.ring_type))

    def rotate_columns(self, ct: Ciphertext, k: int) -> Ciphertext:
        return self.automorphism(ct, self.params.galois_element(k))

    def rotate_columns_hoisted(self, ct: Ciphertext,
                               ks: list[int]) -> dict[int, Ciphertext]:
        """Rotate by every k in ks reusing ONE gadget decomposition of c1
        (ref schemes/ckks/evaluator.go:1228 RotateHoisted): the decompose
        (INTT + ModUp + NTT per digit) amortizes across all rotations."""
        digits = self.decompose_ntt(ct.value[..., 1, :, :], ct.level)
        return {k: self.automorphism_hoisted(
            ct, digits, self.params.galois_element(k)) for k in ks}

    # -- trace / inner sum --------------------------------------------------------------------

    def trace(self, ct: Ciphertext, log_n_start: int) -> Ciphertext:
        """Trace onto the degree-2^logn sub-ring: X → Σ_i ±X^{i·n+1}
        (ref inner_sum.go:36-115). Pre-multiplies by (N/n)^{-1}, then the
        log-depth ladder out ← out + σ_{5^{2^i}}(out), plus the order-two
        element when logn == 0.
        """
        p = self.params
        level = ct.level
        gap = 1 << (p.log_n - log_n_start - 1)
        if log_n_start == 0:
            gap <<= 1
        if gap <= 1:
            return ct
        inv = pow(gap, -1, p.q_big_int(level))
        out = ct.replace(value=p.ring_q.mul_scalar(ct.value, inv, level))
        for i in range(log_n_start, p.log_n - 1):
            rot = self.automorphism(out, p.galois_element(1 << i))
            out = out.replace(value=p.ring_q.add(out.value, rot.value, level))
        if log_n_start == 0 and p.ring_type == "standard":
            rot = self.automorphism(out, p.galois_element_order_two)
            out = out.replace(value=p.ring_q.add(out.value, rot.value, level))
        return out

    def galois_elements_for_trace(self, log_n_start: int) -> list[int]:
        """Galois keys needed by :meth:`trace` (ref inner_sum.go:120)."""
        p = self.params
        els = [p.galois_element(1 << i) for i in range(log_n_start, p.log_n - 1)]
        if log_n_start == 0 and p.ring_type == "standard":
            els.append(p.galois_element_order_two)
        return els

    def inner_function(self, ct: Ciphertext, batch: int, n: int,
                       f) -> Ciphertext:
        """Log-depth rotate-and-combine with a user combine ``f(a, b) → ct``
        (ref inner_sum.go:317 InnerFunction): f-fold of rot(ct, i·batch)
        for i < n. ``f`` must be associative-compatible with rotation
        (e.g. homomorphic add, mul-relin for products, max for maxima).

        Binary decomposition: doubling ladders build the fold over 2^j
        elements, and each set bit of n contributes its ladder rotated past
        the lower blocks.
        """
        acc = None
        cur = ct          # fold over {rot(ct, i·batch) : i < m}
        m = 1
        pos = 0           # Σ of lower set bits (block offset)
        while m <= n:
            if n & m:
                part = cur if pos == 0 else self.rotate_columns(cur, pos * batch)
                acc = part if acc is None else f(acc, part)
                pos += m
            m <<= 1
            if m <= n:
                cur = f(cur, self.rotate_columns(cur, (m >> 1) * batch))
        return acc

    def partial_traces_sum(self, ct: Ciphertext, offset: int,
                           n: int) -> Ciphertext:
        """Σ_{i<n} φ_{i·offset}(ct) with ONE gadget decomposition of c1
        (ref inner_sum.go:147 PartialTracesSum): the hoisted linear-depth
        alternative to :meth:`inner_sum` — n−1 automorphism keys but a
        single decompose, best when n is small or the rotations are
        reused nowhere else."""
        if offset == 0:
            # the reference rejects offset == 0 (inner_sum.go:148) — the
            # mathematically-consistent result would be n·ct, which is
            # never what a caller wants from a trace ladder
            raise ValueError("partial_traces_sum: offset must be non-zero")
        if n == 1:
            return ct
        p = self.params
        level = ct.level
        digits = self.decompose_ntt(ct.value[..., 1, :, :], level)
        acc = ct.value
        for i in range(1, n):
            rot = self.automorphism_hoisted(
                ct, digits, p.galois_element(i * offset))
            acc = p.ring_q.add(acc, rot.value, level)
        return ct.replace(value=acc)

    def galois_elements_for_partial_traces_sum(self, offset: int,
                                               n: int) -> list[int]:
        return [self.params.galois_element(i * offset) for i in range(1, n)]

    def inner_sum(self, ct: Ciphertext, batch: int, n: int) -> Ciphertext:
        """Σ_{i<n} rot(ct, i·batch), log-depth, any n (ref inner_sum.go:317):
        :meth:`inner_function` with homomorphic addition as the combine."""
        rq = self.params.ring_q

        def add(a: Ciphertext, b: Ciphertext) -> Ciphertext:
            return a.replace(value=rq.add(a.value, b.value, a.level))

        return self.inner_function(ct, batch, n, add)

    def replicate(self, ct: Ciphertext, batch: int, n: int) -> Ciphertext:
        """Replicate each batch block n times leftward: InnerSum with the
        opposite rotation direction (ref inner_sum.go:475 Replicate)."""
        return self.inner_sum(ct, -batch, n)

    def galois_elements_for_inner_sum(self, batch: int, n: int) -> list[int]:
        """Galois keys needed by :meth:`inner_sum` (ref inner_sum.go:442)."""
        p = self.params
        els = set()
        m = 1
        pos = 0
        while m <= n:
            if n & m:
                if pos != 0:
                    els.add(p.galois_element(pos * batch))
                pos += m
            m <<= 1
            if m <= n:
                els.add(p.galois_element((m >> 1) * batch))
        return sorted(els)
