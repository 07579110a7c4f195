"""Slot-space linear transformations via hoisted BSGS diagonal method.

TPU-native analog of ``circuits/common/lintrans`` (+ the scheme bindings in
``circuits/{bgv,ckks}/lintrans``). A linear transformation is a set of
non-zero diagonals of the slot-space matrix; evaluation is

    out = Σ_j σ_{N1·j}( Σ_i  pt[N1·j+i] ⊙ σ_i(ct) )

with the baby rotations σ_i hoisted (one gadget decomposition of c1 for
all of them, ref lintrans_evaluator.go:82) and the inner sums accumulated
in the extended R_QP basis so only one ModDown is paid per giant step
(ref MultiplyByDiagMatrixBSGS:280). Diagonal plaintexts are stored in
NTT+Montgomery over QP; the giant-step pre-rotation of each diagonal is
baked in at encoding time (ref lintrans.go:205 Encode).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring import modops
from lattigo_tpu.ring import automorphism as auto_mod
from lattigo_tpu.ring.ringqp import QPPoly
from lattigo_tpu.rlwe.elements import Ciphertext
from lattigo_tpu.rlwe.evaluator import Evaluator as RlweEvaluator


def bsgs_split(diags: list[int], slots: int, log_bsgs_ratio: int = 0) -> int:
    """Choose the baby-step width N1 (ref lintrans.go:297 FindBestBSGSRatio)."""
    n = len(diags)
    if n <= 1:
        return 1
    n1 = 1 << max(1, (int(math.ceil(math.log2(max(n, 2)))) + log_bsgs_ratio) // 2)
    return min(n1, slots)


def bsgs_index(diags: list[int], slots: int, n1: int):
    """index[j] = sorted baby offsets i with diagonal j+i present (mod slots)."""
    index: dict[int, list[int]] = {}
    for k in diags:
        k = k % slots
        j = k - (k % n1)
        index.setdefault(j, []).append(k % n1)
    for j in index:
        index[j] = sorted(set(index[j]))
    return dict(sorted(index.items()))


@dataclass
class LinearTransformation:
    """Encoded linear transformation (ref lintrans.go:127).

    vec[k]: QPPoly — diagonal k pre-rotated by its giant step, encoded in
    NTT+Montgomery over QP at level_q.
    """

    vec: dict[int, QPPoly]
    n1: int
    level_q: int
    scale: Any
    slots: int

    @property
    def index(self):
        return bsgs_index(list(self.vec.keys()), self.slots, self.n1)

    def galois_elements(self, params) -> list[int]:
        """All Galois elements needed to evaluate (babies + giants)."""
        els = set()
        for j, babies in self.index.items():
            if j != 0:
                els.add(params.galois_element(j))
            for i in babies:
                if i != 0:
                    els.add(params.galois_element(i))
        return sorted(els)


def encode_linear_transformation(
    params,
    diagonals: dict[int, np.ndarray],
    encode_diag: Callable[[np.ndarray, int], QPPoly],
    level_q: int,
    scale: Any,
    slots: int,
    log_bsgs_ratio: int = 0,
    rotate_diag: Callable[[np.ndarray, int], np.ndarray] | None = None,
) -> LinearTransformation:
    """Encode diagonals with giant-step pre-rotation baked in.

    encode_diag(vector, level_q) must return the NTT+Montgomery QP encoding
    of the (already rotated) diagonal vector at the transformation's scale.
    rotate_diag(vec, j) applies the giant-step pre-rotation: since the
    evaluator applies σ_j AFTER the inner product and σ_j rotates slots
    left by j, the stored diagonal must be pre-rotated RIGHT by j
    (σ_j(roll(d, +j)) = d). Default: np.roll(d, +j); BGV rolls its two
    rows separately.
    """
    diags = sorted(k % slots for k in diagonals.keys())
    n1 = bsgs_split(diags, slots, log_bsgs_ratio)
    if rotate_diag is None:
        rotate_diag = lambda d, j: np.roll(d, j, axis=-1)
    vec: dict[int, QPPoly] = {}
    for k, d in diagonals.items():
        k = k % slots
        j = k - (k % n1)
        d = np.asarray(d)
        rot = rotate_diag(d, j) if j else d  # pre-rotate by giant step
        vec[k] = encode_diag(rot, level_q)
    return LinearTransformation(vec=vec, n1=n1, level_q=level_q,
                                scale=scale, slots=slots)


# ---------------------------------------------------------------------------
# Scheme bindings (ref circuits/{ckks,bgv}/lintrans)
# ---------------------------------------------------------------------------

def lift_ints_qp(params, ints: np.ndarray, level_q: int) -> QPPoly:
    """Signed integer coeffs (object array [..., N]) → NTT+Montgomery QPPoly."""
    import jax.numpy as jnp
    out_q = np.zeros(ints.shape[:-1] + (level_q + 1, params.n), dtype=np.uint64)
    for i, q in enumerate(params.q_moduli[: level_q + 1]):
        out_q[..., i, :] = np.mod(ints, q).astype(np.uint64)
    qq = params.ring_q.mform(params.ring_q.ntt(jnp.asarray(out_q), level_q), level_q)
    pp = None
    if params.ring_p is not None:
        out_p = np.zeros(ints.shape[:-1] + (len(params.p_moduli), params.n),
                         dtype=np.uint64)
        for i, q in enumerate(params.p_moduli):
            out_p[..., i, :] = np.mod(ints, q).astype(np.uint64)
        pp = params.ring_p.mform(params.ring_p.ntt(jnp.asarray(out_p)))
    return QPPoly(qq, pp)


def ckks_diag_encoder(params, encoder, scale) -> Callable[[np.ndarray, int], QPPoly]:
    """Diagonal encoder for CKKS: embed → ×scale → round → lift to QP."""
    def encode_diag(vec: np.ndarray, level_q: int) -> QPPoly:
        coeffs = encoder.embed_to_coeffs(vec) * float(scale)
        ints = np.vectorize(lambda x: int(round(x)), otypes=[object])(coeffs)
        return lift_ints_qp(params, ints, level_q)
    return encode_diag


def bgv_diag_encoder(params, encoder) -> Callable[[np.ndarray, int], QPPoly]:
    """Diagonal encoder for BGV: raw m ∈ R_T, centered lift (no T^{-1}).

    ct(m1·s·T^{-1})·m2 decrypts to m1m2·s·T^{-1} — plain-mul semantics with
    lt.scale = 1 (ref circuits/bgv/lintrans).
    """
    def encode_diag(vec: np.ndarray, level_q: int) -> QPPoly:
        coeffs_t = np.asarray(encoder.encode_ring_t(vec))[..., 0, :]
        half_t = params.t >> 1
        ints = np.vectorize(
            lambda x: int(x) - params.t if int(x) > half_t else int(x),
            otypes=[object])(coeffs_t)
        return lift_ints_qp(params, ints, level_q)
    return encode_diag


def bgv_rotate_diag(vec: np.ndarray, j: int) -> np.ndarray:
    """Right-roll the 2 × N/2 BGV slot rows independently (see above)."""
    half = vec.shape[-1] // 2
    return np.concatenate(
        [np.roll(vec[..., :half], j, axis=-1),
         np.roll(vec[..., half:], j, axis=-1)], axis=-1)


class LinTransEvaluator:
    """Hoisted BSGS evaluation (ref lintrans_evaluator.go:27)."""

    def __init__(self, rlwe_eval: RlweEvaluator):
        self.ev = rlwe_eval
        self.params = rlwe_eval.params

    def _pre_rotate(self, ct: Ciphertext, digits, babies: list[int], level: int):
        """preRot[i] = σ_i(ct) in lazy-QP form, Q part carrying a P factor.

        i=0 maps to (P·c0, P·c1) over Q with zero P part
        (ref MultiplyByDiagMatrixBSGS: MulScalarBigint by P).
        """
        p = self.params
        P = p.p_big_int()
        pre: dict[int, tuple[QPPoly, QPPoly]] = {}
        lp = len(p.p_moduli)
        zero_p = jnp.zeros(ct.value.shape[:-3] + (lp, p.n), dtype=jnp.uint64)
        for i in babies:
            if i == 0:
                c0 = p.ring_q.mul_scalar(ct.value[..., 0, :, :], P, level)
                c1 = p.ring_q.mul_scalar(ct.value[..., 1, :, :], P, level)
                pre[0] = (QPPoly(c0, zero_p), QPPoly(c1, zero_p))
                continue
            gal = p.galois_element(i)
            gk = self.ev.evk.galois_key(gal)
            acc = self.ev.gadget_product_hoisted_lazy(digits, gk.gadget, level)
            # d0 += P·c0 (Q part only), then permute both rows
            d0q = p.ring_q.add(
                acc.q[..., 0, :, :],
                p.ring_q.mul_scalar(ct.value[..., 0, :, :], P, level), level)
            idx = auto_mod.ntt_index(p.n, gal, p.ring_type)
            pre[i] = (
                QPPoly(auto_mod.apply_ntt(d0q, idx),
                       auto_mod.apply_ntt(acc.p[..., 0, :, :], idx)),
                QPPoly(auto_mod.apply_ntt(acc.q[..., 1, :, :], idx),
                       auto_mod.apply_ntt(acc.p[..., 1, :, :], idx)),
            )
        return pre

    def evaluate(self, ct: Ciphertext, lt: LinearTransformation) -> Ciphertext:
        p = self.params
        rq, rp = p.ring_q, p.ring_p
        level = min(ct.level, lt.level_q)
        l = level + 1
        ct = ct.at_level(level)
        index = lt.index
        babies = sorted({i for b in index.values() for i in b})

        digits = self.ev.decompose_ntt(ct.value[..., 1, :, :], level)
        pre = self._pre_rotate(ct, digits, babies, level)

        qmax = max(max(p.q_moduli[:l]), max(p.p_moduli))
        margin = max(2, ((1 << 64) - 1) // (2 * qmax) - 1)

        def mac(acc, pt: QPPoly, x: QPPoly):
            tq = modops.mred_lazy(x.q, pt.q[..., :l, :], rq.q[:l], rq.qinv[:l])
            tp = modops.mred_lazy(x.p, pt.p, rp.q, rp.qinv)
            if acc is None:
                return (tq, tp), 1
            return (acc[0] + tq, acc[1] + tp), None

        out0 = out1 = None  # QP lazy accumulators across giant steps
        n_out = 0
        for j, b_list in index.items():
            acc0 = acc1 = None
            cnt = 0
            for i in b_list:
                pt = lt.vec[j + i]
                x0, x1 = pre[i]
                t0q = modops.mred_lazy(x0.q, pt.q[..., :l, :], rq.q[:l], rq.qinv[:l])
                t0p = modops.mred_lazy(x0.p, pt.p, rp.q, rp.qinv)
                t1q = modops.mred_lazy(x1.q, pt.q[..., :l, :], rq.q[:l], rq.qinv[:l])
                t1p = modops.mred_lazy(x1.p, pt.p, rp.q, rp.qinv)
                if acc0 is None:
                    acc0, acc1 = [t0q, t0p], [t1q, t1p]
                else:
                    acc0 = [acc0[0] + t0q, acc0[1] + t0p]
                    acc1 = [acc1[0] + t1q, acc1[1] + t1p]
                cnt += 1
                if cnt % margin == margin - 1:
                    acc0 = [modops.bred_add_lazy(acc0[0], rq.q[:l], rq.bred_hi[:l]),
                            modops.bred_add_lazy(acc0[1], rp.q, rp.bred_hi)]
                    acc1 = [modops.bred_add_lazy(acc1[0], rq.q[:l], rq.bred_hi[:l]),
                            modops.bred_add_lazy(acc1[1], rp.q, rp.bred_hi)]
            tmp0 = QPPoly(modops.bred_add(acc0[0], rq.q[:l], rq.bred_hi[:l]),
                          modops.bred_add(acc0[1], rp.q, rp.bred_hi))
            tmp1 = QPPoly(modops.bred_add(acc1[0], rq.q[:l], rq.bred_hi[:l]),
                          modops.bred_add(acc1[1], rp.q, rp.bred_hi))

            if j != 0:
                # collapse P on the c1 side, key-switch by giant rotation
                t1q = p.basis_extender.mod_down_qp_to_q(
                    tmp1.q, tmp1.p, level, ntt_domain=True)
                gal = p.galois_element(j)
                gk = self.ev.evk.galois_key(gal)
                d = self.ev.gadget_product_hoisted_lazy(
                    self.ev.decompose_ntt(t1q, level), gk.gadget, level)
                # d0 += tmp0 (both carry the P factor)
                d0 = QPPoly(rq.add(d.q[..., 0, :, :], tmp0.q, level),
                            rp.add(d.p[..., 0, :, :], tmp0.p))
                d1 = QPPoly(d.q[..., 1, :, :], d.p[..., 1, :, :])
                idx = auto_mod.ntt_index(p.n, gal, p.ring_type)
                g0 = QPPoly(auto_mod.apply_ntt(d0.q, idx), auto_mod.apply_ntt(d0.p, idx))
                g1 = QPPoly(auto_mod.apply_ntt(d1.q, idx), auto_mod.apply_ntt(d1.p, idx))
            else:
                g0, g1 = tmp0, tmp1

            if out0 is None:
                out0, out1 = [g0.q, g0.p], [g1.q, g1.p]
            else:
                out0 = [out0[0] + g0.q, out0[1] + g0.p]
                out1 = [out1[0] + g1.q, out1[1] + g1.p]
            n_out += 1
            if n_out % margin == margin - 1:
                out0 = [modops.bred_add_lazy(out0[0], rq.q[:l], rq.bred_hi[:l]),
                        modops.bred_add_lazy(out0[1], rp.q, rp.bred_hi)]
                out1 = [modops.bred_add_lazy(out1[0], rq.q[:l], rq.bred_hi[:l]),
                        modops.bred_add_lazy(out1[1], rp.q, rp.bred_hi)]

        c0q = modops.bred_add(out0[0], rq.q[:l], rq.bred_hi[:l])
        c0p = modops.bred_add(out0[1], rp.q, rp.bred_hi)
        c1q = modops.bred_add(out1[0], rq.q[:l], rq.bred_hi[:l])
        c1p = modops.bred_add(out1[1], rp.q, rp.bred_hi)
        c0 = p.basis_extender.mod_down_qp_to_q(c0q, c0p, level, ntt_domain=True)
        c1 = p.basis_extender.mod_down_qp_to_q(c1q, c1p, level, ntt_domain=True)

        if hasattr(p, "t"):  # BGV: scales live in Z_T
            new_scale = ct.scale * lt.scale % p.t
        else:  # CKKS: exact rational scales
            from fractions import Fraction
            new_scale = Fraction(ct.scale) * Fraction(lt.scale)
        return ct.replace(value=jnp.stack([c0, c1], axis=-3), scale=new_scale)
