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

from flax import struct

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring import modops
from lattigo_tpu.ring import automorphism as auto_mod
from lattigo_tpu.ring.ringqp import QPPoly
from lattigo_tpu.rlwe.elements import Ciphertext
from lattigo_tpu.rlwe.evaluator import Evaluator as RlweEvaluator


def bsgs_split(diags: list[int], slots: int, log_bsgs_ratio: int = 0) -> int:
    """Choose the baby-step width N1 (ref lintrans.go:320 FindBestBSGSRatio).

    Searches power-of-two N1 minimizing the total number of key-switches
    (#baby rotations + #giant rotations), which handles STRIDED diagonal
    sets (the homomorphic-DFT stages produce indices {0, S, 2S, …}): for
    those the baby offsets are rot mod N1 with N1 a multiple of S, e.g. 16
    diagonals of stride 256 split 4×4 instead of degenerating into 16
    giant steps (each giant step costs a gadget product + ModDown).
    ``log_bsgs_ratio`` biases toward more giants (>0) or more babies (<0)
    by weighting giants 2^-ratio in the cost.
    """
    n = len(diags)
    if n <= 1:
        return 1
    best_n1, best_cost = 1, float("inf")
    w = 2.0 ** (-log_bsgs_ratio)
    n1 = 1
    while n1 <= slots:
        index = bsgs_index(diags, slots, n1)
        nb_babies = len({i for b in index.values() for i in b})
        nb_giants = len(index)
        cost = (nb_babies - 1) + w * (nb_giants - 1)
        if cost < best_cost:
            best_n1, best_cost = n1, cost
        n1 <<= 1
    return best_n1


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


@struct.dataclass
class LinearTransformation:
    """Encoded linear transformation (ref lintrans.go:127).

    vec[k]: QPPoly — diagonal k pre-rotated by its giant step, encoded in
    NTT+Montgomery over QP at level_q. A pytree (array leaves = the
    encoded diagonals) so whole transformations can cross jit boundaries
    as arguments instead of being inlined as HLO constants.
    """

    vec: dict[int, QPPoly]
    n1: int = struct.field(pytree_node=False, default=1)
    level_q: int = struct.field(pytree_node=False, default=0)
    scale: Any = struct.field(pytree_node=False, default=1)
    slots: int = struct.field(pytree_node=False, default=0)

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
    ks, rots = [], []
    for k, d in diagonals.items():
        k = k % slots
        j = k - (k % n1)
        d = np.asarray(d)
        ks.append(k)
        rots.append(rotate_diag(d, j) if j else d)  # pre-rotate by giant step
    vec: dict[int, QPPoly] = {}
    batch = getattr(encode_diag, "encode_batch", None)
    if batch is not None:
        # one device call per chunk of diagonals instead of one per diagonal;
        # chunks are zero-padded to a fixed size so every call reuses the
        # same compiled program
        chunk = 16
        for lo in range(0, len(ks), chunk):
            part = rots[lo:lo + chunk]
            pad = chunk - len(part)
            if pad:
                part = part + [np.zeros_like(np.asarray(part[0]))] * pad
            qp = batch(np.stack(part), level_q)
            for i, k in enumerate(ks[lo:lo + chunk]):
                vec[k] = QPPoly(qp.q[i], None if qp.p is None else qp.p[i])
    else:
        for k, rot in zip(ks, rots):
            vec[k] = encode_diag(rot, level_q)
    return LinearTransformation(vec=vec, n1=n1, level_q=level_q,
                                scale=scale, slots=slots)


# ---------------------------------------------------------------------------
# Scheme bindings (ref circuits/{ckks,bgv}/lintrans)
# ---------------------------------------------------------------------------

def lift_f64_qp(params, vals: np.ndarray, level_q: int) -> QPPoly:
    """Signed integral f64 coeffs [..., N] → NTT+Montgomery QPPoly.

    Fast path for float-precision constants (CKKS DFT/lintrans matrices):
    the magnitude (< 2^63, integral) is split hi·2^32 + lo exactly in f64,
    reassembled as u64 on host, and reduced per limb on device — one device
    round-trip for a whole batch of diagonals instead of per-diagonal
    Python big-int residues. Bit-identical to lift_ints_qp on inputs that
    came from f64 (they all do on this path).
    """
    import jax.numpy as jnp
    from lattigo_tpu.ring import modops
    mag = np.abs(np.rint(vals))
    assert np.all(mag < 2.0 ** 63), "constant exceeds 63-bit magnitude"
    neg = vals < 0
    hi = np.floor(mag * 2.0 ** -32)
    lo = mag - hi * 2.0 ** 32
    m64 = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)

    def reduce_ring(ring, l):
        q, bhi = ring.q[:l], ring.bred_hi[:l]
        r = modops.bred_add(jnp.asarray(m64)[..., None, :], q, bhi)
        return jnp.where(jnp.asarray(neg)[..., None, :],
                         modops.neg_mod(r, q), r)

    # always lift over the FULL chain and slice down: one program shape
    # for every (matrix, level) — compile once, reuse for all encodes
    rq = params.ring_q
    lfull = rq.max_level + 1
    qq = rq.mform(rq.ntt(reduce_ring(rq, lfull)))[..., : level_q + 1, :]
    pp = None
    if params.ring_p is not None:
        rp = params.ring_p
        pp = rp.mform(rp.ntt(reduce_ring(rp, len(params.p_moduli))))
    return QPPoly(qq, pp)


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
    """Diagonal encoder for CKKS: embed → ×scale → round → lift to QP.

    Exposes ``encode_batch(vecs[D, slots], level_q)`` so a whole matrix's
    diagonals lift in one device call (see encode_linear_transformation).
    """
    def encode_batch(vecs: np.ndarray, level_q: int) -> QPPoly:
        coeffs = encoder.embed_to_coeffs(vecs) * float(scale)
        return lift_f64_qp(params, coeffs, level_q)

    def encode_diag(vec: np.ndarray, level_q: int) -> QPPoly:
        qp = encode_batch(np.asarray(vec)[None], level_q)
        return QPPoly(qp.q[0], None if qp.p is None else qp.p[0])

    encode_diag.encode_batch = encode_batch
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

        tmp_by_j: dict[int, tuple[QPPoly, QPPoly]] = {}
        for j, b_list in index.items():
            # stack the giant step's baby plaintexts and pre-rotations, one
            # broadcast Montgomery MAC + lazy tree reduction over the baby
            # axis (single fused op chain — see modops.lazy_tree_sum)
            ptq = jnp.stack([lt.vec[j + i].q[..., :l, :] for i in b_list])
            ptp = jnp.stack([lt.vec[j + i].p for i in b_list])
            x0q = jnp.stack([pre[i][0].q for i in b_list])
            if x0q.ndim > ptq.ndim:  # ct batch dims: keep pt aligned on [B,...,l,N]
                ext = (1,) * (x0q.ndim - ptq.ndim)
                ptq = ptq.reshape(ptq.shape[:1] + ext + ptq.shape[1:])
                ptp = ptp.reshape(ptp.shape[:1] + ext + ptp.shape[1:])
            x0p = jnp.stack([pre[i][0].p for i in b_list])
            x1q = jnp.stack([pre[i][1].q for i in b_list])
            x1p = jnp.stack([pre[i][1].p for i in b_list])
            sum_q = lambda x, pt: modops.lazy_tree_sum(
                modops.mred_lazy(x, pt, rq.q[:l], rq.qinv[:l]),
                rq.q[:l], rq.bred_hi[:l], margin)
            sum_p = lambda x, pt: modops.lazy_tree_sum(
                modops.mred_lazy(x, pt, rp.q, rp.qinv),
                rp.q, rp.bred_hi, margin)
            tmp_by_j[j] = (
                QPPoly(
                    modops.bred_add(sum_q(x0q, ptq), rq.q[:l], rq.bred_hi[:l]),
                    modops.bred_add(sum_p(x0p, ptp), rp.q, rp.bred_hi)),
                QPPoly(
                    modops.bred_add(sum_q(x1q, ptq), rq.q[:l], rq.bred_hi[:l]),
                    modops.bred_add(sum_p(x1p, ptp), rp.q, rp.bred_hi)))

        # giant steps: every j != 0 needs ModDown + decompose + gadget MAC +
        # NTT permutation — identical shapes, so the whole set runs BATCHED
        # over a leading giant axis (stacked Galois keys / gather indices):
        # one program instead of per-giant chains, then one tree reduction.
        giants = [j for j in index if j != 0]
        parts0, parts1 = [], []
        if 0 in index:
            g0, g1 = tmp_by_j[0]
            parts0.append(g0)
            parts1.append(g1)
        if giants:
            T0q = jnp.stack([tmp_by_j[j][0].q for j in giants])  # [G, ..., l, N]
            T0p = jnp.stack([tmp_by_j[j][0].p for j in giants])
            T1q = jnp.stack([tmp_by_j[j][1].q for j in giants])
            T1p = jnp.stack([tmp_by_j[j][1].p for j in giants])
            t1q = p.basis_extender.mod_down_qp_to_q(T1q, T1p, level,
                                                    ntt_domain=True)
            digits = self.ev.decompose_ntt(t1q, level)   # [G, ..., beta, l, N]
            gks = [self.ev.evk.galois_key(p.galois_element(j)) for j in giants]
            beta = digits.q.shape[-3]
            evq = jnp.stack([gk.gadget.value.q[:beta, :, :l, :] for gk in gks])
            evp = jnp.stack([gk.gadget.value.p[:beta] for gk in gks])
            n_ext = digits.q.ndim + 1 - evq.ndim  # ct batch dims (G .. beta)
            if n_ext > 0:
                ext = (1,) * n_ext
                evq = evq.reshape(evq.shape[:1] + ext + evq.shape[1:])
                evp = evp.reshape(evp.shape[:1] + ext + evp.shape[1:])
            dq = modops.mred_lazy(digits.q[..., :, None, :, :], evq,
                                  rq.q[:l], rq.qinv[:l])
            dp = modops.mred_lazy(digits.p[..., :, None, :, :], evp,
                                  rp.q, rp.qinv)
            accq = modops.bred_add(
                modops.lazy_tree_sum(jnp.moveaxis(dq, -4, 0),
                                     rq.q[:l], rq.bred_hi[:l], margin),
                rq.q[:l], rq.bred_hi[:l])                # [G, ..., 2, l, N]
            accp = modops.bred_add(
                modops.lazy_tree_sum(jnp.moveaxis(dp, -4, 0),
                                     rp.q, rp.bred_hi, margin),
                rp.q, rp.bred_hi)
            d0q = rq.add(accq[..., 0, :, :], T0q, level)
            d0p = rp.add(accp[..., 0, :, :], T0p)
            d1q, d1p = accq[..., 1, :, :], accp[..., 1, :, :]
            # per-giant permutation with STATIC indices (constant-folded
            # gathers; a dynamic take_along_axis lowers poorly)
            for g, j in enumerate(giants):
                idx = auto_mod.ntt_index(p.n, p.galois_element(j), p.ring_type)
                parts0.append(QPPoly(auto_mod.apply_ntt(d0q[g], idx),
                                     auto_mod.apply_ntt(d0p[g], idx)))
                parts1.append(QPPoly(auto_mod.apply_ntt(d1q[g], idx),
                                     auto_mod.apply_ntt(d1p[g], idx)))

        base_ndim = next(iter(tmp_by_j.values()))[0].q.ndim

        def reduce_parts(parts, is_q: bool):
            arrs = []
            for qp in parts:
                a = qp.q if is_q else qp.p
                # per-giant stacks carry a leading G axis; singles don't
                arrs.append(a if a.ndim > base_ndim else a[None])
            t = jnp.concatenate(arrs, axis=0)
            qv, bhi = (rq.q[:l], rq.bred_hi[:l]) if is_q else (rp.q, rp.bred_hi)
            return modops.bred_add(
                modops.lazy_tree_sum(t, qv, bhi, margin), qv, bhi)

        c0q = reduce_parts(parts0, True)
        c0p = reduce_parts(parts0, False)
        c1q = reduce_parts(parts1, True)
        c1p = reduce_parts(parts1, False)
        c0 = p.basis_extender.mod_down_qp_to_q(c0q, c0p, level, ntt_domain=True)
        c1 = p.basis_extender.mod_down_qp_to_q(c1q, c1p, level, ntt_domain=True)

        if hasattr(p, "t"):  # BGV: scales live in Z_T
            new_scale = ct.scale * lt.scale % p.t
        else:  # CKKS: exact rational scales
            from fractions import Fraction
            new_scale = Fraction(ct.scale) * Fraction(lt.scale)
        return ct.replace(value=jnp.stack([c0, c1], axis=-3), scale=new_scale)
