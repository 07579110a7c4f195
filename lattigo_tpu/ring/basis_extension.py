"""RNS basis extension: ModUp / ModDown / gadget decomposition.

TPU-native analog of ``ring/basis_extension.go`` (BasisExtender, ModUpQtoP/
PtoQ, ModDownQPtoQ[NTT], Decomposer/DecomposeAndSplit). The HPS fast basis
conversion is a contraction over source limbs:

    y_i   = x_i · (Q/q_i)^{-1}            (mod q_i)
    v     = round(Σ_i y_i / q_i)          (overflow count)
    out_j = Σ_i y_i · (Q/q_i) − v·Q       (mod p_j)

The reference computes v with f64 inverse sums (basis_extension.go:504);
TPUs have no fast f64, so v is computed in **exact 128-bit fixed point**
(two u64 words of ⌊2^128/q_i⌋ per limb), giving per-coefficient error
< L·2^-67 — strictly tighter than the reference's f64 path. With
``centered=True`` v = round(·) and the conversion produces the centered
representative (−Q/2, Q/2] mod p_j, which is what key-switching and
ModDown need for minimal noise.

The limb contraction is accumulated lazily in [0, 2p) with margin-based
flushes (the analog of the reference's QiOverflowMargin cadence).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from lattigo_tpu.ring import modops

_U64 = np.uint64


def _mform_int(a: int, q: int) -> int:
    return (a << 64) % q


class ModUpConstants:
    """Precomputed tables for basis conversion src_moduli → dst_moduli."""

    def __init__(self, src_moduli: list[int], dst_moduli: list[int]):
        self.src_moduli = list(src_moduli)
        self.dst_moduli = list(dst_moduli)
        Q = 1
        for q in src_moduli:
            Q *= q
        Li, Lj = len(src_moduli), len(dst_moduli)

        qhatinv = np.zeros((Li, 1), dtype=_U64)
        for i, q in enumerate(src_moduli):
            qhat = Q // q
            qhatinv[i, 0] = _mform_int(pow(qhat % q, -1, q), q)
        # numpy storage: these may be built lazily inside a jit trace,
        # where jnp arrays would be tracers and poison the cache
        # (jnp ops accept numpy operands directly)
        self.qhatinv = qhatinv  # M-form, [Li, 1]

        qhat_dst = np.zeros((Li, Lj), dtype=_U64)
        for i, q in enumerate(src_moduli):
            qhat = Q // q
            for j, p in enumerate(dst_moduli):
                qhat_dst[i, j] = _mform_int(qhat % p, p)
        self.qhat_dst = qhat_dst  # M-form, [Li, Lj]

        qneg_dst = np.zeros((Lj, 1), dtype=_U64)
        for j, p in enumerate(dst_moduli):
            qneg_dst[j, 0] = _mform_int((-Q) % p, p)
        self.qneg_dst = qneg_dst  # M-form of -Q mod p_j

        # 128-bit fixed-point reciprocals ⌊2^128 / q_i⌋ = whi·2^64 + wlo.
        whi = np.zeros((Li, 1), dtype=_U64)
        wlo = np.zeros((Li, 1), dtype=_U64)
        for i, q in enumerate(src_moduli):
            w = (1 << 128) // q
            whi[i, 0] = (w >> 64) & 0xFFFFFFFFFFFFFFFF
            wlo[i, 0] = w & 0xFFFFFFFFFFFFFFFF
        self.whi = whi
        self.wlo = wlo

        # Lazy-accumulation flush margin: how many [0,2p) terms fit in u64.
        pmax = max(dst_moduli)
        self.margin = max(1, ((1 << 64) - 1) // (2 * pmax) - 1)

        self.src_q = np.array(src_moduli, dtype=_U64).reshape(Li, 1)
        self.src_qinv = (
            np.array(
                [modops.gen_mred_constant(q) for q in src_moduli], dtype=_U64
            ).reshape(Li, 1)
        )

        # Small-prime fast path (all moduli < 2^30): y_i·(qhat mod p_j) fits
        # u64 PLAIN, so the contraction runs as raw multiply-accumulate with
        # one Barrett reduction per output element — ~4x fewer VPU ops than
        # per-term Montgomery (the ModUp analog of modops' engine32).
        # Cross-size hazard: when every dst prime is below the u32
        # fast-path bound but a src prime is not, mred_lazy(y_i, ·) would
        # take the 32-bit Montgomery path with a 30+-bit operand a=y_i,
        # overflowing its a·b < 2^64 contract (seen as exact corruption for
        # src primes ≥ 2^52 with T=2^16+1 — the BGV decode Q→T conversion).
        # mod_up pre-reduces y mod the dst primes in that case.
        self.prereduce_src = (
            max(dst_moduli) < (1 << modops.SMALL_Q_BITS)
            <= max(src_moduli))

        self.small = max(src_moduli + dst_moduli) < (1 << 30)
        if self.small:
            qhat_plain = np.zeros((Li, Lj), dtype=_U64)
            for i, q in enumerate(src_moduli):
                qh = Q // q
                for j, p in enumerate(dst_moduli):
                    qhat_plain[i, j] = qh % p
            self.qhat_plain = qhat_plain
            qneg_plain = np.zeros((Lj,), dtype=_U64)
            for j, p in enumerate(dst_moduli):
                qneg_plain[j] = (-Q) % p
            self.qneg_plain = qneg_plain
            # terms < 2^30·2^30 = 2^60: flush cadence for the raw sum
            self.margin_small = max(1, ((1 << 64) - 1) // (1 << 60) - 1)

        # MXU digit-matmul path (all moduli < 2^29): the limb contraction
        # Σ_i y_i·(qhat_i mod p_j) runs as one exact int8 matmul on the
        # systolic array (same balanced-digit construction as ntt_mxu.py).
        # W[(d, i), (s, j)] = digit_s((2^{8d}·qhat_i) mod p_j); the four
        # i32 digit planes recombine in i64 (|Σ_s P_s·2^{8s}| < Li·2^41)
        # with one Barrett per output element.
        # Li >= 6: below that the 4·Li contraction is too skinny for the
        # 128-deep systolic array to beat the VPU MAC loop (measured).
        self.mxu = max(src_moduli + dst_moduli) < (1 << 29) and 6 <= Li <= 256
        if self.mxu:
            ext = np.zeros((4, Li, Lj), dtype=np.int64)
            for i, q in enumerate(src_moduli):
                qh = Q // q
                for j, p in enumerate(dst_moduli):
                    for d in range(4):
                        ext[d, i, j] = ((1 << (8 * d)) * qh) % p
            # balanced signed base-256 digits of ext (< 2^29)
            w = np.zeros((4, Li, 4, Lj), dtype=np.int8)  # [d, i, s, j]
            v = ext
            for s in range(4):
                dig = v & 255
                carry = dig >> 7
                w[:, :, s, :] = (dig - (carry << 8)).astype(np.int8)
                v = (v >> 8) + carry
            assert np.all(v == 0)
            self.w_mxu = w.reshape(4 * Li, 4 * Lj)
            # per-output-limb shift to make the signed recombination
            # non-negative before Barrett: a multiple of p_j ≥ 2^51
            self.cshift = np.array(
                [((1 << 51) // p) * p for p in dst_moduli], dtype=_U64)


def _overflow_count(y, consts: ModUpConstants, centered: bool):
    """v = floor/round(Σ_i y_i/q_i) via exact 128-bit fixed point.

    y: u64[..., Li, N] with y_i < q_i. Returns u64[..., N].
    """
    # Each term y_i·⌊2^128/q_i⌋ < 2^128 is purely fractional (128 frac bits).
    t_hi = y * consts.whi + modops.mul_hi(y, consts.wlo)  # [..., Li, N]
    t_lo = y * consts.wlo
    # 128-bit accumulation across limbs with carry propagation.
    acc_lo = jnp.zeros(t_lo.shape[:-2] + (t_lo.shape[-1],), dtype=jnp.uint64)
    acc_hi = jnp.zeros_like(acc_lo)
    v = jnp.zeros_like(acc_lo)
    Li = t_lo.shape[-2]
    for i in range(Li):
        lo = t_lo[..., i, :]
        hi = t_hi[..., i, :]
        new_lo = acc_lo + lo
        carry = (new_lo < lo).astype(jnp.uint64)
        new_hi = acc_hi + hi + carry
        v = v + (new_hi < hi).astype(jnp.uint64)  # carry out of 128 bits
        acc_lo, acc_hi = new_lo, new_hi
    if centered:
        v = v + (acc_hi >> jnp.uint64(63))
    return v


def _mod_up_contract_mxu(y, v, consts: ModUpConstants, dst_q, dst_bhi):
    """Limb contraction as an exact int8 digit matmul (MXU).

    y: u64[..., Li, N] canonical; v: u64[..., N] overflow count.
    """
    Lj = len(consts.dst_moduli)
    planes = []
    w = y
    for _ in range(4):
        d = w & jnp.uint64(255)
        c = d >> jnp.uint64(7)
        w = (w >> jnp.uint64(8)) + c
        planes.append((d.astype(jnp.int32) - (c << jnp.uint64(8)).astype(jnp.int32))
                      .astype(jnp.int8))
    dig = jnp.concatenate(planes, axis=-2)               # [..., 4Li, N] i8
    p32 = jax.lax.dot_general(
        dig, jnp.asarray(consts.w_mxu),
        (((dig.ndim - 2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                # [..., N, 4Lj]
    p64 = p32.astype(jnp.int64)
    t = (p64[..., 0 * Lj:1 * Lj]
         + (p64[..., 1 * Lj:2 * Lj] << 8)
         + (p64[..., 2 * Lj:3 * Lj] << 16)
         + (p64[..., 3 * Lj:4 * Lj] << 24))              # [..., N, Lj], |t| < 2^51
    tu = (t + consts.cshift.astype(np.int64)).astype(jnp.uint64)
    tu = jnp.moveaxis(tu, -1, -2)                        # [..., Lj, N]
    acc = tu + v[..., None, :] * consts.qneg_plain[:, None]
    return modops.bred_add(acc, dst_q, dst_bhi)


def mod_up(x, consts: ModUpConstants, dst_q, dst_qinv, dst_bhi, centered: bool = True):
    """Basis-convert x (u64[..., Li, N], coeff domain) to dst basis [..., Lj, N]."""
    y = modops.mred(x, consts.qhatinv, consts.src_q, consts.src_qinv)  # [..., Li, N]
    v = _overflow_count(y, consts, centered)             # [..., N]

    Li = len(consts.src_moduli)
    if (consts.mxu and jax.default_backend() == "tpu"
            and not os.environ.get("LATTIGO_TPU_NO_MXU_MODUP")):
        return _mod_up_contract_mxu(y, v, consts, dst_q, dst_bhi)
    # one broadcast MAC over [..., Li, Lj, N] + lazy tree reduction over Li
    # (see modops.lazy_tree_sum) instead of a per-source-limb Python chain
    if consts.small:
        # raw u64 MAC (terms < 2^60) + one Barrett per output element;
        # v < Li+1 so v·(−Q mod p) is far below the term bound too
        t = y[..., :, None, :] * consts.qhat_plain[:, :, None]
        acc = modops.lazy_tree_sum(jnp.moveaxis(t, -3, 0), dst_q, dst_bhi,
                                   consts.margin_small)
        acc = acc + v[..., None, :] * consts.qneg_plain[:, None]
        return modops.bred_add(acc, dst_q, dst_bhi)

    yb = y[..., :, None, :]
    if consts.prereduce_src:
        # keep the u32 fast path's a < 4q contract (see ModUpConstants)
        yb = modops.bred_add(yb, dst_q, dst_bhi)
    t = modops.mred_lazy(yb, consts.qhat_dst[:, :, None],
                         dst_q, dst_qinv)                  # [..., Li, Lj, N]
    acc = modops.lazy_tree_sum(jnp.moveaxis(t, -3, 0), dst_q, dst_bhi,
                               consts.margin)
    acc = acc + modops.mred_lazy(v[..., None, :], consts.qneg_dst,
                                 dst_q, dst_qinv)
    return modops.bred_add(acc, dst_q, dst_bhi)


class BasisExtender:
    """Q↔P conversion + exact division by P (ref basis_extension.go:14-277).

    ring_q, ring_p: :class:`lattigo_tpu.ring.Ring` over the Q and P chains.
    All methods take a static ``level_q`` (and use the full P chain).
    """

    def __init__(self, ring_q, ring_p):
        self.ring_q = ring_q
        self.ring_p = ring_p
        lq = len(ring_q.moduli)
        self._q_to_p = [
            ModUpConstants(ring_q.moduli[: l + 1], ring_p.moduli) for l in range(lq)
        ]
        self._p_to_q = [
            ModUpConstants(ring_p.moduli, ring_q.moduli[: l + 1]) for l in range(lq)
        ]
        # MForm(P^{-1} mod q_i) for the final scaling of ModDown.
        P = 1
        for p in ring_p.moduli:
            P *= p
        pinv = np.array(
            [_mform_int(pow(P % q, -1, q), q) for q in ring_q.moduli], dtype=_U64
        ).reshape(lq, 1)
        self.pinv_q = pinv
        self.p_modulus = P

    def mod_up_q_to_p(self, x, level_q: int, centered: bool = True):
        """x mod Q_{level} (coeff domain) → x mod P basis."""
        rp = self.ring_p
        return mod_up(x, self._q_to_p[level_q], rp.q, rp.qinv, rp.bred_hi, centered)

    def mod_up_p_to_q(self, x, level_q: int, centered: bool = True):
        rq = self.ring_q
        l = level_q + 1
        return mod_up(
            x, self._p_to_q[level_q], rq.q[:l], rq.qinv[:l], rq.bred_hi[:l], centered
        )

    def mod_down_qp_to_q(self, xq, xp, level_q: int, ntt_domain: bool = False):
        """(x mod QP) → round(x/P) mod Q (ref ModDownQPtoQ[NTT], :215-277).

        xq: u64[..., level_q+1, N]; xp: u64[..., LP, N]. Both NTT-domain if
        ntt_domain, else coefficient domain.
        """
        rq = self.ring_q
        l = level_q + 1
        if ntt_domain:
            xp = self.ring_p.intt(xp)
        lift = self.mod_up_p_to_q(xp, level_q, centered=True)
        if ntt_domain:
            lift = rq.ntt(lift, level=level_q)
        diff = modops.sub_mod(xq, lift, rq.q[:l])
        return modops.mred(diff, self.pinv_q[:l], rq.q[:l], rq.qinv[:l])


class Decomposer:
    """RNS gadget decomposition for key switching (ref :313 Decomposer).

    Splits the Q-basis limbs at level l into ``beta = ceil((l+1)/alpha)``
    digits of ``alpha = |P|`` limbs each; digit d is base-converted to the
    full QP basis (its own limbs pass through unchanged).
    """

    def __init__(self, ring_q, ring_p):
        self.ring_q = ring_q
        self.ring_p = ring_p
        self.alpha = len(ring_p.moduli)
        # consts[(level, digit)] built lazily.
        self._consts: dict[tuple[int, int], ModUpConstants] = {}

    def num_digits(self, level_q: int) -> int:
        return -(-(level_q + 1) // self.alpha)

    def digit_range(self, level_q: int, d: int) -> tuple[int, int]:
        lo = d * self.alpha
        hi = min((d + 1) * self.alpha, level_q + 1)
        return lo, hi

    def _get_consts(self, level_q: int, d: int) -> ModUpConstants:
        key = (level_q, d)
        if key not in self._consts:
            lo, hi = self.digit_range(level_q, d)
            src = self.ring_q.moduli[lo:hi]
            dst = self.ring_q.moduli[: level_q + 1] + self.ring_p.moduli
            self._consts[key] = ModUpConstants(src, dst)
        return self._consts[key]

    def _stacked_consts(self, level_q: int):
        """Digit-stacked ModUp tables for :meth:`decompose_all` (cached).

        Rows of the padded last digit carry zero tables so they contribute
        nothing to the contraction or the overflow count.
        """
        key = ("stacked", level_q)
        if key in self._consts:
            return self._consts[key]
        rq, rp = self.ring_q, self.ring_p
        lq = level_q + 1
        a = self.alpha
        beta = self.num_digits(level_q)
        Lj = lq + len(rp.moduli)
        qhatinv = np.zeros((beta, a, 1), dtype=_U64)
        whi = np.zeros((beta, a, 1), dtype=_U64)
        wlo = np.zeros((beta, a, 1), dtype=_U64)
        src_q = np.ones((beta, a, 1), dtype=_U64)
        src_qinv = np.ones((beta, a, 1), dtype=_U64)
        qhat_dst = np.zeros((beta, a, Lj), dtype=_U64)
        qneg_dst = np.zeros((beta, Lj, 1), dtype=_U64)
        margin = 1 << 62
        for d in range(beta):
            c = self._get_consts(level_q, d)
            k = len(c.src_moduli)
            qhatinv[d, :k] = c.qhatinv
            whi[d, :k] = c.whi
            wlo[d, :k] = c.wlo
            src_q[d, :k] = c.src_q
            src_qinv[d, :k] = c.src_qinv
            qhat_dst[d, :k] = c.qhat_dst
            qneg_dst[d] = c.qneg_dst
            margin = min(margin, c.margin)
        pass_mask = np.zeros((beta, Lj, 1), dtype=bool)
        for d in range(beta):
            lo, hi = self.digit_range(level_q, d)
            pass_mask[d, lo:hi] = True
        out = dict(qhatinv=qhatinv, whi=whi, wlo=wlo, src_q=src_q,
                   src_qinv=src_qinv, qhat_dst=qhat_dst, qneg_dst=qneg_dst,
                   margin=margin, pass_mask=pass_mask, beta=beta)
        self._consts[key] = out
        return out

    def decompose_all(self, x_coeff, level_q: int):
        """All digits at once: (yq [..., beta, l+1, N], yp [..., beta, LP, N]).

        One broadcast computation over a digit axis instead of beta separate
        ModUp programs — same math as :meth:`decompose_single` per digit
        (general Montgomery path; falls back to the per-digit loop for the
        small/MXU-contraction chains, whose fast paths are already compact).
        """
        rq, rp = self.ring_q, self.ring_p
        lq = level_q + 1
        if self._get_consts(level_q, 0).small or self._get_consts(level_q, 0).mxu:
            ys = [self.decompose_single(x_coeff, level_q, d)
                  for d in range(self.num_digits(level_q))]
            return (jnp.stack([y[0] for y in ys], axis=-3),
                    jnp.stack([y[1] for y in ys], axis=-3))
        c = self._stacked_consts(level_q)
        beta, a = c["beta"], self.alpha
        Lj = lq + len(rp.moduli)
        # group the limbs into digits: [..., beta, a, N] (zero-padded tail)
        pad = beta * a - lq
        x = x_coeff
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-2] + (pad, x.shape[-1]), x.dtype)],
                axis=-2)
        xg = x.reshape(x.shape[:-2] + (beta, a, x.shape[-1]))

        # tables [beta, r, c] right-align against xg [..., beta, a, N]
        y = modops.mred(xg, c["qhatinv"], c["src_q"], c["src_qinv"])
        # overflow count v = round(Σ_i y_i/q_i) via 128-bit fixed point
        t_hi = y * c["whi"] + modops.mul_hi(y, c["wlo"])
        t_lo = y * c["wlo"]
        acc_lo = jnp.zeros(t_lo.shape[:-2] + (t_lo.shape[-1],), jnp.uint64)
        acc_hi = jnp.zeros_like(acc_lo)
        v = jnp.zeros_like(acc_lo)
        for i in range(a):
            lo_, hi_ = t_lo[..., i, :], t_hi[..., i, :]
            new_lo = acc_lo + lo_
            carry = (new_lo < lo_).astype(jnp.uint64)
            new_hi = acc_hi + hi_ + carry
            v = v + (new_hi < hi_).astype(jnp.uint64)
            acc_lo, acc_hi = new_lo, new_hi
        v = v + (acc_hi >> jnp.uint64(63))                 # centered

        dst_q = np.concatenate([rq.q[:lq], rp.q], axis=0)
        dst_qinv = np.concatenate([rq.qinv[:lq], rp.qinv], axis=0)
        dst_bhi = np.concatenate([rq.bred_hi[:lq], rp.bred_hi], axis=0)
        # contraction: [..., beta, a, Lj, N] MAC, lazy tree-sum over a
        tq = modops.mred_lazy(y[..., :, None, :],
                              c["qhat_dst"][..., :, :, None],
                              dst_q, dst_qinv)
        acc = modops.lazy_tree_sum(jnp.moveaxis(tq, -3, 0), dst_q, dst_bhi,
                                   c["margin"])
        acc = acc + modops.mred_lazy(v[..., None, :],
                                     c["qneg_dst"], dst_q, dst_qinv)
        extd = modops.bred_add(acc, dst_q, dst_bhi)        # [..., beta, Lj, N]
        # digit's own limbs pass through exactly (mask aligns from the right:
        # [beta, Lj, 1] vs extd [..., beta, Lj, N])
        xb = jnp.concatenate(
            [x_coeff, jnp.zeros(x_coeff.shape[:-2] + (Lj - lq, x_coeff.shape[-1]),
                                x_coeff.dtype)], axis=-2)[..., None, :, :]
        extd = jnp.where(c["pass_mask"], xb, extd)
        return extd[..., :lq, :], extd[..., lq:, :]

    def decompose_single(self, x_coeff, level_q: int, d: int):
        """Digit d of x (coeff domain [..., l+1, N]) extended to basis QP.

        Returns (yq [..., l+1, N], yp [..., LP, N]) in coeff domain. The
        digit's own limb rows equal x's rows exactly (pass-through), matching
        the reference's DecomposeAndSplit (:381).
        """
        rq, rp = self.ring_q, self.ring_p
        lo, hi = self.digit_range(level_q, d)
        lq = level_q + 1
        consts = self._get_consts(level_q, d)
        dst_q = np.concatenate([rq.q[:lq], rp.q], axis=0)
        dst_qinv = np.concatenate([rq.qinv[:lq], rp.qinv], axis=0)
        dst_bhi = np.concatenate([rq.bred_hi[:lq], rp.bred_hi], axis=0)
        ext = mod_up(x_coeff[..., lo:hi, :], consts, dst_q, dst_qinv, dst_bhi, True)
        # Pass the digit's own limbs through exactly (no conversion error).
        ext = ext.at[..., lo:hi, :].set(x_coeff[..., lo:hi, :])
        return ext[..., :lq, :], ext[..., lq:, :]
