"""Four-step negacyclic NTT/INTT on the MXU (matmul engine).

The VPU kernel (:mod:`lattigo_tpu.ring.ntt_pallas`) is compute-bound on
32-bit lane arithmetic: logN stages x ~35 VPU ops per coefficient. This
kernel moves the O(N log N) butterfly work onto the MXU as two exact
integer matmuls per transform (the classic four-step factorization,
N = R*C):

    out[t1, t2] = ( (W1 @ digits(x)) . T ) @ W2          (all mod q)

with the bit-reversal of the library's NTT layout and the negacyclic
psi-twist folded into the host-precomputed constant matrices, so the
result is bit-exact with the radix-2 kernels (same output permutation;
ref ring/ntt.go:223 for the reference's scalar loop — redesigned, not
translated).

Exact integer matmuls on the MXU: operands are split into *balanced*
signed 8-bit digits (|d| <= 128, exact in bf16); each weight digit
matrix W_s encodes digit_s((2^{8i} * W[row, col]) mod q), stacked so one
[4R, 4R] bf16 matmul computes all four output digit planes of the
length-4R extended contraction:

    P_s[t1, c] = sum_{i, j1} d_i[j1, c] * e_s[(i, j1), t1]

|P_s| <= 128 * 128 * 4R <= 2^24 for R <= 256 — exact in the MXU's f32
accumulation. The digit planes are recombined mod q on the VPU with one
Montgomery multiply (split at 2^24), the mid-step twiddle is one more
Montgomery multiply, and everything stays fused in VMEM: one HBM read
and one write per polynomial, ~2.5 Montgomery ops per coefficient
instead of logN.

Requires q < 2^29 (keeps every recombination < 2^32) and N >= 4096
(below that the matrices are too skinny for the MXU to win).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lattigo_tpu.ring.ntt import bit_reverse
from lattigo_tpu.ring.ntt_pallas import _mred_lazy32, _mform32

MAX_Q_BITS = 29
MIN_N = 4096


# ---------------------------------------------------------------------------
# Host-side table generation
# ---------------------------------------------------------------------------

def _pow_table(base: int, count: int, q: int) -> np.ndarray:
    out = np.empty(count, dtype=np.uint64)
    p = 1
    for i in range(count):
        out[i] = p
        p = p * base % q
    return out


def _signed_digits(vals: np.ndarray, ndig: int = 4) -> list[np.ndarray]:
    """Balanced base-256 digits (each in [-128, 127]) of u64 values < 2^31."""
    v = vals.astype(np.int64)
    digs = []
    for _ in range(ndig):
        d = v & 255
        carry = d >= 128
        d = d - (carry << 8)
        v = (v >> 8) + carry
        digs.append(d)
    assert np.all(v == 0), "value too large for balanced digit count"
    return digs


def _extend_weight(w: np.ndarray, q: int, contract_first: bool) -> np.ndarray:
    """[rows, cols] u64 weight matrix -> [4*rows', 4*cols'] f32 of balanced
    digits of (2^{8i} * w) mod q.

    contract_first=True  -> layout [(s, out), (i, in)] with w = [out, in]
                            (left operand of dot, contraction on axis 1)
    contract_first=False -> layout [(i, in), (s, out)] with w = [in, out]
                            (right operand of dot, contraction on axis 0)
    """
    r, c = w.shape
    ext = np.empty((4, r, c), dtype=np.uint64)
    for i in range(4):
        ext[i] = (w * ((1 << (8 * i)) % q)) % q
    digs = _signed_digits(ext.reshape(-1))  # 4 arrays of [4*r*c]
    out = np.empty((4, 4, r, c), dtype=np.float32)  # [s, i, r, c]
    for s in range(4):
        out[s] = digs[s].reshape(4, r, c).astype(np.float32)
    if contract_first:
        # [(s, r), (i, c)]: w[out, in] -> rows (s, out), cols (i, in)
        return out.transpose(0, 2, 1, 3).reshape(4 * r, 4 * c)
    # [(i, r), (s, c)]: w[in, out] -> rows (i, in), cols (s, out)
    return out.transpose(1, 2, 0, 3).reshape(4 * r, 4 * c)


def gen_four_step_weights(n: int, rr: int, cc: int, psi: int, q: int):
    """Raw u64 weight matrices of the four-step factorization.

    Forward:  out = ( (WA @ M) . * TF ) @ WB              (all mod q)
      WA[t1, j1] = w^{C j1 brev(t1)} psi^{C j1}
      TF[t1, j2] = w^{j2 brev(t1)} * psi^{j2}
      WB[j2, t2] = w^{R j2 brev(t2)}
    Inverse (input in the library's NTT layout, N^{-1} folded into WAI):
      WBI[t2, j2] = w^{-R j2 brev(t2)}
      TI[t1, j2]  = w^{-j2 brev(t1)} * psi^{-j2}
      WAI[j1, t1] = w^{-C j1 brev(t1)} psi^{-C j1}/N
    """
    logr = rr.bit_length() - 1
    logc = cc.bit_length() - 1
    w = psi * psi % q
    wi = pow(w, -1, q)
    psii = pow(psi, -1, q)
    ninv = pow(n, -1, q)

    brev_r = np.array([bit_reverse(t, logr) for t in range(rr)])
    brev_c = np.array([bit_reverse(t, logc) for t in range(cc)])

    # -- forward ------------------------------------------------------------
    u = _pow_table(pow(w, cc, q), rr, q)        # order R
    psic = _pow_table(pow(psi, cc, q), rr, q)
    wa = (u[np.outer(brev_r, np.arange(rr)) % rr].astype(object)
          * psic[None, :].astype(object)) % q    # [t1, j1]
    wp = _pow_table(w, n, q)                     # order N/2 suffices; N safe
    psip = _pow_table(psi, cc, q)
    tf = (wp[np.outer(brev_r, np.arange(cc)) % n].astype(object)
          * psip[None, :cc].astype(object)) % q  # [t1, j2]
    v = _pow_table(pow(w, rr, q), cc, q)         # order C
    wb = v[np.outer(np.arange(cc), brev_c) % cc]  # [j2, t2]

    # -- inverse ------------------------------------------------------------
    ui = _pow_table(pow(wi, rr, q), cc, q)
    # WBi[t2 (contraction), j2 (out)]: w^{-R j2 brev(t2)}
    wbi = ui[np.outer(brev_c, np.arange(cc)) % cc]    # [t2, j2]
    wpi = _pow_table(wi, n, q)
    psiip = _pow_table(psii, cc, q)
    ti = (wpi[np.outer(brev_r, np.arange(cc)) % n].astype(object)
          * psiip[None, :cc].astype(object)) % q      # [t1, j2]
    uii = _pow_table(pow(wi, cc, q), rr, q)
    psici = _pow_table(pow(psii, cc, q), rr, q)
    # stepwise mod: the three factors overflow u64 if multiplied at once
    wai = uii[np.outer(np.arange(rr), brev_r) % rr].astype(object) \
        * psici[:, None].astype(object) % q
    wai = wai * ninv % q                              # [j1, t1]
    as_u64 = lambda a: np.asarray(a, dtype=object).astype(np.uint64)  # noqa: E731
    return dict(wa=as_u64(wa), tf=as_u64(tf), wb=as_u64(wb),
                wbi=as_u64(wbi), ti=as_u64(ti), wai=as_u64(wai))


def gen_mxu_tables(n: int, rr: int, cc: int, psi: int, q: int):
    """Per-prime constant pack for the fused four-step kernel: balanced
    int8 digit extensions of the raw weights + Montgomery-form twiddle."""
    raw = gen_four_step_weights(n, rr, cc, psi, q)
    wa, tf, wb = raw["wa"], raw["tf"], raw["wb"]
    wbi, ti, wai = raw["wbi"], raw["ti"], raw["wai"]

    tf_mont = np.vectorize(lambda x: _mform32(int(x), q),
                           otypes=[np.uint32])(tf)
    ti_mont = np.vectorize(lambda x: _mform32(int(x), q),
                           otypes=[np.uint32])(ti)

    return dict(
        w1f=_extend_weight(wa, q, contract_first=True),     # [4R, 4R]
        tf=tf_mont,                                         # [R, C]
        w2f=_extend_weight(wb, q, contract_first=False),    # [4C, 4C]
        w1i=_extend_weight(wbi, q, contract_first=False),   # [4C, 4C]
        ti=ti_mont,                                         # [R, C]
        w2i=_extend_weight(wai, q, contract_first=True),    # [4R, 4R]
    )


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

_M8 = 0xFF
_M16 = 0xFFFF


def _balanced_digit_planes(x, dtype):
    """u32 (< 2^30) -> 4 balanced signed base-256 digit planes.

    Each digit is in [-128, 127] (input < 2^30 keeps the top digit plus
    carry <= 64); emitted as bf16 (via i32 — Mosaic has no direct
    u32 -> f32 cast) or int8.
    """
    planes = []
    v = x
    for i in range(4):
        d = v & _M8
        c = d >> 7                      # carry if digit >= 128
        v = (v >> 8) + c
        signed = d.astype(jnp.int32) - (c << 8).astype(jnp.int32)
        planes.append(signed.astype(jnp.float32).astype(jnp.bfloat16)
                      if dtype == jnp.bfloat16 else signed.astype(dtype))
    return planes


def _digits_rows(x, dtype):
    """u32 [R, C] -> [4R, C] balanced digit planes (row stack)."""
    return jnp.concatenate(_balanced_digit_planes(x, dtype), axis=0)


def _digits_cols(x, dtype):
    """u32 [R, C] -> [R, 4C] balanced digit planes (col stack)."""
    return jnp.concatenate(_balanced_digit_planes(x, dtype), axis=1)


def _recombine(p0, p1, p2, p3, q, qinv, c24m, negb):
    """sum_s P_s 2^{8s} mod q from signed i32/f32 digit planes; out < 2^32,
    congruent mod q. One Montgomery multiply (split at 2^24)."""
    # f32 -> i32 first (|P| <= 2^24 is f32-exact), THEN bias in integer
    # math — (P + 2^24) can reach 2^25, where f32 addition rounds.
    bias = jnp.int32(1 << 24)
    u0 = (p0.astype(jnp.int32) + bias).astype(jnp.uint32)
    u1 = (p1.astype(jnp.int32) + bias).astype(jnp.uint32)
    u2 = (p2.astype(jnp.int32) + bias).astype(jnp.uint32)
    u3 = (p3.astype(jnp.int32) + bias).astype(jnp.uint32)
    lo = u0 + ((u1 & _M16) << 8) + ((u2 & _M8) << 16)          # < 2^26
    hi = (u1 >> 16) + (u2 >> 8) + u3                           # < 2^26
    v = lo + _mred_lazy32(hi, c24m, q, qinv)                   # ≡ Σ Pu_s 2^{8s}
    return v + negb                                            # strip bias


def _split_rows(p, r):
    return p[0 * r:1 * r], p[1 * r:2 * r], p[2 * r:3 * r], p[3 * r:4 * r]


def _split_cols(p, c):
    return p[:, 0 * c:1 * c], p[:, 1 * c:2 * c], p[:, 2 * c:3 * c], \
        p[:, 3 * c:4 * c]


def _dot(a, b):
    acc = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=acc)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _ntt_mxu_kernel(consts_ref, x_ref, w1_ref, t_ref, w2_ref, o_ref, *,
                    rr: int, cc: int, tb: int, lazy: bool, limb_lo: int,
                    inverse: bool, dtype):
    limb = pl.program_id(0) + limb_lo
    q = consts_ref[limb, 0]
    qinv = consts_ref[limb, 1]
    c24m = consts_ref[limb, 2]
    negb = consts_ref[limb, 3]
    onem = consts_ref[limb, 4]
    w1 = w1_ref[0]
    w2 = w2_ref[0]
    tm = t_ref[0]
    for p in range(tb):
        x = x_ref[0, p]                                   # [R, C] u32
        # entry reduction: any u32 -> [0, 2q) < 2^30, so every balanced
        # digit (incl. the top one plus carry) stays within [-128, 128]
        x = _mred_lazy32(x, onem, q, qinv)
        if inverse:
            # step 1: contract t2 (cols): D [R, 4C] @ W1i [4C, 4C]
            pm = _dot(_digits_cols(x, dtype), w1)                # [R, 4C] f32
            g = _recombine(*_split_cols(pm, cc), q, qinv, c24m, negb)
            h = _mred_lazy32(g, tm, q, qinv)              # [0, 2q)
            # step 2: contract t1 (rows): W2i [4R, 4R] @ D [4R, C]
            pm2 = _dot(w2, _digits_rows(h, dtype))               # [4R, C]
            v = _recombine(*_split_rows(pm2, rr), q, qinv, c24m, negb)
        else:
            # step 1: contract j1 (rows): W1f [4R, 4R] @ D [4R, C]
            pm = _dot(w1, _digits_rows(x, dtype))                # [4R, C] f32
            b = _recombine(*_split_rows(pm, rr), q, qinv, c24m, negb)
            b = _mred_lazy32(b, tm, q, qinv)              # twiddle, [0, 2q)
            # step 2: contract j2 (cols): D [R, 4C] @ W2f [4C, 4C]
            pm2 = _dot(_digits_cols(b, dtype), w2)               # [R, 4C]
            v = _recombine(*_split_cols(pm2, cc), q, qinv, c24m, negb)
        # normalize: v < 2^32, ≡ result mod q -> [0, 2q) -> [0, q)
        v = _mred_lazy32(v, onem, q, qinv)
        if not lazy:
            v = jnp.where(v >= q, v - q, v)
        o_ref[0, p] = v


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------

class NTTMxu:
    """Per-Ring MXU four-step NTT/INTT (same entry points as NTTPallas)."""

    def __init__(self, n: int, moduli: list[int], psis: list[int],
                 dtype=jnp.bfloat16, tb: int = 4):
        assert all(q < (1 << MAX_Q_BITS) for q in moduli)
        assert n >= MIN_N and n & (n - 1) == 0
        self.dtype = dtype
        self.tb = tb
        self.n = n
        self.logn = n.bit_length() - 1
        self.cc = max(128, 1 << (self.logn // 2))
        self.rr = n // self.cc
        L = len(moduli)
        consts = np.zeros((L, 8), dtype=np.uint32)
        packs = []
        for i, (psi, q) in enumerate(zip(psis, moduli)):
            consts[i, 0] = q
            consts[i, 1] = pow(q, -1, 1 << 32)
            consts[i, 2] = _mform32((1 << 24) % q, q)
            # bias correction: -(2^24 * (1 + 2^8 + 2^16 + 2^24)) mod q
            b = ((1 << 24) * (1 + (1 << 8) + (1 << 16) + (1 << 24))) % q
            consts[i, 3] = (q - b) % q
            consts[i, 4] = _mform32(1, q)
            packs.append(gen_mxu_tables(n, self.rr, self.cc, psi, q))
        self.consts = jnp.asarray(consts)
        # weight stacks: [L, 4R, 4R] etc., bf16 on device
        def stack(key):
            return jnp.asarray(
                np.stack([p[key] for p in packs]).astype(np.float32)
            ).astype(dtype)
        self.w1f = stack("w1f")
        self.w2f = stack("w2f")
        self.w1i = stack("w1i")
        self.w2i = stack("w2i")
        self.tf = jnp.asarray(np.stack([p["tf"] for p in packs]))
        self.ti = jnp.asarray(np.stack([p["ti"] for p in packs]))

    # see ntt_u64_mxu.NTTMxu64.table_names — same argument-threading hook
    table_names = ("w1f", "w2f", "w1i", "w2i", "tf", "ti", "consts")

    def get_tables(self):
        return {k: getattr(self, k) for k in self.table_names}

    def set_tables(self, tabs):
        for k, v in tabs.items():
            setattr(self, k, v)

    def _call(self, x, limb_lo: int, inverse: bool, lazy: bool,
              interpret: bool):
        shape = x.shape
        l = shape[-2]
        n = shape[-1]
        rr, cc = self.rr, self.cc
        r = 1
        for d in shape[:-2]:
            r *= d
        x32 = jnp.moveaxis(x.reshape(r, l, n), 1, 0).astype(jnp.uint32)
        x32 = x32.reshape(l, r, rr, cc)
        tb = self.tb
        while r % tb:
            tb //= 2
        grid = (l, r // tb)
        z = np.int32(0)
        lo = np.int32(limb_lo)
        w1 = self.w1i if inverse else self.w1f
        w2 = self.w2i if inverse else self.w2f
        tm = self.ti if inverse else self.tf
        kernel = functools.partial(
            _ntt_mxu_kernel, rr=rr, cc=cc, tb=tb, lazy=lazy,
            limb_lo=limb_lo, inverse=inverse, dtype=self.dtype)
        L = self.consts.shape[0]
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((l, r, rr, cc), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, 8), lambda j, i: (z, z),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tb, rr, cc), lambda j, i: (j, i, z, z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + w1.shape[1:], lambda j, i: (j + lo, z, z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rr, cc), lambda j, i: (j + lo, z, z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + w2.shape[1:], lambda j, i: (j + lo, z, z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tb, rr, cc), lambda j, i: (j, i, z, z),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(self.consts, x32, w1, tm, w2)
        out = out.reshape(l, r, n)
        return jnp.moveaxis(out, 0, 1).astype(jnp.uint64).reshape(shape)

    def ntt(self, x, level: int, lazy: bool = False, interpret: bool = False):
        return self._call(x, 0, False, lazy, interpret)

    def intt(self, x, level: int, lazy: bool = False, interpret: bool = False):
        return self._call(x, 0, True, lazy, interpret)

    def ntt_single(self, i: int, x, lazy: bool = False,
                   interpret: bool = False):
        return self._call(x, i, False, lazy, interpret)

    def intt_single(self, i: int, x, lazy: bool = False,
                    interpret: bool = False):
        return self._call(x, i, True, lazy, interpret)
