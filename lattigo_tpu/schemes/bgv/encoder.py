"""BGV/BFV encoder: SIMD batching over Z_T.

TPU-native analog of ``schemes/bgv/encoder.go``. Slot layout is the
reference's 2 × N/2 matrix (row rotation = conjugation, column rotation =
powers of 5, ``schemes/bgv/params.go:238``): logical slot (r, j) is stored
at the NTT evaluation point ζ^{±5^j}. The permutation between logical slot
order and this library's bit-reversed NTT slot order is precomputed on the
host; encode = permute → INTT over Z_T → centered lift ×T^{-1} into R_Q
(MSB encoding, see schemes/bgv/README.md), decode = the exact inverse.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring import modops
from lattigo_tpu.ring.ntt import bit_reverse
from lattigo_tpu.rlwe.elements import Plaintext
from lattigo_tpu.schemes.bgv.params import Parameters

_U64 = np.uint64


@functools.lru_cache(maxsize=None)
def _slot_permutation(n: int) -> np.ndarray:
    """perm[logical_slot] = NTT slot index (ref encoder.go:110 permuteMatrix).

    Logical slots: j in [0, N/2) is row 0 (exponent 5^j mod 2N), j in
    [N/2, N) is row 1 (exponent -5^{j-N/2} mod 2N). NTT slot k holds the
    evaluation at exponent 2·brv(k)+1, so the NTT index for exponent e is
    brv((e-1)/2).
    """
    logn = n.bit_length() - 1
    two_n = 2 * n
    perm = np.zeros(n, dtype=np.int64)
    e = 1  # 5^0
    for j in range(n // 2):
        perm[j] = bit_reverse((e - 1) // 2, logn)
        perm[j + n // 2] = bit_reverse((two_n - e - 1) // 2, logn)
        e = e * 5 % two_n
    return perm


class Encoder:
    """Encoder over Z_T slots (ref schemes/bgv/encoder.go:29)."""

    def __init__(self, params: Parameters):
        if params.ring_t is None:
            raise ValueError("batching requires T ≡ 1 mod 2N")
        self.params = params
        self.perm = _slot_permutation(params.n)
        self.iperm = np.argsort(self.perm)

    # -- Z_T slot transform (host+device mixed; ring_t NTT on device) --------

    def encode_ring_t(self, values) -> jnp.ndarray:
        """values int[..., ≤N] → coeffs of R_T, u64[..., 1, N] (ref :203)."""
        p = self.params
        vals = np.asarray(values)
        if vals.shape[-1] < p.n:
            pad = np.zeros(vals.shape[:-1] + (p.n - vals.shape[-1],), dtype=vals.dtype)
            vals = np.concatenate([vals, pad], axis=-1)
        vals = np.mod(vals.astype(object), p.t).astype(np.uint64)
        slots = np.zeros_like(vals)
        slots[..., self.perm] = vals
        return p.ring_t.intt(jnp.asarray(slots)[..., None, :])

    def decode_ring_t(self, coeffs) -> np.ndarray:
        """coeffs u64[..., 1, N] of R_T → slot values u64[..., N]."""
        p = self.params
        evals = np.asarray(p.ring_t.ntt(coeffs))[..., 0, :]
        return evals[..., self.perm]

    # -- R_T ↔ R_Q lifts -------------------------------------------------------

    def ring_t_to_q(self, coeffs_t, level: int | None = None) -> jnp.ndarray:
        """Centered lift of m ∈ R_T times T^{-1} mod Q (MSB encoding, ref :378).

        lift(x) = x mod q_i if x ≤ T/2 else q_i − (T − x) mod q_i.
        """
        p = self.params
        l = (p.max_level if level is None else level) + 1
        q = p.ring_q.q[:l]
        bhi = p.ring_q.bred_hi[:l]
        half_t = jnp.uint64(p.t >> 1)
        x = coeffs_t  # [..., 1, N] in [0, T)
        pos = modops.bred_add(x, q, bhi)
        neg_mag = modops.bred_add(jnp.uint64(p.t) - x, q, bhi)
        neg = jnp.where(neg_mag == 0, neg_mag, q - neg_mag)
        lifted = jnp.where(x > half_t, neg, pos)
        return modops.mred(lifted, p.tinv_mont[:l], q, p.ring_q.qinv[:l])

    @functools.lru_cache(maxsize=None)
    def _q_to_t_consts(self, level: int):
        from lattigo_tpu.ring.basis_extension import ModUpConstants
        return ModUpConstants(self.params.q_moduli[: level + 1], [self.params.t])

    def ring_q_to_t(self, poly_q, level: int) -> jnp.ndarray:
        """[x·T]_Q centered → mod T (ref :412).

        The centered reduction of a Q-basis value mod T is exactly a
        centered basis conversion Q → {T}, reusing :func:`mod_up` (batched,
        device-resident — no big-int CRT on the host).
        """
        from lattigo_tpu.ring.basis_extension import mod_up
        p = self.params
        l = level + 1
        t_scaled = p.ring_q.mul_scalar(poly_q, p.t, level)  # plain T·x mod Q
        rt = p.ring_t
        return mod_up(t_scaled, self._q_to_t_consts(level),
                      rt.q, rt.qinv, rt.bred_hi, centered=True)

    # -- public API ---------------------------------------------------------------

    def encode(self, values, level: int | None = None, scale: int = 1) -> Plaintext:
        p = self.params
        coeffs_t = self.encode_ring_t(values)
        if scale != 1:
            coeffs_t = p.ring_t.mul_scalar(coeffs_t, scale)
        pt_q = self.ring_t_to_q(coeffs_t, level)
        return Plaintext(value=p.ring_q.ntt(pt_q, level), is_ntt=True, scale=scale)

    def decode(self, pt: Plaintext) -> np.ndarray:
        p = self.params
        v = pt.value
        if pt.is_ntt:
            v = p.ring_q.intt(v, pt.level)
        coeffs_t = self.ring_q_to_t(v, pt.level)
        if pt.scale != 1:
            coeffs_t = p.ring_t.mul_scalar(coeffs_t, pow(pt.scale, -1, p.t))
        return np.asarray(self.decode_ring_t(coeffs_t)).astype(np.int64)
