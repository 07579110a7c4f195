"""CKKS encoder: canonical embedding C^{N/2} ↔ R = Z[X]/(X^N+1).

TPU-native analog of ``schemes/ckks/encoder.go``. Instead of the
reference's hand-unrolled special FFT over the rotation group
(``ckks_vector_ops.go:18``), the embedding is evaluated through a single
length-2N FFT (host-side numpy, O(N log N), f64):

    slot_j = m(ζ^{e_j}),  e_j = 5^j mod 2N  (row-0 exponents)
    encode: m_k = (2/N)·Re( FFT_{2N}(A)[k] ),  A[e_j] = v_j
    decode: v_j = (2N·IFFT_{2N}(m))[e_j]

The 5^j slot ordering makes rotation-by-k exactly the Galois element 5^k
and conjugation the element 2N−1, matching the evaluator's automorphisms.

f64 gives ~2^-45 relative embedding error — the reference's own default
double-precision path (``encoder.go:219 embedDouble``); the >53-bit
big-float path (ref :342) is a later addition for deep bootstrapping.
"""

from __future__ import annotations

import functools
from fractions import Fraction

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring.ring import CONJUGATE_INVARIANT
from lattigo_tpu.rlwe.elements import Plaintext
from lattigo_tpu.schemes.ckks.params import Parameters


@functools.lru_cache(maxsize=None)
def _rot_group_exponents(n: int) -> np.ndarray:
    """e_j = 5^j mod 2N for j in [0, N/2)."""
    two_n = 2 * n
    e = np.zeros(n // 2, dtype=np.int64)
    cur = 1
    for j in range(n // 2):
        e[j] = cur
        cur = cur * 5 % two_n
    return e


@functools.lru_cache(maxsize=None)
def _rot_group_exponents_ci(n: int) -> np.ndarray:
    """e_k = 5^k mod 4N for k in [0, N) (CI ring: 4N-th roots)."""
    four_n = 4 * n
    e = np.zeros(n, dtype=np.int64)
    cur = 1
    for k in range(n):
        e[k] = cur
        cur = cur * 5 % four_n
    return e


class CIEncoder:
    """Real-slot encoder for the conjugate-invariant ring: N real slots at
    ring degree N (ref schemes/ckks/params.go CI slot geometry; the
    embedding evaluates at the 5-orbit of the 4N-th roots, where CI
    elements take real values since p(ζ) = p(ζ^{-1})).

    Coefficient convention matches :mod:`lattigo_tpu.ring.ntt_ci`:
    (c_0…c_{N−1}) ↦ c_0 + Σ c_j (X^j + X^{−j}).
    """

    def __init__(self, params: Parameters):
        assert params.ring_type == CONJUGATE_INVARIANT
        self.params = params
        self.exponents = _rot_group_exponents_ci(params.n)

    def embed_to_coeffs(self, values: np.ndarray) -> np.ndarray:
        """real v[..., ≤N] → CI coeffs f64[..., N] (unscaled).

        p̃_j = (1/N)·Re Σ_k v_k ζ^{e_k j} (inverse DFT over the odd
        characters, using σ-invariance to fold the −5-orbit)."""
        p = self.params
        n = p.n
        v = np.real(np.asarray(values, dtype=np.complex128))
        if v.shape[-1] < n:
            pad = np.zeros(v.shape[:-1] + (n - v.shape[-1],))
            v = np.concatenate([v, pad], axis=-1)
        a = np.zeros(v.shape[:-1] + (4 * n,), dtype=np.complex128)
        a[..., self.exponents] = v
        return (1.0 / n) * np.fft.fft(a, axis=-1)[..., :n].real

    def coeffs_to_slots(self, coeffs: np.ndarray) -> np.ndarray:
        p = self.params
        n = p.n
        c = np.asarray(coeffs, dtype=np.float64)
        # unfold: p̃_j = c_j, p̃_{2N−j} = −c_j (negacyclic X^{-j} lift)
        full = np.zeros(c.shape[:-1] + (4 * n,), dtype=np.float64)
        full[..., :n] = c
        for j in range(1, n):
            full[..., 2 * n - j] = -c[..., j]
        spec = np.fft.ifft(full, axis=-1) * (4 * n)
        return spec[..., self.exponents].real

    def encode(self, values, level: int | None = None,
               scale: Fraction | None = None) -> Plaintext:
        p = self.params
        level = p.max_level if level is None else level
        scale = p.default_scale_fraction if scale is None else Fraction(scale)
        coeffs = self.embed_to_coeffs(values) * float(scale)
        ints = np.round(coeffs).astype(np.int64).astype(object)
        out = np.zeros(ints.shape[:-1] + (level + 1, p.n), dtype=np.uint64)
        for i, q in enumerate(p.q_moduli[: level + 1]):
            out[..., i, :] = np.mod(ints, q).astype(np.uint64)
        return Plaintext(value=p.ring_q.ntt(jnp.asarray(out), level),
                         is_ntt=True, scale=scale)

    def decode(self, pt: Plaintext) -> np.ndarray:
        p = self.params
        v = pt.value
        if pt.is_ntt:
            v = p.ring_q.intt(v, pt.level)
        ints = p.ring_q.to_int_coeffs(np.asarray(v), pt.level, centered=True)
        coeffs = np.array([float(x) for x in ints]) / float(pt.scale)
        return self.coeffs_to_slots(coeffs)


class Encoder:
    """Canonical-embedding encoder (ref schemes/ckks/encoder.go:58)."""

    def __init__(self, params: Parameters):
        self.params = params
        self.exponents = _rot_group_exponents(params.n)

    # -- embedding (host, f64) ---------------------------------------------------

    def embed_to_coeffs(self, values: np.ndarray) -> np.ndarray:
        """complex v[..., ≤N/2] → real coeffs f64[..., N] (unscaled)."""
        p = self.params
        slots = p.max_slots
        v = np.asarray(values, dtype=np.complex128)
        if v.shape[-1] < slots:
            pad = np.zeros(v.shape[:-1] + (slots - v.shape[-1],), np.complex128)
            v = np.concatenate([v, pad], axis=-1)
        a = np.zeros(v.shape[:-1] + (2 * p.n,), dtype=np.complex128)
        a[..., self.exponents] = v
        return (2.0 / p.n) * np.fft.fft(a, axis=-1)[..., : p.n].real

    def coeffs_to_slots(self, coeffs: np.ndarray) -> np.ndarray:
        """real coeffs f64[..., N] → complex slots[..., N/2]."""
        p = self.params
        m = np.asarray(coeffs, dtype=np.float64)
        pad = np.zeros(m.shape[:-1] + (2 * p.n - p.n,), dtype=np.float64)
        spec = np.fft.ifft(np.concatenate([m, pad], axis=-1), axis=-1) * (2 * p.n)
        return spec[..., self.exponents]

    # -- RNS lifts ------------------------------------------------------------------

    def _lift_ints(self, ints: np.ndarray, level: int) -> jnp.ndarray:
        """Signed int coeffs (object or int64) → residues u64[..., l+1, N]."""
        p = self.params
        moduli = p.q_moduli[: level + 1]
        out = np.zeros(ints.shape[:-1] + (level + 1, p.n), dtype=np.uint64)
        for i, q in enumerate(moduli):
            out[..., i, :] = np.mod(ints, q).astype(np.uint64)
        return jnp.asarray(out)

    # -- public API --------------------------------------------------------------------

    def encode(self, values, level: int | None = None,
               scale: Fraction | None = None) -> Plaintext:
        p = self.params
        level = p.max_level if level is None else level
        scale = p.default_scale_fraction if scale is None else Fraction(scale)
        coeffs = self.embed_to_coeffs(values) * float(scale)
        if np.max(np.abs(coeffs), initial=0.0) < 2**52:
            ints = np.round(coeffs).astype(np.int64).astype(object)
        else:  # big-int path for very large scales
            ints = np.vectorize(lambda x: int(round(x)), otypes=[object])(coeffs)
        pt_q = self._lift_ints(ints, level)
        return Plaintext(value=p.ring_q.ntt(pt_q, level), is_ntt=True, scale=scale)

    def decode(self, pt: Plaintext) -> np.ndarray:
        p = self.params
        v = pt.value
        if pt.is_ntt:
            v = p.ring_q.intt(v, pt.level)
        ints = p.ring_q.to_int_coeffs(np.asarray(v), pt.level, centered=True)
        coeffs = np.array([float(x) for x in ints]) / float(pt.scale)
        return self.coeffs_to_slots(coeffs)

    def decode_public(self, pt: Plaintext, log_prec: float = 0) -> np.ndarray:
        """Decode for PUBLICATION: slot values are rounded to ``log_prec``
        fractional bits so the decryption noise is not exposed — the
        IND-CPA-D mitigation (ref encoder.go:199 DecodePublic,
        SECURITY.md:30-39). ``log_prec == 0`` skips the rounding (the
        caller takes responsibility for noise exposure)."""
        v = self.decode(pt)
        if log_prec:
            s = 2.0 ** log_prec
            v = (np.round(v.real * s) + 1j * np.round(v.imag * s)) / s
        return v


class PrecisionEncoder(Encoder):
    """~106-bit canonical-embedding encoder (ref encoder.go:342
    embedArbitrary, the >53-bit big-float path used by deep bootstrapping
    and META-BTS verification).

    Implementation: the same length-2N FFT formulation as :class:`Encoder`,
    but in vectorized double-double arithmetic
    (:mod:`lattigo_tpu.utils.ddarith`) with exact Fraction scale handling —
    encode quantisation and decode are exact given the ~2^-105 embedding.

    ``decode_dd`` returns the slots as a (hi, lo) pair of complex arrays so
    sub-2^-53 structure is observable (e.g. measuring >53-bit META-BTS
    output precision).
    """

    def encode(self, values, level: int | None = None,
               scale: Fraction | None = None) -> Plaintext:
        from lattigo_tpu.utils import ddarith as dd
        p = self.params
        level = p.max_level if level is None else level
        scale = p.default_scale_fraction if scale is None else Fraction(scale)
        slots = p.max_slots
        v = np.asarray(values, dtype=np.complex128)
        if v.shape[-1] < slots:
            pad = np.zeros(v.shape[:-1] + (slots - v.shape[-1],), np.complex128)
            v = np.concatenate([v, pad], axis=-1)
        two_n = 2 * p.n
        ar = np.zeros(v.shape[:-1] + (two_n,))
        ai = np.zeros_like(ar)
        ar[..., self.exponents] = v.real
        ai[..., self.exponents] = v.imag
        rh, rl, _, _ = dd.fft_dd(ar, np.zeros_like(ar), ai, np.zeros_like(ai))
        # coeff_k = (2/N)·Re(FFT[k]); quantise at `scale` exactly
        fac = Fraction(2, p.n) * scale
        flat_h = rh[..., : p.n].reshape(-1)
        flat_l = rl[..., : p.n].reshape(-1)
        ints = np.empty(flat_h.shape, dtype=object)
        for i in range(flat_h.shape[0]):
            ints[i] = round(dd.dd_to_fraction(flat_h[i], flat_l[i]) * fac)
        ints = ints.reshape(rh.shape[:-1] + (p.n,))
        pt_q = self._lift_ints(ints, level)
        return Plaintext(value=p.ring_q.ntt(pt_q, level), is_ntt=True, scale=scale)

    def decode_dd(self, pt: Plaintext) -> tuple[np.ndarray, np.ndarray]:
        """→ (slots_hi, slots_lo): complex128 pair, hi + lo ≈ true slots."""
        from lattigo_tpu.utils import ddarith as dd
        p = self.params
        v = pt.value
        if pt.is_ntt:
            v = p.ring_q.intt(v, pt.level)
        ints = p.ring_q.to_int_coeffs(np.asarray(v), pt.level, centered=True)
        inv_scale = 1 / Fraction(pt.scale)
        ch = np.empty(p.n)
        cl = np.empty(p.n)
        for i in range(p.n):
            f = int(ints[i]) * inv_scale
            ch[i] = float(f)
            cl[i] = float(f - Fraction(ch[i]))
        two_n = 2 * p.n
        mh = np.concatenate([ch, np.zeros(two_n - p.n)])
        ml = np.concatenate([cl, np.zeros(two_n - p.n)])
        rh, rl, ih, il = dd.fft_dd(mh, ml, np.zeros(two_n), np.zeros(two_n),
                                   inverse=True)
        # slots = 2N·IFFT[e_j]
        e = self.exponents
        hi = (two_n * rh[e]) + 1j * (two_n * ih[e])
        lo = (two_n * rl[e]) + 1j * (two_n * il[e])
        return hi, lo

    def decode(self, pt: Plaintext) -> np.ndarray:
        hi, lo = self.decode_dd(pt)
        return hi + lo
