"""BGV/BFV encryption ↔ secret-sharing conversion and collective refresh.

TPU-native analog of ``multiparty/mpbgv`` (sharing.go, refresh.go,
transform.go). Unlike the CKKS variants (:mod:`lattigo_tpu.multiparty.sharing`),
masks live in R_T — uniform mod the plaintext modulus, no statistical
flooding bound needed — and the R_T ↔ R_Q lifts are the BGV encoder's MSB
encoding (×T^{-1} mod Q, ref schemes/bgv/encoder.go:378 RingT2Q).

Transforms are user functions over Z_T vectors; ``decode``/``encode`` flags
wrap them in the slot transform at the ciphertext's scale
(ref mpbgv/transform.go:29 MaskedTransformFunc).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from lattigo_tpu.ring import sampling
from lattigo_tpu.rlwe.elements import Ciphertext
from lattigo_tpu.rlwe.keys import SecretKey
from lattigo_tpu.schemes.bgv.encoder import Encoder
from lattigo_tpu.schemes.bgv.params import Parameters


def _sample_mask_t(key, params: Parameters):
    """Uniform mask in R_T: u64[1, N] coefficients in [0, T)."""
    return jax.random.randint(
        key, (1, params.n), 0, params.t, dtype=jnp.int64).astype(jnp.uint64)


def _noise_ntt(key, params: Parameters, level: int, sigma: float):
    e = sampling.gaussian_signed(
        key, params.n, sampling.DiscreteGaussian(sigma, 6 * sigma))
    return params.ring_q.ntt(
        sampling.lift_signed(params.ring_q, e, level), level)


class BGVEncToShareProtocol:
    """ref mpbgv/sharing.go:16 EncToShareProtocol."""

    def __init__(self, params: Parameters, noise_sigma: float = 3.2):
        self.params = params
        self.encoder = Encoder(params)
        self.noise_sigma = noise_sigma

    def gen_share(self, key, sk: SecretKey, ct: Ciphertext):
        """→ (secret mask u64[1, N] in R_T, public share u64[l+1, N] NTT).

        h_i = e_i + s_i·c1 − Enc_Q(M_i) (decrypt convention pt = c0 + c1·s,
        ref mpbgv/sharing.go:62 GenShare).
        """
        p = self.params
        level = ct.level
        km, ke = jax.random.split(key)
        mask_t = _sample_mask_t(km, p)
        mask_q = p.ring_q.ntt(self.encoder.ring_t_to_q(mask_t, level), level)
        c1s = p.ring_q.mul_mont(ct.value[..., 1, :, :],
                                sk.value.q[..., : level + 1, :], level)
        e = _noise_ntt(ke, p, level, self.noise_sigma)
        h = p.ring_q.sub(p.ring_q.add(e, c1s, level), mask_q, level)
        return mask_t, h

    def aggregate_shares(self, h1, h2):
        return self.params.ring_q.add(h1, h2, h1.shape[-2] - 1)

    def get_share(self, secret_mask, h_agg, ct: Ciphertext):
        """Masked decryption → R_T value; with the caller's own mask added
        this is the caller's additive share (ref sharing.go:79 GetShare)."""
        p = self.params
        level = ct.level
        pub = p.ring_q.add(ct.value[..., 0, :, :], h_agg, level)
        coeff = p.ring_q.intt(pub, level)
        m_t = self.encoder.ring_q_to_t(coeff, level)
        if secret_mask is not None:
            m_t = p.ring_t.add(m_t, secret_mask)
        return m_t


class BGVShareToEncProtocol:
    """ref mpbgv/sharing.go:96 ShareToEncProtocol."""

    def __init__(self, params: Parameters, noise_sigma: float = 3.2):
        self.params = params
        self.encoder = Encoder(params)
        self.noise_sigma = noise_sigma

    def sample_crp(self, seed: bytes, level: int | None = None):
        prng = sampling.KeyedPRNG(seed)
        return self.params.ring_q.ntt(
            prng.uniform_poly(self.params.ring_q, level), level)

    def gen_share(self, key, sk: SecretKey, mask_t, crp,
                  level: int | None = None):
        """h'_i = −s_i·crp + e_i + Enc_Q(M_i) (ref sharing.go:125)."""
        p = self.params
        level = p.max_level if level is None else level
        mask_q = p.ring_q.ntt(self.encoder.ring_t_to_q(mask_t, level), level)
        cs = p.ring_q.mul_mont(crp, sk.value.q[..., : level + 1, :], level)
        e = _noise_ntt(key, p, level, self.noise_sigma)
        return p.ring_q.add(p.ring_q.sub(e, cs, level), mask_q, level)

    def aggregate_shares(self, s1, s2):
        return self.params.ring_q.add(s1, s2, s1.shape[-2] - 1)

    def finalize(self, agg, crp, extra_mask_t=None, scale: int = 1,
                 level: int | None = None) -> Ciphertext:
        """ct = (Σh'_i [+ Enc_Q(mask)], crp) (ref sharing.go:148)."""
        p = self.params
        level = p.max_level if level is None else level
        c0 = agg
        if extra_mask_t is not None:
            lifted = p.ring_q.ntt(
                self.encoder.ring_t_to_q(extra_mask_t, level), level)
            c0 = p.ring_q.add(c0, lifted, level)
        return Ciphertext(value=jnp.stack([c0, crp], axis=-3),
                          is_ntt=True, scale=scale)


@dataclass
class MaskedTransformFunc:
    """User transform over Z_T vectors (ref mpbgv/transform.go:29).

    ``fn`` maps u64[N] mod T → u64[N] mod T. With ``decode``, the input is
    in slot order at the ciphertext scale; with ``encode``, the output is
    re-encoded to R_T coefficients.
    """

    fn: Callable
    decode: bool = False
    encode: bool = False


class BGVMaskedTransformProtocol:
    """One-round refresh-with-transform over R_T masks (ref mpbgv/transform.go:14)."""

    def __init__(self, params: Parameters, noise_sigma: float = 3.2):
        self.params = params
        self.e2s = BGVEncToShareProtocol(params, noise_sigma)
        self.s2e = BGVShareToEncProtocol(params, noise_sigma)
        self.encoder = self.e2s.encoder

    def sample_crp(self, seed: bytes, level: int | None = None):
        return self.s2e.sample_crp(seed, level)

    def _apply(self, transform: MaskedTransformFunc | None, mask_t, scale: int):
        if transform is None:
            return mask_t
        p = self.params
        if transform.decode:
            m = p.ring_t.mul_scalar(mask_t, pow(int(scale), -1, p.t))
            vals = self.encoder.decode_ring_t(m)
        else:
            vals = np.asarray(mask_t)[..., 0, :]
        out = np.asarray(transform.fn(vals), dtype=np.uint64)
        if transform.encode:
            m2 = self.encoder.encode_ring_t(out)
            return p.ring_t.mul_scalar(m2, int(scale) % p.t)
        return jnp.asarray(out)[..., None, :]

    def gen_share(self, key, sk: SecretKey, ct: Ciphertext, crp,
                  transform: MaskedTransformFunc | None = None,
                  level_out: int | None = None):
        """→ (h_e2s u64[l_in+1, N], h_s2e u64[l_out+1, N]) (ref :67)."""
        k1, k2 = jax.random.split(key)
        mask_t, h = self.e2s.gen_share(k1, sk, ct)
        m2 = self._apply(transform, mask_t, ct.scale)
        h2 = self.s2e.gen_share(k2, sk, m2, crp, level_out)
        return h, h2

    def aggregate_shares(self, s1, s2):
        return (self.e2s.aggregate_shares(s1[0], s2[0]),
                self.s2e.aggregate_shares(s1[1], s2[1]))

    def finalize(self, ct: Ciphertext, agg, crp,
                 transform: MaskedTransformFunc | None = None,
                 level_out: int | None = None) -> Ciphertext:
        """Aggregator: decrypt-to-masked-R_T, transform, re-encrypt (ref :131)."""
        p = self.params
        level_out = p.max_level if level_out is None else level_out
        pub_t = self.e2s.get_share(None, agg[0], ct)  # m − ΣM_i  mod T
        pub_t = self._apply(transform, pub_t, ct.scale)
        return self.s2e.finalize(agg[1], crp, extra_mask_t=pub_t,
                                 scale=ct.scale, level=level_out)


class BGVRefreshProtocol(BGVMaskedTransformProtocol):
    """Collective BGV bootstrap: masked transform with the identity
    (ref mpbgv/refresh.go:11)."""

    def gen_share(self, key, sk, ct, crp, level_out=None):  # noqa: D102
        return super().gen_share(key, sk, ct, crp, None, level_out)

    def finalize(self, ct, agg, crp, level_out=None):  # noqa: D102
        return super().finalize(ct, agg, crp, None, level_out)
