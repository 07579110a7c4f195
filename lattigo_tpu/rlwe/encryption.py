"""RLWE encryption / decryption.

TPU-native analog of ``core/rlwe/encryptor.go`` + ``decryptor.go``.
Functional: every call takes a JAX PRNG key and returns fresh pytrees;
batch encryption is a leading batch axis (vmap-free broadcasting), the
TPU replacement for the reference's buffer-pool concurrency.

Conventions: fresh ciphertexts are plain-form (never Montgomery), in the
NTT domain iff ``params.ntt_flag`` / the plaintext's metadata say so.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lattigo_tpu.ring import modops, sampling
from lattigo_tpu.ring.ringqp import QPPoly
from lattigo_tpu.rlwe.params import Parameters
from lattigo_tpu.rlwe.elements import Ciphertext, Plaintext, ciphertext_from_polys
from lattigo_tpu.rlwe.keys import SecretKey, PublicKey


class Encryptor:
    """Encryption under sk or pk (ref encryptor.go:15)."""

    def __init__(self, params: Parameters, enc_key: SecretKey | PublicKey):
        self.params = params
        self.key = enc_key

    def encrypt_zero(self, key, level: int | None = None,
                     batch: tuple[int, ...] = ()) -> Ciphertext:
        level = self.params.max_level if level is None else level
        if isinstance(self.key, SecretKey):
            return self._encrypt_zero_sk(key, level, batch)
        return self._encrypt_zero_pk(key, level, batch)

    def encrypt(self, key, pt: Plaintext, batch: tuple[int, ...] = ()) -> Ciphertext:
        """ct = EncryptZero + pt (ref encryptor.go:134)."""
        ct = self.encrypt_zero(key, pt.level, batch)
        return add_plaintext(self.params, ct, pt)

    # -- secret-key path: c1 uniform, c0 = -c1·s + e (ref encryptor.go:347) -----

    def _encrypt_zero_sk(self, key, level: int, batch) -> Ciphertext:
        p = self.params
        kc, ke = jax.random.split(key)
        c1 = sampling.uniform(kc, p.ring_q, level, batch)    # NTT domain
        e = p.ring_q.ntt(
            sampling.lift_signed(
                p.ring_q, sampling.signed(ke, p.n, p.xe, batch), level),
            level)
        c1s = p.ring_q.mul_mont(c1, self.key.value.q[..., : level + 1, :], level)
        c0 = p.ring_q.sub(e, c1s, level)
        ct = ciphertext_from_polys([c0, c1], is_ntt=True)
        if not p.ntt_flag:
            ct = ct.replace(value=p.ring_q.intt(ct.value, level), is_ntt=False)
        return ct

    def encrypt_zero_seeded(self, key, seed: bytes,
                            level: int | None = None) -> Ciphertext:
        """sk-encryption with c1 derived from a deterministic seed.

        The c1 component can be dropped on the wire and re-derived by the
        receiver from the seed — the reference's compressed/seeded
        ciphertexts (ref encryptor.go:396-437). Requires a SecretKey.
        """
        p = self.params
        assert isinstance(self.key, SecretKey), "seeded encryption needs sk"
        level = p.max_level if level is None else level
        c1 = sampling.KeyedPRNG(seed).uniform_poly(p.ring_q, level)  # NTT dom
        e = p.ring_q.ntt(
            sampling.lift_signed(
                p.ring_q, sampling.signed(key, p.n, p.xe), level), level)
        c1s = p.ring_q.mul_mont(
            c1, self.key.value.q[..., : level + 1, :], level)
        # mul_mont treats sk (M-form) as the Montgomery operand: plain c1·s
        c0 = p.ring_q.sub(e, c1s, level)
        return ciphertext_from_polys([c0, c1], is_ntt=True)

    # -- public-key path: u·pk + (e0,e1) over QP, ModDown by P (ref :204) --------

    def _encrypt_zero_pk(self, key, level: int, batch) -> Ciphertext:
        p = self.params
        ku, k0, k1 = jax.random.split(key, 3)
        rqp = p.ring_qp
        u = rqp.ntt(rqp.sample_signed(ku, p.xs, level, batch), level)
        pk = self.key.value  # [2, ...] NTT+Montgomery
        pk_l = QPPoly(pk.q[..., : level + 1, :], pk.p)
        c = rqp.mul_mont(QPPoly(u.q[..., None, :, :], None if u.p is None else u.p[..., None, :, :]),
                         pk_l, level)                       # [..., 2, L, N] plain NTT
        c = rqp.intt(c, level)
        e0 = sampling.signed(k0, p.n, p.xe, batch)
        e1 = sampling.signed(k1, p.n, p.xe, batch)
        e = QPPoly(
            jnp.stack([sampling.lift_signed(p.ring_q, e0, level),
                       sampling.lift_signed(p.ring_q, e1, level)], axis=-3),
            None if p.ring_p is None else jnp.stack(
                [sampling.lift_signed(p.ring_p, e0),
                 sampling.lift_signed(p.ring_p, e1)], axis=-3),
        )
        c = rqp.add(c, e, level)
        if p.ring_p is not None:
            value = p.basis_extender.mod_down_qp_to_q(c.q, c.p, level)
        else:
            value = c.q
        if p.ntt_flag:
            value = p.ring_q.ntt(value, level)
        return Ciphertext(value=value, is_ntt=p.ntt_flag)


def add_plaintext(params: Parameters, ct: Ciphertext, pt: Plaintext) -> Ciphertext:
    """ct[0] += pt, aligning NTT domains (ref encryptor.go:481)."""
    level = min(ct.level, pt.level)
    ptv = pt.value[..., : level + 1, :]
    if pt.is_ntt != ct.is_ntt:
        ptv = params.ring_q.ntt(ptv, level) if ct.is_ntt else params.ring_q.intt(ptv, level)
    c0 = params.ring_q.add(ct.value[..., 0, : level + 1, :], ptv, level)
    value = ct.value[..., : level + 1, :].at[..., 0, :, :].set(c0)
    return ct.replace(value=value, scale=pt.scale)


class Decryptor:
    """pt = Σ_i ct[i]·s^i via Horner in the NTT domain (ref decryptor.go:51)."""

    def __init__(self, params: Parameters, sk: SecretKey):
        self.params = params
        self.sk = sk

    def decrypt(self, ct: Ciphertext, out_ntt: bool | None = None) -> Plaintext:
        p = self.params
        level = ct.level
        s = self.sk.value.q[..., : level + 1, :]
        v = ct.value
        if not ct.is_ntt:
            v = p.ring_q.ntt(v, level)
        acc = v[..., ct.degree, :, :]
        for i in range(ct.degree - 1, -1, -1):
            acc = p.ring_q.mul_mont(acc, s, level)
            acc = p.ring_q.add(acc, v[..., i, :, :], level)
        out_ntt = ct.is_ntt if out_ntt is None else out_ntt
        if not out_ntt:
            acc = p.ring_q.intt(acc, level)
        return Plaintext(value=acc, is_ntt=out_ntt, scale=ct.scale)
