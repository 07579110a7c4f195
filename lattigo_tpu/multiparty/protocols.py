"""Multiparty (threshold) HE protocols: collective keygen & key switching.

TPU-native analog of ``multiparty/`` (L5). Every protocol follows the
reference's share-object pattern (SURVEY.md §2.5): allocate → sample CRP
from a common PRNG seed → gen_share (local, uses the party's secret) →
aggregate_shares (associative ring addition — tree-reducible) → finalize.
Shares are plain pytrees of u64 tensors; transport/serialization is the
application's plane, exactly as in the reference (no network layer here).

CRS: all parties derive identical uniform polynomials from a shared
``KeyedPRNG`` seed (ref multiparty/crs.go:10, utils/sampling/prng.go:35).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring import modops, sampling
from lattigo_tpu.ring.ringqp import QPPoly, stack as qp_stack
from lattigo_tpu.ring import automorphism as auto_mod
from lattigo_tpu.rlwe.params import Parameters
from lattigo_tpu.rlwe.elements import Ciphertext
from lattigo_tpu.rlwe.keys import (
    SecretKey, PublicKey, GadgetCiphertext, EvaluationKey,
    RelinearizationKey, GaloisKey, KeyGenerator,
)


def sample_crp_qp(params: Parameters, seed: bytes, count: int = 1) -> list[QPPoly]:
    """Common random polynomials over R_QP from a shared seed."""
    prng = sampling.KeyedPRNG(seed)
    out = []
    for _ in range(count):
        q = prng.uniform_poly(params.ring_q)
        p = prng.uniform_poly(params.ring_p) if params.ring_p is not None else None
        out.append(QPPoly(q, p))
    return out


# ---------------------------------------------------------------------------
# Collective public key (ref multiparty/keygen_cpk.go:14)
# ---------------------------------------------------------------------------

class PublicKeyGenProtocol:
    """1-round CPK: share_i = −s_i·crp + e_i over R_QP."""

    def __init__(self, params: Parameters):
        self.params = params

    def sample_crp(self, seed: bytes) -> QPPoly:
        return sample_crp_qp(self.params, seed)[0]

    def gen_share(self, key, sk: SecretKey, crp: QPPoly) -> QPPoly:
        p = self.params
        rqp = p.ring_qp
        e = rqp.ntt(rqp.sample_signed(key, p.xe))
        return rqp.sub(e, rqp.mul_mont(crp, sk.value))

    def aggregate_shares(self, s1: QPPoly, s2: QPPoly) -> QPPoly:
        return self.params.ring_qp.add(s1, s2)

    def finalize(self, agg: QPPoly, crp: QPPoly) -> PublicKey:
        rqp = self.params.ring_qp
        return PublicKey(qp_stack([rqp.mform(agg), rqp.mform(crp)]))


# ---------------------------------------------------------------------------
# Collective key switching (ref multiparty/keyswitch_sk.go:16)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class NoiseFlooding:
    """Smudging noise σ for CKS/PCKS (ref NoiseFlooding)."""
    sigma: float = 3.2


class KeySwitchProtocol:
    """CKS: ct under Σsk_i → ct under Σsk'_i (sk'=0 ⇒ collective decrypt)."""

    def __init__(self, params: Parameters, noise: NoiseFlooding = NoiseFlooding()):
        self.params = params
        self.noise = noise

    def gen_share(self, key, sk_in: SecretKey, sk_out: SecretKey | None,
                  ct: Ciphertext):
        """share = c1·(s_in − s_out) + e (NTT domain; ref GenShare:85)."""
        p = self.params
        level = ct.level
        l = level + 1
        s_in = sk_in.value.q[..., :l, :]
        s_out = (jnp.zeros_like(s_in) if sk_out is None
                 else sk_out.value.q[..., :l, :])
        delta = modops.sub_mod(s_in, s_out, p.ring_q.q[:l])  # still M-form
        c1 = ct.value[..., 1, :, :]
        assert ct.is_ntt
        h = p.ring_q.mul_mont(c1, delta, level)
        e = sampling.lift_signed(
            p.ring_q,
            sampling.gaussian_signed(
                key, p.n, sampling.DiscreteGaussian(
                    self.noise.sigma, 6 * self.noise.sigma)),
            level)
        return p.ring_q.add(h, p.ring_q.ntt(e, level), level)

    def aggregate_shares(self, s1, s2):
        # level travels in the limb axis; adding at the default level would
        # broadcast level-l shares against the full chain
        return self.params.ring_q.add(s1, s2, s1.shape[-2] - 1)

    def key_switch(self, ct: Ciphertext, combined) -> Ciphertext:
        """out = (c0 + h, c1) (ref KeySwitch:133)."""
        p = self.params
        c0 = p.ring_q.add(ct.value[..., 0, :, :], combined, ct.level)
        return ct.replace(value=ct.value.at[..., 0, :, :].set(c0))


class PublicKeySwitchProtocol:
    """PCKS: re-encrypt from Σsk_i to a foreign public key
    (ref multiparty/keyswitch_pk.go:15)."""

    def __init__(self, params: Parameters, noise: NoiseFlooding = NoiseFlooding()):
        self.params = params
        self.noise = noise

    def gen_share(self, key, sk: SecretKey, pk_out: PublicKey, ct: Ciphertext):
        """share = (u·pk0 + s·c1 + e0, u·pk1 + e1) over Q."""
        p = self.params
        level = ct.level
        l = level + 1
        ku, k0, k1 = jax.random.split(key, 3)
        u = p.ring_q.ntt(
            sampling.lift_signed(
                p.ring_q, sampling.signed(ku, p.n, p.xs), level), level)
        pk0 = pk_out.value.q[0, :l, :]
        pk1 = pk_out.value.q[1, :l, :]
        h0 = p.ring_q.mul_mont(u, pk0, level)
        h1 = p.ring_q.mul_mont(u, pk1, level)
        c1s = p.ring_q.mul_mont(ct.value[..., 1, :, :],
                                sk.value.q[..., :l, :], level)
        h0 = p.ring_q.add(h0, c1s, level)
        dist = sampling.DiscreteGaussian(self.noise.sigma, 6 * self.noise.sigma)
        e0 = p.ring_q.ntt(sampling.lift_signed(
            p.ring_q, sampling.gaussian_signed(k0, p.n, dist), level), level)
        e1 = p.ring_q.ntt(sampling.lift_signed(
            p.ring_q, sampling.gaussian_signed(k1, p.n, dist), level), level)
        return (p.ring_q.add(h0, e0, level), p.ring_q.add(h1, e1, level))

    def aggregate_shares(self, s1, s2):
        p = self.params
        level = s1[0].shape[-2] - 1
        return (p.ring_q.add(s1[0], s2[0], level),
                p.ring_q.add(s1[1], s2[1], level))

    def key_switch(self, ct: Ciphertext, combined) -> Ciphertext:
        p = self.params
        h0, h1 = combined
        c0 = p.ring_q.add(ct.value[..., 0, :, :], h0, ct.level)
        return ct.replace(value=jnp.stack([c0, h1], axis=-3))


# ---------------------------------------------------------------------------
# Collective EVK / Galois keys (ref multiparty/keygen_evk.go, keygen_gal.go)
# ---------------------------------------------------------------------------

class GaloisKeyGenProtocol:
    """1-round collective GaloisKey (ref keygen_gal.go:14).

    Party share for digit d: −a_d·σ^{-1}... following the single-party
    construction (keys.py gen_galois_key): share_d = −crp_d·σ_inv(s_i) +
    e + s_i·g_d; aggregation sums shares; c1 rows are the CRPs.
    """

    def __init__(self, params: Parameters):
        self.params = params
        self.kgen = KeyGenerator(params)

    def num_digits(self) -> int:
        return -(-(self.params.max_level + 1) // len(self.params.p_moduli))

    def sample_crp(self, seed: bytes) -> list[QPPoly]:
        return sample_crp_qp(self.params, seed, self.num_digits())

    def gen_share(self, key, gal_el: int, sk: SecretKey, crps: list[QPPoly]):
        p = self.params
        rqp = p.ring_qp
        rq = p.ring_q
        gal_inv = p.galois_element_inverse(gal_el)
        s_inv = rqp.automorphism_ntt(sk.value, gal_inv)
        gfac = self.kgen._gadget_scalars(p.max_level)
        alpha = len(p.p_moduli)
        lq = p.max_level + 1
        shares = []
        for d, crp in enumerate(crps):
            key, ke = jax.random.split(key)
            e = rqp.ntt(rqp.sample_signed(ke, p.xe))
            c0 = rqp.sub(e, rqp.mul_mont(crp, s_inv))
            c0 = rqp.mform(c0)
            lo, hi = d * alpha, min((d + 1) * alpha, lq)
            term = modops.mred(sk.value.q[..., lo:hi, :], gfac[lo:hi],
                               rq.q[lo:hi], rq.qinv[lo:hi])
            c0q = c0.q.at[..., lo:hi, :].set(
                modops.add_mod(c0.q[..., lo:hi, :], term, rq.q[lo:hi]))
            shares.append(QPPoly(c0q, c0.p))
        return shares

    def aggregate_shares(self, s1, s2):
        rqp = self.params.ring_qp
        return [rqp.add(a, b) for a, b in zip(s1, s2)]

    def finalize(self, gal_el: int, agg, crps: list[QPPoly]) -> GaloisKey:
        rqp = self.params.ring_qp
        rows = [qp_stack([c0, rqp.mform(crp)]) for c0, crp in zip(agg, crps)]
        return GaloisKey(GadgetCiphertext(qp_stack(rows)), gal_el)


class EvaluationKeyGenProtocol:
    """1-round collective generic EVK sk_in → sk_out (ref keygen_evk.go:17).

    Each party holds additive shares of BOTH secrets; share for digit d is
    −crp_d·skOut_i + e_i + skIn_i·g_d (gadget-wise, exactly the Galois-key
    protocol with an arbitrary output secret).
    """

    def __init__(self, params: Parameters):
        self.params = params
        self.kgen = KeyGenerator(params)

    def num_digits(self) -> int:
        return -(-(self.params.max_level + 1) // len(self.params.p_moduli))

    def sample_crp(self, seed: bytes) -> list[QPPoly]:
        return sample_crp_qp(self.params, seed, self.num_digits())

    def gen_share(self, key, sk_in: SecretKey, sk_out: SecretKey,
                  crps: list[QPPoly]):
        p = self.params
        rqp, rq = p.ring_qp, p.ring_q
        gfac = self.kgen._gadget_scalars(p.max_level)
        alpha = len(p.p_moduli)
        lq = p.max_level + 1
        shares = []
        for d, crp in enumerate(crps):
            key, ke = jax.random.split(key)
            e = rqp.ntt(rqp.sample_signed(ke, p.xe))
            c0 = rqp.mform(rqp.sub(e, rqp.mul_mont(crp, sk_out.value)))
            lo, hi = d * alpha, min((d + 1) * alpha, lq)
            term = modops.mred(sk_in.value.q[..., lo:hi, :], gfac[lo:hi],
                               rq.q[lo:hi], rq.qinv[lo:hi])
            c0q = c0.q.at[..., lo:hi, :].set(
                modops.add_mod(c0.q[..., lo:hi, :], term, rq.q[lo:hi]))
            shares.append(QPPoly(c0q, c0.p))
        return shares

    def aggregate_shares(self, s1, s2):
        rqp = self.params.ring_qp
        return [rqp.add(a, b) for a, b in zip(s1, s2)]

    def finalize(self, agg, crps: list[QPPoly]) -> EvaluationKey:
        rqp = self.params.ring_qp
        rows = [qp_stack([c0, rqp.mform(crp)]) for c0, crp in zip(agg, crps)]
        return EvaluationKey(GadgetCiphertext(qp_stack(rows)))


class RelinearizationKeyGenProtocol:
    """2-round collective RLK with ephemeral secret (ref keygen_relin.go:15).

    Round 1: share_i = (h0_i, h1_i) per digit with ephemeral u_i:
        h0_i = −u_i·crp + s_i·g + e0_i
        h1_i = s_i·crp + e1_i
    Round 2 (after aggregating h0, h1):
        h0'_i = s_i·h0 + e2_i
        h1'_i = (u_i − s_i)·h1 + e3_i
    Final: rlk_d = (h0' + h1', h1... ) → (d0, d1) = (Σh0' + Σh1', h... )
    following the reference's combination: rlk = (h0'+h1' , h0).
    """

    def __init__(self, params: Parameters):
        self.params = params
        self.kgen = KeyGenerator(params)

    def num_digits(self) -> int:
        return -(-(self.params.max_level + 1) // len(self.params.p_moduli))

    def sample_crp(self, seed: bytes) -> list[QPPoly]:
        return sample_crp_qp(self.params, seed, self.num_digits())

    def gen_ephemeral(self, key) -> SecretKey:
        p = self.params
        qp = p.ring_qp.ntt(p.ring_qp.sample_signed(key, p.xs))
        return SecretKey(p.ring_qp.mform(qp))

    def gen_share_round1(self, key, sk: SecretKey, u: SecretKey,
                         crps: list[QPPoly]):
        p = self.params
        rqp, rq = p.ring_qp, p.ring_q
        gfac = self.kgen._gadget_scalars(p.max_level)
        alpha = len(p.p_moduli)
        lq = p.max_level + 1
        shares = []
        for d, crp in enumerate(crps):
            key, k0, k1 = jax.random.split(key, 3)
            e0 = rqp.mform(rqp.ntt(rqp.sample_signed(k0, p.xe)))
            e1 = rqp.mform(rqp.ntt(rqp.sample_signed(k1, p.xe)))
            crp_m = rqp.mform(crp)
            h0 = rqp.add(rqp.neg(rqp.mul_mont(crp_m, u.value)), e0)
            lo, hi = d * alpha, min((d + 1) * alpha, lq)
            term = modops.mred(sk.value.q[..., lo:hi, :], gfac[lo:hi],
                               rq.q[lo:hi], rq.qinv[lo:hi])
            h0 = QPPoly(h0.q.at[..., lo:hi, :].set(
                modops.add_mod(h0.q[..., lo:hi, :], term, rq.q[lo:hi])), h0.p)
            h1 = rqp.add(rqp.mul_mont(crp_m, sk.value), e1)
            shares.append((h0, h1))
        return shares

    def aggregate_shares(self, s1, s2):
        rqp = self.params.ring_qp
        return [(rqp.add(a0, b0), rqp.add(a1, b1))
                for (a0, a1), (b0, b1) in zip(s1, s2)]

    def gen_share_round2(self, key, sk: SecretKey, u: SecretKey, agg1):
        p = self.params
        rqp = p.ring_qp
        shares = []
        u_minus_s = rqp.sub(u.value, sk.value)
        for h0, h1 in agg1:
            key, k2, k3 = jax.random.split(key, 3)
            e2 = rqp.mform(rqp.ntt(rqp.sample_signed(k2, p.xe)))
            e3 = rqp.mform(rqp.ntt(rqp.sample_signed(k3, p.xe)))
            g0 = rqp.add(rqp.mul_mont(h0, sk.value), e2)
            g1 = rqp.add(rqp.mul_mont(h1, u_minus_s), e3)
            shares.append((g0, g1))
        return shares

    def finalize(self, agg1, agg2) -> RelinearizationKey:
        """rlk_d = (g0 + g1, h1): then d0 + d1·s = s²·g − s²a + s²a + e·s
        = s²·g + noise (ref keygen_relin.go:256)."""
        rqp = self.params.ring_qp
        rows = []
        for (_h0, h1), (g0, g1) in zip(agg1, agg2):
            rows.append(qp_stack([rqp.add(g0, g1), h1]))
        return RelinearizationKey(GadgetCiphertext(qp_stack(rows)))
