"""Encryption ↔ secret-sharing conversion and collective refresh.

TPU-native analog of ``multiparty/mpckks/sharing.go`` + ``mpbgv/sharing.go``
and the refresh protocols built from them (E2S ∘ S2E at a higher level,
ref mpckks/refresh.go:12).

EncToShare: each party publishes h_i = +s_i·c1 − M_i + e_i (decryption is
pt = c0 + c1·s) and keeps the mask M_i; the aggregated public value
c0 + Σh_i plus Σ M_i reconstructs the plaintext, so {M_i} is an additive
sharing. ShareToEnc re-encrypts: parties publish h'_i = −s_i·crp + M_i + e_i;
the aggregate is the c0 of a fresh ciphertext with c1 = crp. Masks are sampled uniform with a statistical
flooding bound 2^log_bound ≫ noise (ref GetMinimumLevelForRefresh,
mpckks/utils.go:16).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring import modops, sampling
from lattigo_tpu.rlwe.params import Parameters
from lattigo_tpu.rlwe.elements import Ciphertext
from lattigo_tpu.rlwe.keys import SecretKey


def _sample_mask_signed(key, n: int, log_bound: int):
    """Uniform signed mask int64[..., N] in [−2^b, 2^b) (b ≤ 62)."""
    assert log_bound <= 62
    return jax.random.randint(
        key, (n,), -(1 << log_bound), 1 << log_bound, dtype=jnp.int64)


class EncToShareProtocol:
    """ref mpckks/sharing.go:36 (CKKS) / mpbgv/sharing.go:16 (BGV)."""

    def __init__(self, params: Parameters, log_bound: int = 40,
                 noise_sigma: float = 3.2):
        self.params = params
        self.log_bound = log_bound
        self.noise_sigma = noise_sigma

    def gen_share(self, key, sk: SecretKey, ct: Ciphertext):
        """→ (secret_share int64[N], public_share u64[l+1, N] NTT)."""
        p = self.params
        level = ct.level
        l = level + 1
        km, ke = jax.random.split(key)
        mask = _sample_mask_signed(km, p.n, self.log_bound)
        mask_q = p.ring_q.ntt(sampling.lift_signed(p.ring_q, mask, level), level)
        c1s = p.ring_q.mul_mont(ct.value[..., 1, :, :],
                                sk.value.q[..., :l, :], level)
        e = p.ring_q.ntt(sampling.lift_signed(
            p.ring_q,
            sampling.gaussian_signed(ke, p.n, sampling.DiscreteGaussian(
                self.noise_sigma, 6 * self.noise_sigma)), level), level)
        # h = e + s·c1 − M  (decrypt convention pt = c0 + c1·s,
        # ref keyswitch_sk.go:85 with sk_out = 0)
        h = p.ring_q.sub(p.ring_q.add(e, c1s, level), mask_q, level)
        return mask, h

    def aggregate_shares(self, h1, h2):
        # shares carry their level in the limb axis; never broadcast to the
        # full chain (the default-level tables would corrupt upper rows)
        return self.params.ring_q.add(h1, h2, h1.shape[-2] - 1)

    def finalize_public(self, ct: Ciphertext, h_agg):
        """c0 + Σh_i: combined with Σ M_i this is the plaintext."""
        return self.params.ring_q.add(ct.value[..., 0, :, :], h_agg, ct.level)


class ShareToEncProtocol:
    """ref mpckks/sharing.go:171."""

    def __init__(self, params: Parameters, noise_sigma: float = 3.2):
        self.params = params
        self.noise_sigma = noise_sigma

    def sample_crp(self, seed: bytes, level: int | None = None):
        prng = sampling.KeyedPRNG(seed)
        return self.params.ring_q.ntt(
            prng.uniform_poly(self.params.ring_q, level), level)

    def gen_share(self, key, sk: SecretKey, mask, crp, level: int | None = None):
        """h'_i = −s_i·crp + M_i + e_i (NTT domain)."""
        p = self.params
        level = p.max_level if level is None else level
        l = level + 1
        mask_q = p.ring_q.ntt(sampling.lift_signed(p.ring_q, mask, level), level)
        cs = p.ring_q.mul_mont(crp, sk.value.q[..., :l, :], level)
        e = p.ring_q.ntt(sampling.lift_signed(
            p.ring_q,
            sampling.gaussian_signed(key, p.n, sampling.DiscreteGaussian(
                self.noise_sigma, 6 * self.noise_sigma)), level), level)
        return p.ring_q.add(p.ring_q.sub(e, cs, level), mask_q, level)

    def aggregate_shares(self, s1, s2):
        return self.params.ring_q.add(s1, s2, s1.shape[-2] - 1)

    def finalize(self, agg, crp, extra_c0=None, scale=1.0,
                 level: int | None = None) -> Ciphertext:
        """ct = (Σh'_i [+ extra_c0], crp)."""
        p = self.params
        level = p.max_level if level is None else level
        c0 = agg if extra_c0 is None else p.ring_q.add(agg, extra_c0, level)
        return Ciphertext(value=jnp.stack([c0, crp], axis=-3),
                          is_ntt=True, scale=scale)


class MaskedTransformProtocol:
    """Refresh with a public linear transform applied inside the masking
    (ref mpckks/transform.go:17 MaskedLinearTransformationProtocol).

    One round: each party publishes its E2S share AND an S2E share built
    from the *transformed* mask; the aggregator applies the same transform
    to the public masked plaintext. Since the transform is linear, it
    commutes with the additive sharing:  T(pt) = T(pt − ΣM) + Σ T(M_i).

    ``transform`` maps centered integer coefficient vectors int64[N] →
    int64[N] on the host (build one from a slot-space function with
    :func:`ckks_coeff_transform`).
    """

    def __init__(self, params: Parameters, log_bound: int = 40):
        self.params = params
        self.e2s = EncToShareProtocol(params, log_bound)
        self.s2e = ShareToEncProtocol(params)

    def sample_crp(self, seed: bytes, level: int | None = None):
        return self.s2e.sample_crp(seed, level)

    def gen_share(self, key, sk: SecretKey, ct: Ciphertext, crp, transform,
                  level_out: int | None = None):
        """→ (h_e2s u64[l_in+1, N], h_s2e u64[l_out+1, N])."""
        p = self.params
        level_out = p.max_level if level_out is None else level_out
        k1, k2 = jax.random.split(key)
        mask, h = self.e2s.gen_share(k1, sk, ct)
        tmask = np.asarray(transform(np.asarray(mask)), dtype=np.int64)
        h2 = self.s2e.gen_share(k2, sk, tmask, crp, level_out)
        return h, h2

    def aggregate_shares(self, s1, s2):
        return (self.params.ring_q.add(s1[0], s2[0], s1[0].shape[-2] - 1),
                self.params.ring_q.add(s1[1], s2[1], s1[1].shape[-2] - 1))

    def finalize(self, ct: Ciphertext, agg, crp, transform,
                 level_out: int | None = None) -> Ciphertext:
        """Aggregator: transform the public masked plaintext, lift, add."""
        p = self.params
        level_in = ct.level
        level_out = p.max_level if level_out is None else level_out
        pub = self.e2s.finalize_public(ct, agg[0])          # NTT, level_in
        coeffs = p.ring_q.to_int_coeffs(
            np.asarray(p.ring_q.intt(pub, level_in)), level_in, centered=True)
        tpub = transform(np.array(coeffs, dtype=object))
        lifted = p.ring_q.ntt(
            p.ring_q.from_int_coeffs(list(tpub), level_out), level_out)
        return self.s2e.finalize(agg[1], crp, extra_c0=lifted,
                                 scale=ct.scale, level=level_out)


def ckks_coeff_transform(encoder, fn):
    """Lift a linear slot-space function C^{N/2} → C^{N/2} to a centered
    integer coefficient transform (host; mask precision is preserved up to
    rounding, as in the reference's big-float mask path)."""
    def transform(coeffs):
        slots = encoder.coeffs_to_slots(np.asarray(coeffs, dtype=np.float64))
        out = fn(slots)
        back = encoder.embed_to_coeffs(out)
        return np.array([int(round(float(np.real(x)))) for x in back],
                        dtype=object)
    return transform


class RefreshProtocol:
    """Collective bootstrap: E2S at the input level, S2E at the top level.

    The public value c0+Σh is added on the S2E side after a centered exact
    lift from Q_level to Q_top (masks and plaintext are ≪ q_0, so the lift
    is exact; ref mpckks/refresh.go:12-50).
    """

    def __init__(self, params: Parameters, log_bound: int = 40):
        self.params = params
        self.e2s = EncToShareProtocol(params, log_bound)
        self.s2e = ShareToEncProtocol(params)

    def lift_public(self, combined, level_in: int, level_out: int):
        """Centered basis lift Q_in → Q_out of the public masked plaintext."""
        from lattigo_tpu.ring.basis_extension import ModUpConstants, mod_up
        p = self.params
        coeff = p.ring_q.intt(combined, level_in)
        consts = ModUpConstants(p.q_moduli[: level_in + 1],
                                p.q_moduli[: level_out + 1])
        l = level_out + 1
        out = mod_up(coeff, consts, p.ring_q.q[:l], p.ring_q.qinv[:l],
                     p.ring_q.bred_hi[:l], centered=True)
        return p.ring_q.ntt(out, level_out)
