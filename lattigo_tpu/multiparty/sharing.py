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


def get_minimum_level_for_refresh(lambda_: int, scale, n_parties: int,
                                  moduli) -> tuple[int, int, bool]:
    """Minimum level (and mask bit-length) for a collective refresh with
    ≥ ``lambda_`` bits of statistical security (ref mpckks/utils.go:16
    GetMinimumLevelForRefresh).

    The additive masks must flood the plaintext (≈ scale) by 2^lambda, and
    the modulus at the refresh level must hold n_parties such masks:
    returns (min_level, log_bound, ok); ok=False if the chain is too short.
    """
    import math
    log_bound = lambda_ + math.ceil(math.log2(float(scale)))
    max_bound = math.ceil(log_bound + math.log2(n_parties))
    min_level, log_q, i = -1, 0.0, 0
    while log_q < max_bound:
        if i >= len(moduli):
            return 0, 0, False
        log_q += math.log2(moduli[i])
        min_level += 1
        i += 1
    return min_level, log_bound, True


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

    ``params_out`` (or :meth:`with_params`, ref mpckks/transform.go:29
    WithParams) re-encrypts into a DIFFERENT parameter set: the E2S side
    stays on the input parameters, the S2E side moves to the output ones,
    and the value is rescaled by scale_out/scale_in inside the integer
    mask arithmetic (the reference's prec-bit big-float mask path) so the
    output reads the same message at the output default scale.
    """

    def __init__(self, params: Parameters, log_bound: int = 40,
                 params_out: Parameters | None = None, scale_ratio=None):
        self.params = params
        self.params_out = params if params_out is None else params_out
        if self.params_out.n != params.n:
            raise ValueError("masked transform requires matching ring degree")
        self.log_bound = log_bound
        self.e2s = EncToShareProtocol(params, log_bound)
        self.s2e = ShareToEncProtocol(self.params_out)
        # physical value multiplier folded into the transform; by default
        # scale_out/scale_in so the output label is the out default scale
        self.scale_ratio = scale_ratio

    def with_params(self, params_out: Parameters,
                    scale_ratio=None) -> "MaskedTransformProtocol":
        """Shallow copy re-encrypting into ``params_out`` (ref
        mpckks/transform.go:29 WithParams — the expected input parameters
        are unchanged)."""
        return MaskedTransformProtocol(self.params, self.log_bound,
                                       params_out=params_out,
                                       scale_ratio=scale_ratio)

    def _ratio(self, scale_in):
        from fractions import Fraction
        if self.scale_ratio is not None:
            return Fraction(self.scale_ratio)
        if self.params_out is self.params:
            return Fraction(1)
        return (Fraction(self.params_out.default_scale_fraction)
                / Fraction(scale_in))

    @staticmethod
    def _apply(transform, coeffs, ratio):
        out = transform(coeffs)
        if ratio == 1:
            return out
        num, den = ratio.numerator, ratio.denominator
        return np.array([(2 * int(x) * num + den) // (2 * den)
                         for x in out], dtype=object)

    def sample_crp(self, seed: bytes, level: int | None = None):
        return self.s2e.sample_crp(seed, level)

    def gen_share(self, key, sk: SecretKey, ct: Ciphertext, crp, transform,
                  level_out: int | None = None,
                  sk_out: SecretKey | None = None):
        """→ (h_e2s u64[l_in+1, N], h_s2e u64[l_out+1, N]).

        ``sk_out``: the party's secret in the OUTPUT parameter set (same
        underlying coefficients — KeyGenerator.secret_key_from_signed);
        defaults to ``sk`` for the single-parameter-set protocol."""
        po = self.params_out
        level_out = po.max_level if level_out is None else level_out
        k1, k2 = jax.random.split(key)
        mask, h = self.e2s.gen_share(k1, sk, ct)
        tmask = self._apply(transform, np.asarray(mask), self._ratio(ct.scale))
        tmask = np.asarray([int(x) for x in tmask], dtype=np.int64)
        h2 = self.s2e.gen_share(k2, sk if sk_out is None else sk_out,
                                tmask, crp, level_out)
        return h, h2

    def aggregate_shares(self, s1, s2):
        return (self.params.ring_q.add(s1[0], s2[0], s1[0].shape[-2] - 1),
                self.params_out.ring_q.add(s1[1], s2[1], s1[1].shape[-2] - 1))

    def finalize(self, ct: Ciphertext, agg, crp, transform,
                 level_out: int | None = None) -> Ciphertext:
        """Aggregator: transform the public masked plaintext, lift, add."""
        p, po = self.params, self.params_out
        level_in = ct.level
        level_out = po.max_level if level_out is None else level_out
        ratio = self._ratio(ct.scale)
        pub = self.e2s.finalize_public(ct, agg[0])          # NTT, level_in
        coeffs = p.ring_q.to_int_coeffs(
            np.asarray(p.ring_q.intt(pub, level_in)), level_in, centered=True)
        tpub = self._apply(transform, np.array(coeffs, dtype=object), ratio)
        lifted = po.ring_q.ntt(
            po.ring_q.from_int_coeffs(list(tpub), level_out), level_out)
        from fractions import Fraction
        return self.s2e.finalize(agg[1], crp, extra_c0=lifted,
                                 scale=Fraction(ct.scale) * ratio,
                                 level=level_out)


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
