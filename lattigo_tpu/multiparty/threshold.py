"""t-out-of-N thresholdization of secret keys (Shamir over R_QP).

TPU-native analog of ``multiparty/threshold.go``: each party Shamir-shares
its additive secret-key share; any t active parties recombine their Shamir
shares into additive shares of the full key via Lagrange coefficients at
the public Shamir points (ref GenShamirPolynomial:81, Combiner:148).

Shamir points are small public nonzero integers; all scalar arithmetic is
RNS per-limb, and polynomials stay in the NTT+Montgomery key domain so
thresholdized shares plug directly into every protocol.
"""

from __future__ import annotations

import jax

from lattigo_tpu.ring.ringqp import QPPoly
from lattigo_tpu.rlwe.params import Parameters
from lattigo_tpu.rlwe.keys import SecretKey


def _mul_scalar_qp(params: Parameters, x: QPPoly, scalar: int) -> QPPoly:
    q = params.ring_q.mul_scalar(x.q, scalar)
    p = None if x.p is None else params.ring_p.mul_scalar(x.p, scalar)
    return QPPoly(q, p)


class ShamirPolynomial:
    """coeffs[0] = secret, coeffs[1..t-1] uniform in R_QP (ref :81)."""

    def __init__(self, coeffs: list[QPPoly]):
        self.coeffs = coeffs


class Thresholdizer:
    """ref threshold.go:21."""

    def __init__(self, params: Parameters):
        self.params = params

    def gen_shamir_polynomial(self, key, threshold: int,
                              sk_share: SecretKey) -> ShamirPolynomial:
        p = self.params
        coeffs = [sk_share.value]
        for _ in range(threshold - 1):
            key, k = jax.random.split(key)
            coeffs.append(p.ring_qp.mform(p.ring_qp.uniform(k)))
        return ShamirPolynomial(coeffs)

    def gen_shamir_secret_share(self, point: int,
                                poly: ShamirPolynomial) -> QPPoly:
        """Horner evaluation at the public point (ref :102)."""
        p = self.params
        acc = poly.coeffs[-1]
        for c in reversed(poly.coeffs[:-1]):
            acc = p.ring_qp.add(_mul_scalar_qp(p, acc, point), c)
        return acc

    @staticmethod
    def aggregate_shares(params: Parameters, s1: QPPoly, s2: QPPoly) -> QPPoly:
        return params.ring_qp.add(s1, s2)


class Combiner:
    """Lagrange recombination at 0 over active points (ref :148)."""

    def __init__(self, params: Parameters, threshold: int):
        self.params = params
        self.threshold = threshold

    def gen_additive_share(self, active_points: list[int], own_point: int,
                           own_share: QPPoly) -> SecretKey:
        """additive_j = share_j · Π_{i≠j} x_i/(x_i − x_j) mod Q (and P)."""
        p = self.params
        assert len(active_points) >= self.threshold
        # Lagrange coefficient per modulus:
        # λ_j mod m = Π_{i≠j} x_i · (x_i − x_j)^{-1} mod m.
        lam_mod = {}
        for m in p.q_moduli + p.p_moduli:
            lam = 1
            for x in active_points:
                if x == own_point:
                    continue
                lam = lam * x % m
                lam = lam * pow((x - own_point) % m, -1, m) % m
            lam_mod[m] = lam

        import numpy as np
        import jax.numpy as jnp
        from lattigo_tpu.ring import modops

        def apply(part_arr, ring, moduli):
            lamv = np.array(
                [(lam_mod[m] << 64) % m for m in moduli], dtype=np.uint64
            ).reshape(len(moduli), 1)
            return modops.mred(part_arr, jnp.asarray(lamv), ring.q, ring.qinv)

        out_q = apply(own_share.q, p.ring_q, p.q_moduli)
        out_p = (None if own_share.p is None
                 else apply(own_share.p, p.ring_p, p.p_moduli))
        return SecretKey(QPPoly(out_q, out_p))
