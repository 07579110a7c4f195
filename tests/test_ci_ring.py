"""Conjugate-invariant ring Z[X+X^{-1}]/(X^{2N}+1): NTT + exact arithmetic.

Oracle: a CI element (c_0,…,c_{N−1}) ↦ c_0 + Σ_{j≥1} c_j·(X^j − X^{2N−j})
is σ_{X→X^{-1}}-invariant in the standard 2N-ring; CI products must match
the folded standard-2N products exactly (ref ring/ntt.go:715,
conjugate_invariant.go).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lattigo_tpu.ring.ring import Ring, CONJUGATE_INVARIANT
from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator


@pytest.fixture(scope="module")
def rings():
    n = 128
    gen = NTTFriendlyPrimesGenerator(45, 4 * n)
    moduli = [gen.next_alternating_prime() for _ in range(2)]
    return (Ring(n, moduli, CONJUGATE_INVARIANT), Ring(2 * n, moduli), n,
            moduli)


def _unfold(c, q, n):
    s = np.zeros(2 * n, dtype=object)
    s[0] = int(c[0])
    for j in range(1, n):
        s[j] = int(c[j])
        s[2 * n - j] = (q - int(c[j])) % q
    return s


def test_ci_ntt_roundtrip(rings):
    ci, _, n, moduli = rings
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, min(moduli), (3, 2, n)).astype(np.uint64))
    back = ci.intt(ci.ntt(x))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_ci_mul_matches_standard_2n(rings):
    ci, std, n, moduli = rings
    rng = np.random.default_rng(1)
    a = rng.integers(0, min(moduli), n)
    b = rng.integers(0, min(moduli), n)

    # CI path: N-point transform, pointwise Montgomery product
    va = ci.ntt(ci.from_int_coeffs(list(a)))
    vb = ci.ntt(ci.from_int_coeffs(list(b)))
    got = np.asarray(ci.intt(ci.mul_mont(ci.mform(va), vb)))

    # oracle: sigma-invariant unfoldings multiplied in the standard 2N ring
    for i, q in enumerate(moduli):
        ua = std.ntt(std.from_int_coeffs(list(_unfold(a, q, n))))
        ub = std.ntt(std.from_int_coeffs(list(_unfold(b, q, n))))
        prod = np.asarray(std.intt(std.mul_mont(std.mform(ua), ub)))[i]
        assert int(prod[n]) == 0
        for j in range(1, n):
            assert (int(prod[j]) + int(prod[2 * n - j])) % q == 0
        np.testing.assert_array_equal(got[i], prod[:n])
