"""Ring/NTT exactness tests vs Python big-int negacyclic convolution."""

import numpy as np
import jax.numpy as jnp
import pytest

from lattigo_tpu.ring import Ring
from lattigo_tpu.utils.primes import generate_ntt_primes

RNG = np.random.default_rng(1)


def negacyclic_mul_int(a, b, q, n):
    """Schoolbook negacyclic convolution over Z_q (oracle)."""
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            p = ai * int(b[j])
            if k >= n:
                out[k - n] = (out[k - n] - p) % q
            else:
                out[k] = (out[k] + p) % q
    return np.array(out, dtype=np.uint64)


@pytest.fixture(scope="module", params=[(6, 1), (10, 3)])
def ring(request):
    logn, nlimbs = request.param
    primes = generate_ntt_primes(55, 2 << logn, nlimbs)
    return Ring(1 << logn, primes)


def rand_poly(ring):
    out = np.zeros((len(ring.moduli), ring.n), dtype=np.uint64)
    for i, q in enumerate(ring.moduli):
        out[i] = RNG.integers(0, q, size=ring.n, dtype=np.uint64)
    return jnp.asarray(out)


def test_ntt_roundtrip(ring):
    a = rand_poly(ring)
    back = ring.intt(ring.ntt(a))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_ntt_lazy_matches(ring):
    a = rand_poly(ring)
    full = np.asarray(ring.ntt(a))
    lazy = np.asarray(ring.ntt(a, lazy=True))
    q = np.array(ring.moduli, dtype=np.uint64).reshape(-1, 1)
    assert (lazy < 4 * q.astype(object)).all()
    np.testing.assert_array_equal(lazy % q, full)


def test_ntt_is_linear_and_convolves(ring):
    if ring.n > 256:
        pytest.skip("schoolbook oracle too slow; covered at small N")
    a = rand_poly(ring)
    b = rand_poly(ring)
    # pointwise Montgomery product in NTT domain == negacyclic convolution
    fa = ring.ntt(a)
    fb = ring.mform(ring.ntt(b))
    prod = ring.intt(ring.mul_mont(fa, fb))
    got = np.asarray(prod)
    for i, q in enumerate(ring.moduli):
        want = negacyclic_mul_int(np.asarray(a)[i], np.asarray(b)[i], q, ring.n)
        np.testing.assert_array_equal(got[i], want)


def test_level_views(ring):
    if ring.max_level == 0:
        pytest.skip("single limb")
    lvl = ring.max_level - 1
    a = rand_poly(ring)[: lvl + 1]
    back = ring.intt(ring.ntt(a, level=lvl), level=lvl)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_scalar_mul_and_crt(ring):
    a = rand_poly(ring)
    s = 123456789
    got = ring.mul_scalar(a, s)
    for i, q in enumerate(ring.moduli):
        want = (np.asarray(a)[i].astype(object) * s) % q
        np.testing.assert_array_equal(np.asarray(got)[i], want)


def test_crt_roundtrip(ring):
    coeffs = [int(x) for x in RNG.integers(-1000, 1000, size=ring.n)]
    p = ring.from_int_coeffs(coeffs)
    back = ring.to_int_coeffs(p)
    assert back == coeffs


def test_batched_ntt(ring):
    batch = jnp.stack([rand_poly(ring) for _ in range(3)])
    out = ring.intt(ring.ntt(batch))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(batch))
