"""Exactness tests for 64-bit modular primitives vs Python big-int oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from lattigo_tpu.ring import modops

RNG = np.random.default_rng(0)

PRIMES = [
    0x1FFFFFFFFFE00001,  # 61-bit, NTT-friendly for large N
    0xFFFFFFFFFFC0001,   # 60-bit (Lattigo default pk prime size class)
    1152921504606584833,
    40961,               # 16-bit
    65537,
]


def rand_u64(shape, bound):
    return RNG.integers(0, bound, size=shape, dtype=np.uint64)


@pytest.mark.parametrize("q", PRIMES)
def test_mul_hi(q):
    a = rand_u64((256,), 1 << 63)
    b = rand_u64((256,), 1 << 63)
    got = np.asarray(modops.mul_hi(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([(int(x) * int(y)) >> 64 for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("q", PRIMES)
def test_mred(q):
    qinv = modops.gen_mred_constant(q)
    a = rand_u64((512,), q)
    b = rand_u64((512,), q)
    got = np.asarray(
        modops.mred(jnp.asarray(a), jnp.asarray(b), jnp.uint64(q), jnp.uint64(qinv))
    )
    rinv = pow(1 << 64, -1, q)
    want = np.array([int(x) * int(y) * rinv % q for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("q", PRIMES)
def test_mred_lazy_range_and_value(q):
    qinv = modops.gen_mred_constant(q)
    # lazy admits a < 4q as long as a*b < q*2^64; emulate NTT usage: a < 4q, b < q
    a = rand_u64((512,), min(4 * q, (1 << 64) - 1))
    b = rand_u64((512,), q)
    got = np.asarray(
        modops.mred_lazy(jnp.asarray(a), jnp.asarray(b), jnp.uint64(q), jnp.uint64(qinv))
    )
    assert (got < 2 * q).all()
    rinv = pow(1 << 64, -1, q)
    want = np.array([int(x) * int(y) * rinv % q for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(got % q, want)


@pytest.mark.parametrize("q", PRIMES)
def test_mform_imform(q):
    bhi, blo = modops.gen_bred_constant(q)
    qinv = modops.gen_mred_constant(q)
    a = rand_u64((512,), q)
    m = modops.mform(jnp.asarray(a), jnp.uint64(q), jnp.uint64(bhi), jnp.uint64(blo))
    want = np.array([(int(x) << 64) % q for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(m), want)
    back = modops.imform(m, jnp.uint64(q), jnp.uint64(qinv))
    np.testing.assert_array_equal(np.asarray(back), a)


@pytest.mark.parametrize("q", PRIMES)
def test_bred_add(q):
    bhi, _ = modops.gen_bred_constant(q)
    a = rand_u64((512,), (1 << 64) - 1)
    got = np.asarray(modops.bred_add(jnp.asarray(a), jnp.uint64(q), jnp.uint64(bhi)))
    want = np.array([int(x) % q for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("q", PRIMES)
def test_bred_mul(q):
    bhi, blo = modops.gen_bred_constant(q)
    a = rand_u64((512,), q)
    b = rand_u64((512,), q)
    got = np.asarray(
        modops.bred_mul(
            jnp.asarray(a), jnp.asarray(b), jnp.uint64(q), jnp.uint64(bhi), jnp.uint64(blo)
        )
    )
    want = np.array([int(x) * int(y) % q for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("q", PRIMES)
def test_add_sub_neg(q):
    qj = jnp.uint64(q)
    a = rand_u64((512,), q)
    b = rand_u64((512,), q)
    np.testing.assert_array_equal(
        np.asarray(modops.add_mod(jnp.asarray(a), jnp.asarray(b), qj)),
        (a.astype(object) + b.astype(object)) % q,
    )
    np.testing.assert_array_equal(
        np.asarray(modops.sub_mod(jnp.asarray(a), jnp.asarray(b), qj)),
        (a.astype(object) - b.astype(object)) % q,
    )
    np.testing.assert_array_equal(
        np.asarray(modops.neg_mod(jnp.asarray(a), qj)),
        (-a.astype(object)) % q,
    )
