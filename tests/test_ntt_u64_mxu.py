"""Four-step u64 MXU NTT (XLA-level int8 digit matmuls) vs the
stage-by-stage u64 path — bit-exact for full-width (55-60 bit) primes."""

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring.ring import Ring
from lattigo_tpu.ring.ntt_u64_mxu import NTTMxu64
from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator


def test_u64_mxu_ntt_bit_exact():
    n = 1 << 12
    gen = NTTFriendlyPrimesGenerator(55, 2 * n)
    moduli = [gen.next_alternating_prime() for _ in range(2)]
    ring = Ring(n, moduli)
    mxu = NTTMxu64(n, moduli, [s.psi for s in ring.subrings])

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.integers(0, 1 << 32, (3, 2, n)).astype(np.uint64)
         * rng.integers(0, 1 << 23, (3, 2, n)).astype(np.uint64))
        % np.array(moduli, np.uint64)[:, None])

    want = np.asarray(ring.ntt(x))
    got = np.asarray(mxu.ntt(x, 1))
    np.testing.assert_array_equal(got, want)

    back = np.asarray(mxu.intt(jnp.asarray(got), 1))
    np.testing.assert_array_equal(back, np.asarray(x))

    # lazy outputs stay in [0, 2q) and are congruent
    lazy = np.asarray(mxu.ntt(x, 1, lazy=True))
    for i, q in enumerate(moduli):
        assert lazy[:, i].max() < 2 * q
        np.testing.assert_array_equal(lazy[:, i] % q, want[:, i])

    # single-limb entry points
    x1 = x[:, 1:2, :]
    got1 = np.asarray(mxu.ntt_single(1, x1))
    np.testing.assert_array_equal(got1, np.asarray(ring.ntt_single(1, x1)))
    back1 = np.asarray(mxu.intt_single(1, jnp.asarray(got1)))
    np.testing.assert_array_equal(back1, np.asarray(x1))


def test_u64_mxu_small_and_mixed_primes():
    """Mixed-width chains (25..50-bit) stay bit-exact: the digit
    recombination's Montgomery step runs on accumulator-range operands
    (~2^50) and must use mred_wide — plain mred's small-modulus (< 2^30)
    cascade assumes a < 4q and corrupted every limb with a small prime
    (regression: N15QP768's 25-bit residual prime, round 4)."""
    n = 1 << 12
    moduli = []
    for bits in (25, 30, 33, 50):
        moduli.append(NTTFriendlyPrimesGenerator(
            bits, 2 * n).next_alternating_prime())
    ring = Ring(n, moduli)
    mxu = NTTMxu64(n, moduli, [s.psi for s in ring.subrings])

    rng = np.random.default_rng(1)
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, (2, n), dtype=np.uint64) for q in moduli],
        axis=-2))
    want = np.asarray(ring.ntt(x))
    got = np.asarray(mxu.ntt(x, len(moduli) - 1))
    np.testing.assert_array_equal(got, want)
    back = np.asarray(mxu.intt(jnp.asarray(got), len(moduli) - 1))
    np.testing.assert_array_equal(back, np.asarray(x))
