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


def test_u64_mxu_reduced_digit_planes():
    """Chains whose widest prime is < 53/45 bits contract 7x7 / 6x6 digit
    planes instead of 8x8 (a 1.3-1.8x MXU-FLOP cut); bit-exactness must
    hold including for LAZY (< 2q) inputs, which the operand plane count
    budgets 4q of headroom for."""
    n = 1 << 12
    for bits, nd in ((44, 6), (51, 7)):
        gen = NTTFriendlyPrimesGenerator(bits, 2 * n)
        moduli = [gen.next_alternating_prime() for _ in range(2)]
        ring = Ring(n, moduli)
        mxu = NTTMxu64(n, moduli, [s.psi for s in ring.subrings])
        assert mxu.nd_in == nd and mxu.nd_out == nd, (
            f"{bits}b: planes {mxu.nd_in}x{mxu.nd_out}, want {nd}x{nd}")
        rng = np.random.default_rng(bits)
        x = jnp.asarray(np.stack(
            [rng.integers(0, q, (2, n), dtype=np.uint64) for q in moduli],
            axis=-2))
        want = np.asarray(ring.ntt(x))
        got = np.asarray(mxu.ntt(x, 1))
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(np.asarray(mxu.intt(jnp.asarray(got), 1)),
                                      np.asarray(x))
        # lazy-range input: x + q stays congruent and must transform exactly
        xl = jnp.asarray(np.asarray(x) + np.array(moduli, np.uint64)[:, None])
        got_l = np.asarray(mxu.ntt(xl, 1))
        np.testing.assert_array_equal(got_l, want)
