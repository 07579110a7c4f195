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
