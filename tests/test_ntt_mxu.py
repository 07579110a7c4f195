"""Four-step MXU NTT kernel vs the u64 XLA path (interpret mode on CPU).

The real TPU lowering/throughput is exercised by bench.py; this checks
the exact-integer-matmul construction (balanced signed digits, digit
recombination, mid-step twiddle) stays bit-exact with the reference u64
implementation for both the bf16 and int8 operand encodings.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lattigo_tpu.ring.ring import Ring
from lattigo_tpu.ring.ntt_mxu import NTTMxu
from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
def test_mxu_ntt_bit_exact(dtype):
    n = 1 << 12
    gen = NTTFriendlyPrimesGenerator(28, 2 * n)
    moduli = [gen.next_alternating_prime() for _ in range(2)]
    ring = Ring(n, moduli)
    mxu = NTTMxu(n, moduli, [s.psi for s in ring.subrings], dtype=dtype)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, min(moduli), (3, 2, n)).astype(np.uint64))

    want = np.asarray(ring.ntt(x))
    got = np.asarray(mxu.ntt(x, 1, interpret=True))
    np.testing.assert_array_equal(got, want)

    back = np.asarray(mxu.intt(jnp.asarray(got), 1, interpret=True))
    np.testing.assert_array_equal(back, np.asarray(x))

    # lazy variants stay in [0, 2q) and are congruent mod q
    lazy = np.asarray(mxu.ntt(x, 1, lazy=True, interpret=True))
    for i, q in enumerate(moduli):
        assert lazy[:, i].max() < 2 * q
        np.testing.assert_array_equal(lazy[:, i] % q, want[:, i])

    # single-limb entry points against limb 1
    x1 = x[:, 1:2, :]
    want1 = np.asarray(ring.ntt_single(1, x1))
    got1 = np.asarray(mxu.ntt_single(1, x1, interpret=True))
    np.testing.assert_array_equal(got1, want1)
    back1 = np.asarray(mxu.intt_single(1, jnp.asarray(got1), interpret=True))
    np.testing.assert_array_equal(back1, np.asarray(x1))
