"""Pallas u32 NTT kernel vs the u64 XLA path (interpret mode on CPU).

The real TPU lowering is exercised by bench.py / the driver; this checks
the kernel's math (u32 Montgomery, roll-select butterflies, stage root
tables) stays bit-exact with the reference u64 implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lattigo_tpu.ring.ring import Ring
from lattigo_tpu.ring.ntt_pallas import NTTPallas
from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator


@pytest.mark.parametrize("logn", [9, 10])
def test_pallas_ntt_bit_exact(logn):
    n = 1 << logn
    gen = NTTFriendlyPrimesGenerator(29, 2 * n)
    moduli = [gen.next_alternating_prime() for _ in range(2)]
    ring = Ring(n, moduli)
    pal = NTTPallas(n, moduli, [s.psi for s in ring.subrings])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, min(moduli), (3, 2, n)).astype(np.uint64))

    want = np.asarray(ring.ntt(x))
    got = np.asarray(pal.ntt(x, 1, interpret=True))
    np.testing.assert_array_equal(got, want)

    back = np.asarray(pal.intt(jnp.asarray(got), 1, interpret=True))
    np.testing.assert_array_equal(back, np.asarray(x))

    # single-limb entry points against limb 1
    x1 = x[:, 1:2, :]
    want1 = np.asarray(ring.ntt_single(1, x1))
    got1 = np.asarray(pal.ntt_single(1, x1, interpret=True))
    np.testing.assert_array_equal(got1, want1)
