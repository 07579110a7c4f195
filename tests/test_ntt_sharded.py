"""Coefficient-axis sharded NTT: bit-exact vs the single-device kernel
(SURVEY.md §7 step 7 — butterfly all-to-all over the device mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lattigo_tpu.ring.ring import Ring
from lattigo_tpu.parallel.ntt_sp import (
    ntt_sharded, intt_sharded, negacyclic_mul_sharded)
from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator


@pytest.fixture(scope="module")
def ctx():
    n = 1 << 10
    gen = NTTFriendlyPrimesGenerator(45, 2 * n)
    gen38 = NTTFriendlyPrimesGenerator(38, 2 * n)
    ring = Ring(n, [gen.next_alternating_prime(),
                    gen38.next_alternating_prime()])
    devices = np.asarray(jax.devices("cpu")[:8])
    mesh = Mesh(devices, axis_names=("sp",))
    return dict(ring=ring, mesh=mesh)

pytestmark = pytest.mark.slow  # covered by dryrun_multichip in the fast loop



def _shard(x, mesh):
    sh = NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["sp"])))
    return jax.device_put(x, sh)


def test_ntt_sharded_bit_exact(ctx):
    ring, mesh = ctx["ring"], ctx["mesh"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, ring.moduli[0], (2, 2, ring.n)).astype(np.uint64)
                    % np.array(ring.moduli, dtype=np.uint64)[None, :, None])
    want = np.asarray(ring.ntt(x))
    got = np.asarray(ntt_sharded(ring, _shard(x, mesh), mesh, "sp"))
    np.testing.assert_array_equal(got, want)


def test_intt_sharded_bit_exact(ctx):
    ring, mesh = ctx["ring"], ctx["mesh"]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, ring.moduli[1], (2, ring.n)).astype(np.uint64))
    f = ring.ntt(x)
    want = np.asarray(ring.intt(f))
    got = np.asarray(intt_sharded(ring, _shard(f, mesh), mesh, "sp"))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, np.asarray(x))


def test_negacyclic_mul_sharded(ctx):
    """(a·b mod X^N+1) via the fully sharded pipeline == single device."""
    ring, mesh = ctx["ring"], ctx["mesh"]
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.integers(0, ring.moduli[1], (2, ring.n)).astype(np.uint64))
    b = jnp.asarray(rng.integers(0, ring.moduli[1], (2, ring.n)).astype(np.uint64))
    want = np.asarray(ring.intt(ring.mul_mont(
        ring.mform(ring.ntt(a)), ring.ntt(b))))
    got = np.asarray(negacyclic_mul_sharded(
        ring, _shard(a, mesh), _shard(b, mesh), mesh, "sp"))
    np.testing.assert_array_equal(got, want)
