"""Polynomial samplers: uniform, ternary, discrete Gaussian.

TPU-native analog of ``ring/sampler_{uniform,ternary,gaussian}.go``. Device
sampling is keyed by JAX threefry PRNG keys (functional, fork-safe — the
analog of the reference's thread-safe PRNG streams); a host-side
:class:`KeyedPRNG` (blake2b in counter mode) provides deterministic common
reference strings for the multiparty layer, mirroring the reference's
KeyedPRNG XOF (``utils/sampling/prng.go:35``).

Distribution semantics (matching ref ``ring/sampler.go:19-66``):

* ``Uniform``: uniform in [0, q_i) per limb. Sampled as 128 random bits
  reduced mod q_i — statistical distance < 2^-67 from uniform (the
  reference uses rejection; rejection has data-dependent shape, which is
  hostile to XLA, and 2^-67 bias is far below any security slack).
* ``Ternary(p)``: coefficients in {-1, 0, 1}, Pr[0] = p, Pr[±1] = (1-p)/2.
* ``Ternary(hamming_weight=h)``: exactly h nonzero ±1 coefficients.
* ``DiscreteGaussian(sigma, bound)``: rounded continuous Gaussian clamped
  to |x| ≤ bound (tail mass at default (3.2, 19.2) is < 2^-49).

Small signed samples are drawn once per coefficient and lifted into every
RNS limb, exactly like the reference's per-limb lifting.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from lattigo_tpu.ring import modops


# ---------------------------------------------------------------------------
# Distribution descriptors (analog of ring/sampler.go distribution params)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Uniform:
    pass


@dataclass(frozen=True)
class Ternary:
    p: float | None = None          # probability of 0
    hamming_weight: int | None = None

    def __post_init__(self):
        if (self.p is None) == (self.hamming_weight is None):
            raise ValueError("Ternary takes exactly one of p / hamming_weight")


@dataclass(frozen=True)
class DiscreteGaussian:
    sigma: float = 3.2
    bound: float = 19.2


# Default distributions (ref core/rlwe/security.go).
DEFAULT_XE = DiscreteGaussian(3.2, 19.2)
DEFAULT_XS = Ternary(p=1.0 / 3.0)


# ---------------------------------------------------------------------------
# Signed-integer lifting
# ---------------------------------------------------------------------------

def lift_signed(ring, x, level: int | None = None):
    """Lift small signed ints x (int64[..., N]) to residues u64[..., L, N]."""
    l = ring.max_level if level is None else level
    q_i64 = ring.q[: l + 1].astype(jnp.int64)  # [L, 1]
    r = jnp.remainder(x[..., None, :], q_i64)  # sign of divisor ⇒ in [0, q)
    return r.astype(jnp.uint64)


# ---------------------------------------------------------------------------
# Device samplers (jax.random keys)
# ---------------------------------------------------------------------------

def ternary_signed(key, n: int, dist: Ternary = DEFAULT_XS,
                   batch: tuple[int, ...] = ()):
    """Signed ternary sample int64[batch..., N] (before RNS lifting).

    Kept separate from :func:`ternary` so key material can lift the SAME
    integer vector into both the Q and P chains (ref: secret keys live in
    R_QP, core/rlwe/keys.go:18).
    """
    if dist.p is not None:
        ku, ks = jax.random.split(key)
        u = jax.random.uniform(ku, batch + (n,))
        sign = jax.random.rademacher(ks, batch + (n,), dtype=jnp.int64)
        return jnp.where(u < dist.p, jnp.int64(0), sign)
    h = dist.hamming_weight
    ks, kp = jax.random.split(key)
    base = jnp.concatenate(
        [
            jax.random.rademacher(ks, batch + (h,), dtype=jnp.int64),
            jnp.zeros(batch + (n - h,), dtype=jnp.int64),
        ],
        axis=-1,
    )
    return jax.random.permutation(kp, base, axis=-1, independent=True)


def gaussian_signed(key, n: int, dist: DiscreteGaussian = DEFAULT_XE,
                    batch: tuple[int, ...] = ()):
    """Signed rounded-Gaussian sample int64[batch..., N]."""
    g = jax.random.normal(key, batch + (n,), dtype=jnp.float32) * dist.sigma
    g = jnp.clip(g, -dist.bound, dist.bound)
    return jnp.round(g).astype(jnp.int64)


def signed(key, n: int, dist, batch: tuple[int, ...] = ()):
    if isinstance(dist, Ternary):
        return ternary_signed(key, n, dist, batch)
    if isinstance(dist, DiscreteGaussian):
        return gaussian_signed(key, n, dist, batch)
    raise TypeError(f"distribution {dist!r} has no small-signed form")


def uniform(key, ring, level: int | None = None, batch: tuple[int, ...] = ()):
    """Uniform poly in [0, q_i) per limb: u64[batch..., L, N]."""
    l = (ring.max_level if level is None else level) + 1
    shape = batch + (l, ring.n)
    k1, k2 = jax.random.split(key)
    hi = jax.random.bits(k1, shape, dtype=jnp.uint64)
    lo = jax.random.bits(k2, shape, dtype=jnp.uint64)
    q, _, bhi, blo = ring.tables(level)
    # (hi·2^64 + lo) mod q  =  MForm(hi mod q) + (lo mod q)
    return modops.add_mod(
        modops.mform(modops.bred_add(hi, q, bhi), q, bhi, blo),
        modops.bred_add(lo, q, bhi),
        q,
    )


def ternary(key, ring, dist: Ternary = DEFAULT_XS, level: int | None = None,
            batch: tuple[int, ...] = ()):
    """Ternary secret poly, lifted to residues u64[batch..., L, N]."""
    return lift_signed(ring, ternary_signed(key, ring.n, dist, batch), level)


def discrete_gaussian(key, ring, dist: DiscreteGaussian = DEFAULT_XE,
                      level: int | None = None, batch: tuple[int, ...] = ()):
    """Rounded clamped Gaussian error poly, lifted: u64[batch..., L, N]."""
    return lift_signed(ring, gaussian_signed(key, ring.n, dist, batch), level)


def sample(key, ring, dist, level: int | None = None, batch: tuple[int, ...] = ()):
    if isinstance(dist, Uniform):
        return uniform(key, ring, level, batch)
    if isinstance(dist, Ternary):
        return ternary(key, ring, dist, level, batch)
    if isinstance(dist, DiscreteGaussian):
        return discrete_gaussian(key, ring, dist, level, batch)
    raise TypeError(f"unknown distribution {dist!r}")


# ---------------------------------------------------------------------------
# Host-side deterministic PRNG (CRS / seeded-ciphertext compression)
# ---------------------------------------------------------------------------

class KeyedPRNG:
    """Deterministic byte stream: blake2b(key ‖ counter) in counter mode.

    Fills uniform polynomials on the host for common-reference strings and
    seeded (compressed) ciphertexts — the role of the reference's blake2b
    XOF KeyedPRNG. (Wire-compatibility with Go's x/crypto XOF is not
    claimed; determinism across parties sharing the seed is.)

    Backed by the native C++ XOF (:mod:`lattigo_tpu.native`) when a
    compiler is available; the pure-Python hashlib path below is
    bit-identical (gated by tests/test_native.py) and used as fallback.
    """

    def __init__(self, key: bytes = b""):
        self.key = bytes(key)
        self.counter = 0

    def read_u64(self, count: int) -> np.ndarray:
        from lattigo_tpu import native

        got = native.xof_fill_u64(self.key[:64], self.counter, count)
        if got is not None:
            out, self.counter = got
            return out
        words = []
        while len(words) * 8 < count * 8:
            h = hashlib.blake2b(
                self.counter.to_bytes(8, "little"), key=self.key[:64]
            ).digest()
            words.extend(
                int.from_bytes(h[i : i + 8], "little") for i in range(0, 64, 8)
            )
            self.counter += 1
        return np.array(words[:count], dtype=np.uint64)

    def uniform_poly(self, ring, level: int | None = None) -> jnp.ndarray:
        """Uniform [L, N] poly (128-bit reduction, bias < 2^-67)."""
        from lattigo_tpu import native

        l = (ring.max_level if level is None else level) + 1
        out = np.zeros((l, ring.n), dtype=np.uint64)
        for i in range(l):
            q = ring.moduli[i]
            got = native.xof_uniform_mod_q(
                self.key[:64], self.counter, q, ring.n)
            if got is not None:
                out[i], self.counter = got
                continue
            hi = self.read_u64(ring.n).astype(object)
            lo = self.read_u64(ring.n).astype(object)
            out[i] = (((hi << 64) | lo) % q).astype(np.uint64)
        return jnp.asarray(out)
