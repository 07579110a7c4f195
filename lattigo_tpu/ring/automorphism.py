"""Galois automorphisms X → X^k on ring polynomials.

TPU-native analog of ``ring/automorphism.go``: the permutation index (and
coefficient-domain sign mask) for each Galois element is precomputed on the
host; applying an automorphism on device is a single gather (plus a select
for the sign in the coefficient domain) — ideal for XLA.

NTT-domain derivation for this library's ordering (natural → bit-reversed):
slot j of the NTT holds a(ψ^{e_j}) with e_j = 2·brv(j)+1, so
(σ_k a)(ψ^{e_j}) = a(ψ^{e_j·k mod 2N}) = NTT(a)[j'] with
brv(j') = (e_j·k mod 2N − 1)/2.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring.ntt import bit_reverse


@functools.lru_cache(maxsize=None)
def _ntt_index_np(n: int, gal_el: int) -> np.ndarray:
    logn = n.bit_length() - 1
    two_n = 2 * n
    idx = np.zeros(n, dtype=np.int32)
    for j in range(n):
        e = (2 * bit_reverse(j, logn) + 1) * gal_el % two_n
        idx[j] = bit_reverse((e - 1) // 2, logn)
    return idx


@functools.lru_cache(maxsize=None)
def _coeff_index_np(n: int, gal_el: int) -> tuple[np.ndarray, np.ndarray]:
    two_n = 2 * n
    kinv = pow(gal_el, -1, two_n)
    idx = np.zeros(n, dtype=np.int32)
    neg = np.zeros(n, dtype=bool)
    for j in range(n):
        i = kinv * j % two_n
        if i < n:
            idx[j] = i
        else:
            idx[j] = i - n
            neg[j] = True
    return idx, neg


@functools.lru_cache(maxsize=None)
def _ntt_index_ci_np(n: int, gal_el: int) -> np.ndarray:
    """CI-ring NTT automorphism index: position j holds the value at
    exponent E(j) = 2·brv_{log2N}(j)+1 of the 4N-th root (the kept half of
    the size-2N transform, always ≡ 1 mod 4); σ_g reads the value at
    E(j)·g, identifying conjugate exponents e ↔ 4N−e (CI values agree)."""
    assert gal_el % 2 == 1
    log2n = n.bit_length()  # log2(2N)
    four_n = 4 * n
    idx = np.zeros(n, dtype=np.int32)
    for j in range(n):
        e = (2 * bit_reverse(j, log2n) + 1) * gal_el % four_n
        if e % 4 != 1:
            e = four_n - e
        idx[j] = bit_reverse((e - 1) // 2, log2n)
    return idx


def ntt_index(n: int, gal_el: int, ring_type: str = "standard") -> jnp.ndarray:
    """Gather index table for NTT-domain automorphism (ref :12)."""
    if ring_type == "conjugate_invariant":
        return jnp.asarray(_ntt_index_ci_np(n, gal_el))
    return jnp.asarray(_ntt_index_np(n, gal_el))


def apply_ntt(x, idx):
    """NTT-domain automorphism: pure gather over the coefficient axis."""
    return jnp.take(x, idx, axis=-1)


def apply_coeff(x, n: int, gal_el: int, q):
    """Coefficient-domain automorphism with sign flip (ref :113).

    x: u64[..., L, N] in [0, q); q: u64[L, 1].
    """
    idx_np, neg_np = _coeff_index_np(n, gal_el)
    g = jnp.take(x, jnp.asarray(idx_np), axis=-1)
    neg = jnp.asarray(neg_np)
    return jnp.where(neg, jnp.where(g == 0, g, q - g), g)


def automorphism_ntt(x, n: int, gal_el: int, ring_type: str = "standard"):
    return apply_ntt(x, ntt_index(n, gal_el, ring_type))
