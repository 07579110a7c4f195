"""Negacyclic NTT / INTT as shape-static vectorised JAX programs.

TPU-native re-design of the reference's radix-2 lazy NTT
(``ring/ntt.go:223-553``). Instead of hand-unrolled in-place scalar loops,
every butterfly stage is a whole-array reshape + fused vector expression:
at stage ``s`` the coefficient axis is viewed as ``[m, 2, t]`` (``m = 2^s``
groups, ``t = N/2m`` pair stride) and one lazy Harvey butterfly is applied
across the whole tensor. logN stages unroll at trace time; XLA fuses each
stage into a handful of VPU loops.

Laziness discipline (Harvey): forward butterflies keep coefficients in
[0, 4q); the inverse keeps them in [0, 2q). ``q < 2^61`` guarantees no u64
overflow. Root tables are bit-reverse-ordered powers of the 2N-th root, in
Montgomery form (host precompute in :mod:`lattigo_tpu.ring.ring`).

Ordering convention: ``ntt`` maps natural coefficient order to bit-reversed
evaluation order; ``intt`` inverts it. All NTT-domain ops (pointwise mul,
automorphisms) consistently use this ordering.
"""

from __future__ import annotations

import jax.numpy as jnp

from lattigo_tpu.ring.modops import cred, mred, mred_lazy


def bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def _fwd_stage_ws(x, w, q2, q, qinv, m: int):
    """One forward CT stage, m groups, explicit roots slice w [..., m, 1]."""
    n = x.shape[-1]
    t = n // (2 * m)
    shape = x.shape
    xv = x.reshape(shape[:-1] + (m, 2, t))
    x0 = xv[..., 0, :]
    x1 = xv[..., 1, :]
    q2e = q2[..., None]                             # [L, 1, 1] vs data [L, m, t]
    x0 = jnp.where(x0 >= q2e, x0 - q2e, x0)         # [0, 2q)
    v = mred_lazy(x1, w, q[..., None], qinv[..., None])  # [0, 2q)
    y0 = x0 + v                                     # [0, 4q)
    y1 = x0 - v + q2e                               # [0, 4q)
    return jnp.stack([y0, y1], axis=-2).reshape(shape)


def _fwd_stage(x, roots, q2, q, qinv, m: int, n: int):
    """One forward CT stage over trailing axis of length n, m groups.

    Roots slice for stage m: psi^{brev} entries [m, 2m)."""
    return _fwd_stage_ws(x, roots[..., m : 2 * m, None], q2, q, qinv, m)


def _inv_stage_ws(x, w, q2, q, qinv, m: int):
    """One inverse GS stage, m groups, explicit roots slice w [..., m, 1]."""
    n = x.shape[-1]
    t = n // (2 * m)
    shape = x.shape
    xv = x.reshape(shape[:-1] + (m, 2, t))
    x0 = xv[..., 0, :]
    x1 = xv[..., 1, :]
    q2e = q2[..., None]
    y0 = x0 + x1                                    # [0, 4q)
    y0 = jnp.where(y0 >= q2e, y0 - q2e, y0)         # [0, 2q)
    y1 = mred_lazy(x0 - x1 + q2e, w, q[..., None], qinv[..., None])  # [0, 2q)
    return jnp.stack([y0, y1], axis=-2).reshape(shape)


def _inv_stage(x, iroots, q2, q, qinv, m: int, n: int):
    """One inverse GS stage, m groups (mirrors forward stage m)."""
    return _inv_stage_ws(x, iroots[..., m : 2 * m, None], q2, q, qinv, m)


def ntt(x, roots, q, qinv, logn: int, lazy: bool = False):
    """Forward negacyclic NTT.

    Args:
      x:      uint64[..., L, N] coefficients in [0, q) (or [0, 2q) accepted).
      roots:  uint64[L, N] bit-reversed 2N-th root powers, Montgomery form.
      q:      uint64[L, 1]; qinv: uint64[L, 1] (q^{-1} mod 2^64).
      logn:   static log2(N).
      lazy:   if True output stays in [0, 4q) (ref NTTLazy).

    Returns NTT(x) in bit-reversed evaluation order.
    """
    n = 1 << logn
    q2 = q + q
    for s in range(logn):
        x = _fwd_stage(x, roots, q2, q, qinv, 1 << s, n)
    if lazy:
        return x
    x = jnp.where(x >= q2, x - q2, x)
    return cred(x, q)


def intt(x, iroots, ninv_mont, q, qinv, logn: int, lazy: bool = False):
    """Inverse negacyclic NTT; input bit-reversed order, output natural.

    ninv_mont: uint64[L, 1] — N^{-1} mod q in Montgomery form; the final
    Montgomery multiply both scales by N^{-1} and exits any laziness.
    """
    n = 1 << logn
    q2 = q + q
    for s in range(logn - 1, -1, -1):
        x = _inv_stage(x, iroots, q2, q, qinv, 1 << s, n)
    if lazy:
        return mred_lazy(x, ninv_mont, q, qinv)
    return mred(x, ninv_mont, q, qinv)
