"""Coefficient-axis ("sequence-parallel") sharded NTT over a device mesh.

The intra-chip NTT (:mod:`lattigo_tpu.ring.ntt`) is limb-local; this module
shards the COEFFICIENT axis across devices — the analog slot of
ring-attention/sequence parallelism for this domain (SURVEY.md §2.7) and
the latency-mode option for logN ≥ 16 rings (SURVEY.md §7 step 7).

Structure: Cooley–Tukey stage s pairs coefficients at distance N/2^{s+1}.
With N/D contiguous coefficients per device, the FIRST log2(D) forward
stages are cross-device — each is ONE pairwise chunk exchange
(``lax.ppermute`` with partner d ⊕ D/2^{s+1``} — a butterfly all-to-all
riding ICI) followed by a local Harvey butterfly against a per-device
scalar twiddle. All remaining stages are device-local with per-device
slices of the same bit-reversed root tables, so the result is BIT-EXACT
equal to the single-device NTT (same expression tree per coefficient).
The inverse runs the mirror schedule (local stages first, then log2(D)
exchanges), finishing with the N^{-1} Montgomery multiply.

Total communication: log2(D) × (local chunk) per direction — the minimum
for a distance-halving butterfly network.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lattigo_tpu.ring import modops
from lattigo_tpu.ring.ntt import _fwd_stage_ws, _inv_stage_ws
from lattigo_tpu.ring.modops import cred, mred, mred_lazy


def _exchange(xl, axis: str, dist: int, n_dev: int):
    """Pairwise chunk swap with partner device d ⊕ dist."""
    perm = [(i, i ^ dist) for i in range(n_dev)]
    return lax.ppermute(xl, axis, perm)


def _dslice(tab, off, size: int):
    """dynamic_slice of [L, N] root table: [L, size] at traced offset."""
    return lax.dynamic_slice(
        tab, (jnp.int32(0), jnp.asarray(off, jnp.int32)),
        (tab.shape[0], size))


def ntt_sharded(ring, x, mesh: Mesh, axis: str, lazy: bool = False):
    """Forward negacyclic NTT of x u64[..., L, N] with the last axis sharded
    over mesh axis ``axis``. Bit-exact vs ``ring.ntt``."""
    n = ring.n
    logn = ring.log_n
    n_dev = mesh.shape[axis]
    log_d = n_dev.bit_length() - 1
    assert 1 << log_d == n_dev and n_dev <= n
    roots, q, qinv = ring.roots, ring.q, ring.qinv
    q2 = q + q
    ndim = x.ndim
    spec = P(*([None] * (ndim - 1) + [axis]))

    def local(xl):
        d = lax.axis_index(axis)
        # cross-device stages: s = 0 .. log_d-1
        for s in range(log_d):
            dist = n_dev >> (s + 1)
            other = _exchange(xl, axis, dist, n_dev)
            m = 1 << s
            g = d >> (log_d - s)            # group index of this chunk
            w = _dslice(roots, m + g, 1)
            is_hi = (d & dist) != 0         # this chunk is the x1 half
            x0 = jnp.where(is_hi, other, xl)
            x1 = jnp.where(is_hi, xl, other)
            x0 = jnp.where(x0 >= q2, x0 - q2, x0)
            v = mred_lazy(x1, w, q, qinv)
            xl = jnp.where(is_hi, x0 - v + q2, x0 + v)
        # local stages: s = log_d .. logn-1
        for s in range(log_d, logn):
            m = 1 << s
            m_loc = m >> log_d
            off = m + d * m_loc
            w = _dslice(roots, off, m_loc)[..., None]
            xl = _fwd_stage_ws(xl, w, q2, q, qinv, m_loc)
        if lazy:
            return xl
        xl = jnp.where(xl >= q2, xl - q2, xl)
        return cred(xl, q)

    return shard_map(local, mesh=mesh, in_specs=spec, out_specs=spec)(x)


def intt_sharded(ring, x, mesh: Mesh, axis: str, level: int | None = None,
                 lazy: bool = False):
    """Inverse negacyclic NTT (mirror schedule). Bit-exact vs ``ring.intt``."""
    del level  # tables pre-sliced by the caller's ring level view
    n = ring.n
    logn = ring.log_n
    n_dev = mesh.shape[axis]
    log_d = n_dev.bit_length() - 1
    assert 1 << log_d == n_dev and n_dev <= n
    iroots, ninv, q, qinv = ring.iroots, ring.ninv, ring.q, ring.qinv
    q2 = q + q
    ndim = x.ndim
    spec = P(*([None] * (ndim - 1) + [axis]))

    def local(xl):
        d = lax.axis_index(axis)
        for s in range(logn - 1, log_d - 1, -1):
            m = 1 << s
            m_loc = m >> log_d
            off = m + d * m_loc
            w = _dslice(iroots, off, m_loc)[..., None]
            xl = _inv_stage_ws(xl, w, q2, q, qinv, m_loc)
        for s in range(log_d - 1, -1, -1):
            dist = n_dev >> (s + 1)
            other = _exchange(xl, axis, dist, n_dev)
            m = 1 << s
            g = d >> (log_d - s)
            w = _dslice(iroots, m + g, 1)
            is_hi = (d & dist) != 0
            x0 = jnp.where(is_hi, other, xl)
            x1 = jnp.where(is_hi, xl, other)
            y0 = x0 + x1
            y0 = jnp.where(y0 >= q2, y0 - q2, y0)
            y1 = mred_lazy(x0 - x1 + q2, w, q, qinv)
            xl = jnp.where(is_hi, y1, y0)
        if lazy:
            return mred_lazy(xl, ninv, q, qinv)
        return mred(xl, ninv, q, qinv)

    return shard_map(local, mesh=mesh, in_specs=spec, out_specs=spec)(x)


def negacyclic_mul_sharded(ring, a, b, mesh: Mesh, axis: str):
    """Full sharded pointwise pipeline: NTT(a)·NTT(b) → INTT, coefficient
    axis sharded end-to-end (the mul itself is embarrassingly local)."""
    fa = ntt_sharded(ring, a, mesh, axis)
    fb = ntt_sharded(ring, b, mesh, axis)
    q, qinv = ring.q, ring.qinv
    ndim = a.ndim
    spec = P(*([None] * (ndim - 1) + [axis]))
    prod = shard_map(
        lambda x, y: mred(modops.mform(x, q, ring.bred_hi, ring.bred_lo), y,
                          q, qinv),
        mesh=mesh, in_specs=(spec, spec), out_specs=spec)(fa, fb)
    return intt_sharded(ring, prod, mesh, axis)
