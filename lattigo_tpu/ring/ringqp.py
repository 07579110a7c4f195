"""Product ring R_Q × R_P used by all key material and key switching.

TPU-native analog of the reference's ``ring/ringqp`` package: a QP
polynomial is a pair of residue tensors (one per chain). ``p`` may be
``None`` when the parameter set has no auxiliary P basis, mirroring the
reference's nil RingP handling.

A :class:`QPPoly` is a NamedTuple so it is automatically a JAX pytree;
all ops are pure functions broadcasting over leading batch axes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from lattigo_tpu.ring import modops, sampling
from lattigo_tpu.ring import automorphism as auto_mod


class QPPoly(NamedTuple):
    """Pair of residue tensors: q: u64[..., lq+1, N], p: u64[..., LP, N]|None."""

    q: jax.Array
    p: Optional[jax.Array] = None


class RingQP:
    """Paired-op dispatcher over (ring_q, ring_p); analog of ringqp.Ring.

    ``level_q`` arguments are static ints selecting the Q-chain prefix; the
    P chain is always used in full (matching ref ringqp/operations.go).
    """

    def __init__(self, ring_q, ring_p=None):
        self.ring_q = ring_q
        self.ring_p = ring_p

    def _map(self, fq, fp, *polys: QPPoly) -> QPPoly:
        q = fq(*[x.q for x in polys])
        p = None
        if self.ring_p is not None and polys[0].p is not None:
            p = fp(*[x.p for x in polys])
        return QPPoly(q, p)

    # -- arithmetic -----------------------------------------------------------

    def add(self, a: QPPoly, b: QPPoly, level_q: int | None = None) -> QPPoly:
        return self._map(
            lambda x, y: self.ring_q.add(x, y, level_q),
            lambda x, y: self.ring_p.add(x, y),
            a, b,
        )

    def add_lazy(self, a: QPPoly, b: QPPoly) -> QPPoly:
        return self._map(lambda x, y: x + y, lambda x, y: x + y, a, b)

    def sub(self, a: QPPoly, b: QPPoly, level_q: int | None = None) -> QPPoly:
        return self._map(
            lambda x, y: self.ring_q.sub(x, y, level_q),
            lambda x, y: self.ring_p.sub(x, y),
            a, b,
        )

    def neg(self, a: QPPoly, level_q: int | None = None) -> QPPoly:
        return self._map(
            lambda x: self.ring_q.neg(x, level_q),
            lambda x: self.ring_p.neg(x),
            a,
        )

    def mform(self, a: QPPoly, level_q: int | None = None) -> QPPoly:
        return self._map(
            lambda x: self.ring_q.mform(x, level_q),
            lambda x: self.ring_p.mform(x),
            a,
        )

    def mul_mont(self, a: QPPoly, b: QPPoly, level_q: int | None = None) -> QPPoly:
        return self._map(
            lambda x, y: self.ring_q.mul_mont(x, y, level_q),
            lambda x, y: self.ring_p.mul_mont(x, y),
            a, b,
        )

    def mul_mont_lazy(self, a: QPPoly, b: QPPoly, level_q: int | None = None) -> QPPoly:
        return self._map(
            lambda x, y: self.ring_q.mul_mont_lazy(x, y, level_q),
            lambda x, y: self.ring_p.mul_mont_lazy(x, y),
            a, b,
        )

    def imform(self, a: QPPoly, level_q: int | None = None) -> QPPoly:
        return self._map(
            lambda x: self.ring_q.imform(x, level_q),
            lambda x: self.ring_p.imform(x), a)

    def reduce(self, a: QPPoly, level_q: int | None = None) -> QPPoly:
        return self._map(
            lambda x: self.ring_q.reduce(x, level_q),
            lambda x: self.ring_p.reduce(x),
            a,
        )

    def reduce_lazy(self, a: QPPoly, level_q: int | None = None) -> QPPoly:
        lq = self.ring_q._lvl(level_q) + 1
        out_q = modops.bred_add_lazy(a.q, self.ring_q.q[:lq], self.ring_q.bred_hi[:lq])
        out_p = None
        if self.ring_p is not None and a.p is not None:
            out_p = modops.bred_add_lazy(a.p, self.ring_p.q, self.ring_p.bred_hi)
        return QPPoly(out_q, out_p)

    # -- NTT ------------------------------------------------------------------

    def ntt(self, a: QPPoly, level_q: int | None = None, lazy: bool = False) -> QPPoly:
        return self._map(
            lambda x: self.ring_q.ntt(x, level_q, lazy=lazy),
            lambda x: self.ring_p.ntt(x, lazy=lazy),
            a,
        )

    def intt(self, a: QPPoly, level_q: int | None = None, lazy: bool = False) -> QPPoly:
        return self._map(
            lambda x: self.ring_q.intt(x, level_q, lazy=lazy),
            lambda x: self.ring_p.intt(x, lazy=lazy),
            a,
        )

    # -- automorphism (NTT domain: pure gather on both parts) -----------------

    def automorphism_ntt(self, a: QPPoly, gal_el: int) -> QPPoly:
        idx = auto_mod.ntt_index(self.ring_q.n, gal_el, self.ring_q.ring_type)
        p = None if a.p is None else auto_mod.apply_ntt(a.p, idx)
        return QPPoly(auto_mod.apply_ntt(a.q, idx), p)

    # -- sampling --------------------------------------------------------------

    def uniform(self, key, level_q: int | None = None,
                batch: tuple[int, ...] = ()) -> QPPoly:
        if self.ring_p is None:
            return QPPoly(sampling.uniform(key, self.ring_q, level_q, batch))
        kq, kp = jax.random.split(key)
        return QPPoly(
            sampling.uniform(kq, self.ring_q, level_q, batch),
            sampling.uniform(kp, self.ring_p, None, batch),
        )

    def lift_signed(self, x, level_q: int | None = None) -> QPPoly:
        """Lift ONE signed int64[..., N] vector into both chains."""
        p = None
        if self.ring_p is not None:
            p = sampling.lift_signed(self.ring_p, x)
        return QPPoly(sampling.lift_signed(self.ring_q, x, level_q), p)

    def sample_signed(self, key, dist, level_q: int | None = None,
                      batch: tuple[int, ...] = ()) -> QPPoly:
        """Sample a small signed poly once and lift to QP (ternary/gaussian)."""
        x = sampling.signed(key, self.ring_q.n, dist, batch)
        return self.lift_signed(x, level_q)

    # -- shape helpers ----------------------------------------------------------

    def at_level(self, a: QPPoly, level_q: int) -> QPPoly:
        return QPPoly(a.q[..., : level_q + 1, :], a.p)

    def zero(self, level_q: int | None = None, batch: tuple[int, ...] = ()) -> QPPoly:
        p = None if self.ring_p is None else self.ring_p.zero(batch=batch)
        return QPPoly(self.ring_q.zero(level_q, batch), p)


def stack(polys: list[QPPoly], axis: int = 0) -> QPPoly:
    """Stack QP polys along a new leading axis (e.g. gadget digits)."""
    q = jnp.stack([x.q for x in polys], axis=axis)
    p = None
    if polys[0].p is not None:
        p = jnp.stack([x.p for x in polys], axis=axis)
    return QPPoly(q, p)
