"""Fused negacyclic NTT/INTT as a single Pallas TPU kernel (u32 engine).

The XLA stage-by-stage NTT (:mod:`lattigo_tpu.ring.ntt`) materialises the
whole tensor between stages: logN HBM round trips. This kernel keeps a
row-tile resident in VMEM across ALL stages — one read, one write — and
replaces the emulated 64-bit modular arithmetic with native 32-bit lane
math (Montgomery with R = 2^32, 16-bit-split mulhi), which is what the
TPU's VPU actually executes. Requires primes q < 2^30 (lazy [0,4q) bound
must fit u32); the ring layer auto-dispatches here for such chains and
falls back to the u64 XLA path otherwise.

Butterflies are expressed in a roll-select form that avoids sub-lane
reshapes entirely (Mosaic-friendly at every stage size):

    u  = MRedLazy(x, w_s)         # w_s = stage-s root at upper positions
    y  = lower ? x + roll(u, -t)  :  roll(x, +t) - u + 2q

with per-stage root vectors precomputed on host ([logN, N] per prime).

Ref: ring/ntt.go:223-553 (lazy radix-2 Harvey NTT; redesigned, not
translated — the reference is an in-place scalar loop).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lattigo_tpu.ring.ntt import bit_reverse

MAX_Q_BITS = 30  # 4q must fit in u32


def _mform32(a: int, q: int) -> int:
    return (a << 32) % q


def gen_stage_roots(n: int, psi: int, q: int, inverse: bool) -> np.ndarray:
    """[logN, N] u32 per-stage root vectors in execution order.

    Stage with m groups (pair stride t = N/2m): positions p = g·2t + h·t + j;
    upper (h=1) positions carry MForm32(psi^brev(m+g)), lower carry 0.
    Forward executes m = 1, 2, …, N/2; inverse executes m = N/2, …, 2, 1
    with psi^{-1}.
    """
    logn = n.bit_length() - 1
    base = pow(psi, -1, q) if inverse else psi
    pows = np.zeros(n, dtype=np.uint64)
    p = 1
    for j in range(n):
        pows[j] = p
        p = p * base % q
    out = np.zeros((logn, n), dtype=np.uint32)
    ms = [1 << s for s in range(logn)]
    if inverse:
        ms = ms[::-1]
    for si, m in enumerate(ms):
        t = n // (2 * m)
        for g in range(m):
            w = _mform32(int(pows[bit_reverse(m + g, logn)]), q)
            lo = g * 2 * t + t
            out[si, lo : lo + t] = w
    return out


# ---------------------------------------------------------------------------
# In-kernel u32 modular arithmetic
# ---------------------------------------------------------------------------

_M16 = 0xFFFF  # python int: weak-typed, avoids captured device constants


def _mulhi32(a, b):
    ah, al = a >> 16, a & _M16
    bh, bl = b >> 16, b & _M16
    m1 = ah * bl
    m2 = al * bh
    t1 = ((al * bl) >> 16) + (m1 & _M16) + (m2 & _M16)
    return ah * bh + (m1 >> 16) + (m2 >> 16) + (t1 >> 16)


def _mred_lazy32(a, b, q, qinv):
    """a·b·2^{-32}, output [0, 2q); needs a·b < q·2^32."""
    hi = _mulhi32(a, b)
    m = (a * b) * qinv
    mh = _mulhi32(m, q)
    return hi - mh + q


def _roll(x, shift: int):
    """Circular roll along the last axis (lane dimension).

    pltpu.roll requires a non-negative shift; negative shifts are taken
    mod the axis length (np.roll semantics).
    """
    n = x.shape[-1]
    # np.int32: under x64 a bare python int lowers to an i64 scalar, which
    # tpu.dynamic_rotate rejects.
    return pltpu.roll(x, shift=np.int32(shift % n), axis=x.ndim - 1)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _ntt_kernel(q_ref, qinv_ref, x_ref, w_ref, o_ref, *, logn: int, lazy: bool,
                limb_lo: int):
    n = 1 << logn
    limb = pl.program_id(0) + limb_lo
    q = q_ref[limb, 0]
    qinv = qinv_ref[limb, 0]
    q2 = q + q
    x = x_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
    for s in range(logn):
        t = n >> (s + 1)
        w = w_ref[0, s, :]
        x = jnp.where(x >= q2, x - q2, x)              # [0, 2q)
        u = _mred_lazy32(x, w[None, :], q, qinv)       # upper: w·x1, [0, 2q)
        um = _roll(u, -t)                              # at lower p: u[p+t]
        xp = _roll(x, t)                               # at upper p: x[p-t]
        is_lower = (lane & t) == 0
        x = jnp.where(is_lower, x + um, xp - u + q2)   # [0, 4q)
    if not lazy:
        x = jnp.where(x >= q2, x - q2, x)
        x = jnp.where(x >= q, x - q, x)
    o_ref[0] = x


def _intt_kernel(q_ref, qinv_ref, ninv_ref, x_ref, w_ref, o_ref, *,
                 logn: int, lazy: bool, limb_lo: int):
    n = 1 << logn
    limb = pl.program_id(0) + limb_lo
    q = q_ref[limb, 0]
    qinv = qinv_ref[limb, 0]
    ninv = ninv_ref[limb, 0]
    q2 = q + q
    x = x_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
    for si in range(logn):
        t = 1 << si                                    # m = n/2t
        w = w_ref[0, si, :]
        xm = _roll(x, -t)                              # at lower p: x1
        xp = _roll(x, t)                               # at upper p: x0
        ssum = x + xm                                  # [0, 4q)
        ssum = jnp.where(ssum >= q2, ssum - q2, ssum)  # [0, 2q)
        sdif = _mred_lazy32(xp - x + q2, w[None, :], q, qinv)
        is_lower = (lane & t) == 0
        x = jnp.where(is_lower, ssum, sdif)            # [0, 2q)
    x = _mred_lazy32(x, ninv, q, qinv)                 # ×N^{-1}, exit M-form
    if not lazy:
        x = jnp.where(x >= q, x - q, x)
    o_ref[0] = x


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------

class NTTPallas:
    """Per-Ring u32 table pack + jittable fused NTT/INTT entry points."""

    def __init__(self, n: int, moduli: list[int], psis: list[int]):
        assert all(q < (1 << MAX_Q_BITS) for q in moduli)
        self.n = n
        self.logn = n.bit_length() - 1
        L = len(moduli)
        self.q32 = jnp.asarray(
            np.array(moduli, dtype=np.uint32).reshape(L, 1))
        self.qinv32 = jnp.asarray(np.array(
            [pow(q, -1, 1 << 32) for q in moduli],
            dtype=np.uint32).reshape(L, 1))
        self.ninv32 = jnp.asarray(np.array(
            [_mform32(pow(n, -1, q), q) for q in moduli],
            dtype=np.uint32).reshape(L, 1))
        self.wfwd = jnp.asarray(np.stack(
            [gen_stage_roots(n, psi, q, inverse=False)
             for psi, q in zip(psis, moduli)]))          # [L, logN, N]
        self.winv = jnp.asarray(np.stack(
            [gen_stage_roots(n, psi, q, inverse=True)
             for psi, q in zip(psis, moduli)]))

    def _call(self, x, limb_lo: int, kernel, tables, w, interpret: bool):
        """x: u64[..., l, N] → same shape/dtype via the u32 kernel.

        Data is transposed limb-major ([l, r, N]) so the row-tile block
        (1, TB, N) satisfies Mosaic's (8, 128) minor-dims constraint.
        """
        shape = x.shape
        l = shape[-2]
        n = shape[-1]
        r = 1
        for d in shape[:-2]:
            r *= d
        x32 = jnp.moveaxis(x.reshape(r, l, n), 1, 0).astype(jnp.uint32)
        # TB=16 measured ~15% faster than 8 at logN=14 on v5e. Mosaic wants
        # the block's sublane dim divisible by 8 OR equal to the array dim,
        # so odd row counts fall back to one whole-array block.
        tb = 16
        while r % tb:
            tb //= 2
        if tb < 8 and tb != r:
            tb = r
        grid = (l, r // tb)
        # index maps must produce i32 (x64 mode turns bare int literals into
        # i64, which Mosaic's func.return cannot legalize)
        z = np.int32(0)
        lo = np.int32(limb_lo)
        L = tables[0].shape[0]
        scalar_specs = [
            pl.BlockSpec((L, 1), lambda j, i: (z, z), memory_space=pltpu.SMEM)
            for _ in tables
        ]
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((l, r, n), jnp.uint32),
            grid=grid,
            in_specs=scalar_specs + [
                pl.BlockSpec((1, tb, n), lambda j, i: (j, i, z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, self.logn, n), lambda j, i: (j + lo, z, z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tb, n), lambda j, i: (j, i, z),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*tables, x32, w)
        return jnp.moveaxis(out, 0, 1).astype(jnp.uint64).reshape(shape)

    def ntt(self, x, level: int, lazy: bool = False, interpret: bool = False):
        k = functools.partial(_ntt_kernel, logn=self.logn, lazy=lazy, limb_lo=0)
        return self._call(x, 0, k, (self.q32, self.qinv32), self.wfwd,
                          interpret)

    def intt(self, x, level: int, lazy: bool = False, interpret: bool = False):
        k = functools.partial(_intt_kernel, logn=self.logn, lazy=lazy,
                              limb_lo=0)
        return self._call(x, 0, k, (self.q32, self.qinv32, self.ninv32),
                          self.winv, interpret)

    def ntt_single(self, i: int, x, lazy: bool = False,
                   interpret: bool = False):
        k = functools.partial(_ntt_kernel, logn=self.logn, lazy=lazy,
                              limb_lo=i)
        return self._call(x, i, k, (self.q32, self.qinv32), self.wfwd,
                          interpret)

    def intt_single(self, i: int, x, lazy: bool = False,
                    interpret: bool = False):
        k = functools.partial(_intt_kernel, logn=self.logn, lazy=lazy,
                              limb_lo=i)
        return self._call(x, i, k, (self.q32, self.qinv32, self.ninv32),
                          self.winv, interpret)
