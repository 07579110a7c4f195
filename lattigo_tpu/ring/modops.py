"""64-bit modular arithmetic primitives as vectorised JAX ops.

Functional analog of the reference's scalar kernels in
``ring/modular_reduction.go`` (MForm/MRed/BRed/BRedAdd/CRed) and the
unrolled vector loops in ``ring/vec_ops.go`` — but expressed as whole-array
jnp ops so XLA fuses them. TPUs have no native 64×64→128 multiplier, so the
128-bit products every reduction needs are built from a 32-bit-split
``mul_hi``; XLA further lowers each u64 op onto u32 pairs.

Conventions (all functions broadcast; ``q`` and its constants are typically
``uint64[L, 1]`` against data ``uint64[..., L, N]``):

* ``q`` is an odd prime ``< 2^61``.
* ``qinv``  = q^{-1} mod 2^64                       (host: :func:`gen_mred_constant`)
* ``bred``  = (⌊2^128/q⌋ >> 64, ⌊2^128/q⌋ mod 2^64) (host: :func:`gen_bred_constant`)
* "M-form" means the Montgomery representation a·2^64 mod q.
* "lazy" outputs live in [0, 2q) instead of [0, q).
"""

from __future__ import annotations

import jax.numpy as jnp

U64 = jnp.uint64
_MASK32 = jnp.uint64(0xFFFFFFFF)
_SH32 = jnp.uint64(32)


# ---------------------------------------------------------------------------
# Host-side constant generation
# ---------------------------------------------------------------------------

def gen_mred_constant(q: int) -> int:
    """q^{-1} mod 2^64 (Montgomery constant; ref ring/modular_reduction.go:68)."""
    return pow(q, -1, 1 << 64)


def gen_bred_constant(q: int) -> tuple[int, int]:
    """(hi, lo) words of ⌊2^128 / q⌋ (Barrett; ref ring/modular_reduction.go:99)."""
    u = (1 << 128) // q
    return (u >> 64) & 0xFFFFFFFFFFFFFFFF, u & 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# 128-bit product building blocks
# ---------------------------------------------------------------------------

def mul_hi(a, b):
    """High 64 bits of the 128-bit product a*b (u64 inputs)."""
    a0 = a & _MASK32
    a1 = a >> _SH32
    b0 = b & _MASK32
    b1 = b >> _SH32
    m00 = a0 * b0
    m01 = a0 * b1
    m10 = a1 * b0
    carry = ((m00 >> _SH32) + (m01 & _MASK32) + (m10 & _MASK32)) >> _SH32
    return a1 * b1 + (m01 >> _SH32) + (m10 >> _SH32) + carry


# ---------------------------------------------------------------------------
# Reductions
# ---------------------------------------------------------------------------

def cred(a, q):
    """Conditional subtraction: a mod q for a in [0, 2q)."""
    return jnp.where(a >= q, a - q, a)


def bred_add(a, q, bred_hi):
    """a mod q for any a < 2^64 (single-word Barrett, ref :110 BRedAdd)."""
    quo = mul_hi(a, bred_hi)
    return cred(a - quo * q, q)


def bred_add_lazy(a, q, bred_hi):
    """a mod q up to one extra q: output in [0, 2q)."""
    quo = mul_hi(a, bred_hi)
    return a - quo * q


def mform(a, q, bred_hi, bred_lo):
    """Montgomery form a·2^64 mod q via 128-bit Barrett (ref :11 MForm).

    Valid for a in [0, q).
    """
    # qhat ≈ ⌊a·⌊2^128/q⌋ / 2^64⌋, correct mod 2^64 (underestimates by ≤ 2).
    qhat = a * bred_hi + mul_hi(a, bred_lo)
    r = jnp.uint64(0) - qhat * q  # a·2^64 - qhat·q  (mod 2^64), true value < 3q
    return cred(cred(r, q + q), q)


def mform_lazy(a, q, bred_hi, bred_lo):
    """Montgomery form, output in [0, 3q)."""
    qhat = a * bred_hi + mul_hi(a, bred_lo)
    return jnp.uint64(0) - qhat * q


def imform(a, q, qinv):
    """Leave Montgomery form: a·2^{-64} mod q (ref :58 IMForm). a in [0, q)."""
    # Montgomery reduction of the single word a.
    m = a * qinv
    h = mul_hi(m, q)
    return cred(q - h, q)  # (a - m·q)/2^64 = -hi(m·q) + (a!=0); equals q-h or 0


SMALL_Q_BITS = 30


def _is_small(q) -> bool:
    """True iff every modulus in the (trace-time constant) table is < 2^30.

    Modulus tables are stored as NUMPY host arrays precisely so this stays
    a static (concrete) dispatch under tracing — jax ≥ 0.9 turns any op on
    a jnp closure constant into a tracer, and probing a tracer both loses
    the fast path and costs O(jaxpr) per call in exception bookkeeping.
    A traced table falls back to the generic path WITHOUT constructing the
    (expensive) concretization error.
    """
    import numpy as _np
    if not isinstance(q, (_np.ndarray, _np.generic, int)):
        return False  # traced value: generic path
    return int(_np.max(_np.asarray(q))) < (1 << SMALL_Q_BITS)


def _mred32_lazy(a, b, q, qinv32):
    """a·b·2^{-32} mod q in [0, 2q) for q < 2^30, a·b < q·2^32.

    All products fit u64 (the whole point): one multiply replaces each
    16-bit-split mul_hi of the generic path. Low words of ab and m·q are
    exactly equal (Montgomery identity), so the high words subtract without
    borrow.
    """
    ab = a * b
    hi = ab >> _SH32
    m = ((ab & _MASK32) * qinv32) & _MASK32
    mh = (m * q) >> _SH32
    return hi - mh + q


def _mred_small_lazy(a, b, q, qinv):
    """a·b·2^{-64} via two cascaded 32-bit Montgomery steps (q < 2^30).

    Same contract and M-form convention (R = 2^64) as :func:`mred_lazy`;
    ~2x fewer multiplies. Requires a < 4q, b < q (the callers' invariant).
    """
    qinv32 = qinv & _MASK32  # q^{-1} mod 2^32 is the low word of mod 2^64
    y = _mred32_lazy(a, b, q, qinv32)            # a·b·2^{-32}, [0, 2q)
    return _mred32_lazy(y, jnp.uint64(1), q, qinv32)  # ×2^{-32}, [0, 2q)


def mred(a, b, q, qinv):
    """Montgomery product a·b·2^{-64} mod q, output in [0, q).

    Requires a·b < q·2^64 (always true when a < 2q... precisely when
    a, b < 2^63 and q < 2^61; callers keep one operand in M-form < q and the
    other < 4q).  Ref ring/modular_reduction.go:78.
    """
    if _is_small(q):
        return cred(_mred_small_lazy(a, b, q, qinv), q)
    hi = mul_hi(a, b)
    m = (a * b) * qinv
    h = mul_hi(m, q)
    return cred(hi - h + q, q)


def mred_lazy(a, b, q, qinv):
    """Montgomery product with lazy output in [0, 2q) (ref :90 MRedLazy)."""
    if _is_small(q):
        return _mred_small_lazy(a, b, q, qinv)
    hi = mul_hi(a, b)
    m = (a * b) * qinv
    h = mul_hi(m, q)
    return hi - h + q


def mred_wide(a, b, q, qinv):
    """Montgomery product for a WIDE left operand: a·b·2^{-64} mod q with
    only a·b < q·2^64 required (no a < 4q caller invariant), output [0, q).

    Always takes the generic 64-bit path: the small-modulus cascade of
    :func:`mred` assumes a < 4q and silently corrupts wider operands —
    callers that feed accumulator-range values (e.g. the u64 MXU NTT's
    digit recombination, where a ≈ 2^50 regardless of q) must use this.
    """
    hi = mul_hi(a, b)
    m = (a * b) * qinv
    h = mul_hi(m, q)
    return cred(hi - h + q, q)


def bred_mul(a, b, q, bred_hi, bred_lo):
    """Full Barrett product a·b mod q for a, b in [0, 2^63) (ref :127 BRed)."""
    mhi = mul_hi(a, b)
    mlo = a * b
    # qhat = ⌊(mhi·2^64 + mlo)·u / 2^128⌋ mod 2^64, u = bred_hi·2^64 + bred_lo
    qhat = mhi * bred_hi + mul_hi(mhi, bred_lo) + mul_hi(mlo, bred_hi)
    r = mlo - qhat * q
    return cred(cred(r, q + q), q)


# ---------------------------------------------------------------------------
# Elementwise modular vector ops (ref ring/vec_ops.go)
# ---------------------------------------------------------------------------

def add_mod(a, b, q):
    return cred(a + b, q)

def add_lazy(a, b):
    return a + b

def sub_mod(a, b, q):
    return cred(a - b + q, q)

def neg_mod(a, q):
    return jnp.where(a == 0, a, q - a)

def double_mod(a, q):
    return cred(a + a, q)

def mul_mont(a, b, q, qinv):
    """a·b with b in M-form → normal form, in [0, q)."""
    return mred(a, b, q, qinv)

def mul_mont_lazy(a, b, q, qinv):
    return mred_lazy(a, b, q, qinv)

def mul_scalar_mont(a, s_mform, q, qinv):
    """a·s for a scalar already in M-form (broadcasts)."""
    return mred(a, s_mform, q, qinv)


def lazy_tree_sum(t, q, bred_hi, margin: int):
    """Reduce axis 0 of lazy (< 2q) values with periodic Barrett reduction.

    Sums chunks of up to `margin` terms in plain u64 (margin·2q < 2^64 by
    construction — the caller derives margin from the largest modulus, ref
    QiOverflowMargin) and lazy-reduces between rounds. Zero-padding is safe
    (0 is a fixed point of the reduction). One fused op per round instead
    of a Python-level accumulate chain — this is the inner loop of every
    gadget product and BSGS matrix MAC.
    """
    b = t.shape[0]
    while b > 1:
        k = min(max(2, margin), b)
        rem = (-b) % k
        if rem:
            t = jnp.concatenate(
                [t, jnp.zeros((rem,) + t.shape[1:], t.dtype)], axis=0)
        t = t.reshape((t.shape[0] // k, k) + t.shape[1:]).sum(axis=1)
        t = bred_add_lazy(t, q, bred_hi)
        b = t.shape[0]
    return t[0]
