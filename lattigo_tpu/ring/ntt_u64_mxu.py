"""Four-step negacyclic NTT/INTT on the MXU for full-width (< 2^61) primes.

Same factorization and host tables as :mod:`lattigo_tpu.ring.ntt_mxu`
(bit-reversal + psi-twist folded into the constant matrices, bit-exact
with the radix-2 kernels), but for the production big-prime chains
(45-61 bit) where the u32 Pallas kernels don't apply. Runs at the XLA
level — no Pallas:

* operands split into 8 balanced signed base-256 digits (int8);
* the butterfly contractions run as int8 x int8 -> int32 `dot_general`s,
  which XLA lowers onto the systolic array (|P_s| <= 128^2 * 8R < 2^26,
  exact in the MXU's int32 accumulation);
* the 8 digit planes recombine in two i64 halves joined by one u64
  Montgomery multiply with MForm(2^32), plus one Barrett per element;
* the mid-step twiddle is one u64 Montgomery multiply.

Per coefficient that is ~3 u64 modmuls + 2 matmuls instead of logN
emulated-u64 butterflies and logN HBM passes (ref ring/ntt.go:223 for
the reference's scalar loop — redesigned, not translated).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lattigo_tpu.ring import modops
from lattigo_tpu.ring.ntt_mxu import gen_four_step_weights

MAX_Q_BITS = 61
MIN_N = 4096

_U64 = np.uint64


def _mform_int(a: int, q: int) -> int:
    return (a << 64) % q


def _extend_weight8(w: np.ndarray, q: int, contract_first: bool,
                    nd_in: int = 8, nd_out: int = 8) -> np.ndarray:
    """[rows, cols] u64 weight matrix -> [nd_out*r, nd_in*c] int8 of
    balanced digits of (2^{8i} * w) mod q (same layout contract as
    ntt_mxu). ``nd_in`` plane count matches the operand digitization;
    ``nd_out`` covers the reduced weights (< q)."""
    r, c = w.shape
    ext = np.empty((nd_in, r, c), dtype=object)
    wobj = w.astype(object)
    for i in range(nd_in):
        ext[i] = (wobj * ((1 << (8 * i)) % q)) % q
    # balanced signed base-256 digits (object ints -> int8)
    out = np.empty((nd_out, nd_in, r, c), dtype=np.int8)  # [s, i, r, c]
    v = ext
    for s in range(nd_out):
        d = v & 255
        carry = d >> 7
        out[s] = (d - (carry << 8)).astype(np.int64).astype(np.int8)
        v = (v >> 8) + carry
    assert np.all(v == 0), "nd_out too small for modulus width"
    if contract_first:
        # rows (s, out), cols (i, in) with w = [out, in]
        return out.transpose(0, 2, 1, 3).reshape(nd_out * r, nd_in * c)
    # rows (i, in), cols (s, out) with w = [in, out]
    return out.transpose(1, 2, 0, 3).reshape(nd_in * r, nd_out * c)


def _digits8(x, axis: int, nd: int = 8):
    """u64 (< 2^{8·nd−2}) -> nd balanced int8 digit planes on `axis`."""
    planes = []
    v = x
    for _ in range(nd):
        d = v & jnp.uint64(255)
        c = d >> jnp.uint64(7)
        v = (v >> jnp.uint64(8)) + c
        planes.append(
            (d.astype(jnp.int32) - (c << jnp.uint64(8)).astype(jnp.int32))
            .astype(jnp.int8))
    return jnp.concatenate(planes, axis=axis)


def _recombine8(p, axis: int, block: int, q, qinv, m32, c1, bhi, lazy: bool,
                nd: int = 8):
    """Σ_s P_s·2^{8s} mod q from nd int32 digit planes stacked on `axis`
    in blocks of `block`; output [0, q) ([0, 2q) if lazy)."""
    sl = [slice(None)] * p.ndim
    zero = None

    def plane(s):
        nonlocal zero
        if s >= nd:
            if zero is None:
                sl[axis] = slice(0, block)
                zero = jnp.zeros_like(p[tuple(sl)].astype(jnp.int64))
            return zero
        sl[axis] = slice(s * block, (s + 1) * block)
        return p[tuple(sl)].astype(jnp.int64)

    lo = plane(0) + (plane(1) << 8) + (plane(2) << 16) + (plane(3) << 24)
    hi = plane(4) + (plane(5) << 8) + (plane(6) << 16) + (plane(7) << 24)
    # |lo|, |hi| < 2^50; shift by a multiple of q >= 2^50 before going u64
    lou = (lo + c1).astype(jnp.uint64)
    hiu = (hi + c1).astype(jnp.uint64)
    # hiu ≈ 2^50 regardless of q: must be the WIDE Montgomery product —
    # plain mred's small-q (< 2^30) cascade assumes a < 4q and silently
    # corrupts every limb of a mixed-width chain whose prime is small
    # (e.g. N15QP768's 25-bit residual prime)
    t = lou + modops.mred_wide(hiu, m32, q, qinv)  # ≡ lo + 2^32·hi (mod q)
    if lazy:
        return modops.bred_add_lazy(t, q, bhi)
    return modops.bred_add(t, q, bhi)


class NTTMxu64:
    """Per-Ring four-step MXU NTT/INTT for < 2^61 primes (XLA-level)."""

    def __init__(self, n: int, moduli: list[int], psis: list[int]):
        assert all(q < (1 << MAX_Q_BITS) for q in moduli)
        assert n >= MIN_N and n & (n - 1) == 0
        self.n = n
        self.logn = n.bit_length() - 1
        self.cc = max(128, 1 << (self.logn // 2))
        self.rr = n // self.cc
        rr, cc = self.rr, self.cc

        # Per-ring digit-plane counts: the MXU work is nd_in·nd_out planes
        # per butterfly matrix, so chains whose widest prime is below 61
        # bits contract fewer planes (e.g. 7×7 at ≤53-bit, 6×6 at ≤45-bit
        # — a 1.3–1.8× matmul-FLOP cut on production bootstrap chains).
        qbits = max(int(q).bit_length() for q in moduli)
        self.nd_in = min(8, (qbits + 3 + 7) // 8)    # operands < 4q (lazy)
        self.nd_out = min(8, (qbits + 2 + 7) // 8)   # weights reduced < q

        w1f, w2f, w1i, w2i, tf, ti = [], [], [], [], [], []
        consts = np.zeros((len(moduli), 6), dtype=_U64)
        for i, (psi, q) in enumerate(zip(psis, moduli)):
            raw = gen_four_step_weights(n, rr, cc, psi, q)
            nd = dict(nd_in=self.nd_in, nd_out=self.nd_out)
            w1f.append(_extend_weight8(raw["wa"], q, contract_first=True, **nd))
            w2f.append(_extend_weight8(raw["wb"], q, contract_first=False, **nd))
            w1i.append(_extend_weight8(raw["wbi"], q, contract_first=False, **nd))
            w2i.append(_extend_weight8(raw["wai"], q, contract_first=True, **nd))
            mf = np.vectorize(lambda x, qq=q: _mform_int(int(x), qq),
                              otypes=[_U64])
            tf.append(mf(raw["tf"]))
            ti.append(mf(raw["ti"]))
            consts[i, 0] = q
            consts[i, 1] = pow(q, -1, 1 << 64)      # -q^{-1} convention below
            consts[i, 2] = _mform_int((1 << 32) % q, q)
            consts[i, 3] = ((1 << 50) // q + 1) * q  # recombination shift
            consts[i, 4] = modops.gen_bred_constant(q)[0]
        # modops.mred uses qinv = q^{-1} mod 2^64 with the (hi - h + q) form
        self.q = consts[:, 0].copy()
        self.qinv = np.array([pow(int(q), -1, 1 << 64) for q in self.q],
                             dtype=_U64)
        self.m32 = consts[:, 2].copy()
        self.c1 = consts[:, 3].copy().astype(np.int64)
        self.bhi = consts[:, 4].copy()
        self.w1f = jnp.asarray(np.stack(w1f))   # [L, 8R, 8R] int8
        self.w2f = jnp.asarray(np.stack(w2f))   # [L, 8C, 8C]
        self.w1i = jnp.asarray(np.stack(w1i))   # [L, 8C, 8C]
        self.w2i = jnp.asarray(np.stack(w2i))   # [L, 8R, 8R]
        self.tf = jnp.asarray(np.stack(tf))     # [L, R, C] u64 M-form
        self.ti = jnp.asarray(np.stack(ti))

    # Weight stacks are ~L·(8R)²·2 int8 bytes — hundreds of MB at logN≥15.
    # Closed over a jit they lower as HLO constants (inlined per program,
    # exhausting compiler/device memory); long-lived pipelines thread them
    # through the jit boundary as ARGUMENTS via get_tables/set_tables
    # (see BootstrappingEvaluator.jitted big_state).
    table_names = ("w1f", "w2f", "w1i", "w2i", "tf", "ti")

    def get_tables(self):
        return {k: getattr(self, k) for k in self.table_names}

    def set_tables(self, tabs):
        for k, v in tabs.items():
            setattr(self, k, v)

    def _consts(self, s: slice):
        return (self.q[s][:, None, None], self.qinv[s][:, None, None],
                self.m32[s][:, None, None], self.c1[s][:, None, None],
                self.bhi[s][:, None, None])

    def _apply(self, x, s: slice, inverse: bool, lazy: bool):
        shape = x.shape
        n = shape[-1]
        rr, cc = self.rr, self.cc
        x4 = x.reshape(shape[:-1] + (rr, cc))    # [..., l, R, C]
        q, qinv, m32, c1, bhi = self._consts(s)
        ni, no = self.nd_in, self.nd_out
        if inverse:
            d = _digits8(x4, axis=-1, nd=ni)     # [..., l, R, ni·C]
            p = jnp.einsum("...lrc,lcs->...lrs", d, self.w1i[s],
                           preferred_element_type=jnp.int32)
            g = _recombine8(p, -1, cc, q, qinv, m32, c1, bhi, lazy=False,
                            nd=no)
            h = modops.mred(g, self.ti[s], q, qinv)
            d2 = _digits8(h, axis=-2, nd=ni)     # [..., l, ni·R, C]
            p2 = jnp.einsum("lsr,...lrc->...lsc", self.w2i[s], d2,
                            preferred_element_type=jnp.int32)
            v = _recombine8(p2, -2, rr, q, qinv, m32, c1, bhi, lazy, nd=no)
        else:
            d = _digits8(x4, axis=-2, nd=ni)     # [..., l, ni·R, C]
            p = jnp.einsum("lsr,...lrc->...lsc", self.w1f[s], d,
                           preferred_element_type=jnp.int32)
            b = _recombine8(p, -2, rr, q, qinv, m32, c1, bhi, lazy=False,
                            nd=no)
            b = modops.mred(b, self.tf[s], q, qinv)
            d2 = _digits8(b, axis=-1, nd=ni)     # [..., l, R, ni·C]
            p2 = jnp.einsum("...lrc,lcs->...lrs", d2, self.w2f[s],
                            preferred_element_type=jnp.int32)
            v = _recombine8(p2, -1, cc, q, qinv, m32, c1, bhi, lazy, nd=no)
        return v.reshape(shape)

    def ntt(self, x, level: int, lazy: bool = False):
        return self._apply(x, slice(0, x.shape[-2]), False, lazy)

    def intt(self, x, level: int, lazy: bool = False):
        return self._apply(x, slice(0, x.shape[-2]), True, lazy)

    def ntt_single(self, i: int, x, lazy: bool = False):
        return self._apply(x, slice(i, i + 1), False, lazy)

    def intt_single(self, i: int, x, lazy: bool = False):
        return self._apply(x, slice(i, i + 1), True, lazy)
