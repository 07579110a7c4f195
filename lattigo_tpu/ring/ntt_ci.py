"""Negacyclic NTT for the conjugate-invariant ring Z[X+X^{-1}]/(X^{2N}+1).

TPU-native analog of the reference's CI transformer (ring/ntt.go:715-1311,
ia.cr/2018/952): a ring element is stored as N coefficients
(c_0, …, c_{N−1}) ↦ c_0 + Σ_{j≥1} c_j·(X^j − X^{2N−j}) — the fixed ring of
the automorphism X → X^{−1} inside Z[X]/(X^{2N}+1) — and its NTT is the
N-point "left half" of the 2N-point transform, computed as:

  forward:  one folding pre-stage with F = ψ^{brev(1)} (ψ = 4N-th root):
                y[j]   = x[j] − F·x[N−j]          (j = 1..N−1, y[0]=x[0])
            then the standard radix-2 stages, except stage s reads its
            group roots from the 4N-root table at offset 2^{s+1} (the kept
            half of the size-2N transform's stage s+1).
  inverse:  mirrored GS stages, the inverse pre-stage, x[0] doubled, ×N^{-1}.

The stage loop is shared with the standard path (:mod:`.ntt`) through a
REMAPPED table: roots_eff[2^s + g] = table_4N[2^{s+1} + g], so no new
butterfly code. All ops are whole-array jnp expressions (XLA path; the
Pallas fast path currently covers the standard ring only).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring import ntt as ntt_mod
from lattigo_tpu.ring.modops import cred, mred, mred_lazy
from lattigo_tpu.ring.ntt import bit_reverse


def _mform_int(a: int, q: int) -> int:
    return (a << 64) % q


def gen_ci_tables(n: int, psi4n: int, q: int):
    """(fwd_remap u64[N], inv_remap u64[N], F_fwd, F_inv, ninv) tables.

    The 4N-root table over index space [0, 2N) with logN+1-bit bit-reversal
    (the size-2N standard table), remapped so the shared stage loop indexes
    it as a size-N table (see module docstring).
    """
    log2n = n.bit_length()  # log2(2N)
    ipsi = pow(psi4n, -1, q)

    def table(base):
        pows = np.zeros(2 * n, dtype=np.uint64)
        p = 1
        for j in range(2 * n):
            pows[j] = p
            p = p * base % q
        t = np.zeros(2 * n, dtype=np.uint64)
        for j in range(2 * n):
            t[j] = _mform_int(int(pows[bit_reverse(j, log2n)]), q)
        return t

    t_f = table(psi4n)
    t_i = table(ipsi)
    fwd = np.zeros(n, dtype=np.uint64)
    inv = np.zeros(n, dtype=np.uint64)
    for s in range(log2n - 1):          # stages over N elements
        m = 1 << s
        fwd[m: 2 * m] = t_f[2 * m: 3 * m]
        inv[m: 2 * m] = t_i[2 * m: 3 * m]
    # NInv = (NthRoot/2)^{-1} = (2N)^{-1} (ref subring.go NInv; the inverse
    # pre-stage doubles index 0, netting N^{-1} there)
    ninv = _mform_int(pow(2 * n, -1, q), q)
    return fwd, inv, int(t_f[1]), int(t_i[1]), ninv


def _fold_partner(x):
    """partner[j] = x[(N − j) mod N] along the last axis."""
    return jnp.roll(jnp.flip(x, axis=-1), 1, axis=-1)


def ntt_ci(x, roots_remap, f_fwd, q, qinv, logn: int, lazy: bool = False):
    """Forward CI NTT (ref NTTConjugateInvariant, ntt.go:716).

    x: u64[..., L, N] coefficients in [0, q). Output: N NTT values.
    """
    n = 1 << logn
    q2 = q + q
    part = _fold_partner(x)
    y = x + q2 - mred_lazy(part, f_fwd, q, qinv)      # [0, 4q)
    y = y.at[..., 0].set(x[..., 0])
    for s in range(logn):
        y = ntt_mod._fwd_stage(y, roots_remap, q2, q, qinv, 1 << s, n)
    if lazy:
        return y
    y = jnp.where(y >= q2, y - q2, y)
    return cred(y, q)


def intt_ci(v, iroots_remap, f_inv, ninv_mont, q, qinv, logn: int,
            lazy: bool = False):
    """Inverse CI NTT (ref INTTConjugateInvariant, ntt.go:727)."""
    n = 1 << logn
    q2 = q + q
    x = v
    for s in range(logn - 1, -1, -1):
        x = ntt_mod._inv_stage(x, iroots_remap, q2, q, qinv, 1 << s, n)
    # inverse pre-stage: x[j] − F⁻¹·x[N−j], x[0] doubled (ref :1259-1264)
    part = _fold_partner(x)
    y = x + q2 - mred_lazy(part, f_inv, q, qinv)
    # dropping the N axis leaves the limb axis last: align q2 accordingly
    y = y.at[..., 0].set(cred(x[..., 0] * jnp.uint64(2), q2[..., 0]))
    if lazy:
        return mred_lazy(y, ninv_mont, q, qinv)
    return mred(y, ninv_mont, q, qinv)
