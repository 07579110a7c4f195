"""RNS rescaling: exact division by the last modulus (floor / round).

TPU-native analog of ``ring/scaling.go`` (DivFloorByLastModulus[Many][NTT],
DivRoundByLastModulus[Many][NTT]). A poly at level l (``[l+1, N]``) is
divided by q_l and re-expressed at level l-1 (``[l, N]``):

    floor:  out_i = (a_i - a_l) · q_l^{-1}          (mod q_i)
    round:  x' = x + ⌊q_l/2⌋, then floor-divide x'

The NTT-domain variants INTT only the last limb, lift its (centered)
residue into every remaining limb, NTT that lift *batched across all limbs
at once* (one vectorised NTT instead of the reference's per-limb loop), and
merge.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring import modops


def _lift_last_residue(ring, r, level: int, half: int | None):
    """Reduce last-limb residues r (u64[..., N] < q_level) mod q_0..q_{level-1}.

    If half is not None, computes (r + half) mod q_last first and lifts the
    result minus the per-limb half, implementing centered rounding.
    Returns u64[..., level, N].
    """
    q = ring.q[:level]
    bhi = ring.bred_hi[:level]
    r = r[..., None, :]  # [..., 1, N]
    if half is None:
        return modops.bred_add(r, q, bhi)
    # (a_l + half) mod q_l already applied by caller; subtract half mod q_i.
    half_i = jnp.asarray(
        np.array([half % m for m in ring.moduli[:level]], dtype=np.uint64).reshape(level, 1)
    )
    lifted = modops.bred_add(r, q, bhi)
    return modops.sub_mod(lifted, half_i, q)


def div_by_last_modulus(ring, a, level: int | None = None, ntt_domain: bool = False,
                        round_div: bool = True):
    """Divide by q_level and drop the last limb: [l+1, N] → [l, N]."""
    level = ring.max_level if level is None else level
    assert level >= 1, "cannot rescale below level 0"
    q_last = ring.moduli[level]
    body, last = a[..., :level, :], a[..., level, :]

    if ntt_domain:
        last = ring.intt_single(level, last[..., None, :])[..., 0, :]
    half = (q_last >> 1) if round_div else None
    if half is not None:
        qj = jnp.uint64(q_last)
        last = modops.cred(last + jnp.uint64(half), qj)
    lifted = _lift_last_residue(ring, last, level, half)
    if ntt_domain:
        lifted = ring.ntt(lifted, level=level - 1)
    diff = modops.sub_mod(body, lifted, ring.q[:level])
    qlinv = ring.rescale_constants[level, :level]
    return modops.mred(diff, qlinv, ring.q[:level], ring.qinv[:level])


def div_by_last_modulus_many(ring, a, k: int, level: int | None = None,
                             ntt_domain: bool = False, round_div: bool = True):
    """Drop the last k moduli (iterated exact division, ref scaling.go:148)."""
    level = ring.max_level if level is None else level
    for j in range(k):
        a = div_by_last_modulus(ring, a, level - j, ntt_domain=ntt_domain,
                                round_div=round_div)
    return a
