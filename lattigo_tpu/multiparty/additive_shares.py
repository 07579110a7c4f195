"""Standalone additive-share types for plaintext-space secret sharing.

TPU-native analog of ``multiparty/additive_shares.go:10-27``: the RNS-domain
share (a polynomial in Z_Q[X], one u64 residue matrix) and the positional-
domain share (arbitrary-precision integers, used by the CKKS E2S masks whose
statistical-flooding bound can exceed Q). The E2S/S2E protocols in
:mod:`lattigo_tpu.multiparty.sharing` produce and consume these implicitly;
the standalone types give user code a first-class object to allocate,
aggregate, and serialize.

Shares are pytrees / plain containers; aggregation is associative addition,
so tree-reduction over parties is valid (ref multiparty/keygen_cpk.go:86).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from flax import struct


@struct.dataclass
class AdditiveShare:
    """Additively shared value in Z_Q[X] (RNS domain) — a pytree.

    ``value``: u64[..., level+1, N] residues (ref additive_shares.go:10).
    """

    value: jnp.ndarray

    def aggregate(self, other: "AdditiveShare", ring, level: int | None = None
                  ) -> "AdditiveShare":
        """self + other mod Q (associative; ref AggregateShares pattern)."""
        return AdditiveShare(ring.add(self.value, other.value, level))


def new_additive_share(ring, level: int | None = None,
                       batch: tuple[int, ...] = ()) -> AdditiveShare:
    """Zero share over the given ring (ref NewAdditiveShare:22)."""
    return AdditiveShare(ring.zero(level, batch))


@dataclass
class AdditiveShareBigint:
    """Additively shared value in Z (positional domain): arbitrary-precision
    Python ints, exact regardless of the flooding bound
    (ref additive_shares.go:16 ``Value []*big.Int``)."""

    value: list[int] = field(default_factory=list)

    def aggregate(self, other: "AdditiveShareBigint") -> "AdditiveShareBigint":
        assert len(self.value) == len(other.value)
        return AdditiveShareBigint(
            [a + b for a, b in zip(self.value, other.value)])

    def to_numpy_signed(self) -> np.ndarray:
        """int64 view (raises on overflow — use only for bounded masks)."""
        return np.array(self.value, dtype=np.int64)


def new_additive_share_bigint(n: int) -> AdditiveShareBigint:
    """n zero big-int shares (ref NewAdditiveShareBigint:27)."""
    return AdditiveShareBigint([0] * n)
