"""Ciphertext / Plaintext containers (pytrees with static metadata).

TPU-native analog of ``core/rlwe/element.go`` + ``metadata.go``: instead of
a generic Element[T] object graph, a ciphertext is ONE stacked tensor
``uint64[..., degree+1, level+1, N]`` — degree and level are carried by the
shape (static under jit), metadata (domain flags, scale) is static pytree
aux data, and leading axes batch. This makes vmap/shard_map over ciphertext
batches trivial, which is the TPU-native replacement for the reference's
buffer-pool concurrency machinery.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Plaintext:
    """Degree-0 element: value u64[..., level+1, N] (ref plaintext.go:11)."""

    value: jax.Array
    is_ntt: bool = struct.field(pytree_node=False, default=True)
    is_montgomery: bool = struct.field(pytree_node=False, default=False)
    scale: Any = struct.field(pytree_node=False, default=1.0)

    @property
    def level(self) -> int:
        return self.value.shape[-2] - 1

    @property
    def n(self) -> int:
        return self.value.shape[-1]


@struct.dataclass
class Ciphertext:
    """Degree-d element: value u64[..., d+1, level+1, N] (ref ciphertext.go:11).

    ``value[..., i, :, :]`` is the coefficient of s^i in the decryption
    equation μ = Σ_i ct[i]·s^i.
    """

    value: jax.Array
    is_ntt: bool = struct.field(pytree_node=False, default=True)
    is_montgomery: bool = struct.field(pytree_node=False, default=False)
    scale: Any = struct.field(pytree_node=False, default=1.0)

    @property
    def degree(self) -> int:
        return self.value.shape[-3] - 1

    @property
    def level(self) -> int:
        return self.value.shape[-2] - 1

    @property
    def n(self) -> int:
        return self.value.shape[-1]

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.value.shape[:-3]

    def at_level(self, level: int) -> "Ciphertext":
        """Static level-drop view (ref element.go:120 truncation)."""
        return self.replace(value=self.value[..., : level + 1, :])

    def poly(self, i: int) -> jax.Array:
        return self.value[..., i, :, :]


def ciphertext_from_polys(polys: list[jax.Array], **meta) -> Ciphertext:
    return Ciphertext(value=jnp.stack(polys, axis=-3), **meta)
