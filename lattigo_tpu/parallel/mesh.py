"""Mesh construction and ciphertext sharding helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp: int | None = None, limb: int = 1) -> Mesh:
    """Build a (dp, limb) mesh over the given (or all) devices."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if dp is None:
        dp = n // limb
    assert dp * limb == n, f"mesh {dp}x{limb} != {n} devices"
    arr = np.asarray(devices).reshape(dp, limb)
    return Mesh(arr, axis_names=("dp", "limb"))


def batch_sharding(mesh: Mesh, ndim: int, limb_axis: bool = False) -> NamedSharding:
    """Shard the leading (batch) axis over dp; optionally limbs over limb.

    ndim is the rank of the ciphertext value tensor, e.g. 4 for
    [batch, degree+1, L, N]; the limb axis is at -2.
    """
    spec = [None] * ndim
    spec[0] = "dp"
    if limb_axis and mesh.shape["limb"] > 1:
        spec[-2] = "limb"
    return NamedSharding(mesh, P(*spec))


def shard_ciphertext(ct, mesh: Mesh, limb_axis: bool = False):
    """Device-put a ciphertext pytree with batch (and optionally limb) sharding."""
    sh = batch_sharding(mesh, ct.value.ndim, limb_axis)
    return ct.replace(value=jax.device_put(ct.value, sh))
