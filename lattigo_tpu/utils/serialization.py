"""Checkpoint / resume: serialization of keys, ciphertexts, and shares.

TPU-native analog of the reference's WriteTo/ReadFrom layer (SURVEY.md §5:
``utils/buffer``, ``core/rlwe/keys.go`` serialization). Every public object
in this library is a JAX pytree, so one generic (save, load) pair covers
ciphertexts, all key material, gadget ciphertexts, and protocol shares:
array leaves go into a single .npz, the tree structure + static metadata
(scales, Galois elements, domain flags) ride alongside.

Wire compatibility with the reference's Go format is NOT provided (the
reference's unsafe []uint64 byte bridge is Go-specific); deterministic
seeded (compressed) objects keep the same seed-expansion semantics.
"""

from __future__ import annotations

import io
import pickle

import numpy as np
import jax
import jax.numpy as jnp


def dumps(obj) -> bytes:
    """Serialize any library pytree to bytes."""
    leaves, treedef = jax.tree_util.tree_flatten(obj)
    buf = io.BytesIO()
    np.savez_compressed(
        buf, n=np.int64(len(leaves)),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    return pickle.dumps({"treedef": treedef, "arrays": buf.getvalue()})


def loads(data: bytes):
    """Inverse of :func:`dumps`; array leaves come back as device arrays."""
    d = pickle.loads(data)
    with np.load(io.BytesIO(d["arrays"])) as z:
        n = int(z["n"])
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(d["treedef"], leaves)


def save(obj, path: str) -> None:
    with open(path, "wb") as f:
        f.write(dumps(obj))


def load(path: str):
    with open(path, "rb") as f:
        return loads(f.read())
