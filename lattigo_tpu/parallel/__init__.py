"""Multi-chip sharding (SPMD over jax.sharding.Mesh).

The reference has no distributed backend (SURVEY.md §2.7) — its parallelism
axes map to TPU meshes as:

* ``dp``   — ciphertext batch (embarrassingly parallel, the analog of the
  reference's thread-safe evaluator fan-out / BootstrapMany batching).
* ``limb`` — RNS limb axis (the reference's per-SubRing independence);
  NTT and elementwise ops are limb-local, basis extension / rescale
  contract over limbs and become all-gathers/psums on ICI.

* ``sp``   — coefficient axis (:mod:`lattigo_tpu.parallel.ntt_sp`): the
  NTT's first/last log2(D) butterfly stages become pairwise ppermute
  exchanges over ICI, bit-exact vs the single-device kernel
  (SURVEY.md §7 step 7 — the sequence-parallel/ring-attention analog).
"""

from lattigo_tpu.parallel.mesh import make_mesh, shard_ciphertext, batch_sharding
from lattigo_tpu.parallel.ntt_sp import (
    ntt_sharded, intt_sharded, negacyclic_mul_sharded,
)

__all__ = ["make_mesh", "shard_ciphertext", "batch_sharding",
           "ntt_sharded", "intt_sharded", "negacyclic_mul_sharded"]
