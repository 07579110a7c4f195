"""Multi-chip sharding (SPMD over jax.sharding.Mesh).

The reference has no distributed backend (SURVEY.md §2.7) — its parallelism
axes map to TPU meshes as:

* ``dp``   — ciphertext batch (embarrassingly parallel, the analog of the
  reference's thread-safe evaluator fan-out / BootstrapMany batching).
* ``limb`` — RNS limb axis (the reference's per-SubRing independence);
  NTT and elementwise ops are limb-local, basis extension / rescale
  contract over limbs and become all-gathers/psums on ICI.

Coefficient-axis ("sequence parallel") NTT sharding is a later stage
(SURVEY.md §7 step 7).
"""

from lattigo_tpu.parallel.mesh import make_mesh, shard_ciphertext, batch_sharding

__all__ = ["make_mesh", "shard_ciphertext", "batch_sharding"]
