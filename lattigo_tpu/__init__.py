"""lattigo_tpu — a TPU-native full-RNS RLWE homomorphic-encryption framework.

A brand-new JAX/XLA/Pallas implementation of the capability surface of
tuneinsight/lattigo v6 (reference: /root/reference): RNS polynomial rings with
negacyclic NTT, BGV/BFV and CKKS schemes, gadget key-switching, Galois
automorphisms, homomorphic circuits (BSGS linear transforms, Paterson-
Stockmeyer polynomial evaluation, homomorphic DFT, mod-1, minimax sign and
comparison, CKKS bootstrapping), RGSW external products and blind rotation,
and multiparty/threshold protocols.

Design (TPU-first, not a Go port):
  * A polynomial is a ``uint64`` tensor of shape ``[limbs, N]`` (RNS
    limb-major). Ciphertexts batch naturally along leading axes.
  * All modular arithmetic is vectorised 64-bit Montgomery/Barrett built on a
    32-bit-split ``mulhi`` (TPUs have no u64 multiplier; XLA emulates u64 via
    u32 pairs, and the hot kernels have Pallas versions operating directly on
    32-bit lanes).
  * Parameters, levels, scales and metadata are *static* host-side objects:
    everything under ``jit`` is shape- and control-flow-static.
  * Scale-out shards the batch and RNS-limb axes over a
    ``jax.sharding.Mesh``; basis extension / rescaling are the only
    cross-limb collectives.

This package requires 64-bit integer support and enables ``jax_enable_x64``
at import time.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache (kernel shapes recur across runs; HE
# parameter sets are static so cache hits are the common case).
if not _os.environ.get("LATTIGO_TPU_NO_CACHE"):
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

__version__ = "0.1.0"
