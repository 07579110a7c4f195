"""RNS polynomial ring arithmetic (L1 of the stack).

TPU-native analog of the reference's ``ring/`` package: negacyclic NTT,
Montgomery/Barrett modular arithmetic, RNS basis extension and rescaling,
samplers, and Galois automorphisms — all as vectorised JAX programs over
``uint64[limbs, N]`` tensors (with Pallas fast paths for the hot kernels).

Host-side precomputation (NTT tables, reduction constants, prime generation)
lives in :mod:`lattigo_tpu.ring.ring`; device code is pure functions of
arrays + static Python ints.
"""

from lattigo_tpu.ring.ring import Ring, SubRing
from lattigo_tpu.ring import modops

__all__ = ["Ring", "SubRing", "modops"]
