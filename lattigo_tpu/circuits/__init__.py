"""Homomorphic circuits (L4 of the stack).

TPU-native analog of the reference's ``circuits/`` tree: BSGS linear
transformations, Paterson–Stockmeyer polynomial evaluation, homomorphic
DFT, mod-1 (EvalMod), minimax composite polynomials, sign/comparison,
inverse, and CKKS bootstrapping.
"""

from lattigo_tpu.circuits import (
    lintrans, polynomial, dft, mod1, minimax, comparison, inverse,
    bootstrapping,
)

__all__ = ["lintrans", "polynomial", "dft", "mod1", "minimax", "comparison",
           "inverse", "bootstrapping"]
