"""RGSW ciphertexts and the external product (L2, ref ``core/rgsw``).

An RGSW(m) ciphertext is a pair of gadget ciphertexts under the same key:
the first carries m·g on the c0 component, the second on the c1 component
(ref core/rgsw/elements.go:12). The external product RLWE ⊠ RGSW
decomposes both RLWE components and MACs them against the two gadget
halves, yielding RLWE(μ·m) — the primitive behind FHEW/TFHE-style
programmable bootstrapping.
"""

from lattigo_tpu.rgsw.rgsw import Ciphertext, Encryptor, external_product

__all__ = ["Ciphertext", "Encryptor", "external_product"]
