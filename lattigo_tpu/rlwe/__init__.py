"""Scheme-generic RLWE core (L2 of the stack).

TPU-native analog of the reference's ``core/rlwe`` package: parameters,
ciphertext/plaintext pytrees, key material (secret/public/gadget/EVK/
Galois), encryption/decryption, and the gadget-product key-switching
machinery that every scheme evaluator builds on.
"""

from lattigo_tpu.rlwe.params import (
    Parameters, ParametersLiteral,
    DiscreteGaussian, Ternary, Uniform, DEFAULT_XE, DEFAULT_XS,
)
from lattigo_tpu.rlwe.elements import Ciphertext, Plaintext, ciphertext_from_polys
from lattigo_tpu.rlwe.keys import (
    SecretKey, PublicKey, GadgetCiphertext, EvaluationKey,
    RelinearizationKey, GaloisKey, KeyGenerator, EvaluationKeySet,
)
from lattigo_tpu.rlwe.encryption import Encryptor, Decryptor, add_plaintext
from lattigo_tpu.rlwe.errors import (
    MissingKeyError, MissingGaloisKeyError, MissingRelinearizationKeyError,
)
from lattigo_tpu.rlwe.evaluator import Evaluator

__all__ = [
    "Parameters", "ParametersLiteral",
    "DiscreteGaussian", "Ternary", "Uniform", "DEFAULT_XE", "DEFAULT_XS",
    "Ciphertext", "Plaintext", "ciphertext_from_polys",
    "SecretKey", "PublicKey", "GadgetCiphertext", "EvaluationKey",
    "RelinearizationKey", "GaloisKey", "KeyGenerator", "EvaluationKeySet",
    "Encryptor", "Decryptor", "add_plaintext", "Evaluator",
]
