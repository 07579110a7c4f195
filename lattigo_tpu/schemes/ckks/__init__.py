"""CKKS: approximate arithmetic over C^{N/2} (L3 of the stack).

TPU-native analog of ``schemes/ckks``.
"""

from lattigo_tpu.schemes.ckks.params import Parameters, ParametersLiteral
from lattigo_tpu.schemes.ckks.encoder import Encoder, CIEncoder, PrecisionEncoder
from lattigo_tpu.schemes.ckks.evaluator import Evaluator
from lattigo_tpu.schemes.ckks.precision import (
    PrecisionStats, get_precision_stats, verify_test_vectors,
)

__all__ = [
    "Parameters", "ParametersLiteral", "Encoder", "CIEncoder",
    "PrecisionEncoder", "Evaluator",
    "PrecisionStats", "get_precision_stats", "verify_test_vectors",
]
