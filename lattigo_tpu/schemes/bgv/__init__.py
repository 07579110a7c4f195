"""BGV/BFV: exact integer SIMD arithmetic over Z_T (L3 of the stack).

TPU-native analog of ``schemes/bgv`` — the unified BGV/BFV scheme
(BFV = scale-invariant tensoring variant, selected per-call).
"""

from lattigo_tpu.schemes.bgv.params import Parameters, ParametersLiteral
from lattigo_tpu.schemes.bgv.encoder import Encoder
from lattigo_tpu.schemes.bgv.evaluator import Evaluator

__all__ = ["Parameters", "ParametersLiteral", "Encoder", "Evaluator"]
