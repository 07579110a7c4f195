"""CKKS parameters: RLWE parameters + default scale / slot geometry.

TPU-native analog of ``schemes/ckks/params.go``. Scales are tracked as
exact rationals (:class:`fractions.Fraction`) — static metadata resolved at
trace time, the functional replacement for the reference's big.Float
``rlwe.Scale`` (``core/rlwe/scale.go:24``); no precision is lost across
arbitrarily many rescalings.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from fractions import Fraction

from lattigo_tpu import rlwe
from lattigo_tpu.ring.ring import STANDARD, CONJUGATE_INVARIANT


@dataclass(frozen=True)
class ParametersLiteral(rlwe.ParametersLiteral):
    """RLWE literal + LogDefaultScale (ref schemes/ckks/params.go:47)."""

    log_default_scale: int = 45


class Parameters(rlwe.Parameters):
    """Resolved CKKS parameters (ref schemes/ckks/params.go:90)."""

    def __init__(self, literal: ParametersLiteral):
        super().__init__(replace(literal, ntt_flag=True))
        self.log_default_scale = literal.log_default_scale
        self.default_scale_fraction = Fraction(1 << literal.log_default_scale)

    @property
    def max_slots(self) -> int:
        """N/2 complex slots (standard ring); N real slots (CI ring)."""
        return self.n if self.ring_type == CONJUGATE_INVARIANT else self.n // 2

    @property
    def log_max_slots(self) -> int:
        return self.max_slots.bit_length() - 1

    def q_fraction(self, level: int) -> Fraction:
        return Fraction(self.q_moduli[level])
