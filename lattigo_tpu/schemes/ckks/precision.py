"""Precision statistics: the CKKS test oracle.

Port of the reference's ``schemes/ckks/precision.go`` PrecisionStats —
mandatory test infrastructure (SURVEY.md §5): compares decoded values
against a plaintext-side recomputation and reports min/max/avg log2
precision.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PrecisionStats:
    min_precision: float
    max_precision: float
    avg_precision: float
    median_precision: float
    std_error: float

    def __str__(self) -> str:
        return (f"PrecisionStats(min={self.min_precision:.2f}, "
                f"avg={self.avg_precision:.2f}, max={self.max_precision:.2f}, "
                f"median={self.median_precision:.2f} bits)")


def get_precision_stats(want, have) -> PrecisionStats:
    """log2-precision stats of have vs want (ref precision.go:18)."""
    want = np.asarray(want, dtype=np.complex128).ravel()
    have = np.asarray(have, dtype=np.complex128).ravel()[: want.size]
    err = np.abs(want - have)
    err = np.maximum(err, 2.0 ** -80)  # floor to avoid inf
    prec = -np.log2(err)
    return PrecisionStats(
        min_precision=float(prec.min()),
        max_precision=float(prec.max()),
        avg_precision=float(prec.mean()),
        median_precision=float(np.median(prec)),
        std_error=float(err.std()),
    )


def verify_test_vectors(want, have, min_precision: float) -> PrecisionStats:
    """Assert minimum average precision (ref VerifyTestVectors:84)."""
    stats = get_precision_stats(want, have)
    assert stats.avg_precision >= min_precision, (
        f"precision too low: {stats} < required avg {min_precision}")
    return stats
