"""Slow-tier end-to-end execution of every published bootstrap preset
recipe at reduced degree (logN=9), with per-preset precision ratchets.

Moves ``validate_presets.py`` into CI (round-4 verdict: a recipe
regression could previously only be noticed by a human running the
script). Thresholds are ~1.5 bits under the post-round-5 measured values
(ModUp-amplification fix, ref bootstrapping/evaluator.go:709) so noise
variation passes but a structural regression fails loudly.
"""

import pytest

from lattigo_tpu.circuits import bootstrapping_presets as bp

# name -> (min worst-slot bits, min avg bits) @ logN=9; measured round 5:
# N15QP768 17.1/19.1, N16QP1546 20.2/21.6, N16QP1547 27.1/28.3,
# N16QP1553 20.2/21.6, N16QP1767 20.2/21.6, N16QP1788 27.1/28.3,
# N16QP1793 20.2/21.6, N15QP880 20.2/21.6 (dense sets run with the
# Hamming weight capped at N/2 of the reduced ring)
THRESHOLDS = {
    "N15QP768_H192_H32": (15.5, 17.5),
    "N16QP1546_H192_H32": (18.5, 20.0),
    "N16QP1547_H192_H32": (25.5, 26.5),
    "N16QP1553_H192_H32": (18.5, 20.0),
    "N16QP1767_H32768_H32": (18.5, 20.0),
    "N16QP1788_H32768_H32": (25.5, 26.5),
    "N16QP1793_H32768_H32": (18.5, 20.0),
    "N15QP880_H16384_H32": (18.5, 20.0),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(THRESHOLDS))
def test_preset_recipe(name):
    worst, avg = bp.run_recipe(getattr(bp, name), log_n=9)
    min_worst, min_avg = THRESHOLDS[name]
    assert worst >= min_worst, f"{name}: worst {worst:.1f} < {min_worst}"
    assert avg >= min_avg, f"{name}: avg {avg:.1f} < {min_avg}"
