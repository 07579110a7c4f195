"""Published bootstrapping parameter sets: chain assembly + level layout
(ref circuits/ckks/bootstrapping/default_parameters.go)."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.circuits import bootstrapping_presets as bp
from lattigo_tpu.circuits.bootstrapping import BootstrappingEvaluator

ALL = bp.DEFAULT_PARAMETERS_SPARSE + bp.DEFAULT_PARAMETERS_DENSE
NAMES = ["N16QP1546_H192", "N16QP1547_H192", "N16QP1553_H192",
         "N15QP768_H192", "N16QP1767_H32768", "N16QP1788_H32768",
         "N16QP1793_H32768", "N15QP880_H16384"]


@pytest.mark.parametrize("preset,name", zip(ALL, NAMES), ids=NAMES)
def test_preset_chain_layout(preset, name):
    residual, lit = preset
    full, btp = bp.build_bootstrapping_parameters(residual, lit)
    assert full.log_n == residual.log_n
    # chain covers c2s + evalmod + s2c + residual + q0 exactly: the
    # conjugation split and interval map are folded into the C2S matrices
    # and P-S is depth-exact, matching the reference budget
    depth = BootstrappingEvaluator._mod1_depth(btp.mod1)
    need = (len(btp.c2s_levels) + depth + len(btp.s2c_levels)
            + btp.residual_levels + 1)
    assert len(full.log_q) == need
    # radix splits cover all slots
    log_slots = residual.log_n - 1
    assert sum(btp.c2s_levels) == log_slots
    assert sum(btp.s2c_levels) == log_slots
    # exact logQP of the reference's ASSEMBLED chains (residual + S2C +
    # EvalMod·Depth() + C2S + P, computed from default_parameters.go
    # literals; the names N16QP1553/N16QP1793 drifted from the literals in
    # the reference itself — their actual assembled totals are 1522/1852)
    expected = {"N16QP1546_H192": 1546, "N16QP1547_H192": 1547,
                "N16QP1553_H192": 1522, "N15QP768_H192": 768,
                "N16QP1767_H32768": 1767, "N16QP1788_H32768": 1788,
                "N16QP1793_H32768": 1852, "N15QP880_H16384": 880}
    log_qp = sum(full.log_q) + sum(full.log_p)
    assert log_qp == expected[name], (log_qp, expected[name])


def test_builder_feeds_evaluator():
    """The builder's chain is exactly what BootstrappingEvaluator expects
    (demo-sized: logN=9 keeps the DFT matrix generation cheap)."""
    residual = ckks.ParametersLiteral(
        log_n=9, log_q=(55, 45), log_p=(60,), log_default_scale=45)
    lit = bp.BootstrappingLiteral(
        c2s_log_scales=[[55], [55]], s2c_log_scales=[[45], [45]],
        evalmod_log_scale=55, ephemeral_secret_weight=None)
    full, btp = bp.build_bootstrapping_parameters(residual, lit)
    params = ckks.Parameters(full)
    enc = ckks.Encoder(params)
    ev = ckks.Evaluator(params)
    b = BootstrappingEvaluator(params, ev, enc, btp)
    assert len(b.galois_elements()) > 0
    # level layout: S2C sits right above the residual chain
    assert b.level_s2c_top - len(btp.s2c_levels) == btp.residual_levels


def test_preset_xs_propagates():
    residual, lit = bp.N15QP768_H192_H32
    full, _ = bp.build_bootstrapping_parameters(residual, lit)
    assert full.xs.hamming_weight == 192
