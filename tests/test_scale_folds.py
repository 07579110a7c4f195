"""Scale-fold audit: tracing the bootstrap pipeline must not fold large
relative scale mismatches into the message.

``_match_scales`` reconciles operands whose exact-Fraction scales differ by
multiplying the smaller-scale side by the ROUNDED integer ratio and
relabeling; the residual relative mismatch becomes message error. Planned
scales divide by actual chain primes (2^b + δ), so ratios land just below
exact powers — flooring the ratio once turned a 2^-41 residual into 2^-10
and cost the bootstrap ~17 bits. This test traces the full pipeline with
``jax.eval_shape`` (scales are static metadata — no compile, no device
work) and asserts every fold's residual stays below 2^-20.
"""

from fractions import Fraction

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.schemes.ckks import evaluator as ev_mod
from lattigo_tpu.circuits import bootstrapping as bts
from lattigo_tpu.circuits import bootstrapping_presets as bp
from lattigo_tpu.ring.sampling import Ternary
from lattigo_tpu.rlwe.elements import Ciphertext


def _audit_folds(monkeypatch):
    folds = []
    orig_ms = ev_mod.Evaluator._match_scales
    orig_mp = ev_mod.Evaluator._match_pt_scale

    def residual(s0, s1):
        lo, hi = (s0, s1) if s0 < s1 else (s1, s0)
        ri = max(1, int(hi / lo + Fraction(1, 2)))
        return abs(float(hi / (lo * ri)) - 1.0)

    def ms(self, a, b):
        folds.append(residual(Fraction(a.scale), Fraction(b.scale)))
        return orig_ms(self, a, b)

    def mp(self, a, b):
        folds.append(residual(Fraction(a.scale), Fraction(b.scale)))
        return orig_mp(self, a, b)

    monkeypatch.setattr(ev_mod.Evaluator, "_match_scales", ms)
    monkeypatch.setattr(ev_mod.Evaluator, "_match_pt_scale", mp)
    return folds


@pytest.mark.parametrize("em_scale", [55, 60])
def test_bootstrap_trace_has_no_large_folds(monkeypatch, em_scale):
    residual = ckks.ParametersLiteral(
        log_n=8, log_q=(55, 45, 45, 45), log_p=(60, 60),
        log_default_scale=45, xs=Ternary(hamming_weight=32))
    lit = bp.BootstrappingLiteral(
        c2s_log_scales=[[56]] * 3, s2c_log_scales=[[39]] * 3,
        evalmod_log_scale=em_scale, ephemeral_secret_weight=None)
    full, btp = bp.build_bootstrapping_parameters(residual, lit)
    params = ckks.Parameters(full)
    enc = ckks.Encoder(params)
    kgen = rlwe.KeyGenerator(params)
    k = jax.random.PRNGKey(0)
    sk = kgen.gen_secret_key(k)
    rlk = kgen.gen_relinearization_key(k, sk)
    ev0 = ckks.Evaluator(params, rlwe.EvaluationKeySet(relinearization_key=rlk))
    b = bts.BootstrappingEvaluator(params, ev0, enc, btp)
    gks = kgen.gen_galois_keys(k, b.galois_elements(), sk)
    b.with_evaluator(ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk, galois_keys=gks)))

    folds = _audit_folds(monkeypatch)

    def raw(v):
        return b.bootstrap(Ciphertext(
            value=v, is_ntt=True, scale=Fraction(2) ** 45)).value

    jax.eval_shape(raw, jax.ShapeDtypeStruct((2, 1, params.n), np.uint64))
    assert folds, "expected the trace to exercise _match_scales"
    worst = max(folds)
    assert worst < 2.0 ** -20, (
        f"scale fold residual {worst:.3e} exceeds 2^-20 — the rounding "
        "fold in _match_scales regressed (this costs bootstrap precision)")
