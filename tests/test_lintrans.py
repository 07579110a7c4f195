"""Linear transformation (BSGS) tests for CKKS and BGV."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import bgv, ckks
from lattigo_tpu.circuits import lintrans as lt_mod


@pytest.mark.slow
def test_ckks_lintrans():
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=10, log_q=(50, 40, 40), log_p=(55,), log_default_scale=40))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 3)
    sk = kgen.gen_secret_key(k_sk)
    enc = ckks.Encoder(params)

    slots = params.max_slots
    rng = np.random.default_rng(1)
    diag_idx = [0, 1, 2, 5, slots - 1]
    diagonals = {k: rng.uniform(-1, 1, slots) for k in diag_idx}

    scale = params.q_moduli[params.max_level]  # rescale restores input scale
    lt = lt_mod.encode_linear_transformation(
        params, diagonals,
        lt_mod.ckks_diag_encoder(params, enc, scale),
        level_q=params.max_level, scale=scale, slots=slots)

    gks = kgen.gen_galois_keys(k_gk, lt.galois_elements(params), sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(galois_keys=gks))
    lt_ev = lt_mod.LinTransEvaluator(ev)

    v = rng.uniform(-1, 1, slots) + 1j * rng.uniform(-1, 1, slots)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v))
    out = ev.rescale(lt_ev.evaluate(ct, lt))

    want = np.zeros(slots, dtype=complex)
    for k, d in diagonals.items():
        want += d * np.roll(v, -k)
    got = enc.decode(rlwe.Decryptor(params, sk).decrypt(out))
    ckks.verify_test_vectors(want, got, min_precision=20.0)


def test_bgv_lintrans():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=10, log_q=(45, 35, 35), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(2), 3)
    sk = kgen.gen_secret_key(k_sk)
    enc = bgv.Encoder(params)

    slots = params.n
    half = slots // 2
    rng = np.random.default_rng(3)
    diag_idx = [0, 1, 3]
    diagonals = {k: rng.integers(0, params.t, slots, dtype=np.int64)
                 for k in diag_idx}

    lt = lt_mod.encode_linear_transformation(
        params, diagonals,
        lt_mod.bgv_diag_encoder(params, enc),
        level_q=params.max_level, scale=1, slots=half,
        rotate_diag=lt_mod.bgv_rotate_diag)

    gks = kgen.gen_galois_keys(k_gk, lt.galois_elements(params), sk)
    ev = bgv.Evaluator(params, rlwe.EvaluationKeySet(galois_keys=gks))
    lt_ev = lt_mod.LinTransEvaluator(ev)

    m = rng.integers(0, params.t, slots, dtype=np.int64)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(m))
    out = lt_ev.evaluate(ct, lt)

    def rot(v, k):
        return np.concatenate([np.roll(v[:half], -k), np.roll(v[half:], -k)])

    want = np.zeros(slots, dtype=object)
    for k, d in diagonals.items():
        want = (want + d.astype(object) * rot(m, k)) % params.t
    got = enc.decode(rlwe.Decryptor(params, sk).decrypt(out)) % params.t
    np.testing.assert_array_equal(got, want.astype(np.int64))
