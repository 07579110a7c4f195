"""Example parameter sets construct and round-trip (ref examples/params.go
+ the reference's examples/example_test.go validation pattern)."""

import numpy as np
import jax
import pytest

from lattigo_tpu import presets, rlwe
from lattigo_tpu.schemes import bgv, ckks


@pytest.mark.parametrize("lit", presets.BGV_PARAMS[:2] + presets.BGV_SI_PARAMS[:1])
def test_bgv_presets_construct(lit):
    params = bgv.Parameters(lit)
    assert params.t == presets.T_DEFAULT
    sk = rlwe.KeyGenerator(params).gen_secret_key(jax.random.PRNGKey(0))
    enc = bgv.Encoder(params)
    m = np.arange(params.n, dtype=np.int64) % params.t
    ct = rlwe.Encryptor(params, sk).encrypt(jax.random.PRNGKey(1), enc.encode(m))
    got = enc.decode(rlwe.Decryptor(params, sk).decrypt(ct)) % params.t
    np.testing.assert_array_equal(got, m)


@pytest.mark.parametrize("lit", presets.CKKS_COMPLEX_PARAMS[:2])
def test_ckks_presets_construct(lit):
    params = ckks.Parameters(lit)
    sk = rlwe.KeyGenerator(params).gen_secret_key(jax.random.PRNGKey(0))
    enc = ckks.Encoder(params)
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots)
    ct = rlwe.Encryptor(params, sk).encrypt(jax.random.PRNGKey(1), enc.encode(v))
    got = enc.decode(rlwe.Decryptor(params, sk).decrypt(ct))
    assert np.abs(got - v).max() < 1e-6


def test_tpu_params_small_primes():
    lit = presets.bgv_tpu_params(13, 218)
    params = bgv.Parameters(lit)
    assert max(params.q_moduli + params.p_moduli) < (1 << 30)
    assert sum(q.bit_length() for q in params.q_moduli + params.p_moduli) <= 218
