"""Power-of-two gadget decomposition (ref EvaluationKeyParameters
BaseTwoDecomposition, evaluator_gadget_product.go:203)."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import bgv


@pytest.mark.parametrize("log_p", [(50,), ()], ids=["single-P", "no-P"])
def test_base2_key_switch(log_p):
    """EVK with base-2^14 gadget re-encrypts exactly (BGV oracle)."""
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=9, log_q=(45, 38), log_p=log_p or None, t=65537))
    kgen = rlwe.KeyGenerator(params)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = kgen.gen_secret_key(k1)
    sk2 = kgen.gen_secret_key(k2)
    evk = kgen.gen_evaluation_key(k3, sk, sk2, base2=14)
    assert evk.gadget.base2 == 14

    enc = bgv.Encoder(params)
    rng = np.random.default_rng(5)
    m = rng.integers(0, params.t, params.n, dtype=np.int64)
    ct = rlwe.Encryptor(params, sk).encrypt(k4, enc.encode(m))
    ev = rlwe.Evaluator(params)
    sw = ev.apply_evaluation_key(ct, evk)
    got = enc.decode(rlwe.Decryptor(params, sk2).decrypt(sw)) % params.t
    np.testing.assert_array_equal(got, m % params.t)


def test_base2_relinearization():
    """BGV Mul+Relin with a base-2 RLK stays exact."""
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=9, log_q=(45, 38, 38), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    sk = kgen.gen_secret_key(k1)
    rlk = kgen.gen_relinearization_key(k2, sk, base2=15)
    ev = bgv.Evaluator(params, rlwe.EvaluationKeySet(relinearization_key=rlk))
    enc = bgv.Encoder(params)
    rng = np.random.default_rng(6)
    m1 = rng.integers(0, params.t, params.n, dtype=np.int64)
    m2 = rng.integers(0, params.t, params.n, dtype=np.int64)
    encr = rlwe.Encryptor(params, sk)
    ka, kb = jax.random.split(k3)
    ct = ev.mul_relin(encr.encrypt(ka, enc.encode(m1)),
                      encr.encrypt(kb, enc.encode(m2)))
    got = enc.decode(rlwe.Decryptor(params, sk).decrypt(ct)) % params.t
    np.testing.assert_array_equal(got, (m1.astype(object) * m2) % params.t)
