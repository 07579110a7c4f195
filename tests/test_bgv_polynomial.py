"""BGV exact polynomial evaluation + Lagrange interpolation mod T."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import bgv
from lattigo_tpu.circuits.bgv_polynomial import (
    BGVPolynomialEvaluator, interpolate_mod_t,
)


def test_interpolate_mod_t():
    t = 65537
    # p(x) = 3 + 5x + 7x^3 mod t
    p = [3, 5, 0, 7]
    xs = [1, 2, 3, 4]
    ys = [sum(c * pow(x, i, t) for i, c in enumerate(p)) % t for x in xs]
    got = interpolate_mod_t(xs, ys, t)
    assert got == [3, 5, 0, 7]


@pytest.mark.slow
def test_bgv_polynomial_exact():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=9, log_q=(45,) + (40,) * 6, log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_ct = jax.random.split(jax.random.PRNGKey(0), 3)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    ev = bgv.Evaluator(params, rlwe.EvaluationKeySet(relinearization_key=rlk))
    enc = bgv.Encoder(params)

    t = params.t
    coeffs = [12, 7, 0, 3, 0, 0, 1, 9]  # degree 7
    rng = np.random.default_rng(1)
    m = rng.integers(0, t, params.n, dtype=np.int64)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(m))

    pe = BGVPolynomialEvaluator(ev)
    out = pe.evaluate(ct, coeffs)

    got = np.asarray(enc.decode(rlwe.Decryptor(params, sk).decrypt(out))) % t
    want = np.zeros(params.n, dtype=object)
    for i, c in enumerate(coeffs):
        want = (want + c * pow(m.astype(object), i)) % t
    np.testing.assert_array_equal(got, want.astype(np.int64))
