"""BFV scale-invariant multiplication: exact, level-free tensoring."""

import numpy as np
import jax

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import bgv


def test_bfv_mul_scale_invariant_exact():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=10, log_q=(45, 38, 38), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    ev = bgv.Evaluator(params, rlwe.EvaluationKeySet(relinearization_key=rlk))
    enc = bgv.Encoder(params)
    t = params.t
    rng = np.random.default_rng(1)
    m1 = rng.integers(0, t, params.n, dtype=np.int64)
    m2 = rng.integers(0, t, params.n, dtype=np.int64)
    encr = rlwe.Encryptor(params, sk)
    ct1 = encr.encrypt(k1, enc.encode(m1))
    ct2 = encr.encrypt(k2, enc.encode(m2))

    out = ev.mul_scale_invariant(ct1, ct2, relin=True)
    # BFV: no rescale, level unchanged, result exact
    assert out.level == ct1.level
    got = np.asarray(enc.decode(rlwe.Decryptor(params, sk).decrypt(out))) % t
    want = (m1.astype(object) * m2.astype(object)) % t
    np.testing.assert_array_equal(got, want.astype(np.int64))

    # second multiplication on the product (depth-2 without rescaling)
    out2 = ev.mul_scale_invariant(out, ct1, relin=True)
    got2 = np.asarray(enc.decode(rlwe.Decryptor(params, sk).decrypt(out2))) % t
    want2 = want * m1.astype(object) % t
    np.testing.assert_array_equal(got2, want2.astype(np.int64))
