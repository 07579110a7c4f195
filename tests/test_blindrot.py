"""LMKCDEY blind rotation test (ref core/rgsw/blindrot/blindrot_test.go)."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.rgsw import blindrot

pytestmark = pytest.mark.slow  # compile-heavy tier (see pyproject)


def sign(x):
    return 1.0 if x > 0 else (-1.0 if x < 0 else 0.0)


def test_blind_rotation_sign():
    # BR ring: logN=9, one 28-bit prime + one 30-bit P (RNS gadget, beta=1)
    params_br = rlwe.Parameters(rlwe.ParametersLiteral(
        log_n=9, log_q=(28,), log_p=(32,)))
    # LWE ring: logN=7, one small prime
    params_lwe = rlwe.Parameters(rlwe.ParametersLiteral(
        log_n=7, log_q=(14,), log_p=(15,)))

    k_sk_lwe, k_sk_br, k_brk, k_ct = jax.random.split(jax.random.PRNGKey(0), 4)
    sk_lwe = rlwe.KeyGenerator(params_lwe).gen_secret_key(k_sk_lwe)
    sk_br = rlwe.KeyGenerator(params_br).gen_secret_key(k_sk_br)

    q_lwe = params_lwe.q_moduli[0]
    q_br = params_br.q_moduli[0]
    scale_lwe = q_lwe / 4.0
    scale_br = q_br / 4.0
    slots = 8

    values = [-1 + 2 * i / slots for i in range(slots)]
    coeffs = [0] * params_lwe.n
    for i, v in enumerate(values):
        coeffs[i] = int(round(v * scale_lwe))
    pt_poly = params_lwe.ring_q.ntt(
        params_lwe.ring_q.from_int_coeffs(coeffs, 0), 0)
    pt = rlwe.Plaintext(value=pt_poly, is_ntt=True)
    ct = rlwe.Encryptor(params_lwe, sk_lwe).encrypt(k_ct, pt)

    f = blindrot.init_test_polynomial(sign, scale_br, params_br, -1.0, 1.0)
    test_polys = {i: f for i in range(slots)}

    brk = blindrot.gen_evaluation_keys(
        k_brk, params_br, sk_br, params_lwe, sk_lwe)
    ev = blindrot.BlindRotationEvaluator(params_br, params_lwe)
    out = ev.evaluate(ct, test_polys, brk)

    dec = rlwe.Decryptor(params_br, sk_br)
    ok = 0
    for i, v in enumerate(values):
        if v == 0:
            continue
        ptb = dec.decrypt(out[i])
        c = np.asarray(params_br.ring_q.intt(ptb.value, ptb.level))[0, 0]
        c = int(c)
        a = (c - q_br if c >= q_br // 2 else c) / scale_br
        got = round(a * 8) / 8
        assert abs(got - sign(v)) < 0.25, (
            f"slot {i}: blindrot(sign, {v}) = {a:.4f}, want {sign(v)}")
        ok += 1
    assert ok >= slots - 1
