"""Ring packing: Expand (1 ct → 2^k cts) and Pack (2^k cts → 1 ct)."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.rlwe.ring_packing import RingPackingEvaluator
from lattigo_tpu.schemes import bgv


@pytest.fixture(scope="module")
def ctx():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=7, log_q=(45, 38), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_gk1, k_gk2 = jax.random.split(jax.random.PRNGKey(0), 3)
    sk = kgen.gen_secret_key(k_sk)
    ev0 = rlwe.Evaluator(params)
    rp0 = RingPackingEvaluator(ev0)
    els = sorted(set(rp0.galois_elements_for_expand())
                 | set(rp0.galois_elements_for_pack()))
    gks = kgen.gen_galois_keys(k_gk1, els, sk)
    ev = rlwe.Evaluator(params, rlwe.EvaluationKeySet(galois_keys=gks))
    return dict(params=params, sk=sk, rp=RingPackingEvaluator(ev))


def _decrypt_coeffs(params, sk, ct):
    pt = rlwe.Decryptor(params, sk).decrypt(ct)
    v = params.ring_q.intt(pt.value, pt.level)
    return params.ring_q.to_int_coeffs(np.asarray(v), pt.level, centered=True)


def test_expand(ctx):
    """cts[i] holds coefficient i of the input in its constant slot."""
    params, sk, rp = ctx["params"], ctx["sk"], ctx["rp"]
    delta = 1 << 25
    rng = np.random.default_rng(1)
    m = rng.integers(-7, 8, params.n)
    poly = params.ring_q.ntt(
        params.ring_q.from_int_coeffs([int(x) * delta for x in m]), None)
    ct = rlwe.Encryptor(params, sk).encrypt(
        jax.random.PRNGKey(2), rlwe.Plaintext(value=poly, is_ntt=True))
    log_gap = 5  # extract every 32nd coefficient
    cts = rp.expand(ct, log_gap)
    for i, c in cts.items():
        coeffs = _decrypt_coeffs(params, sk, c)
        got = int(round(coeffs[0] / delta))
        assert got == int(m[i]), f"slot {i}: {got} != {m[i]}"


def test_pack(ctx):
    """pack interleaves the constant coefficients of many cts into one."""
    params, sk, rp = ctx["params"], ctx["sk"], ctx["rp"]
    delta = 1 << 25
    rng = np.random.default_rng(3)
    k = 8
    gap = params.n // k
    vals = rng.integers(-7, 8, k)
    encr = rlwe.Encryptor(params, sk)
    cts = {}
    for i in range(k):
        poly = params.ring_q.ntt(params.ring_q.from_int_coeffs(
            [int(vals[i]) * delta] + [0] * (params.n - 1)), None)
        cts[i * gap] = encr.encrypt(
            jax.random.PRNGKey(100 + i), rlwe.Plaintext(value=poly, is_ntt=True))
    out = rp.pack(cts, input_log_gap=params.log_n)
    coeffs = _decrypt_coeffs(params, sk, out)
    for i in range(k):
        got = int(round(coeffs[i * gap] / delta))
        assert got == int(vals[i]), f"coeff {i*gap}: {got} != {vals[i]}"
