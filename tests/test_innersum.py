"""Generic inner sum / replicate (arbitrary n) on CKKS slots."""

import numpy as np
import jax

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks


def test_inner_sum_and_replicate_non_pow2():
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(50, 40), log_p=(55,), log_default_scale=40))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 3)
    sk = kgen.gen_secret_key(k_sk)
    enc = ckks.Encoder(params)

    batch, n = 2, 5  # non-power-of-two block count
    ev0 = ckks.Evaluator(params)
    els = set(ev0.galois_elements_for_inner_sum(batch, n))
    els |= set(ev0.galois_elements_for_inner_sum(-batch, n))
    gks = kgen.gen_galois_keys(k_gk, sorted(els), sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(galois_keys=gks))

    slots = params.max_slots
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, slots)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v))

    out = ev.inner_sum(ct, batch, n)
    got = np.real(enc.decode(rlwe.Decryptor(params, sk).decrypt(out)))
    want = sum(np.roll(v, -i * batch) for i in range(n))
    ckks.verify_test_vectors(want, got, min_precision=20.0)

    out2 = ev.replicate(ct, batch, n)
    got2 = np.real(enc.decode(rlwe.Decryptor(params, sk).decrypt(out2)))
    want2 = sum(np.roll(v, i * batch) for i in range(n))
    ckks.verify_test_vectors(want2, got2, min_precision=20.0)
