"""Seeded (compressed) keys and ciphertexts: drop c1, re-derive from seed."""

import numpy as np
import jax

from lattigo_tpu import rlwe
from lattigo_tpu.rlwe import keys as keys_mod
from lattigo_tpu.schemes import bgv


def test_compressed_evaluation_key():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=9, log_q=(45, 38), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    sk_in = kgen.gen_secret_key(k1)
    sk_out = kgen.gen_secret_key(k2)

    seed = b"evk-seed"
    gadget = kgen.gadget_encrypt(k3, sk_in.value.q, sk_out, seed=seed)
    compressed = keys_mod.compress_gadget(gadget, seed)
    expanded = compressed.expand(params)
    np.testing.assert_array_equal(
        np.asarray(expanded.value.q), np.asarray(gadget.value.q))
    np.testing.assert_array_equal(
        np.asarray(expanded.value.p), np.asarray(gadget.value.p))

    # the expanded gadget actually key-switches: enc under sk_in,
    # apply EVK, decrypt under sk_out
    enc = bgv.Encoder(params)
    rng = np.random.default_rng(1)
    m = rng.integers(0, params.t, params.n, dtype=np.int64)
    ct = rlwe.Encryptor(params, sk_in).encrypt(
        jax.random.PRNGKey(9), enc.encode(m))
    ev = bgv.Evaluator(params)
    ct2 = ev.apply_evaluation_key(ct, rlwe.EvaluationKey(gadget=expanded))
    got = np.asarray(enc.decode(
        rlwe.Decryptor(params, sk_out).decrypt(ct2))) % params.t
    np.testing.assert_array_equal(got, m % params.t)


def test_seeded_ciphertext():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=9, log_q=(45, 38), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_e = jax.random.split(jax.random.PRNGKey(2))
    sk = kgen.gen_secret_key(k_sk)
    encr = rlwe.Encryptor(params, sk)

    seed = b"ct-seed"
    ct = encr.encrypt_zero_seeded(k_e, seed)
    # receiver re-derives c1 from the seed alone
    from lattigo_tpu.ring import sampling
    c1 = sampling.KeyedPRNG(seed).uniform_poly(params.ring_q)
    np.testing.assert_array_equal(np.asarray(ct.value[1]), np.asarray(c1))
    # and it decrypts to ~zero noise
    enc = bgv.Encoder(params)
    pt = enc.encode(np.zeros(params.n, dtype=np.int64))
    from lattigo_tpu.rlwe.encryption import add_plaintext
    ct2 = add_plaintext(params, ct, pt)
    got = np.asarray(enc.decode(rlwe.Decryptor(params, sk).decrypt(ct2)))
    assert np.all(got % params.t == 0)
