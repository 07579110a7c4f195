"""BGV end-to-end tests: exact integer SIMD arithmetic.

Gate for SURVEY.md §7 step 4: encrypt → Mul+Relin → Rescale → decrypt must
be EXACT (slices.Equal-style assertions, ref schemes/bgv/test_utils.go:73).
"""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import bgv


@pytest.fixture(scope="module")
def ctx():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=10,
        log_q=(45, 35, 35),
        log_p=(50,),
        t=65537,  # ≡ 1 mod 2^11 -> full slot batching at logN=10
    ))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_pk, k_rlk, k_gk = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = kgen.gen_secret_key(k_sk)
    pk = kgen.gen_public_key(k_pk, sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    gks = kgen.gen_galois_keys(
        k_gk, [params.galois_element(1), params.galois_element_order_two], sk)
    evk = rlwe.EvaluationKeySet(relinearization_key=rlk, galois_keys=gks)
    return dict(
        params=params, sk=sk, pk=pk,
        enc=bgv.Encoder(params),
        encryptor=rlwe.Encryptor(params, sk),
        encryptor_pk=rlwe.Encryptor(params, pk),
        decryptor=rlwe.Decryptor(params, sk),
        eval=bgv.Evaluator(params, evk),
    )


def rand_msg(params, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, params.t, size=params.n, dtype=np.int64)


def enc_dec(ctx, ct):
    return ctx["enc"].decode(ctx["decryptor"].decrypt(ct))


def test_encode_decode_roundtrip(ctx):
    params, enc = ctx["params"], ctx["enc"]
    m = rand_msg(params, 1)
    pt = enc.encode(m)
    np.testing.assert_array_equal(enc.decode(pt) % params.t, m)


def test_encrypt_decrypt_sk(ctx):
    params = ctx["params"]
    m = rand_msg(params, 2)
    ct = ctx["encryptor"].encrypt(jax.random.PRNGKey(1), ctx["enc"].encode(m))
    np.testing.assert_array_equal(enc_dec(ctx, ct) % params.t, m)


def test_encrypt_decrypt_pk(ctx):
    params = ctx["params"]
    m = rand_msg(params, 3)
    ct = ctx["encryptor_pk"].encrypt(jax.random.PRNGKey(2), ctx["enc"].encode(m))
    np.testing.assert_array_equal(enc_dec(ctx, ct) % params.t, m)


def test_add_sub(ctx):
    params, ev = ctx["params"], ctx["eval"]
    m1, m2 = rand_msg(params, 4), rand_msg(params, 5)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    ct1 = ctx["encryptor"].encrypt(k1, ctx["enc"].encode(m1))
    ct2 = ctx["encryptor"].encrypt(k2, ctx["enc"].encode(m2))
    np.testing.assert_array_equal(
        enc_dec(ctx, ev.add(ct1, ct2)) % params.t, (m1 + m2) % params.t)
    np.testing.assert_array_equal(
        enc_dec(ctx, ev.sub(ct1, ct2)) % params.t, (m1 - m2) % params.t)


def test_add_plaintext_and_scalar(ctx):
    params, ev = ctx["params"], ctx["eval"]
    m1, m2 = rand_msg(params, 6), rand_msg(params, 7)
    ct = ctx["encryptor"].encrypt(jax.random.PRNGKey(4), ctx["enc"].encode(m1))
    pt2 = ctx["enc"].encode(m2)
    np.testing.assert_array_equal(
        enc_dec(ctx, ev.add(ct, pt2)) % params.t, (m1 + m2) % params.t)
    np.testing.assert_array_equal(
        enc_dec(ctx, ev.add(ct, 42)) % params.t, (m1 + 42) % params.t)
    np.testing.assert_array_equal(
        enc_dec(ctx, ev.mul_scalar(ct, 7)) % params.t, (m1 * 7) % params.t)


def test_mul_relin_rescale(ctx):
    """The §7-step-4 gate: Mul+Relin, then Rescale, both exact."""
    params, ev = ctx["params"], ctx["eval"]
    m1, m2 = rand_msg(params, 8), rand_msg(params, 9)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    ct1 = ctx["encryptor"].encrypt(k1, ctx["enc"].encode(m1))
    ct2 = ctx["encryptor"].encrypt(k2, ctx["enc"].encode(m2))
    expect = (m1.astype(object) * m2) % params.t

    ct_mul = ev.mul_relin(ct1, ct2)
    assert ct_mul.degree == 1
    np.testing.assert_array_equal(enc_dec(ctx, ct_mul) % params.t, expect)

    ct_rs = ev.rescale(ct_mul)
    assert ct_rs.level == ct_mul.level - 1
    np.testing.assert_array_equal(enc_dec(ctx, ct_rs) % params.t, expect)


def test_mul_plaintext(ctx):
    params, ev = ctx["params"], ctx["eval"]
    m1, m2 = rand_msg(params, 10), rand_msg(params, 11)
    ct = ctx["encryptor"].encrypt(jax.random.PRNGKey(6), ctx["enc"].encode(m1))
    out = ev.mul(ct, ctx["enc"].encode(m2))
    np.testing.assert_array_equal(
        enc_dec(ctx, out) % params.t, (m1.astype(object) * m2) % params.t)


def test_mul_depth2(ctx):
    """Two sequential multiplications with rescaling stay exact."""
    params, ev = ctx["params"], ctx["eval"]
    m1, m2, m3 = rand_msg(params, 12), rand_msg(params, 13), rand_msg(params, 14)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    ct1 = ctx["encryptor"].encrypt(k1, ctx["enc"].encode(m1))
    ct2 = ctx["encryptor"].encrypt(k2, ctx["enc"].encode(m2))
    ct3 = ctx["encryptor"].encrypt(k3, ctx["enc"].encode(m3))
    out = ev.rescale(ev.mul_relin(ct1, ct2))
    out = ev.rescale(ev.mul_relin(out, ct3.at_level(out.level)))
    expect = (m1.astype(object) * m2 % params.t * m3) % params.t
    np.testing.assert_array_equal(enc_dec(ctx, out) % params.t, expect)


def test_rotate_columns(ctx):
    params, ev = ctx["params"], ctx["eval"]
    m = rand_msg(params, 15)
    ct = ctx["encryptor"].encrypt(jax.random.PRNGKey(8), ctx["enc"].encode(m))
    got = enc_dec(ctx, ev.rotate_columns(ct, 1)) % params.t
    half = params.n // 2
    expect = np.concatenate([np.roll(m[:half], -1), np.roll(m[half:], -1)])
    np.testing.assert_array_equal(got, expect)


def test_rotate_rows(ctx):
    params, ev = ctx["params"], ctx["eval"]
    m = rand_msg(params, 16)
    ct = ctx["encryptor"].encrypt(jax.random.PRNGKey(9), ctx["enc"].encode(m))
    got = enc_dec(ctx, ev.rotate_rows(ct)) % params.t
    half = params.n // 2
    expect = np.concatenate([m[half:], m[:half]])
    np.testing.assert_array_equal(got, expect)


def test_add_after_rescale_scale_matching(ctx):
    """Adding cts at different scales goes through scale matching."""
    params, ev = ctx["params"], ctx["eval"]
    m1, m2, m3 = rand_msg(params, 17), rand_msg(params, 18), rand_msg(params, 19)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(10), 3)
    ct1 = ctx["encryptor"].encrypt(k1, ctx["enc"].encode(m1))
    ct2 = ctx["encryptor"].encrypt(k2, ctx["enc"].encode(m2))
    ct3 = ctx["encryptor"].encrypt(k3, ctx["enc"].encode(m3))
    prod = ev.rescale(ev.mul_relin(ct1, ct2))  # scale != 1 now
    assert prod.scale != ct3.scale
    out = ev.add(prod, ct3.at_level(prod.level))
    expect = (m1.astype(object) * m2 + m3) % params.t
    np.testing.assert_array_equal(enc_dec(ctx, out) % params.t, expect)
