"""CKKS over the conjugate-invariant ring: N real slots at ring degree N."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.ring.ring import CONJUGATE_INVARIANT
from lattigo_tpu.schemes import ckks
from lattigo_tpu.schemes.ckks.encoder import CIEncoder


@pytest.fixture(scope="module")
def ctx():
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(50, 40, 40), log_p=(55,), log_default_scale=40,
        ring_type=CONJUGATE_INVARIANT))
    assert params.max_slots == params.n
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk = jax.random.split(jax.random.PRNGKey(0))
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    return dict(
        params=params, sk=sk,
        enc=CIEncoder(params),
        encryptor=rlwe.Encryptor(params, sk),
        decryptor=rlwe.Decryptor(params, sk),
        ev=ckks.Evaluator(params, rlwe.EvaluationKeySet(
            relinearization_key=rlk)),
    )


def test_ci_encode_decode_roundtrip(ctx):
    enc, params = ctx["enc"], ctx["params"]
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.n)
    got = enc.decode(enc.encode(v))
    assert np.abs(got - v).max() < 1e-9


def test_ci_encrypt_mul_decrypt(ctx):
    params, enc = ctx["params"], ctx["enc"]
    ev = ctx["ev"]
    rng = np.random.default_rng(1)
    v1 = rng.uniform(-1, 1, params.n)
    v2 = rng.uniform(-1, 1, params.n)
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    ct1 = ctx["encryptor"].encrypt(k1, enc.encode(v1))
    ct2 = ctx["encryptor"].encrypt(k2, enc.encode(v2))

    out = ev.rescale(ev.mul_relin(ct1, ct2))
    got = enc.decode(ctx["decryptor"].decrypt(out))
    err = np.abs(got - v1 * v2).max()
    assert err < 1e-6, f"CI mul err {err:.2e}"

    out2 = ev.add(ct1, ct2)
    got2 = enc.decode(ctx["decryptor"].decrypt(out2))
    assert np.abs(got2 - (v1 + v2)).max() < 1e-8


def test_ci_rotate(ctx):
    """Slot rotation in the CI ring: N real slots rotate cyclically."""
    params, enc, sk = ctx["params"], ctx["enc"], ctx["sk"]
    kgen = rlwe.KeyGenerator(params)
    k = 3
    gal = params.galois_element(k)
    gks = kgen.gen_galois_keys(jax.random.PRNGKey(7), [gal], sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(galois_keys=gks))

    rng = np.random.default_rng(5)
    v = rng.uniform(-1, 1, params.n)
    ct = ctx["encryptor"].encrypt(jax.random.PRNGKey(8), enc.encode(v))
    out = ev.automorphism(ct, gal)
    got = enc.decode(ctx["decryptor"].decrypt(out))
    want = np.roll(v, -k)
    assert np.abs(got - want).max() < 1e-8, (
        f"CI rotate err {np.abs(got - want).max():.2e}")
