"""Params JSON round-trip + noise telemetry + serialization round-trips."""

import numpy as np
import jax

from lattigo_tpu import rlwe
from lattigo_tpu.rlwe.params import ParametersLiteral
from lattigo_tpu.ring.sampling import Ternary, DiscreteGaussian
from lattigo_tpu.schemes import bgv
from lattigo_tpu.utils import noise as noise_mod
from lattigo_tpu.utils import serialization as ser


def test_parameters_literal_json_roundtrip():
    lit = ParametersLiteral(
        log_n=11, log_q=(45, 38), log_p=(50,),
        xe=DiscreteGaussian(3.2, 19.2), xs=Ternary(p=2 / 3))
    lit2 = ParametersLiteral.from_json(lit.to_json())
    assert lit2.log_n == lit.log_n
    assert lit2.log_q == (45, 38) and lit2.log_p == (50,)
    assert isinstance(lit2.xe, DiscreteGaussian) and lit2.xe.sigma == 3.2
    assert isinstance(lit2.xs, Ternary)


def test_noise_telemetry_fresh_ciphertext():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=9, log_q=(45, 38), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_ct = jax.random.split(jax.random.PRNGKey(0))
    sk = kgen.gen_secret_key(k_sk)
    ct = rlwe.Encryptor(params, sk).encrypt_zero(k_ct)
    # fresh sk-encryption noise: std sigma=3.2 -> log2 std ~ 1.7 +/- slack
    l2 = noise_mod.log2_noise_std(params, sk, ct)
    assert 0.5 < l2 < 3.5, f"unexpected fresh noise log2 std {l2:.2f}"


def test_serialization_roundtrip_key_and_ct():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=9, log_q=(45, 38), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_ct = jax.random.split(jax.random.PRNGKey(1), 3)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    enc = bgv.Encoder(params)
    m = np.arange(params.n, dtype=np.int64) % params.t
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(m))

    for obj in (sk, rlk, ct):
        blob = ser.dumps(obj)
        back = ser.loads(blob)
        la, lb = jax.tree_util.tree_leaves(obj), jax.tree_util.tree_leaves(back)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored ciphertext still decrypts
    back_ct = ser.loads(ser.dumps(ct))
    got = np.asarray(enc.decode(
        rlwe.Decryptor(params, sk).decrypt(back_ct))) % params.t
    np.testing.assert_array_equal(got, m % params.t)
