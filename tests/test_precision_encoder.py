"""~106-bit double-double encoder (ref encoder.go:342 embedArbitrary)."""

import numpy as np
from fractions import Fraction

import jax

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.schemes.ckks import PrecisionEncoder


def test_precision_encoder_roundtrip():
    """Encode/decode at a 100-bit scale keeps ≥ 90 bits — far past the f64
    embedding floor of the default encoder."""
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(60, 60, 55), log_p=(60,), log_default_scale=100))
    enc = PrecisionEncoder(params)
    rng = np.random.default_rng(0)
    v = (rng.uniform(-1, 1, params.max_slots)
         + 1j * rng.uniform(-1, 1, params.max_slots))
    pt = enc.encode(v, scale=Fraction(2) ** 100)
    hi, lo = enc.decode_dd(pt)
    err = np.abs((hi - v) + lo).max()
    assert err < 2.0 ** -90, f"roundtrip err 2^{np.log2(err):.1f}"


def test_precision_encoder_through_encryption():
    """enc → encrypt → decrypt → dec at a 100-bit scale: the residual is
    the RLWE noise (≈ scale·2^-100·noise), well below 2^-53."""
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(60, 60, 55), log_p=(60,), log_default_scale=100))
    enc = PrecisionEncoder(params)
    kgen = rlwe.KeyGenerator(params)
    sk = kgen.gen_secret_key(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    v = (rng.uniform(-1, 1, params.max_slots)
         + 1j * rng.uniform(-1, 1, params.max_slots))
    ct = rlwe.Encryptor(params, sk).encrypt(
        jax.random.PRNGKey(1), enc.encode(v, scale=Fraction(2) ** 100))
    hi, lo = enc.decode_dd(rlwe.Decryptor(params, sk).decrypt(ct))
    err = np.abs((hi - v) + lo).max()
    assert err < 2.0 ** -85, f"noise floor 2^{np.log2(err):.1f}"
