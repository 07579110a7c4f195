"""Full CKKS bootstrapping pipeline test (ref bootstrapping_test.go).

Small insecure parameters: logN=8, 17-limb chain. A level-0 ciphertext is
refreshed to a usable level and must retain ≥ 8 bits of precision (the
message ratio q0/Δ0 = 2^10 bounds the achievable precision here; the
reference's headline 27.9 bits uses logN=16 production parameters).
"""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.circuits import bootstrapping as bts
from lattigo_tpu.circuits.mod1 import Mod1Parameters


@pytest.mark.parametrize("ephemeral_weight", [None, 16],
                         ids=["dense", "sparse-encapsulated"])
def test_bootstrap_end_to_end(ephemeral_weight):
    # Chain layout (bottom→top): q0(55) | residual(45) | S2C 2x45 |
    # EvalMod 11x55 | C2S 3x55. EvalMod primes match the 2^55 working scale
    # (the reference's EvalModLogScale design) so the Chebyshev power-basis
    # scales stay bounded.
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=8,
        log_q=(55,) + (45,) * 3 + (55,) * 14,
        log_p=(60, 60),
        log_default_scale=45,
    ))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    enc = ckks.Encoder(params)
    ev0 = ckks.Evaluator(params, rlwe.EvaluationKeySet(relinearization_key=rlk))

    btp_params = bts.BootstrappingParameters(
        c2s_levels=[4, 3],
        s2c_levels=[4, 3],
        mod1=Mod1Parameters(k=16, degree=30, double_angle=4,
                            log_message_ratio=10),
        residual_levels=1,
        ephemeral_secret_weight=ephemeral_weight,
    )
    btp = bts.BootstrappingEvaluator(params, ev0, enc, btp_params)

    gks = kgen.gen_galois_keys(k_gk, btp.galois_elements(), sk)
    evk = rlwe.EvaluationKeySet(relinearization_key=rlk, galois_keys=gks)
    btp.with_evaluator(ckks.Evaluator(params, evk))

    enc_keys = btp.gen_encapsulation_keys(jax.random.PRNGKey(77), sk)

    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v)).at_level(0)
    assert ct.level == 0

    out = btp.bootstrap(ct, enc_keys)
    assert out.level >= btp_params.residual_levels, (
        f"bootstrap returned level {out.level}")

    got = enc.decode(rlwe.Decryptor(params, sk).decrypt(out))
    err = np.abs(got - v)
    prec = -np.log2(err.max() + 1e-300)
    print(f"bootstrap precision: {prec:.1f} bits (out level {out.level})")
    assert prec >= 8.0, f"bootstrap precision too low: {prec:.1f} bits"
