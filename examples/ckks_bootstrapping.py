"""CKKS bootstrapping basics: refresh an exhausted ciphertext.

Analog of the reference's examples/singleparty/ckks_bootstrapping/basics:
encrypt, consume every level, bootstrap back to a usable level, and keep
computing. Demo-sized parameters (logN=8, insecure) so it runs in seconds;
the same pipeline scales to the production logN=16 presets.
"""

import numpy as np
import jax

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.circuits import bootstrapping as bts
from lattigo_tpu.circuits.mod1 import Mod1Parameters


def main():
    # chain (bottom -> top): q0 | residual x3 | S2C 2x45 | EvalMod 11x55 | C2S
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

    btp = bts.BootstrappingEvaluator(params, ev0, enc, bts.BootstrappingParameters(
        c2s_levels=[4, 3],
        s2c_levels=[4, 3],
        mod1=Mod1Parameters(k=16, degree=30, double_angle=4,
                            log_message_ratio=10),
        residual_levels=1,
    ))
    gks = kgen.gen_galois_keys(k_gk, btp.galois_elements(), sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk, galois_keys=gks))
    btp.with_evaluator(ev)

    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.max_slots) \
        + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v))

    # burn all levels
    ct = ct.at_level(0)
    print(f"before bootstrap: level {ct.level}")

    ct = btp.bootstrap(ct)
    print(f"after bootstrap:  level {ct.level} "
          f"(min usable {btp.minimum_input_level})")

    # the refreshed ciphertext supports arithmetic again
    ct2 = ev.rescale(ev.mul_relin(ct, ct))
    dec = rlwe.Decryptor(params, sk)
    got = enc.decode(dec.decrypt(ct2))
    err = np.abs(got - v * v).max()
    print(f"(bootstrap -> square) max err {err:.2e} "
          f"({-np.log2(err):.1f} bits)")


if __name__ == "__main__":
    main()
