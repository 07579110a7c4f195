"""Validate the published bootstrap preset RECIPES at a reduced ring degree.

Runs each preset's exact chain/mod1/factorization structure with log_n
shrunk (default 9) on CPU, end to end, and reports measured precision.
The ring degree scales only the DFT gain (~√N) and RLWE noise (~√N), so a
recipe that is structurally broken (scale plumbing, matrix quantisation,
message-ratio bookkeeping) is loud here without a chip or a logN=15/16
compile. Usage:

    JAX_PLATFORMS=cpu python validate_presets.py [preset ...] [--log-n 9]
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from dataclasses import replace

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.circuits import bootstrapping as bts
from lattigo_tpu.circuits import bootstrapping_presets as bp


def validate(name: str, log_n: int = 9) -> float:
    residual, lit = getattr(bp, name)
    residual = replace(residual, log_n=log_n)
    full, btp = bp.build_bootstrapping_parameters(residual, lit)
    params = ckks.Parameters(full)
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    enc = ckks.Encoder(params)
    b = bts.BootstrappingEvaluator(params, ckks.Evaluator(
        params, rlwe.EvaluationKeySet(relinearization_key=rlk)), enc, btp)
    gks = kgen.gen_galois_keys(k_gk, b.galois_elements(), sk,
                               levels=b.galois_element_levels())
    b.with_evaluator(ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk, galois_keys=gks)))
    keys = b.gen_encapsulation_keys(jax.random.PRNGKey(7), sk)
    rng = np.random.default_rng(1)
    v = (rng.uniform(-1, 1, params.max_slots)
         + 1j * rng.uniform(-1, 1, params.max_slots))
    ct = rlwe.Encryptor(params, sk).encrypt(
        k_ct, enc.encode(v)).at_level(b.minimum_input_level)
    t0 = time.time()
    out = b.jitted(ct, keys=keys)(ct)
    got = enc.decode(rlwe.Decryptor(params, sk).decrypt(out))
    errs = np.abs(got - v)
    prec = float(-np.log2(errs.max()))
    # the reference quotes MEAN per-slot precision (parameters_literal
    # .go:25 "27.9 (27.4 L2)") — report both
    prec_avg = float(np.mean(-np.log2(np.maximum(errs, 2.0 ** -60))))
    print(f"{name} @ logN={log_n}: {prec:.1f} bits worst-slot / "
          f"{prec_avg:.1f} avg (out level {out.level}, "
          f"{time.time()-t0:.0f}s)", flush=True)
    return prec


if __name__ == "__main__":
    argv = sys.argv[1:]
    log_n = 9
    if "--log-n" in argv:
        i = argv.index("--log-n")
        log_n = int(argv[i + 1])
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    names = args or ["N15QP768_H192_H32", "N16QP1546_H192_H32",
                     "N16QP1547_H192_H32", "N16QP1553_H192_H32",
                     "N16QP1767_H32768_H32", "N16QP1788_H32768_H32",
                     "N16QP1793_H32768_H32", "N15QP880_H16384_H32"]
    for n in names:
        validate(n, log_n)
