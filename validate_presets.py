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

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from lattigo_tpu.circuits import bootstrapping_presets as bp


def validate(name: str, log_n: int = 9) -> float:
    t0 = time.time()
    prec, prec_avg = bp.run_recipe(getattr(bp, name), log_n)
    # the reference quotes MEAN per-slot precision (parameters_literal
    # .go:25 "27.9 (27.4 L2)") — report both
    print(f"{name} @ logN={log_n}: {prec:.1f} bits worst-slot / "
          f"{prec_avg:.1f} avg ({time.time()-t0:.0f}s)", flush=True)
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
