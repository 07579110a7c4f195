"""Headline benchmark: single-chip negacyclic NTT throughput, logN=14.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: Lattigo's CPU NTT cannot be measured in this image (no Go
toolchain — see BASELINE.md). We anchor against an estimate of
50 µs / single-prime logN=14 forward NTT on one modern x86 core
(= 20,000 NTT/s), consistent with published Lattigo-class RNS library
figures; Lattigo's per-NTT cost is essentially independent of prime size
below 2^61. The north-star target (BASELINE.json) is ≥10x.

The measured path is the production fast path: the four-step MXU kernel
(ring/ntt_mxu.py, exact integer digit matmuls on the systolic array)
that Ring auto-selects for chains of < 2^29-bit primes on TPU. RNS
chains of such primes are the library's recommended TPU parameterisation
(more, smaller primes for the same logQ — supported by the same
parameter machinery, SURVEY.md §7 risk 1).
"""

import json
import time

LATTIGO_CPU_NTT_PER_SEC_EST = 20_000.0
LOG_N = 14
BATCH = 1024     # polys per NTT call (batch x 1 limb)
ITERS = 20


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lattigo_tpu.ring.ring import Ring
    from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator

    n = 1 << LOG_N
    q = NTTFriendlyPrimesGenerator(28, 2 * n).next_alternating_prime()
    ring = Ring(n, [q])

    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (BATCH, 1, n), 0, q, dtype=jnp.uint64)

    fwd = jax.jit(lambda a: ring.ntt(a))
    _ = np.asarray(fwd(x)[0, 0, :4])  # compile + full sync

    # Serial dependency chain (output feeds next input) with one host
    # readback, differenced across two lengths: removes both async-dispatch
    # undercounting and the device-tunnel round-trip, leaving the marginal
    # per-iteration kernel cost.
    def measure(iters: int) -> float:
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = fwd(y)
        _ = np.asarray(y[0, 0, :4])
        return time.perf_counter() - t0

    short, long_ = 5, ITERS + 5
    t_short = measure(short)
    t_long = measure(long_)
    per_iter = (t_long - t_short) / (long_ - short)
    per_sec = BATCH / per_iter
    print(json.dumps({
        "metric": f"ntt_logN{LOG_N}_single_prime_throughput",
        "value": round(per_sec, 1),
        "unit": "ntt/s",
        "vs_baseline": round(per_sec / LATTIGO_CPU_NTT_PER_SEC_EST, 3),
    }))


if __name__ == "__main__":
    main()
