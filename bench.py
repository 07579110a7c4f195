"""Headline benchmark: single-chip negacyclic NTT throughput, logN=14.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: Lattigo's CPU NTT cannot be measured in this image (no Go
toolchain — see BASELINE.md). We anchor against an estimate of
50 µs / single-prime logN=14 forward NTT on one modern x86 core
(= 20,000 NTT/s), consistent with published Lattigo-class RNS library
figures. vs_baseline = measured_ntts_per_sec / 20_000. The north-star
target (BASELINE.json) is ≥10x, i.e. vs_baseline ≥ 10.
"""

import json
import time

LATTIGO_CPU_NTT_PER_SEC_EST = 20_000.0
LOG_N = 14
BATCH = 256      # polys per NTT call (batch x 1 limb)
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from lattigo_tpu.ring.ring import Ring
    from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator

    n = 1 << LOG_N
    q = NTTFriendlyPrimesGenerator(60, 2 * n).next_alternating_prime()
    ring = Ring(n, [q])

    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (BATCH, 1, n), 0, q, dtype=jnp.uint64)

    fwd = jax.jit(lambda a: ring.ntt(a))
    fwd(x).block_until_ready()  # compile

    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = fwd(x)
    y.block_until_ready()
    dt = time.perf_counter() - t0

    ntts = BATCH * ITERS
    per_sec = ntts / dt
    print(json.dumps({
        "metric": f"ntt_logN{LOG_N}_single_prime_throughput",
        "value": round(per_sec, 1),
        "unit": "ntt/s",
        "vs_baseline": round(per_sec / LATTIGO_CPU_NTT_PER_SEC_EST, 3),
    }))


if __name__ == "__main__":
    main()
