"""Headline benchmark: single-chip negacyclic NTT throughput, logN=14.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Extra fields carry the secondary paths: the 60-bit ``ntt_u64_mxu`` engine
(the one production bootstrap chains actually use) and logN=16.

Baseline: Lattigo's CPU NTT cannot be measured in this image (no Go
toolchain — see BASELINE.md). We anchor against an estimate of
50 µs / single-prime logN=14 forward NTT on one modern x86 core
(= 20,000 NTT/s), consistent with published Lattigo-class RNS library
figures; Lattigo's per-NTT cost is essentially independent of prime size
below 2^61. The north-star target (BASELINE.json) is ≥10x.

Methodology (round-3 post-mortem: a two-point difference of single runs
went NEGATIVE under tunnel jitter): k=7 dependency-chained windows of 10
iterations each, median window, and a hard validity check — value > 0 and
max/min window spread < 1.3 — so a noisy run fails loudly instead of
publishing garbage.
"""

import json
import statistics
import sys
import time

LATTIGO_CPU_NTT_PER_SEC_EST = 20_000.0


def _measure_engine(ring, batch: int, n_limbs: int, q: int, *,
                    windows: int = 7, iters: int = 10):
    """Median per-NTT-call seconds over dependency-chained windows.

    The ``iters``-long serial chain is fused INSIDE one jitted program, so
    a window is ONE device dispatch: per-call dispatch latency (several ms
    through the axon tunnel — larger than the kernel itself at logN=14) is
    amortized 1/iters instead of dominating the measurement, while the
    data dependency still defeats async undercounting and result caching.
    An NTT is a bijection implemented as matmul/permute stages, so XLA
    cannot collapse the composition."""
    import jax
    import jax.numpy as jnp

    n = ring.n
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (batch, n_limbs, n), 0, q, dtype=jnp.uint64)

    def chain(a):
        for _ in range(iters):
            a = ring.ntt(a)
        return a

    jchain = jax.jit(chain)
    y = jchain(x)
    jax.block_until_ready(y)  # compile + sync

    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        y = jchain(y)  # serial chain across windows too
        jax.block_until_ready(y)
        times.append((time.perf_counter() - t0) / iters)
    med = statistics.median(times)
    spread = max(times) / min(times)
    return med, spread


def bench_path(log_n: int, qbits: int, batch: int):
    from lattigo_tpu.ring.ring import Ring
    from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator

    n = 1 << log_n
    q = NTTFriendlyPrimesGenerator(qbits, 2 * n).next_alternating_prime()
    ring = Ring(n, [q])
    engine = type(ring._pallas).__name__ if ring._pallas else "plain"
    med, spread = _measure_engine(ring, batch, 1, q)
    per_sec = batch / med
    assert per_sec > 0, f"non-positive throughput {per_sec}"
    if spread >= 1.3:
        print(f"# warning: window spread {spread:.2f} >= 1.3 at "
              f"logN={log_n} q={qbits}b — rerun for a stable number",
              file=sys.stderr)
    return per_sec, spread, engine


def main():
    import lattigo_tpu  # noqa: F401  (x64)

    # headline: the 28-bit MXU pallas path at logN=14
    head, spread, engine = bench_path(14, 28, batch=1024)
    # secondary: the 60-bit XLA u64 MXU path (bootstrap chains) + logN=16
    u64_14, sp2, eng2 = bench_path(14, 60, batch=256)
    mxu_16, sp3, eng3 = bench_path(16, 28, batch=256)
    u64_16, sp4, eng4 = bench_path(16, 60, batch=64)

    assert head > 0 and u64_14 > 0 and mxu_16 > 0 and u64_16 > 0
    print(json.dumps({
        "metric": "ntt_logN14_single_prime_throughput",
        "value": round(head, 1),
        "unit": "ntt/s",
        "vs_baseline": round(head / LATTIGO_CPU_NTT_PER_SEC_EST, 3),
        "spread": round(spread, 3),
        "engine": engine,
        "ntt_logN14_60b": round(u64_14, 1),
        "ntt_logN16_28b": round(mxu_16, 1),
        "ntt_logN16_60b": round(u64_16, 1),
        "engines_60b_16": [eng2, eng3, eng4],
    }))


if __name__ == "__main__":
    main()
