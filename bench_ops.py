"""Per-layer benchmark suite: one JSON line per op, on the real chip.

Analog of the reference's layered Go benchmarks — ``BenchmarkRing``
(ring/ring_benchmark_test.go:11), ``BenchmarkRLWE``
(core/rlwe/rlwe_benchmark_test.go:12), ``BenchmarkCKKS``
(schemes/ckks/ckks_benchmarks_test.go:13) — so perf regressions in the
actual hot paths (keygen, encrypt, gadget product, hoisted rotation, BSGS
lintrans, ModUp/ModDown, rescale) are visible round over round.

Methodology matches bench.py: k dependency-chained windows, median, spread
check. Each line: {"metric", "value", "unit", "spread", ...}.

Usage: python bench_ops.py [log_n]          (default 14)
       LATTIGO_BENCH_CPU=1 python bench_ops.py 10   (CPU smoke)
"""

import json
import os
import statistics
import sys
import time

import numpy as np
import jax

if os.environ.get("LATTIGO_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

import lattigo_tpu  # noqa: F401  (x64)
from fractions import Fraction

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.circuits import lintrans as lt_mod
from lattigo_tpu.rlwe.elements import Ciphertext

WINDOWS = 5
ITERS = 4


def timed(name, fn, chain, first, unit="op/s", batch=1, **extra):
    """Median windows of a dependency-chained op; prints one JSON line.

    fn(x) -> y and chain(y) -> x' must keep shapes static; `first` is the
    initial input. Dependency chaining defeats async-dispatch undercounting.
    """
    x = first
    y = fn(x)
    jax.block_until_ready(y)  # compile
    times = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        z = y
        for _ in range(ITERS):
            z = fn(chain(z))
        jax.block_until_ready(z)
        times.append((time.perf_counter() - t0) / ITERS)
    med = statistics.median(times)
    spread = max(times) / min(times)
    print(json.dumps({
        "metric": name, "value": round(batch / med, 2), "unit": unit,
        "ms": round(med * 1e3 / batch, 3), "spread": round(spread, 3),
        **extra}), flush=True)


def main(log_n: int = 14):
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=log_n, log_q=(55,) + (45,) * 5, log_p=(60, 60),
        log_default_scale=45))
    L = params.max_level
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    enc = ckks.Encoder(params)
    rots = [1, 2, 4, 8]
    gks = kgen.gen_galois_keys(
        k_gk, [params.galois_element(r) for r in rots], sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk, galois_keys=gks))
    encryptor = rlwe.Encryptor(params, sk)
    dec = rlwe.Decryptor(params, sk)

    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.max_slots) \
        + 1j * rng.uniform(-1, 1, params.max_slots)
    pt = enc.encode(v)
    ct = encryptor.encrypt(k_ct, pt)
    meta = dict(is_ntt=ct.is_ntt, scale=ct.scale)
    tag = dict(log_n=log_n, limbs=L + 1)

    # keygen: secret key + relinearization key from a threaded PRNG key
    kg_fn = jax.jit(lambda k: kgen.gen_relinearization_key(
        jax.random.wrap_key_data(k), sk).gadget.value.q)
    k0 = jax.random.key_data(k_rlk)
    timed("keygen_rlk", kg_fn,
          lambda y: (k0 + (y.ravel()[0] * 0).astype(k0.dtype)), k0, **tag)

    # encrypt / decrypt (sk)
    enc_fn = jax.jit(lambda k: encryptor.encrypt(
        jax.random.wrap_key_data(k), pt).value)
    timed("encrypt_sk", enc_fn,
          lambda y: (k0 + (y.ravel()[0] * 0).astype(k0.dtype)), k0, **tag)
    dec_fn = jax.jit(lambda u: dec.decrypt(
        Ciphertext(value=u, **meta)).value)
    timed("decrypt", dec_fn,
          lambda y: ct.value + jax.numpy.zeros_like(ct.value)
          .at[..., 0, 0, 0].set(y.ravel()[0] * 0), ct.value, **tag)

    # gadget product (relinearize path): square then relinearize
    def gp(u):
        c = Ciphertext(value=u, **meta)
        return ev.relinearize(ev.mul(c, c)).value
    timed("mul_relinearize", jax.jit(gp),
          lambda y: ct.value + (y.ravel()[0] * 0), ct.value, **tag)

    # rescale
    def rs(u):
        return ev.rescale(Ciphertext(value=u, **meta)).value
    timed("rescale", jax.jit(rs),
          lambda y: ct.value + (y.ravel()[0] * 0).astype(np.uint64),
          ct.value, **tag)

    # hoisted rotations: 4 rotations, one decomposition
    def hr(u):
        c = Ciphertext(value=u, **meta)
        outs = ev.rotate_hoisted(c, rots)
        return sum(outs[r].value for r in rots)
    timed("rotate_hoisted_x4", jax.jit(hr),
          lambda y: ct.value + (y.ravel()[0] * 0), ct.value,
          batch=len(rots), unit="rot/s", **tag)

    # ModUp / ModDown (decompose + one hoisted product)
    def md(u):
        digits = ev.decompose_ntt(u[..., 1, :, :], L)
        return ev.gadget_product_hoisted(digits, rlk.gadget, L)
    timed("decompose_gadget_product", jax.jit(md),
          lambda y: ct.value + (y.ravel()[0] * 0), ct.value, **tag)

    # BSGS lintrans: 16 diagonals
    slots = params.max_slots
    diagonals = {k: rng.uniform(-1, 1, slots) for k in range(16)}
    scale = params.q_moduli[L]
    lt = lt_mod.encode_linear_transformation(
        params, diagonals, lt_mod.ckks_diag_encoder(params, enc, scale),
        level_q=L, scale=scale, slots=slots)
    gks2 = kgen.gen_galois_keys(k_gk, lt.galois_elements(params), sk)
    ev2 = ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk, galois_keys=gks2))
    lt_ev = lt_mod.LinTransEvaluator(ev2)

    def bsgs(u):
        return lt_ev.evaluate(Ciphertext(value=u, **meta), lt).value
    timed("lintrans_bsgs_16diag", jax.jit(bsgs),
          lambda y: ct.value + (y.ravel()[0] * 0), ct.value, **tag)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 14)
