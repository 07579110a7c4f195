"""Data-parallel scaling benchmark: batched CKKS evaluation over a mesh.

North-star gate (BASELINE.json): >=80% multi-host scaling efficiency on
batched ciphertext evaluation. Real multi-chip hardware is not reachable
from this image (one tunneled chip), so this bench demonstrates the two
facts that determine multi-chip efficiency, on a virtual CPU mesh:

1. **Zero communication on the DP axis**: the batch-sharded evaluation
   pipeline (mul_relin + rescale + rotate) compiles to a program with NO
   collectives — each device holds `batch/N` ciphertexts and runs the
   identical per-example program. On real ICI this is embarrassingly
   parallel; efficiency loss can come only from load imbalance (none here:
   identical static shapes) and launch overhead.
   We assert this by inspecting the compiled HLO for collective ops.

2. **Bit-exactness under sharding**: the N-device result equals the
   1-device result exactly (integer arithmetic, no atomics/reordering).

It also reports the raw wall-clock ratio 1 -> N virtual devices, but note
that number is NOT a scaling-efficiency measurement: a single XLA:CPU
device already multithreads across all host cores, so N virtual devices
add no compute — on real chips each device brings its own compute and the
collective-free program above is what determines efficiency.

Usage: python bench_scaling.py [n_devices] [batch]
Prints one JSON line:
  {"metric": "dp_scaling", "n_devices": N, "collectives_on_dp_axis": 0,
   "bit_exact": true, "wallclock_ratio_shared_cores": ...}
"""

import json
import os
import sys
import time


def main(n_devices: int = 4, batch: int = 16) -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()

    import numpy as np
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from lattigo_tpu import rlwe
    from lattigo_tpu.schemes import ckks
    from lattigo_tpu.rlwe.elements import Ciphertext
    from lattigo_tpu.parallel import make_mesh

    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=12, log_q=(45, 38, 38, 38), log_p=(45,), log_default_scale=38))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    gal = params.galois_element(1)
    gks = kgen.gen_galois_keys(k_gk, [gal], sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk, galois_keys=gks))
    enc = rlwe.Encryptor(params, sk)

    ct = enc.encrypt_zero(k_ct, batch=(batch,))

    def step(v):
        c = Ciphertext(value=v, is_ntt=True, scale=params.default_scale)
        c = ev.rescale(ev.mul_relin(c, c))
        c = ev.rotate(c, 1)
        return c.value

    # --- single device ------------------------------------------------------
    dev0 = jax.devices("cpu")[0]
    v0 = jax.device_put(ct.value, dev0)
    f1 = jax.jit(step)
    r1 = np.asarray(f1(v0))

    def timeit(f, x, iters=8):
        f(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(x)
        r.block_until_ready()
        return (time.perf_counter() - t0) / iters

    t1 = timeit(f1, v0)

    # --- N devices, batch sharded over dp ------------------------------------
    mesh = make_mesh(jax.devices("cpu")[:n_devices], limb=1)
    sh = NamedSharding(mesh, P("dp", None, None, None))
    vN = jax.device_put(ct.value, sh)
    fN = jax.jit(step, in_shardings=sh, out_shardings=sh)
    rN = np.asarray(fN(vN))

    # collective census on the compiled module (fact 1)
    hlo = fN.lower(vN).compile().as_text()
    n_coll = sum(hlo.count(op) for op in (
        "all-reduce", "all-gather", "all-to-all", "collective-permute",
        "reduce-scatter"))

    bit_exact = bool(np.array_equal(r1, rN))  # fact 2
    tN = timeit(fN, vN)

    print(json.dumps({
        "metric": "dp_scaling_batched_ckks_eval",
        "n_devices": n_devices,
        "batch": batch,
        "collectives_on_dp_axis": n_coll,
        "bit_exact": bit_exact,
        "t_1dev_s": round(t1, 6),
        "t_Ndev_s": round(tN, 6),
        "wallclock_ratio_shared_cores": round(t1 / tN, 3) if tN > 0 else 0.0,
    }))
    assert n_coll == 0, "DP axis must compile collective-free"
    assert bit_exact, "sharded result must equal single-device result"


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 4, int(a[1]) if len(a) > 1 else 16)
