"""On-TPU correctness gate (~5 min): run on the REAL chip before shipping.

The pytest suite is pinned to CPU (tests/conftest.py) and so structurally
cannot see TPU lowering bugs — e.g. a pallas kernel exceeding the scoped
VMEM limit compiles nowhere but on the chip (round-3 regression: the
logN=16 MXU NTT). This gate runs the checks that only mean something on
hardware:

1. Reference KAT vectors (ring/ntt_test.go) bit-exact on the chip.
2. Every fast NTT engine vs the plain stage-by-stage u64 path at
   logN ∈ {13, 14, 15, 16}, for both 28-bit (pallas MXU), 30-bit (VPU),
   and 50/60-bit (XLA u64 MXU) prime classes — bit-exact.
3. One end-to-end bootstrap at logN=8 with ≥ 8 bits of precision.
4. The published N15QP768 preset recipe at logN=10 with a precision
   ratchet (--full: the full logN=15 preset) — a chip-preset precision
   regression fails the gate instead of waiting for a bench rerun.

Prints one line per check and exits non-zero on any failure.

Usage: timeout 2400 python tpu_gate.py          (quick; ~12 min cached,
                                                 +~20 min first preset compile)
       timeout 7200 python tpu_gate.py --full   (all logN x prime classes
                                                 + full-degree preset)
"""

import sys
import time

import numpy as np
import jax

import lattigo_tpu  # noqa: F401  (enables x64 — must precede jax use)


def check(name, fn, retries: int = 1):
    t0 = time.time()
    for attempt in range(retries + 1):
        try:
            fn()
            print(f"PASS {name} [{time.time() - t0:.1f}s]", flush=True)
            return True
        except Exception as e:
            msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            transient = "remote_compile" in msg or "INTERNAL" in msg
            if transient and attempt < retries:
                print(f"RETRY {name}: transient tunnel error: {msg}",
                      flush=True)
                continue
            print(f"FAIL {name}: {msg} [{time.time() - t0:.1f}s]", flush=True)
            return False


def gate_kat():
    sys.path.insert(0, "tests")
    from test_lattigo_vectors import _parse_reference_vectors
    from lattigo_tpu.ring.ring import Ring
    for n, qis, poly, poly_ntt in _parse_reference_vectors():
        ring = Ring(n, qis)
        got = np.asarray(jax.jit(ring.ntt)(poly))
        np.testing.assert_array_equal(got, poly_ntt, err_msg=f"N={n}")
        back = np.asarray(jax.jit(ring.intt)(got))
        np.testing.assert_array_equal(back, poly, err_msg=f"N={n} intt")


def gate_engines(log_ns, qbits_list):
    import os
    from lattigo_tpu.ring.ring import Ring
    from lattigo_tpu.utils.primes import generate_ntt_primes

    rng = np.random.default_rng(0)
    for logn in log_ns:
        n = 1 << logn
        for qbits in qbits_list:
            primes = generate_ntt_primes(qbits, 2 * n, 2)
            fast = Ring(n, primes)
            if fast._pallas is None and qbits < 31:
                raise AssertionError(
                    f"no fast engine selected at logN={logn} q={qbits}b")
            os.environ["LATTIGO_TPU_NO_PALLAS"] = "1"
            try:
                plain = Ring(n, primes)
            finally:
                del os.environ["LATTIGO_TPU_NO_PALLAS"]
            x = np.stack([rng.integers(0, q, (2, n), dtype=np.uint64)
                          for q in primes], axis=-2)  # [2, L, N]
            a = np.asarray(jax.jit(fast.ntt)(x))
            b = np.asarray(jax.jit(plain.ntt)(x))
            np.testing.assert_array_equal(
                a, b, err_msg=f"logN={logn} q={qbits}b "
                f"({type(fast._pallas).__name__} vs plain)")
            back = np.asarray(jax.jit(fast.intt)(a))
            np.testing.assert_array_equal(
                back, x, err_msg=f"logN={logn} q={qbits}b intt")


def gate_bootstrap():
    from fractions import Fraction
    from lattigo_tpu import rlwe
    from lattigo_tpu.schemes import ckks
    from lattigo_tpu.circuits import bootstrapping as bts
    from lattigo_tpu.circuits import bootstrapping_presets as bp
    from lattigo_tpu.ring.sampling import Ternary

    residual = ckks.ParametersLiteral(
        log_n=8, log_q=(55, 45), log_p=(60, 60), log_default_scale=45,
        xs=Ternary(hamming_weight=32))
    lit = bp.BootstrappingLiteral(
        c2s_log_scales=[[56], [56]], s2c_log_scales=[[39], [39]],
        ephemeral_secret_weight=None)
    full, btp = bp.build_bootstrapping_parameters(residual, lit)
    params = ckks.Parameters(full)
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    enc = ckks.Encoder(params)
    b = bts.BootstrappingEvaluator(
        params, ckks.Evaluator(params, rlwe.EvaluationKeySet(
            relinearization_key=rlk)), enc, btp)
    gks = kgen.gen_galois_keys(k_gk, b.galois_elements(), sk)
    b.with_evaluator(ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk, galois_keys=gks)))
    rng = np.random.default_rng(1)
    v = (rng.uniform(-1, 1, params.max_slots)
         + 1j * rng.uniform(-1, 1, params.max_slots))
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v)).at_level(0)
    out = b.jitted(ct)(ct)
    got = enc.decode(rlwe.Decryptor(params, sk).decrypt(out))
    prec = -np.log2(np.abs(got - v).max())
    print(f"     bootstrap logN=8 precision: {prec:.1f} bits", flush=True)
    assert prec >= 8.0, f"bootstrap precision {prec:.1f} < 8 bits"


def gate_preset(log_n: int | None = 10, min_worst: float = 15.0,
                min_avg: float = 17.0, max_seconds: float | None = None):
    """Published-preset precision gate ON THE CHIP (round-4 verdict #5:
    a chip-preset precision regression must fail a committed gate, not
    wait for a human bench rerun). Quick profile: the N15QP768 recipe at
    logN=10 (post-round-5 measured 16.6/18.5 bits; ratchet 15/17).
    --full: the full logN=15 preset (precision ratchet; timing is
    bench_bootstrap.py's job — it has the windowed methodology)."""
    import time as _t
    from lattigo_tpu.circuits import bootstrapping_presets as bp

    t0 = _t.time()
    worst, avg = bp.run_recipe(getattr(bp, "N15QP768_H192_H32"),
                               log_n=log_n)
    dt = _t.time() - t0
    print(f"     N15QP768 @ logN={log_n or 15}: {worst:.1f} worst / "
          f"{avg:.1f} avg bits [{dt:.0f}s incl compile]", flush=True)
    assert worst >= min_worst, f"preset worst {worst:.1f} < {min_worst}"
    assert avg >= min_avg, f"preset avg {avg:.1f} < {min_avg}"


def main():
    quick = "--full" not in sys.argv
    dev = jax.devices()[0]
    print(f"device: {dev} ({jax.default_backend()})", flush=True)
    ok = True
    ok &= check("KAT vectors (ring/ntt_test.go) bit-exact", gate_kat)
    log_ns = [13, 16] if quick else [13, 14, 15, 16]
    ok &= check(f"fast engines vs plain, logN={log_ns}, q=28b",
                lambda: gate_engines(log_ns, [28]))
    if not quick:
        ok &= check(f"fast engines vs plain, logN={log_ns}, q=30b",
                    lambda: gate_engines(log_ns, [30]))
    ok &= check(f"u64 MXU engine vs plain, logN={log_ns}, q=50b",
                lambda: gate_engines(log_ns, [50]))
    # mixed-width chain (25-bit prime inside a u64-MXU chain): regression
    # for the mred small-modulus corruption (round 4)
    ok &= check("u64 MXU engine vs plain, logN=[15], q=25b",
                lambda: gate_engines([15], [25]))
    if not quick:
        ok &= check("u64 MXU engine vs plain, logN=[14,16], q=60b",
                    lambda: gate_engines([14, 16], [60]))
    ok &= check("end-to-end bootstrap (logN=8)", gate_bootstrap)
    if quick:
        ok &= check("published preset N15QP768 recipe @ logN=10 (chip)",
                    gate_preset)
    else:
        # full-degree flagship: precision ratchet (post-round-5 chip
        # measurement) + wall-time bound
        def full_preset():
            import time as _t
            from lattigo_tpu.circuits import bootstrapping_presets as bp
            t0 = _t.time()
            worst, avg = bp.run_recipe(getattr(bp, "N15QP768_H192_H32"))
            print(f"     N15QP768 @ logN=15: {worst:.1f} worst / "
                  f"{avg:.1f} avg bits", flush=True)
            assert worst >= 12.0 and avg >= 14.5, (worst, avg)
        ok &= check("published preset N15QP768 FULL logN=15 (chip)",
                    full_preset)
    print("GATE", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
