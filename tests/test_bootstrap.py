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

pytestmark = pytest.mark.slow  # compile-heavy tier (see pyproject)


@pytest.fixture(scope="module")
def ctx():
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
    )
    btp = bts.BootstrappingEvaluator(params, ev0, enc, btp_params)
    gks = kgen.gen_galois_keys(k_gk, btp.galois_elements(), sk)
    evk = rlwe.EvaluationKeySet(relinearization_key=rlk, galois_keys=gks)
    btp.with_evaluator(ckks.Evaluator(params, evk))
    return dict(params=params, sk=sk, enc=enc, btp=btp,
                btp_params=btp_params, k_ct=k_ct)


def _fresh_ct(ctx, seed=1, level=0):
    params, enc = ctx["params"], ctx["enc"]
    rng = np.random.default_rng(seed)
    v = (rng.uniform(-1, 1, params.max_slots)
         + 1j * rng.uniform(-1, 1, params.max_slots))
    ct = rlwe.Encryptor(params, ctx["sk"]).encrypt(
        ctx["k_ct"], enc.encode(v)).at_level(level)
    return v, ct


def _precision(ctx, out, v):
    got = ctx["enc"].decode(rlwe.Decryptor(ctx["params"], ctx["sk"]).decrypt(out))
    return -np.log2(np.abs(got - v).max() + 1e-300)


def test_bootstrap_end_to_end(ctx):
    v, ct = _fresh_ct(ctx)
    out = ctx["btp"].bootstrap(ct)
    assert out.level >= ctx["btp_params"].residual_levels, (
        f"bootstrap returned level {out.level}")
    prec = _precision(ctx, out, v)
    print(f"bootstrap precision: {prec:.1f} bits (out level {out.level})")
    assert prec >= 8.0, f"bootstrap precision too low: {prec:.1f} bits"


def test_bootstrap_sparse_encapsulated(ctx):
    """ModUp under an ephemeral sparse secret (ia.cr/2022/024)."""
    params, sk = ctx["params"], ctx["sk"]
    btp = bts.BootstrappingEvaluator(
        params, ctx["btp"].ev, ctx["enc"],
        bts.BootstrappingParameters(
            c2s_levels=[4, 3], s2c_levels=[4, 3],
            mod1=Mod1Parameters(k=16, degree=30, double_angle=4,
                                log_message_ratio=10),
            residual_levels=1, ephemeral_secret_weight=16))
    enc_keys = btp.gen_encapsulation_keys(jax.random.PRNGKey(77), sk)
    v, ct = _fresh_ct(ctx, seed=2)
    out = btp.bootstrap(ct, enc_keys)
    prec = _precision(ctx, out, v)
    print(f"sparse bootstrap precision: {prec:.1f} bits")
    assert prec >= 8.0, f"bootstrap precision too low: {prec:.1f} bits"


def test_bootstrap_slim_decode_then_modup(ctx):
    """Slim circuit order (ref DecodeThenModUp, ia.cr/2018/067): S2C →
    ScaleDown → ModUp → C2S → EvalMod. Output stays in the slots domain."""
    params, sk = ctx["params"], ctx["sk"]
    btp = bts.BootstrappingEvaluator(
        params, ctx["btp"].ev, ctx["enc"],
        bts.BootstrappingParameters(
            c2s_levels=[4, 3], s2c_levels=[4, 3],
            mod1=Mod1Parameters(k=16, degree=30, double_angle=4,
                                log_message_ratio=10),
            residual_levels=1,
            circuit_order=bts.DECODE_THEN_MODUP))
    assert btp.minimum_input_level == 2
    v, ct = _fresh_ct(ctx, seed=4, level=btp.minimum_input_level)
    out = btp.bootstrap(ct)
    assert out.level == btp.output_level
    assert out.level > btp.minimum_input_level  # levels were regained
    prec = _precision(ctx, out, v)
    print(f"slim bootstrap precision: {prec:.1f} bits (out level {out.level})")
    assert prec >= 8.0, f"slim bootstrap precision too low: {prec:.1f} bits"


def test_bootstrap_slim_staged_coeff_circuit(ctx):
    """Manual slim staging with a circuit in the coefficient domain
    (ref slim example step 2: multiply by the monomial X^{N/2} = the
    imaginary unit in the slots domain)."""
    import jax.numpy as jnp
    from fractions import Fraction

    params, sk = ctx["params"], ctx["sk"]
    btp = bts.BootstrappingEvaluator(
        params, ctx["btp"].ev, ctx["enc"],
        bts.BootstrappingParameters(
            c2s_levels=[4, 3], s2c_levels=[4, 3],
            mod1=Mod1Parameters(k=16, degree=30, double_angle=4,
                                log_message_ratio=10),
            residual_levels=1,
            circuit_order=bts.DECODE_THEN_MODUP))
    ev = btp.ev
    v, ct = _fresh_ct(ctx, seed=5, level=btp.minimum_input_level)

    # Step 1: homomorphic decoding.
    ct = btp.slots_to_coeffs(ct)
    # Step 2: coefficient-domain circuit — negacyclic shift by N/2
    # (multiply by X^{N/2}), which is mul-by-i on the slot values.
    n = params.n
    ring = params.ring_q
    val = ct.value
    if ct.is_ntt:
        val = ring.intt(val, ct.level)
    shifted = jnp.roll(val, n // 2, axis=-1)
    idx = jnp.arange(n) < n // 2
    q = ring.q[: ct.level + 1, None]
    neg = jnp.where(shifted == 0, shifted, q - shifted)
    val = jnp.where(idx, neg, shifted)
    ct = ct.replace(value=ring.ntt(val, ct.level), is_ntt=True)
    # Steps 3-6: ScaleDown → ModUp → C2S → EvalMod.
    ct0 = btp.scale_down(ct)
    delta0, q0 = Fraction(ct0.scale), Fraction(params.q_moduli[0])
    up = btp.mod_up(ct0)
    ct_re, ct_im = btp.coeffs_to_slots(up)
    ct_re, ct_im = btp.eval_mod(ct_re), btp.eval_mod(ct_im)
    out = ev.add(ct_re, ev.mul_by_i(ct_im))
    out = out.replace(scale=Fraction(out.scale) * delta0 / q0)

    prec = _precision(ctx, out, 1j * v)
    print(f"slim staged (·X^(N/2)) precision: {prec:.1f} bits")
    assert prec >= 8.0, f"precision too low: {prec:.1f} bits"


def test_bootstrap_meta_iterations(ctx):
    """META-BTS: a second iteration on the residual error must add
    ≥ 3 bits over the single bootstrap (ref evaluator.go:315
    IterationsParameters; gains ~log_prec bits per iteration)."""
    v, ct = _fresh_ct(ctx, seed=3)
    single = ctx["btp"].bootstrap(ct)
    prec1 = _precision(ctx, single, v)
    meta = ctx["btp"].bootstrap_meta(ct, iterations=2, log_prec=6)
    prec2 = _precision(ctx, meta, v)
    print(f"META-BTS precision: {prec1:.1f} → {prec2:.1f} bits")
    assert prec2 >= prec1 + 3.0, (
        f"META-BTS gained only {prec2 - prec1:.1f} bits")


def test_bootstrap_jit_traceable(ctx):
    """The full pipeline traces into ONE jittable XLA program with a batch
    axis (BootstrapMany = leading dim). jitted() runs eval_shape inside —
    trace only, no compile."""
    v, ct = _fresh_ct(ctx, seed=4)
    batched = ct.replace(value=np.broadcast_to(
        np.asarray(ct.value), (3,) + ct.value.shape))
    fn = ctx["btp"].jitted(batched)
    assert fn.out_shape.shape[0] == 3               # batch carried through
    assert fn.out_shape.shape[-2] >= 2              # residual levels present
    assert fn.out_meta["is_ntt"]


def test_bootstrap_many_sparse_packed(ctx):
    """Sparse-slot batching (ref BootstrapMany:229 + PackAndSwitchN1ToN2 /
    UnpackAndSwitchN2ToN1, evaluator.go:857,891): 4 ciphertexts whose
    slots are 4x-replicated (log_slots = log_max_slots - 2, coefficients
    at stride 4) are interleaved into ONE full ciphertext, bootstrapped
    once, and unpacked back to 4 sparse ciphertexts."""
    params, enc, btp = ctx["params"], ctx["enc"], ctx["btp"]
    log_slots = params.log_max_slots - 2
    n_small = 1 << log_slots

    # extend the galois keys with the pack/unpack tree elements
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_gk, _ = jax.random.split(jax.random.PRNGKey(0), 4)
    rlk = kgen.gen_relinearization_key(k_rlk, ctx["sk"])
    lvls = dict(btp.galois_element_levels())
    for el, lv in btp.packing_galois_elements(log_slots).items():
        lvls[el] = max(lvls.get(el, 0), lv)
    gks = kgen.gen_galois_keys(k_gk, sorted(lvls), ctx["sk"], levels=lvls)
    btp.with_evaluator(ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk, galois_keys=gks)))

    rng = np.random.default_rng(11)
    vs, cts = [], []
    for i in range(4):
        v = (rng.uniform(-1, 1, n_small) + 1j * rng.uniform(-1, 1, n_small))
        tiled = np.tile(v, params.max_slots // n_small)
        ct = rlwe.Encryptor(params, ctx["sk"]).encrypt(
            jax.random.PRNGKey(40 + i), enc.encode(tiled)).at_level(0)
        vs.append(tiled)
        cts.append(ct)

    outs = btp.bootstrap_many(cts, log_slots=log_slots)
    assert len(outs) == 4
    for v, out in zip(vs, outs):
        assert out.level >= btp.output_level
        prec = _precision(ctx, out, v)
        assert prec >= 8.0, f"sparse-packed bootstrap precision {prec:.1f}"


def test_bootstrap_conjugate_invariant_pair(ctx):
    """CI-ring pairing (ref EvaluateConjugateInvariant, evaluator.go:460):
    two conjugate-invariant real-slot cts ride ONE standard-ring bootstrap
    as its real and imaginary halves, then split back to the CI ring."""
    from lattigo_tpu.ring.ring import CONJUGATE_INVARIANT
    from lattigo_tpu.schemes.ckks.bridge import (
        DomainSwitcher, gen_ring_swap_keys)
    from lattigo_tpu.schemes.ckks.encoder import CIEncoder

    params = ctx["params"]
    params_ci = ckks.Parameters(ckks.ParametersLiteral(
        log_n=params.log_n - 1, q=params.q_moduli, p=params.p_moduli,
        log_default_scale=45, ring_type=CONJUGATE_INVARIANT))
    k_ci, k_swap = jax.random.split(jax.random.PRNGKey(77))
    sk_ci = rlwe.KeyGenerator(params_ci).gen_secret_key(k_ci)
    std_to_ci, ci_to_std = gen_ring_swap_keys(
        k_swap, params, ctx["sk"], sk_ci)
    sw = DomainSwitcher(params, params_ci, std_to_ci, ci_to_std)

    enc_ci = CIEncoder(params_ci)
    rng = np.random.default_rng(5)
    vl = rng.uniform(-1, 1, params_ci.max_slots)
    vr = rng.uniform(-1, 1, params_ci.max_slots)
    enc_op = rlwe.Encryptor(params_ci, sk_ci)
    ctl = enc_op.encrypt(jax.random.PRNGKey(50), enc_ci.encode(vl)).at_level(0)
    ctr = enc_op.encrypt(jax.random.PRNGKey(51), enc_ci.encode(vr)).at_level(0)

    outl, outr = ctx["btp"].evaluate_conjugate_invariant(ctl, ctr, switcher=sw)
    dec_ci = rlwe.Decryptor(params_ci, sk_ci)
    for v, out in ((vl, outl), (vr, outr)):
        assert out.level >= ctx["btp"].output_level
        got = enc_ci.decode(dec_ci.decrypt(out))
        prec = -np.log2(np.abs(got - v).max() + 1e-300)
        assert prec >= 8.0, f"CI-paired bootstrap precision {prec:.1f}"
