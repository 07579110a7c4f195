"""Circuit tests: polynomial evaluation (P-S), homomorphic DFT, mod1."""

import math

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.circuits import dft as dft_mod
from lattigo_tpu.circuits import mod1 as mod1_mod
from lattigo_tpu.circuits.polynomial import (
    Polynomial, PolynomialEvaluator, chebyshev_approximate,
)

pytestmark = pytest.mark.slow  # compile-heavy tier (see pyproject)


@pytest.fixture(scope="module")
def ctx():
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9,
        log_q=(55,) + (45,) * 8,
        log_p=(60,),
        log_default_scale=45,
    ))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk = jax.random.split(jax.random.PRNGKey(0))
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    evk = rlwe.EvaluationKeySet(relinearization_key=rlk)
    return dict(
        params=params, sk=sk, kgen=kgen, evk=evk,
        enc=ckks.Encoder(params),
        encryptor=rlwe.Encryptor(params, sk),
        decryptor=rlwe.Decryptor(params, sk),
        eval=ckks.Evaluator(params, evk),
    )


def enc_ct(ctx, values, seed=0):
    return ctx["encryptor"].encrypt(
        jax.random.PRNGKey(seed), ctx["enc"].encode(values))


def dec(ctx, ct):
    return ctx["enc"].decode(ctx["decryptor"].decrypt(ct))


def test_monomial_polynomial(ctx):
    """p(x) = 1 + 2x + 3x² + x³ + 0.5x⁷ via P-S, monomial basis."""
    params = ctx["params"]
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.max_slots)
    coeffs = [1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0, 0.5]
    ct = enc_ct(ctx, v, seed=2)
    pe = PolynomialEvaluator(ctx["eval"])
    out = pe.evaluate(ct, Polynomial(coeffs))
    want = sum(c * v**i for i, c in enumerate(coeffs))
    ckks.verify_test_vectors(want, dec(ctx, out), min_precision=17.0)


def test_chebyshev_polynomial_exp(ctx):
    """exp(x) on [-1,1] via degree-15 Chebyshev interpolation."""
    params = ctx["params"]
    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, params.max_slots)
    poly = chebyshev_approximate(math.exp, 15, (-1.0, 1.0))
    ct = enc_ct(ctx, v, seed=4)
    pe = PolynomialEvaluator(ctx["eval"])
    out = pe.evaluate(ct, poly)
    ckks.verify_test_vectors(np.exp(v), dec(ctx, out), min_precision=17.0)


def test_dft_roundtrip(ctx):
    """CoeffsToSlots → SlotsToCoeffs is the identity (up to precision)."""
    params, kgen, sk = ctx["params"], ctx["kgen"], ctx["sk"]
    ev = ctx["eval"]
    enc = ctx["enc"]
    dfte = dft_mod.DFTEvaluator(
        params, ev, enc,
        c2s_levels=[3, 3, 2], s2c_levels=[3, 3, 2])
    gks = kgen.gen_galois_keys(jax.random.PRNGKey(5), dfte.galois_elements(), sk)
    evk = rlwe.EvaluationKeySet(
        relinearization_key=ctx["evk"].relinearization_key, galois_keys=gks)
    dfte.with_evaluator(ckks.Evaluator(params, evk))

    rng = np.random.default_rng(6)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = enc_ct(ctx, v, seed=7)
    ct_re, ct_im = dfte.coeffs_to_slots(ct)
    out = dfte.slots_to_coeffs(ct_re, ct_im)
    ckks.verify_test_vectors(v, dec(ctx, out), min_precision=10.0)


def test_dft_c2s_semantics(ctx):
    """C2S slots = Π-ordered packed polynomial coefficients."""
    params, kgen, sk = ctx["params"], ctx["kgen"], ctx["sk"]
    enc = ctx["enc"]
    dfte = dft_mod.DFTEvaluator(params, ctx["eval"], enc,
                                c2s_levels=[4, 4], s2c_levels=[4, 4])
    gks = kgen.gen_galois_keys(jax.random.PRNGKey(8), dfte.galois_elements(), sk)
    evk = rlwe.EvaluationKeySet(
        relinearization_key=ctx["evk"].relinearization_key, galois_keys=gks)
    dfte.with_evaluator(ckks.Evaluator(params, evk))

    rng = np.random.default_rng(9)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    pt = enc.encode(v)
    ct = ctx["encryptor"].encrypt(jax.random.PRNGKey(10), pt)
    ct_re, ct_im = dfte.coeffs_to_slots(ct)
    got_re = np.real(dec(ctx, ct_re))
    got_im = np.real(dec(ctx, ct_im))

    # expected: polynomial coefficients of pt, packed z_k = m_k + i·m_{k+n},
    # bit-reversal permuted, divided by the encoding scale
    n = params.max_slots
    coeffs = params.ring_q.to_int_coeffs(
        np.asarray(params.ring_q.intt(pt.value)), centered=True)
    m = np.array([float(c) for c in coeffs]) / float(pt.scale)
    perm = dft_mod.bit_reversal_permutation(n)
    want_re = m[:n][perm]
    want_im = m[n:][perm]
    ckks.verify_test_vectors(want_re, got_re, min_precision=10.0)
    ckks.verify_test_vectors(want_im, got_im, min_precision=10.0)


@pytest.mark.parametrize("mod1_type,degree,int_bound,bound", [
    (mod1_mod.COS_CONTINUOUS, 30, 7, 2.0 ** -12),
    # CosDiscrete's Chebyshev variable is u = y/K ∈ [−1, 1] (the Han–Ki
    # coefficients are re-expanded at generation, utils/cosine.py), so the
    # full |y| ≤ K − 1 range is homomorphically stable.
    (mod1_mod.COS_DISCRETE, 30, 7, 2.0 ** -12),
    (mod1_mod.SIN_CONTINUOUS, 63, 7, 2.0 ** -10),
])
def test_mod1(mod1_type, degree, int_bound, bound):
    """EvalMod: y = frac + integer, |frac| small → recover frac.

    Own fixture: mod1 at degree 30 + 3 double-angles consumes ~11 levels
    (1 interval map + ~7 poly + 3 squarings), deeper than the shared ctx.
    Exercises all three approximation types (ref mod1_parameters.go:23).
    """
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9,
        log_q=(55,) + (45,) * 12,
        log_p=(60,),
        log_default_scale=45,
    ))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk = jax.random.split(jax.random.PRNGKey(20))
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(relinearization_key=rlk))
    enc = ckks.Encoder(params)

    rng = np.random.default_rng(11)
    k = 8
    frac = rng.uniform(-1, 1, params.max_slots) * (2.0 ** -5)
    ints = rng.integers(-int_bound, int_bound + 1, params.max_slots)
    y = frac + ints
    ct = rlwe.Encryptor(params, sk).encrypt(jax.random.PRNGKey(21), enc.encode(y))
    m1 = mod1_mod.Mod1Evaluator(
        ev, mod1_mod.Mod1Parameters(k=k, degree=degree, double_angle=3,
                                    log_message_ratio=5, mod1_type=mod1_type))
    out = m1.evaluate(ct)
    got = np.real(enc.decode(rlwe.Decryptor(params, sk).decrypt(out)))
    err = np.abs(got - frac)
    assert err.max() < bound, f"mod1[{mod1_type}] max err {err.max():.2e}"


def test_polynomial_vector(ctx):
    """Two different polynomials on even/odd slots via PolynomialVector
    (ref examples/singleparty/ckks_vectorized_polynomial_evaluation)."""
    from lattigo_tpu.circuits.polynomial import PolynomialVector

    params = ctx["params"]
    slots = params.max_slots
    rng = np.random.default_rng(7)
    v = rng.uniform(-1, 1, slots)
    p0 = chebyshev_approximate(math.exp, 7, (-1.0, 1.0))
    p1 = chebyshev_approximate(math.sin, 7, (-1.0, 1.0))
    pv = PolynomialVector(
        [p0, p1],
        {0: list(range(0, slots, 2)), 1: list(range(1, slots, 2))})
    ct = enc_ct(ctx, v, seed=8)
    pe = PolynomialEvaluator(ctx["eval"], encoder=ctx["enc"])
    out = pe.evaluate(ct, pv)
    want = pv.evaluate_plain(v.astype(np.complex128))
    ckks.verify_test_vectors(want, dec(ctx, out), min_precision=15.0)


@pytest.mark.parametrize("ratio,asin,bound", [
    (8, 0, 2.0 ** -19),   # default recipe: Han–Ki approx-limited (2^-21.3)
    (2, 7, 2.0 ** -20),   # low-message-ratio + arcsine (N16QP1547 recipe)
])
def test_mod1_pinned_working_scale(ratio, asin, bound):
    """EvalMod at a PINNED working scale above the default scale — the
    published bootstrap recipes (ref EvalModLogScale, default 60; here 50
    over a 2^45 default). The squaring ladder maps scale σ → σ²/q, so the
    target must sit at the ≈ q chain primes or the basis scales collapse
    geometrically into message-level noise (regression for exactly that
    round-3 bug). The arcsine case is the reference's low-ratio recipe:
    unscaled cosine → u = sin(2πy) → asin(u)/(2π) series
    (ref mod1_parameters.go:136-158)."""
    em = 50
    p1 = mod1_mod.Mod1Parameters(
        k=16, degree=30, double_angle=3, log_message_ratio=ratio,
        mod1_type=mod1_mod.COS_DISCRETE, arcsine_degree=asin, log_scale=em)
    from lattigo_tpu.circuits.bootstrapping import BootstrappingEvaluator
    depth = BootstrappingEvaluator._mod1_depth(p1)
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=8, log_q=(55, 45) + (em,) * depth + (56,),
        log_p=(60, 60), log_default_scale=45))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_ct = jax.random.split(jax.random.PRNGKey(3), 3)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    enc = ckks.Encoder(params)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(relinearization_key=rlk))
    m1 = mod1_mod.Mod1Evaluator(ev, p1)

    rng = np.random.default_rng(0)
    ints = rng.integers(-10, 11, params.max_slots).astype(float)
    # realistic coefficient magnitudes: the DFT concentrates |frac| around
    # 2^-ratio/sqrt(N); the asin series is exact there and the uniform
    # support edge (|frac| = 2^-ratio) is a separate distributional tail
    frac = rng.uniform(-1, 1, params.max_slots) * 2.0 ** -(ratio + 3)
    y = ints + frac
    # pre-mapped input u = y/K at the pinned scale, one level below the
    # top (the C2S stage consumes that prime in the real pipeline)
    from fractions import Fraction
    pt = enc.encode(y / p1.k, level=params.max_level - 1,
                    scale=Fraction(2) ** em)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, pt)
    out = m1.evaluate(ct, pre_mapped=True)
    got = np.real(enc.decode(rlwe.Decryptor(params, sk).decrypt(out)))
    err = np.abs(got - frac)
    assert float(np.log2(float(out.scale))) == pytest.approx(em, abs=0.2), \
        "pinned EvalMod must come out at the working scale"
    assert err.max() < bound, (
        f"pinned mod1 ratio=2^{ratio} asin={asin}: max err {err.max():.2e}")
