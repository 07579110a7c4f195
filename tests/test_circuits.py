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
    # CosDiscrete is homomorphically stable only for |y| ≲ K/2^r: beyond,
    # constant-quantisation error is amplified by the huge T_n values of
    # its out-of-[−1,1] Chebyshev variable. The reference's own test
    # (mod1_evaluator_test.go:186) draws integers from ±(K/2^r − 1) too.
    (mod1_mod.COS_DISCRETE, 30, 1, 2.0 ** -12),
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
