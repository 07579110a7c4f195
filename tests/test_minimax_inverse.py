"""Minimax composite sign + full-domain inverse circuits.

Mirrors the reference's comparison/inverse tests
(circuits/ckks/comparison/comparison_test.go,
circuits/ckks/inverse/inverse_test.go): evaluate on encrypted uniform
inputs and assert precision against the plaintext recomputation, with a
SecretKeyBootstrapper standing in for the full pipeline (the reference
tests use bootstrapping.NewSecretKeyBootstrapper the same way).
"""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.circuits.bootstrapping import SecretKeyBootstrapper
from lattigo_tpu.circuits.comparison import (
    ComparisonEvaluator, default_composite_sign_polys,
)
from lattigo_tpu.circuits.inverse import InverseEvaluator
from lattigo_tpu.circuits.minimax import (
    SIGN_X4_CHEBY, MinimaxCompositeEvaluator,
)
from lattigo_tpu.utils.minimax import gen_minimax_composite_sign

pytestmark = pytest.mark.slow  # compile-heavy tier (see pyproject)


@pytest.fixture(scope="module")
def ctx():
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=8,
        log_q=(55,) + (45,) * 9,
        log_p=(60,),
        log_default_scale=45,
    ))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_gk = jax.random.split(jax.random.PRNGKey(0), 3)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    gks = kgen.gen_galois_keys(
        k_gk, [params.galois_element_order_two], sk)
    evk = rlwe.EvaluationKeySet(relinearization_key=rlk, galois_keys=gks)
    enc = ckks.Encoder(params)
    return dict(
        params=params, sk=sk, kgen=kgen, evk=evk, enc=enc,
        encryptor=rlwe.Encryptor(params, sk),
        decryptor=rlwe.Decryptor(params, sk),
        eval=ckks.Evaluator(params, evk),
        btp=SecretKeyBootstrapper(params, enc, sk, jax.random.PRNGKey(99)),
    )


def enc_ct(ctx, values, seed=0):
    return ctx["encryptor"].encrypt(
        jax.random.PRNGKey(seed), ctx["enc"].encode(values))


def dec(ctx, ct):
    return ctx["enc"].decode(ctx["decryptor"].decrypt(ct))


def test_minimax_composite_sign(ctx):
    """Remez composite + X4 cleanup reaches ≥20-bit sign on ±[2^-6, 1]."""
    params = ctx["params"]
    rng = np.random.default_rng(1)
    v = rng.uniform(2.0**-6, 1.0, params.max_slots)
    v *= rng.choice([-1.0, 1.0], params.max_slots)
    polys = (list(gen_minimax_composite_sign(6, [15, 15]))
             + [SIGN_X4_CHEBY] * 2)
    mce = MinimaxCompositeEvaluator(ctx["eval"], ctx["btp"])
    out = mce.evaluate(enc_ct(ctx, v, seed=2), polys)
    got = dec(ctx, out).real
    assert np.max(np.abs(got - np.sign(v))) < 2.0**-22


def test_comparison_step_minimax(ctx):
    """step via minimax composite with the (x+1)/2 fold-in."""
    params = ctx["params"]
    rng = np.random.default_rng(3)
    v = rng.uniform(2.0**-5, 1.0, params.max_slots)
    v *= rng.choice([-1.0, 1.0], params.max_slots)
    polys = list(default_composite_sign_polys(5, (15, 15), 2))
    ce = ComparisonEvaluator(ctx["eval"], sign_polys=polys,
                             bootstrapper=ctx["btp"])
    out = ce.step(enc_ct(ctx, v, seed=4))
    got = dec(ctx, out).real
    want = (np.sign(v) + 1) / 2
    assert np.max(np.abs(got - want)) < 2.0**-18


def test_goldschmidt_auto_iterations(ctx):
    """1/x on [2^-4, 1] with automatic iteration count + bootstraps."""
    params = ctx["params"]
    rng = np.random.default_rng(5)
    v = rng.uniform(2.0**-4, 1.0, params.max_slots)
    inv = InverseEvaluator(ctx["eval"], bootstrapper=ctx["btp"])
    out = inv.goldschmidt_division(enc_ct(ctx, v, seed=6), log2min=-4.0)
    got = dec(ctx, out).real
    rel = np.max(np.abs((got - 1.0 / v) * v))
    assert rel < 2.0**-15


def test_interval_normalization(ctx):
    """norm·x ∈ [-1,1] and fac ≈ compression factor for |x| up to 2^3."""
    params = ctx["params"]
    rng = np.random.default_rng(7)
    v = rng.uniform(-(2.0**3), 2.0**3, params.max_slots)
    inv = InverseEvaluator(ctx["eval"], bootstrapper=ctx["btp"])
    norm, fac = inv.interval_normalization(enc_ct(ctx, v, seed=8), 3.0)
    got_norm = dec(ctx, norm).real
    got_fac = dec(ctx, fac).real
    assert np.max(np.abs(got_norm)) <= 1.0 + 1e-3
    # norm = x · fac
    assert np.max(np.abs(got_norm - v * got_fac)) < 1e-3


def test_inverse_positive_domain(ctx):
    """1/x on [2^-3, 2^2] via normalization + Goldschmidt."""
    params = ctx["params"]
    rng = np.random.default_rng(9)
    v = rng.uniform(2.0**-3, 2.0**2, params.max_slots)
    inv = InverseEvaluator(ctx["eval"], bootstrapper=ctx["btp"])
    out = inv.evaluate_positive_domain(enc_ct(ctx, v, seed=10), -3.0, 2.0)
    got = dec(ctx, out).real
    rel = np.max(np.abs((got - 1.0 / v) * v))
    assert rel < 2.0**-10


def test_inverse_full_domain(ctx):
    """1/x on ±[2^-3, 2^2] — sign folded through the minimax composite."""
    params = ctx["params"]
    rng = np.random.default_rng(11)
    v = rng.uniform(2.0**-3, 2.0**2, params.max_slots)
    v *= rng.choice([-1.0, 1.0], params.max_slots)
    polys = (list(gen_minimax_composite_sign(6, [15, 15]))
             + [SIGN_X4_CHEBY] * 2)
    inv = InverseEvaluator(ctx["eval"], bootstrapper=ctx["btp"],
                           sign_polys=polys)
    out = inv.evaluate_full_domain(enc_ct(ctx, v, seed=12), -3.0, 2.0)
    got = dec(ctx, out).real
    rel = np.max(np.abs((got - 1.0 / v) * v))
    assert rel < 2.0**-10
