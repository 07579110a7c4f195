"""CKKS tests: encode/decode precision, arithmetic, rescale, rotations.

Oracle: plaintext-side recomputation + PrecisionStats assertions
(ref schemes/ckks test strategy, SURVEY.md §4).
"""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks


@pytest.fixture(scope="module")
def ctx():
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=11,
        log_q=(50, 40, 40, 40),
        log_p=(55,),
        log_default_scale=40,
    ))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_gk = jax.random.split(jax.random.PRNGKey(0), 3)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    gks = kgen.gen_galois_keys(
        k_gk, [params.galois_element(1), params.galois_element_order_two], sk)
    evk = rlwe.EvaluationKeySet(relinearization_key=rlk, galois_keys=gks)
    return dict(
        params=params, sk=sk,
        enc=ckks.Encoder(params),
        encryptor=rlwe.Encryptor(params, sk),
        decryptor=rlwe.Decryptor(params, sk),
        eval=ckks.Evaluator(params, evk),
    )


def rand_vec(params, seed, bound=1.0):
    rng = np.random.default_rng(seed)
    return bound * (rng.uniform(-1, 1, params.max_slots)
                    + 1j * rng.uniform(-1, 1, params.max_slots))


def enc_ct(ctx, values, seed=100):
    pt = ctx["enc"].encode(values)
    return ctx["encryptor"].encrypt(jax.random.PRNGKey(seed), pt)


def dec(ctx, ct):
    return ctx["enc"].decode(ctx["decryptor"].decrypt(ct))


def test_encode_decode(ctx):
    v = rand_vec(ctx["params"], 1)
    pt = ctx["enc"].encode(v)
    ckks.verify_test_vectors(v, ctx["enc"].decode(pt), min_precision=35.0)


def test_encrypt_decrypt(ctx):
    v = rand_vec(ctx["params"], 2)
    ckks.verify_test_vectors(v, dec(ctx, enc_ct(ctx, v, 3)), min_precision=30.0)


def test_add_sub_ct(ctx):
    v1, v2 = rand_vec(ctx["params"], 4), rand_vec(ctx["params"], 5)
    ct1, ct2 = enc_ct(ctx, v1, 6), enc_ct(ctx, v2, 7)
    ev = ctx["eval"]
    ckks.verify_test_vectors(v1 + v2, dec(ctx, ev.add(ct1, ct2)), 30.0)
    ckks.verify_test_vectors(v1 - v2, dec(ctx, ev.sub(ct1, ct2)), 30.0)


def test_add_plaintext_and_const(ctx):
    v1, v2 = rand_vec(ctx["params"], 8), rand_vec(ctx["params"], 9)
    ct = enc_ct(ctx, v1, 10)
    ev = ctx["eval"]
    ckks.verify_test_vectors(v1 + v2, dec(ctx, ev.add(ct, ctx["enc"].encode(v2))), 30.0)
    ckks.verify_test_vectors(v1 + (0.5 - 0.25j),
                             dec(ctx, ev.add(ct, 0.5 - 0.25j)), 30.0)


def test_mul_relin_rescale(ctx):
    v1, v2 = rand_vec(ctx["params"], 11), rand_vec(ctx["params"], 12)
    ct1, ct2 = enc_ct(ctx, v1, 13), enc_ct(ctx, v2, 14)
    ev = ctx["eval"]
    prod = ev.mul_relin(ct1, ct2)
    assert prod.degree == 1
    out = ev.rescale(prod)
    assert out.level == ct1.level - 1
    ckks.verify_test_vectors(v1 * v2, dec(ctx, out), 25.0)


def test_mul_plaintext(ctx):
    v1, v2 = rand_vec(ctx["params"], 15), rand_vec(ctx["params"], 16)
    ct = enc_ct(ctx, v1, 17)
    ev = ctx["eval"]
    out = ev.rescale(ev.mul(ct, ctx["enc"].encode(v2)))
    ckks.verify_test_vectors(v1 * v2, dec(ctx, out), 25.0)


def test_mul_const_complex(ctx):
    v = rand_vec(ctx["params"], 18)
    c = 0.7 - 1.3j
    ct = enc_ct(ctx, v, 19)
    ev = ctx["eval"]
    out = ev.rescale(ev.mul_const(ct, c))
    ckks.verify_test_vectors(v * c, dec(ctx, out), 25.0)


def test_mul_depth2(ctx):
    params, ev = ctx["params"], ctx["eval"]
    v1, v2, v3 = rand_vec(params, 20), rand_vec(params, 21), rand_vec(params, 22)
    ct1, ct2, ct3 = enc_ct(ctx, v1, 23), enc_ct(ctx, v2, 24), enc_ct(ctx, v3, 25)
    out = ev.rescale(ev.mul_relin(ct1, ct2))
    out = ev.rescale(ev.mul_relin(out, ct3.at_level(out.level)))
    ckks.verify_test_vectors(v1 * v2 * v3, dec(ctx, out), 20.0)


def test_rotate(ctx):
    v = rand_vec(ctx["params"], 26)
    ct = enc_ct(ctx, v, 27)
    out = ctx["eval"].rotate(ct, 1)
    ckks.verify_test_vectors(np.roll(v, -1), dec(ctx, out), 28.0)


def test_conjugate(ctx):
    v = rand_vec(ctx["params"], 28)
    ct = enc_ct(ctx, v, 29)
    out = ctx["eval"].conjugate(ct)
    ckks.verify_test_vectors(np.conj(v), dec(ctx, out), 28.0)


def test_add_after_rescale(ctx):
    """Scale matching after rescale (non-power-of-2 scale)."""
    params, ev = ctx["params"], ctx["eval"]
    v1, v2, v3 = rand_vec(params, 30), rand_vec(params, 31), rand_vec(params, 32)
    ct1, ct2, ct3 = enc_ct(ctx, v1, 33), enc_ct(ctx, v2, 34), enc_ct(ctx, v3, 35)
    prod = ev.rescale(ev.mul_relin(ct1, ct2))
    # encode v3 directly at prod's scale for an exact-scale add
    pt3 = ctx["enc"].encode(v3, level=prod.level, scale=prod.scale)
    out = ev.add(prod, pt3)
    ckks.verify_test_vectors(v1 * v2 + v3, dec(ctx, out), 24.0)


def test_scale_up_set_scale(ctx):
    """ScaleUp multiplies value+scale; SetScale lands on an exact target
    (ref evaluator.go:427/:445)."""
    from fractions import Fraction
    params, enc, ev = ctx["params"], ctx["enc"], ctx["eval"]
    v = rand_vec(params, 31)
    ct = enc_ct(ctx, v, seed=131)

    up = ev.scale_up(ct, 8)
    assert Fraction(up.scale) == 8 * Fraction(ct.scale)
    got = enc.decode(ctx["decryptor"].decrypt(up))
    assert np.abs(got - v).max() < 1e-8

    target = Fraction(2) ** 41
    st = ev.set_scale(ct, target)
    assert Fraction(st.scale) == target and st.level == ct.level - 1
    got2 = enc.decode(ctx["decryptor"].decrypt(st))
    assert np.abs(got2 - v).max() < 1e-8


def test_decode_public_rounding(ctx):
    """decode_public rounds slots to log_prec bits (IND-CPA-D mitigation,
    ref encoder.go:199)."""
    params, enc = ctx["params"], ctx["enc"]
    v = rand_vec(params, 32)
    ct = enc_ct(ctx, v, seed=132)
    got = enc.decode_public(ctx["decryptor"].decrypt(ct), log_prec=12)
    # quantized to 2^-12 grid...
    s = 2.0 ** 12
    assert np.allclose(got.real * s, np.round(got.real * s))
    assert np.abs(got - v).max() < 2.0 ** -12


def test_rotate_hoisted(ctx):
    """Hoisted multi-rotation matches per-rotation results (ref :1228)."""
    params, enc, ev = ctx["params"], ctx["enc"], ctx["eval"]
    v = rand_vec(params, 33)
    ct = enc_ct(ctx, v, seed=133)
    outs = ev.rotate_hoisted(ct, [0, 1])
    for k, out in outs.items():
        got = enc.decode(ctx["decryptor"].decrypt(out))
        assert np.abs(got - np.roll(v, -k)).max() < 1e-8, f"rot {k}"
