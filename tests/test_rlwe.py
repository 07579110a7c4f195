"""RLWE core tests: keygen, encrypt/decrypt, gadget product, automorphism.

Mirrors the reference's core/rlwe test strategy (SURVEY.md §4): encrypt →
operate → decrypt, then assert the residual noise (centered coefficients of
the decryption of an encryption of zero) stays under analytic bounds.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.ring import automorphism as auto_mod


@pytest.fixture(scope="module")
def ctx():
    """TestContext fixture (analog of core/rlwe/test_params.go logN=10)."""
    params = rlwe.Parameters(rlwe.ParametersLiteral(
        log_n=10,
        log_q=(45, 35, 35),
        log_p=(50,),
    ))
    kgen = rlwe.KeyGenerator(params)
    key = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk, k_gk = jax.random.split(key, 4)
    sk = kgen.gen_secret_key(k_sk)
    pk = kgen.gen_public_key(k_pk, sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    gal_el = params.galois_element(1)
    gks = kgen.gen_galois_keys(k_gk, [gal_el, params.galois_element_order_two], sk)
    evk = rlwe.EvaluationKeySet(relinearization_key=rlk, galois_keys=gks)
    return dict(params=params, kgen=kgen, sk=sk, pk=pk, evk=evk,
                eval=rlwe.Evaluator(params, evk))


def noise_log2(params, pt):
    """log2 std of centered coefficients of a plaintext (noise probe)."""
    coeff = pt.value
    if pt.is_ntt:
        coeff = params.ring_q.intt(coeff, pt.level)
    vals = params.ring_q.to_int_coeffs(np.asarray(coeff), pt.level)
    arr = np.array([float(v) for v in vals])
    return math.log2(max(arr.std(), 1e-10))


def test_sk_encrypt_zero_noise(ctx):
    params, sk = ctx["params"], ctx["sk"]
    enc = rlwe.Encryptor(params, sk)
    dec = rlwe.Decryptor(params, sk)
    ct = enc.encrypt_zero(jax.random.PRNGKey(1))
    pt = dec.decrypt(ct)
    # fresh sk noise ~ sigma = 3.2 -> log2 std ~ 1.7; allow slack
    assert noise_log2(params, pt) < 4.0


def test_pk_encrypt_zero_noise(ctx):
    params, sk, pk = ctx["params"], ctx["sk"], ctx["pk"]
    enc = rlwe.Encryptor(params, pk)
    dec = rlwe.Decryptor(params, sk)
    ct = enc.encrypt_zero(jax.random.PRNGKey(2))
    pt = dec.decrypt(ct)
    # pk noise ~ sigma*sqrt(N/3 * 2 + ...) after P-rescaling; generous bound
    bound = math.log2(params.noise_fresh_pk()) + 2.0
    assert noise_log2(params, pt) < bound


def test_encrypt_plaintext_roundtrip(ctx):
    """Encrypt a scaled message, decrypt, compare (message >> noise)."""
    params, sk = ctx["params"], ctx["sk"]
    rng = np.random.default_rng(3)
    msg = rng.integers(-(2**20), 2**20, size=params.n)
    delta = 1 << 24
    pt_coeffs = params.ring_q.from_int_coeffs([int(m) * delta for m in msg])
    pt = rlwe.Plaintext(value=params.ring_q.ntt(pt_coeffs), is_ntt=True)
    enc = rlwe.Encryptor(params, sk)
    dec = rlwe.Decryptor(params, sk)
    ct = enc.encrypt(jax.random.PRNGKey(4), pt)
    out = dec.decrypt(ct, out_ntt=False)
    vals = params.ring_q.to_int_coeffs(np.asarray(out.value))
    rec = np.array([round(v / delta) for v in vals])
    np.testing.assert_array_equal(rec, msg)


def test_keyswitch_evaluation_key(ctx):
    """Gadget product re-encrypts sk1 -> sk2; decryption under sk2 works."""
    params, kgen, sk = ctx["params"], ctx["kgen"], ctx["sk"]
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    sk2 = kgen.gen_secret_key(k1)
    evk = kgen.gen_evaluation_key(k2, sk, sk2)

    rng = np.random.default_rng(6)
    msg = rng.integers(0, 2, size=params.n)
    delta = params.q_big_int() >> 2
    pt = rlwe.Plaintext(value=params.ring_q.ntt(
        params.ring_q.from_int_coeffs([int(m) * delta for m in msg])))
    ct = rlwe.Encryptor(params, sk).encrypt(k3, pt)

    ev = ctx["eval"]
    ct2 = ev.apply_evaluation_key(ct, evk)
    out = rlwe.Decryptor(params, sk2).decrypt(ct2, out_ntt=False)
    vals = params.ring_q.to_int_coeffs(np.asarray(out.value))
    rec = np.array([round(v / delta) % 4 % 2 for v in vals])  # centered round
    rec = np.array([abs(round(v / delta)) for v in vals])
    np.testing.assert_array_equal(rec, msg)


def test_relinearize(ctx):
    """Tensor two degree-1 cts (degree 2) then relinearize back to degree 1."""
    params, sk, ev = ctx["params"], ctx["sk"], ctx["eval"]
    rq = params.ring_q
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    delta = 1 << 20
    m1 = np.zeros(params.n, dtype=int); m1[1] = 3   # 3X
    m2 = np.zeros(params.n, dtype=int); m2[2] = 5   # 5X^2
    pt1 = rlwe.Plaintext(value=rq.ntt(rq.from_int_coeffs([c * delta for c in m1])))
    pt2 = rlwe.Plaintext(value=rq.ntt(rq.from_int_coeffs([c * delta for c in m2])))
    enc = rlwe.Encryptor(params, sk)
    ct1 = enc.encrypt(k1, pt1)
    ct2 = enc.encrypt(k2, pt2)

    # tensor product: (c0, c1) x (d0, d1) -> (c0d0, c0d1+c1d0, c1d1)
    a0, a1 = ct1.value[..., 0, :, :], ct1.value[..., 1, :, :]
    b0, b1 = ct2.value[..., 0, :, :], ct2.value[..., 1, :, :]
    b0m, b1m = rq.mform(b0), rq.mform(b1)
    e0 = rq.mul_mont(a0, b0m)
    e1 = rq.add(rq.mul_mont(a0, b1m), rq.mul_mont(a1, b0m))
    e2 = rq.mul_mont(a1, b1m)
    ct_deg2 = rlwe.ciphertext_from_polys([e0, e1, e2], is_ntt=True)

    ct_relin = ev.relinearize(ct_deg2)
    assert ct_relin.degree == 1
    out = rlwe.Decryptor(params, sk).decrypt(ct_relin, out_ntt=False)
    vals = params.ring_q.to_int_coeffs(np.asarray(out.value))
    rec = np.array([round(v / delta**2) for v in vals])
    expect = np.zeros(params.n, dtype=int); expect[3] = 15  # 3X·5X² = 15X³
    np.testing.assert_array_equal(rec, expect)


def test_automorphism_rotation(ctx):
    """Galois automorphism X -> X^{5}: decrypted poly equals permuted pt."""
    params, sk, ev = ctx["params"], ctx["sk"], ctx["eval"]
    rq = params.ring_q
    gal_el = params.galois_element(1)
    rng = np.random.default_rng(8)
    msg = [int(x) for x in rng.integers(-100, 100, size=params.n)]
    delta = 1 << 30
    pt = rlwe.Plaintext(value=rq.ntt(rq.from_int_coeffs([c * delta for c in msg])))
    ct = rlwe.Encryptor(params, sk).encrypt(jax.random.PRNGKey(9), pt)

    ct_rot = ev.automorphism(ct, gal_el)
    out = rlwe.Decryptor(params, sk).decrypt(ct_rot, out_ntt=False)
    vals = params.ring_q.to_int_coeffs(np.asarray(out.value))
    got = np.array([round(v / delta) for v in vals])

    # plaintext-side automorphism: X^i -> X^{i·gal_el mod 2N} with sign
    expect = np.zeros(params.n, dtype=int)
    for i, c in enumerate(msg):
        j = i * gal_el % (2 * params.n)
        if j < params.n:
            expect[j] += c
        else:
            expect[j - params.n] -= c
    np.testing.assert_array_equal(got, expect)


def plain_automorphism(msg, gal_el: int, n: int) -> np.ndarray:
    """Plaintext-side σ: X^i → X^{i·gal_el mod 2N} with negacyclic sign."""
    out = np.zeros(n, dtype=object)
    for i, c in enumerate(msg):
        j = i * gal_el % (2 * n)
        if j < n:
            out[j] += c
        else:
            out[j - n] -= c
    return out


def test_trace(ctx):
    """Trace matches the plaintext-side subgroup sum ÷ gap (ref inner_sum.go:36)."""
    params, sk = ctx["params"], ctx["sk"]
    kgen = ctx["kgen"]
    ev = ctx["eval"]
    log_start = params.log_n - 2
    gap = 1 << (params.log_n - log_start - 1)  # = 2
    els = ev.galois_elements_for_trace(log_start)
    gks = kgen.gen_galois_keys(jax.random.PRNGKey(10), els, sk)
    ev2 = rlwe.Evaluator(params, rlwe.EvaluationKeySet(galois_keys=gks))

    rq = params.ring_q
    rng = np.random.default_rng(11)
    msg = [int(x) for x in rng.integers(-100, 100, size=params.n)]
    delta = gap << 28  # divisible by gap so the traced value is integral
    pt = rlwe.Plaintext(value=rq.ntt(rq.from_int_coeffs([c * delta for c in msg])))
    ct = rlwe.Encryptor(params, sk).encrypt(jax.random.PRNGKey(12), pt)
    ct_tr = ev2.trace(ct, log_start)
    out = rlwe.Decryptor(params, sk).decrypt(ct_tr, out_ntt=False)
    vals = params.ring_q.to_int_coeffs(np.asarray(out.value))
    got = np.array([round(v / (delta // gap)) for v in vals])

    # expected: Σ_k σ_{5^{k·2^start}}(m) over the generated subgroup
    expect = np.zeros(params.n, dtype=object)
    for k in range(gap):
        g = pow(5, k << log_start, 2 * params.n)
        expect += plain_automorphism(msg, g, params.n)
    np.testing.assert_array_equal(got, expect.astype(np.int64))


def test_batched_encrypt(ctx):
    """Leading batch axes broadcast through encrypt/decrypt."""
    params, sk = ctx["params"], ctx["sk"]
    enc = rlwe.Encryptor(params, sk)
    dec = rlwe.Decryptor(params, sk)
    ct = enc.encrypt_zero(jax.random.PRNGKey(13), batch=(4,))
    assert ct.value.shape[:1] == (4,)
    pt = dec.decrypt(ct)
    assert pt.value.shape[:1] == (4,)


def test_level_scoped_galois_keys():
    """Keys generated at a reduced level (gen_galois_keys(levels=...))
    rotate correctly at that level, and the gadget product refuses a key
    that is too short for the use level."""
    import pytest
    from lattigo_tpu.schemes import ckks

    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=8, log_q=(45, 35, 35), log_p=(50,), log_default_scale=35))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(5), 3)
    sk = kgen.gen_secret_key(k_sk)
    el = params.galois_element(1)
    gks = kgen.gen_galois_keys(k_gk, [el], sk, levels={el: 1})
    assert gks[el].gadget.value.q.shape[-2] == 2  # level-1 rows only
    enc = ckks.Encoder(params)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(galois_keys=gks))
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots)
    ct = rlwe.Encryptor(params, sk).encrypt(
        k_ct, enc.encode(v)).at_level(1)
    out = ev.rotate(ct, 1)
    got = np.real(enc.decode(rlwe.Decryptor(params, sk).decrypt(out)))
    ckks.verify_test_vectors(np.roll(v, -1), got, min_precision=15.0)
    # using the short key above its generation level must fail loudly
    ct_full = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v))
    with pytest.raises(AssertionError):
        ev.rotate(ct_full, 1)
