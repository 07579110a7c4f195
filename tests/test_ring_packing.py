"""Ring packing: Expand (1 ct → 2^k cts) and Pack (2^k cts → 1 ct)."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.rlwe.ring_packing import RingPackingEvaluator
from lattigo_tpu.schemes import bgv


@pytest.fixture(scope="module")
def ctx():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=7, log_q=(45, 38), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_gk1, k_gk2 = jax.random.split(jax.random.PRNGKey(0), 3)
    sk = kgen.gen_secret_key(k_sk)
    ev0 = rlwe.Evaluator(params)
    rp0 = RingPackingEvaluator(ev0)
    els = sorted(set(rp0.galois_elements_for_expand())
                 | set(rp0.galois_elements_for_pack()))
    gks = kgen.gen_galois_keys(k_gk1, els, sk)
    ev = rlwe.Evaluator(params, rlwe.EvaluationKeySet(galois_keys=gks))
    return dict(params=params, sk=sk, rp=RingPackingEvaluator(ev))


def _decrypt_coeffs(params, sk, ct):
    pt = rlwe.Decryptor(params, sk).decrypt(ct)
    v = params.ring_q.intt(pt.value, pt.level)
    return params.ring_q.to_int_coeffs(np.asarray(v), pt.level, centered=True)


def test_expand(ctx):
    """cts[i] holds coefficient i of the input in its constant slot."""
    params, sk, rp = ctx["params"], ctx["sk"], ctx["rp"]
    delta = 1 << 25
    rng = np.random.default_rng(1)
    m = rng.integers(-7, 8, params.n)
    poly = params.ring_q.ntt(
        params.ring_q.from_int_coeffs([int(x) * delta for x in m]), None)
    ct = rlwe.Encryptor(params, sk).encrypt(
        jax.random.PRNGKey(2), rlwe.Plaintext(value=poly, is_ntt=True))
    log_gap = 5  # extract every 32nd coefficient
    cts = rp.expand(ct, log_gap)
    for i, c in cts.items():
        coeffs = _decrypt_coeffs(params, sk, c)
        got = int(round(coeffs[0] / delta))
        assert got == int(m[i]), f"slot {i}: {got} != {m[i]}"


@pytest.fixture(scope="module")
def xctx():
    """Cross-ring-degree context: log_n ∈ {7, 8} over one modulus chain."""
    from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator
    from lattigo_tpu.rlwe.ring_packing import gen_ring_switching_keys

    nth = 2 * 256  # NthRoot of the largest ring
    q = (NTTFriendlyPrimesGenerator(45, nth).next_alternating_prime(),
         NTTFriendlyPrimesGenerator(38, nth).next_alternating_prime())
    p = (NTTFriendlyPrimesGenerator(50, nth).next_alternating_prime(),)
    params = {l: rlwe.Parameters(rlwe.ParametersLiteral(log_n=l, q=q, p=p))
              for l in (7, 8)}
    keys = jax.random.split(jax.random.PRNGKey(10), 6)
    sks = {l: rlwe.KeyGenerator(params[l]).gen_secret_key(k)
           for l, k in zip((7, 8), keys)}
    switching = gen_ring_switching_keys(keys[2], params, sks)

    evs = {}
    for l, kg in zip((7, 8), keys[3:]):
        kgen = rlwe.KeyGenerator(params[l])
        rp0 = RingPackingEvaluator(rlwe.Evaluator(params[l]))
        els = sorted(set(rp0.galois_elements_for_expand())
                     | set(rp0.galois_elements_for_pack()))
        gks = kgen.gen_galois_keys(kg, els, sks[l])
        evs[l] = rlwe.Evaluator(params[l], rlwe.EvaluationKeySet(galois_keys=gks))
    rp = RingPackingEvaluator(evs[8], switching=switching, evaluators=evs)
    return dict(params=params, sks=sks, rp=rp)


def _encrypt_coeffs(params, sk, m, delta, seed):
    poly = params.ring_q.ntt(
        params.ring_q.from_int_coeffs([int(x) * delta for x in m]), None)
    return rlwe.Encryptor(params, sk).encrypt(
        jax.random.PRNGKey(seed), rlwe.Plaintext(value=poly, is_ntt=True))


def test_split_merge_roundtrip(xctx):
    """ctN[X] = even[Y] + X·odd[Y]: split halves the degree, merge inverts."""
    params, sks, rp = xctx["params"], xctx["sks"], xctx["rp"]
    delta = 1 << 25
    rng = np.random.default_rng(7)
    m = rng.integers(-7, 8, params[8].n)
    ct = _encrypt_coeffs(params[8], sks[8], m, delta, 20)

    even, odd = rp.split(ct)
    ce = _decrypt_coeffs(params[7], sks[7], even)
    co = _decrypt_coeffs(params[7], sks[7], odd)
    assert [int(round(c / delta)) for c in ce] == list(m[0::2])
    assert [int(round(c / delta)) for c in co] == list(m[1::2])

    back = rp.merge(even, odd)
    cb = _decrypt_coeffs(params[8], sks[8], back)
    assert [int(round(c / delta)) for c in cb] == list(m)


def test_extract_repack(xctx):
    """extract pulls coefficients into constant slots of half-degree cts;
    repack inverts (zeroing everything not extracted)."""
    params, sks, rp = xctx["params"], xctx["sks"], xctx["rp"]
    delta = 1 << 25
    rng = np.random.default_rng(8)
    m = rng.integers(-7, 8, params[8].n)
    ct = _encrypt_coeffs(params[8], sks[8], m, delta, 21)

    idx = [0, 3, 77, 130, 255]
    cts = rp.extract(ct, idx)
    assert set(cts) == set(idx)
    for i in idx:
        assert cts[i].n == params[7].n
        coeffs = _decrypt_coeffs(params[7], sks[7], cts[i])
        assert int(round(coeffs[0] / delta)) == int(m[i]), f"idx {i}"

    out = rp.repack(cts)
    coeffs = _decrypt_coeffs(params[8], sks[8], out)
    want = [int(m[i]) if i in idx else 0 for i in range(params[8].n)]
    assert [int(round(c / delta)) for c in coeffs] == want


def test_pack(ctx):
    """pack interleaves the constant coefficients of many cts into one."""
    params, sk, rp = ctx["params"], ctx["sk"], ctx["rp"]
    delta = 1 << 25
    rng = np.random.default_rng(3)
    k = 8
    gap = params.n // k
    vals = rng.integers(-7, 8, k)
    encr = rlwe.Encryptor(params, sk)
    cts = {}
    for i in range(k):
        poly = params.ring_q.ntt(params.ring_q.from_int_coeffs(
            [int(vals[i]) * delta] + [0] * (params.n - 1)), None)
        cts[i * gap] = encr.encrypt(
            jax.random.PRNGKey(100 + i), rlwe.Plaintext(value=poly, is_ntt=True))
    out = rp.pack(cts, input_log_gap=params.log_n)
    coeffs = _decrypt_coeffs(params, sk, out)
    for i in range(k):
        got = int(round(coeffs[i * gap] / delta))
        assert got == int(vals[i]), f"coeff {i*gap}: {got} != {vals[i]}"
