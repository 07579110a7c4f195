"""Multiparty protocol tests: N parties in-process vs Σsk oracle
(ref multiparty/multiparty_test.go:36 pattern)."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import bgv
from lattigo_tpu import multiparty as mp
from lattigo_tpu.ring.ringqp import QPPoly

N_PARTIES = 3


@pytest.fixture(scope="module")
def ctx():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=10, log_q=(45, 35, 35), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    keys = jax.random.split(jax.random.PRNGKey(0), N_PARTIES)
    sks = [kgen.gen_secret_key(k) for k in keys]
    # ideal key = Σ sk_i (NTT+Montgomery domain is additive)
    q = sks[0].value.q
    p = sks[0].value.p
    for s in sks[1:]:
        q = params.ring_q.add(q, s.value.q)
        p = params.ring_p.add(p, s.value.p)
    sk_ideal = rlwe.SecretKey(QPPoly(q, p))
    return dict(params=params, kgen=kgen, sks=sks, sk_ideal=sk_ideal,
                enc=bgv.Encoder(params))


def test_collective_public_key(ctx):
    params, sks, sk_ideal = ctx["params"], ctx["sks"], ctx["sk_ideal"]
    proto = mp.PublicKeyGenProtocol(params)
    crp = proto.sample_crp(b"test-crs")
    keys = jax.random.split(jax.random.PRNGKey(1), N_PARTIES)
    shares = [proto.gen_share(k, sk, crp) for k, sk in zip(keys, sks)]
    agg = shares[0]
    for s in shares[1:]:
        agg = proto.aggregate_shares(agg, s)
    pk = proto.finalize(agg, crp)

    # encrypt under collective pk, decrypt under ideal sk
    m = np.arange(params.n) % params.t
    enc = ctx["enc"]
    ct = rlwe.Encryptor(params, pk).encrypt(jax.random.PRNGKey(2), enc.encode(m))
    got = enc.decode(rlwe.Decryptor(params, sk_ideal).decrypt(ct)) % params.t
    np.testing.assert_array_equal(got, m)


def test_collective_decryption(ctx):
    """CKS with sk_out = 0 = collective decryption."""
    params, sks, sk_ideal = ctx["params"], ctx["sks"], ctx["sk_ideal"]
    enc = ctx["enc"]
    m = (np.arange(params.n) * 7) % params.t
    ct = rlwe.Encryptor(params, sk_ideal).encrypt(
        jax.random.PRNGKey(3), enc.encode(m))

    proto = mp.KeySwitchProtocol(params)
    keys = jax.random.split(jax.random.PRNGKey(4), N_PARTIES)
    shares = [proto.gen_share(k, sk, None, ct) for k, sk in zip(keys, sks)]
    agg = shares[0]
    for s in shares[1:]:
        agg = proto.aggregate_shares(agg, s)
    ct_out = proto.key_switch(ct, agg)

    # now decryptable with sk = 0: pt = c0
    pt = rlwe.Plaintext(value=ct_out.value[..., 0, :, :], is_ntt=True,
                        scale=ct_out.scale)
    got = enc.decode(pt) % params.t
    np.testing.assert_array_equal(got, m)


def test_collective_relinearization_key(ctx):
    params, sks, sk_ideal = ctx["params"], ctx["sks"], ctx["sk_ideal"]
    enc = ctx["enc"]
    proto = mp.RelinearizationKeyGenProtocol(params)
    crps = proto.sample_crp(b"rlk-crs")
    keys = jax.random.split(jax.random.PRNGKey(5), N_PARTIES)
    ukeys = jax.random.split(jax.random.PRNGKey(6), N_PARTIES)
    us = [proto.gen_ephemeral(k) for k in ukeys]
    r1 = [proto.gen_share_round1(k, sk, u, crps)
          for k, sk, u in zip(keys, sks, us)]
    agg1 = r1[0]
    for s in r1[1:]:
        agg1 = proto.aggregate_shares(agg1, s)
    keys2 = jax.random.split(jax.random.PRNGKey(7), N_PARTIES)
    r2 = [proto.gen_share_round2(k, sk, u, agg1)
          for k, sk, u in zip(keys2, sks, us)]
    agg2 = r2[0]
    for s in r2[1:]:
        agg2 = proto.aggregate_shares(agg2, s)
    rlk = proto.finalize(agg1, agg2)

    # use the collective rlk: mul_relin two cts encrypted under sk_ideal
    ev = bgv.Evaluator(params, rlwe.EvaluationKeySet(relinearization_key=rlk))
    rng = np.random.default_rng(8)
    m1 = rng.integers(0, params.t, params.n, dtype=np.int64)
    m2 = rng.integers(0, params.t, params.n, dtype=np.int64)
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    encryptor = rlwe.Encryptor(params, sk_ideal)
    ct1 = encryptor.encrypt(k1, enc.encode(m1))
    ct2 = encryptor.encrypt(k2, enc.encode(m2))
    out = ev.rescale(ev.mul_relin(ct1, ct2))
    got = enc.decode(rlwe.Decryptor(params, sk_ideal).decrypt(out)) % params.t
    want = (m1.astype(object) * m2) % params.t
    np.testing.assert_array_equal(got, want)


def test_collective_galois_key(ctx):
    params, sks, sk_ideal = ctx["params"], ctx["sks"], ctx["sk_ideal"]
    enc = ctx["enc"]
    gal_el = params.galois_element(1)
    proto = mp.GaloisKeyGenProtocol(params)
    crps = proto.sample_crp(b"gk-crs")
    keys = jax.random.split(jax.random.PRNGKey(10), N_PARTIES)
    shares = [proto.gen_share(k, gal_el, sk, crps) for k, sk in zip(keys, sks)]
    agg = shares[0]
    for s in shares[1:]:
        agg = proto.aggregate_shares(agg, s)
    gk = proto.finalize(gal_el, agg, crps)

    ev = bgv.Evaluator(params, rlwe.EvaluationKeySet(galois_keys={gal_el: gk}))
    rng = np.random.default_rng(11)
    m = rng.integers(0, params.t, params.n, dtype=np.int64)
    ct = rlwe.Encryptor(params, sk_ideal).encrypt(
        jax.random.PRNGKey(12), enc.encode(m))
    got = enc.decode(rlwe.Decryptor(params, sk_ideal).decrypt(
        ev.rotate_columns(ct, 1))) % params.t
    half = params.n // 2
    want = np.concatenate([np.roll(m[:half], -1), np.roll(m[half:], -1)])
    np.testing.assert_array_equal(got, want)


def test_threshold_shamir(ctx):
    """t-of-N: recombined additive shares decrypt like the ideal key."""
    params, sks, sk_ideal = ctx["params"], ctx["sks"], ctx["sk_ideal"]
    enc = ctx["enc"]
    t = 2
    points = [1, 2, 3]
    th = mp.Thresholdizer(params)
    # each party Shamir-shares its additive sk share
    polys = [th.gen_shamir_polynomial(jax.random.PRNGKey(20 + i), t, sk)
             for i, sk in enumerate(sks)]
    # party j's Shamir share = Σ_i eval(poly_i, x_j)
    shamir_shares = []
    for j, x in enumerate(points):
        agg = th.gen_shamir_secret_share(x, polys[0])
        for poly in polys[1:]:
            agg = mp.Thresholdizer.aggregate_shares(
                params, agg, th.gen_shamir_secret_share(x, poly))
        shamir_shares.append(agg)

    # active subset {party 0, party 2} recombines
    active = [points[0], points[2]]
    comb = mp.Combiner(params, t)
    add0 = comb.gen_additive_share(active, points[0], shamir_shares[0])
    add2 = comb.gen_additive_share(active, points[2], shamir_shares[2])
    q = params.ring_q.add(add0.value.q, add2.value.q)
    p = params.ring_p.add(add0.value.p, add2.value.p)
    sk_rec = rlwe.SecretKey(QPPoly(q, p))

    m = (np.arange(params.n) * 3) % params.t
    ct = rlwe.Encryptor(params, sk_ideal).encrypt(
        jax.random.PRNGKey(13), enc.encode(m))
    got = enc.decode(rlwe.Decryptor(params, sk_rec).decrypt(ct)) % params.t
    np.testing.assert_array_equal(got, m)


def test_collective_evaluation_key(ctx):
    """Generic collective EVK sk_ideal → sk_out re-encrypts correctly
    (ref keygen_evk.go:17): decrypting under sk_out after the key switch
    recovers the message."""
    params, sks, sk_ideal = ctx["params"], ctx["sks"], ctx["sk_ideal"]
    enc = ctx["enc"]
    kgen = ctx["kgen"]

    # output key: each party holds an additive share of sk_out too
    keys = jax.random.split(jax.random.PRNGKey(30), N_PARTIES)
    sks_out = [kgen.gen_secret_key(k) for k in keys]
    q = sks_out[0].value.q
    p = sks_out[0].value.p
    for s in sks_out[1:]:
        q = params.ring_q.add(q, s.value.q)
        p = params.ring_p.add(p, s.value.p)
    sk_out_ideal = rlwe.SecretKey(QPPoly(q, p))

    proto = mp.EvaluationKeyGenProtocol(params)
    crps = proto.sample_crp(b"evk-crs")
    share_keys = jax.random.split(jax.random.PRNGKey(31), N_PARTIES)
    shares = [proto.gen_share(k, s_in, s_out, crps)
              for k, s_in, s_out in zip(share_keys, sks, sks_out)]
    agg = shares[0]
    for s in shares[1:]:
        agg = proto.aggregate_shares(agg, s)
    evk = proto.finalize(agg, crps)

    ev = rlwe.Evaluator(params)
    rng = np.random.default_rng(32)
    m = rng.integers(0, params.t, params.n, dtype=np.int64)
    ct = rlwe.Encryptor(params, sk_ideal).encrypt(
        jax.random.PRNGKey(33), enc.encode(m))
    switched = ev.apply_evaluation_key(ct, evk)
    got = enc.decode(rlwe.Decryptor(params, sk_out_ideal).decrypt(switched)) % params.t
    np.testing.assert_array_equal(got, m % params.t)
