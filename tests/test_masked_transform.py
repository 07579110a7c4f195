"""Collective refresh with a public masked linear transformation (CKKS)."""

import numpy as np
import jax

from lattigo_tpu import rlwe
from lattigo_tpu.rlwe.keys import SecretKey
from lattigo_tpu.ring.ringqp import QPPoly
from lattigo_tpu.schemes import ckks
from lattigo_tpu.multiparty.sharing import (
    MaskedTransformProtocol, RefreshProtocol, ckks_coeff_transform,
)


def _ideal_key(params, sks):
    rqp = params.ring_qp
    ideal = sks[0]
    for s in sks[1:]:
        ideal = SecretKey(rqp.add(ideal.value, s.value))
    return ideal


def test_collective_refresh():
    """E2S at level 0 + S2E at the top = collective bootstrap (mpckks/refresh.go)."""
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(55, 45, 45), log_p=(60,), log_default_scale=45))
    n_parties = 3
    keys = jax.random.split(jax.random.PRNGKey(3), n_parties)
    kgen = rlwe.KeyGenerator(params)
    sks = [kgen.gen_secret_key(k) for k in keys]
    ideal = _ideal_key(params, sks)

    enc = ckks.Encoder(params)
    rng = np.random.default_rng(4)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = rlwe.Encryptor(params, ideal).encrypt(
        jax.random.PRNGKey(8), enc.encode(v)).at_level(0)

    proto = RefreshProtocol(params, log_bound=40)
    crp = proto.s2e.sample_crp(b"refresh-crs")
    L = params.max_level

    e2s_shares, s2e_shares = [], []
    for i in range(n_parties):
        k1, k2 = jax.random.split(jax.random.PRNGKey(200 + i))
        mask, h = proto.e2s.gen_share(k1, sks[i], ct)
        e2s_shares.append(h)
        s2e_shares.append(proto.s2e.gen_share(k2, sks[i], mask, crp, L))
    h_agg = e2s_shares[0]
    s_agg = s2e_shares[0]
    for h, s in zip(e2s_shares[1:], s2e_shares[1:]):
        h_agg = proto.e2s.aggregate_shares(h_agg, h)
        s_agg = proto.s2e.aggregate_shares(s_agg, s)

    pub = proto.e2s.finalize_public(ct, h_agg)
    lifted = proto.lift_public(pub, 0, L)
    out = proto.s2e.finalize(s_agg, crp, extra_c0=lifted,
                             scale=ct.scale, level=L)
    assert out.level == L

    got = enc.decode(rlwe.Decryptor(params, ideal).decrypt(out))
    ckks.verify_test_vectors(v, got, min_precision=12.0)


def test_masked_transform_refresh():
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(55, 45, 45), log_p=(60,), log_default_scale=45))
    n_parties = 3
    keys = jax.random.split(jax.random.PRNGKey(0), n_parties)
    kgen = rlwe.KeyGenerator(params)
    sks = [kgen.gen_secret_key(k) for k in keys]
    # ideal key = sum of shares
    q_sum = sks[0].value.q
    p_sum = sks[0].value.p
    rqp = params.ring_qp
    ideal = sks[0]
    for s in sks[1:]:
        ideal = SecretKey(rqp.add(ideal.value, s.value))

    enc = ckks.Encoder(params)
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = rlwe.Encryptor(params, ideal).encrypt(
        jax.random.PRNGKey(5), enc.encode(v))
    # drop to the lowest level, as after a deep computation
    ct = ct.at_level(0)

    d = rng.uniform(-1, 1, params.max_slots)
    transform = ckks_coeff_transform(enc, lambda s: d * s)

    proto = MaskedTransformProtocol(params, log_bound=40)
    crp = proto.sample_crp(b"masked-transform-crs")

    shares = [proto.gen_share(jax.random.PRNGKey(100 + i), sks[i], ct,
                              crp, transform)
              for i in range(n_parties)]
    agg = shares[0]
    for s in shares[1:]:
        agg = proto.aggregate_shares(agg, s)

    out = proto.finalize(ct, agg, crp, transform)
    assert out.level == params.max_level

    got = enc.decode(rlwe.Decryptor(params, ideal).decrypt(out))
    ckks.verify_test_vectors(d * v, got, min_precision=12.0)


def test_masked_transform_with_params():
    """Parameter-switching refresh (ref mpckks/transform.go:29 WithParams):
    E2S on the input set, S2E into a different chain + default scale."""
    p_in = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(55, 45, 45), log_p=(60,), log_default_scale=45))
    p_out = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(50, 40, 40, 40), log_p=(55,), log_default_scale=40))
    n_parties = 3
    rng = np.random.default_rng(7)
    kg_in, kg_out = rlwe.KeyGenerator(p_in), rlwe.KeyGenerator(p_out)
    # same underlying ternary secrets encoded in both rings
    coeffs = [rng.integers(-1, 2, p_in.n).astype(np.int64)
              for _ in range(n_parties)]
    sks_in = [kg_in.secret_key_from_signed(c) for c in coeffs]
    sks_out = [kg_out.secret_key_from_signed(c) for c in coeffs]
    ideal_in, ideal_out = _ideal_key(p_in, sks_in), _ideal_key(p_out, sks_out)

    enc_in, enc_out = ckks.Encoder(p_in), ckks.Encoder(p_out)
    v = rng.uniform(-1, 1, p_in.max_slots) + 1j * rng.uniform(-1, 1, p_in.max_slots)
    ct = rlwe.Encryptor(p_in, ideal_in).encrypt(
        jax.random.PRNGKey(5), enc_in.encode(v)).at_level(0)

    d = rng.uniform(-1, 1, p_in.max_slots)
    transform = ckks_coeff_transform(enc_in, lambda s: d * s)

    proto = MaskedTransformProtocol(p_in, log_bound=40).with_params(p_out)
    crp = proto.sample_crp(b"with-params-crs")
    shares = [proto.gen_share(jax.random.PRNGKey(300 + i), sks_in[i], ct,
                              crp, transform, sk_out=sks_out[i])
              for i in range(n_parties)]
    agg = shares[0]
    for s in shares[1:]:
        agg = proto.aggregate_shares(agg, s)
    out = proto.finalize(ct, agg, crp, transform)
    assert out.level == p_out.max_level
    assert float(out.scale) == float(p_out.default_scale_fraction)

    got = enc_out.decode(rlwe.Decryptor(p_out, ideal_out).decrypt(out))
    ckks.verify_test_vectors(d * v, got, min_precision=12.0)


def test_get_minimum_level_for_refresh():
    """ref mpckks/utils.go:9-16 — λ-budget helper."""
    from lattigo_tpu.multiparty.sharing import get_minimum_level_for_refresh
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(55, 45, 45, 45), log_p=(60,), log_default_scale=45))
    lvl, bound, ok = get_minimum_level_for_refresh(
        128, 2.0 ** 45, 3, params.q_moduli)
    assert ok and bound == 128 + 45
    # logQ(0..lvl) must cover bound + log2(parties)
    import math
    logq = sum(math.log2(q) for q in params.q_moduli[: lvl + 1])
    assert logq >= bound + math.log2(3)
    assert sum(math.log2(q) for q in params.q_moduli[: lvl]) < bound + math.log2(3) + 1
    # chain too short -> not ok
    _, _, ok2 = get_minimum_level_for_refresh(128, 2.0 ** 45, 3,
                                              params.q_moduli[:2])
    assert not ok2
