"""Collective public key switching: re-encrypt from Σsk_i to a foreign pk."""

import numpy as np
import jax

from lattigo_tpu import rlwe
from lattigo_tpu.rlwe.keys import SecretKey
from lattigo_tpu.schemes import bgv
from lattigo_tpu.multiparty.protocols import PublicKeySwitchProtocol


def test_public_key_switch():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=9, log_q=(45, 38), log_p=(50,), t=65537))
    n_parties = 3
    kgen = rlwe.KeyGenerator(params)
    keys = jax.random.split(jax.random.PRNGKey(0), n_parties)
    sks = [kgen.gen_secret_key(k) for k in keys]
    ideal = sks[0]
    for s in sks[1:]:
        ideal = SecretKey(params.ring_qp.add(ideal.value, s.value))

    # the foreign receiver's key pair
    sk_out = kgen.gen_secret_key(jax.random.PRNGKey(7))
    pk_out = kgen.gen_public_key(jax.random.PRNGKey(8), sk_out)

    enc = bgv.Encoder(params)
    rng = np.random.default_rng(1)
    m = rng.integers(0, params.t, params.n, dtype=np.int64)
    ct = rlwe.Encryptor(params, ideal).encrypt(
        jax.random.PRNGKey(9), enc.encode(m))

    proto = PublicKeySwitchProtocol(params)
    shares = [proto.gen_share(jax.random.PRNGKey(100 + i), sks[i], pk_out, ct)
              for i in range(n_parties)]
    agg = shares[0]
    for s in shares[1:]:
        agg = proto.aggregate_shares(agg, s)
    out = proto.key_switch(ct, agg)

    got = np.asarray(enc.decode(
        rlwe.Decryptor(params, sk_out).decrypt(out))) % params.t
    np.testing.assert_array_equal(got, m % params.t)
