"""BGV collective refresh + masked transform over R_T masks (mpbgv)."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.rlwe.keys import SecretKey
from lattigo_tpu.schemes import bgv
from lattigo_tpu.multiparty.sharing_bgv import (
    BGVMaskedTransformProtocol, BGVRefreshProtocol, MaskedTransformFunc,
)

N_PARTIES = 3


@pytest.fixture(scope="module")
def ctx():
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=9, log_q=(45, 35, 35), log_p=(50,), t=65537))
    keys = jax.random.split(jax.random.PRNGKey(3), N_PARTIES)
    kgen = rlwe.KeyGenerator(params)
    sks = [kgen.gen_secret_key(k) for k in keys]
    ideal = sks[0]
    for s in sks[1:]:
        ideal = SecretKey(params.ring_qp.add(ideal.value, s.value))
    return dict(params=params, sks=sks, ideal=ideal,
                enc=bgv.Encoder(params),
                encryptor=rlwe.Encryptor(params, ideal),
                decryptor=rlwe.Decryptor(params, ideal))


def _run_protocol(ctx, proto, ct, transform=None):
    params, sks = ctx["params"], ctx["sks"]
    crp = proto.sample_crp(b"bgv-refresh-crs")
    L = params.max_level
    kwargs = {} if transform is None else {"transform": transform}
    agg = None
    for i in range(N_PARTIES):
        sh = proto.gen_share(jax.random.PRNGKey(100 + i), sks[i], ct, crp,
                             level_out=L, **kwargs)
        agg = sh if agg is None else proto.aggregate_shares(agg, sh)
    return proto.finalize(ct, agg, crp, level_out=L, **kwargs)


def test_bgv_collective_refresh(ctx):
    """E2S at level 0 + S2E at the top, exact round-trip (mpbgv/refresh.go)."""
    params, enc = ctx["params"], ctx["enc"]
    rng = np.random.default_rng(5)
    m = rng.integers(0, params.t, size=params.n, dtype=np.int64)
    ct = ctx["encryptor"].encrypt(jax.random.PRNGKey(9), enc.encode(m)).at_level(0)

    proto = BGVRefreshProtocol(params)
    out = _run_protocol(ctx, proto, ct)
    assert out.level == params.max_level
    got = enc.decode(ctx["decryptor"].decrypt(out)) % params.t
    np.testing.assert_array_equal(got, m)


def test_bgv_masked_transform(ctx):
    """Linear slot transform (×3, rotate-by-1) riding the refresh
    (mpbgv/transform.go MaskedTransformFunc with Decode/Encode)."""
    params, enc = ctx["params"], ctx["enc"]
    t = params.t
    rng = np.random.default_rng(6)
    m = rng.integers(0, t, size=params.n, dtype=np.int64)
    ct = ctx["encryptor"].encrypt(jax.random.PRNGKey(10), enc.encode(m)).at_level(0)

    def fn(vals):
        return np.roll((vals.astype(object) * 3) % t, 1).astype(np.uint64)

    proto = BGVMaskedTransformProtocol(params)
    out = _run_protocol(ctx, proto, ct,
                        MaskedTransformFunc(fn, decode=True, encode=True))
    got = enc.decode(ctx["decryptor"].decrypt(out)) % t
    want = fn(m.astype(np.uint64))
    np.testing.assert_array_equal(got, want.astype(np.int64))
