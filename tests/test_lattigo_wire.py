"""Lattigo binary wire-format interop (utils/lattigo_wire.py).

Structural gates: byte layouts match the reference's BinarySize contracts
(ref core/rlwe/metadata.go:30, utils/structs/vector.go:41) and every object
round-trips losslessly. Functional gate: a key set serialized and reloaded
through the wire format still decrypts / key-switches correctly.
"""

import struct

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.utils import lattigo_wire as wire


def test_u64_vector_layout():
    v = np.arange(5, dtype=np.uint64)
    b = wire.write_u64_vector(v)
    # ref utils/structs/vector.go: u64 LE length + raw LE u64 data
    assert len(b) == 8 + 5 * 8
    assert struct.unpack_from("<Q", b, 0)[0] == 5
    assert struct.unpack_from("<Q", b, 8)[0] == 0
    assert struct.unpack_from("<Q", b, 8 + 4 * 8)[0] == 4
    out, off = wire.read_u64_vector(memoryview(b), 0)
    assert off == len(b) and np.array_equal(out, v)


def test_poly_layout_and_roundtrip():
    rng = np.random.default_rng(0)
    c = rng.integers(0, 1 << 60, (3, 16), dtype=np.uint64)
    b = wire.write_poly(c)
    # ref ring/poly.go Matrix encoding: #rows + per-row vectors
    assert len(b) == 8 + 3 * (8 + 16 * 8)
    assert struct.unpack_from("<Q", b, 0)[0] == 3
    out, off = wire.read_poly(memoryview(b), 0)
    assert off == len(b) and np.array_equal(out, c)


def test_metadata_fixed_width_and_roundtrip():
    b = wire.write_metadata(scale=2**45, scale_mod=65537,
                            log_dimensions=(1, 13), is_batched=True,
                            is_ntt=True, is_montgomery=False)
    # ref metadata.go BinarySize: 44 + (84 + 111) + 38
    assert len(b) == wire.METADATA_SIZE == 277
    meta, off = wire.read_metadata(memoryview(b), 0)
    assert off == 277
    assert meta["scale"] == 2**45
    assert meta["scale_mod"] == 65537
    assert meta["log_dimensions"] == (1, 13)
    assert meta["is_batched"] and meta["is_ntt"] and not meta["is_montgomery"]


def test_go_float_text_format():
    # big.Float.Text('e', 39): 45 chars, normalized mantissa, 2-digit exp
    for x, want in [
        (2**40, "1.099511627776000000000000000000000000000e+12"),
        (1, "1.000000000000000000000000000000000000000e+00"),
        (0, "0.000000000000000000000000000000000000000e+00"),
        (65537, "6.553700000000000000000000000000000000000e+04"),
    ]:
        got = wire._go_float_text(x)
        assert got == want, (x, got)
        assert len(got) == 45


@pytest.fixture(scope="module")
def ctx():
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(45, 38, 38), log_p=(45,), log_default_scale=38))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_ct, k_gk = jax.random.split(jax.random.PRNGKey(42), 4)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    gks = kgen.gen_galois_keys(k_gk, [params.galois_element(1)], sk)
    return params, sk, rlk, gks, k_ct


def test_secret_key_roundtrip(ctx):
    params, sk, _, _, _ = ctx
    b = wire.secret_key_to_bytes(sk)
    sk2 = wire.secret_key_from_bytes(b)
    assert np.array_equal(np.asarray(sk.value.q), np.asarray(sk2.value.q))
    assert np.array_equal(np.asarray(sk.value.p), np.asarray(sk2.value.p))


def test_public_key_roundtrip(ctx):
    params, sk, _, _, _ = ctx
    kgen = rlwe.KeyGenerator(params)
    pk = kgen.gen_public_key(jax.random.PRNGKey(7), sk)
    pk2 = wire.public_key_from_bytes(wire.public_key_to_bytes(pk))
    assert np.array_equal(np.asarray(pk.value.q), np.asarray(pk2.value.q))
    assert np.array_equal(np.asarray(pk.value.p), np.asarray(pk2.value.p))


def test_ciphertext_roundtrip_and_decrypt(ctx):
    params, sk, _, _, k_ct = ctx
    enc = ckks.Encoder(params)
    v = np.random.default_rng(1).uniform(-1, 1, params.max_slots)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v))
    b = wire.ciphertext_to_bytes(ct, log_dimensions=(0, params.log_n - 1))
    ct2 = wire.ciphertext_from_bytes(b)
    assert np.array_equal(np.asarray(ct.value), np.asarray(ct2.value))
    assert ct2.scale == ct.scale and ct2.is_ntt == ct.is_ntt
    out = enc.decode(rlwe.Decryptor(params, sk).decrypt(ct2))
    assert np.abs(out - v).max() < 1e-6


def test_relinearization_key_roundtrip_and_use(ctx):
    params, sk, rlk, _, k_ct = ctx
    rlk2 = wire.relinearization_key_from_bytes(
        wire.relinearization_key_to_bytes(rlk))
    assert np.array_equal(np.asarray(rlk.gadget.value.q),
                          np.asarray(rlk2.gadget.value.q))
    # functional: mul_relin with the reloaded key still decrypts correctly
    enc = ckks.Encoder(params)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk2))
    v = np.random.default_rng(2).uniform(-1, 1, params.max_slots)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v))
    out = enc.decode(rlwe.Decryptor(params, sk).decrypt(
        ev.rescale(ev.mul_relin(ct, ct))))
    assert np.abs(out - v * v).max() < 1e-4


def test_galois_key_roundtrip(ctx):
    params, sk, _, gks, _ = ctx
    gal_el = next(iter(gks))
    gk = gks[gal_el]
    b = wire.galois_key_to_bytes(gk, params.nth_root)
    gk2 = wire.galois_key_from_bytes(b)
    assert gk2.gal_el == gk.gal_el
    assert np.array_equal(np.asarray(gk.gadget.value.q),
                          np.asarray(gk2.gadget.value.q))


def test_base2_gadget_wire_roundtrip():
    """Base-2^w gadget keys serialize with the reference's per-limb digit
    counts (ref gadgetciphertext.go:33-37, params.go:523) and round-trip
    through the padded flat layout."""
    import jax
    from lattigo_tpu import rlwe
    from lattigo_tpu.utils import lattigo_wire as lw
    from lattigo_tpu.utils.lattigo_wire import _base2_digit_counts

    params = rlwe.Parameters(rlwe.ParametersLiteral(
        log_n=6, log_q=(40, 30, 31), log_p=(45,)))
    kg = rlwe.KeyGenerator(params)
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    sk = kg.gen_secret_key(k0)
    rlk = kg.gen_relinearization_key(k1, sk, base2=13)
    data = lw.relinearization_key_to_bytes(rlk, params.q_moduli)
    back = lw.relinearization_key_from_bytes(data)
    assert back.gadget.base2 == rlk.gadget.base2 == 13
    gq = np.asarray(rlk.gadget.value.q)
    bq = np.asarray(back.gadget.value.q)
    assert gq.shape == bq.shape
    digs = _base2_digit_counts(params.q_moduli, 13)
    max_dig = gq.shape[0] // len(params.q_moduli)
    for i, c in enumerate(digs):
        for j in range(max_dig):
            r = i * max_dig + j
            if j < c:
                np.testing.assert_array_equal(gq[r], bq[r])
            else:
                assert not bq[r].any()   # padding rows zero
    # serializing without moduli must fail loudly, not truncate
    with pytest.raises(ValueError):
        lw.relinearization_key_to_bytes(rlk)
