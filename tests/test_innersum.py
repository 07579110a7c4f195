"""Generic inner sum / replicate (arbitrary n) on CKKS slots."""

import numpy as np
import jax

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks


def test_inner_sum_and_replicate_non_pow2():
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(50, 40), log_p=(55,), log_default_scale=40))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 3)
    sk = kgen.gen_secret_key(k_sk)
    enc = ckks.Encoder(params)

    batch, n = 2, 5  # non-power-of-two block count
    ev0 = ckks.Evaluator(params)
    els = set(ev0.galois_elements_for_inner_sum(batch, n))
    els |= set(ev0.galois_elements_for_inner_sum(-batch, n))
    gks = kgen.gen_galois_keys(k_gk, sorted(els), sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(galois_keys=gks))

    slots = params.max_slots
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, slots)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v))

    out = ev.inner_sum(ct, batch, n)
    got = np.real(enc.decode(rlwe.Decryptor(params, sk).decrypt(out)))
    want = sum(np.roll(v, -i * batch) for i in range(n))
    ckks.verify_test_vectors(want, got, min_precision=20.0)

    out2 = ev.replicate(ct, batch, n)
    got2 = np.real(enc.decode(rlwe.Decryptor(params, sk).decrypt(out2)))
    want2 = sum(np.roll(v, i * batch) for i in range(n))
    ckks.verify_test_vectors(want2, got2, min_precision=20.0)


def test_rotate_hoisted_and_mul_then_add():
    """rotate_hoisted shares one decomposition across many rotations;
    mul[_relin]_then_add parity wrappers."""
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(50, 40, 40), log_p=(55,), log_default_scale=40))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    enc = ckks.Encoder(params)
    ks = [1, 3, 7]
    gks = kgen.gen_galois_keys(
        k_gk, [params.galois_element(k) for k in ks], sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk, galois_keys=gks))

    slots = params.max_slots
    rng = np.random.default_rng(2)
    v = rng.uniform(-1, 1, slots)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v))
    dec = rlwe.Decryptor(params, sk)

    rots = ev.rotate_hoisted(ct, ks)
    for k in ks:
        got = np.real(enc.decode(dec.decrypt(rots[k])))
        ckks.verify_test_vectors(np.roll(v, -k), got, min_precision=20.0)

    acc = ev.mul_relin_then_add(ct, ct, ev.mul_relin(ct, ct))
    got = np.real(enc.decode(dec.decrypt(ev.rescale(acc))))
    ckks.verify_test_vectors(2 * v * v, got, min_precision=18.0)

    assert ev.drop_level(ct, 1).level == ct.level - 1


def test_inner_function_product_fold():
    """inner_function with a mul-relin-rescale combine computes the slotwise
    product of n rotated copies (ref inner_sum.go:317 InnerFunction)."""
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(50, 40, 40, 40), log_p=(55,), log_default_scale=40))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 4)
    sk = kgen.gen_secret_key(k_sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    enc = ckks.Encoder(params)

    batch, n = 1, 4
    ev0 = ckks.Evaluator(params)
    gks = kgen.gen_galois_keys(
        k_gk, ev0.galois_elements_for_inner_sum(batch, n), sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(
        relinearization_key=rlk, galois_keys=gks))

    slots = params.max_slots
    rng = np.random.default_rng(2)
    v = rng.uniform(0.5, 1.5, slots)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v))

    def mul(a, b):
        return ev.rescale(ev.mul_relin(a, b))

    out = ev.inner_function(ct, batch, n, mul)
    got = np.real(enc.decode(rlwe.Decryptor(params, sk).decrypt(out)))
    want = np.ones_like(v)
    for i in range(n):
        want = want * np.roll(v, -i * batch)
    ckks.verify_test_vectors(want, got, min_precision=15.0)


def test_mul_by_monomial_matches_bigint_oracle():
    """Ring.mul_by_monomial vs schoolbook negacyclic shift (ref
    ring/operations.go:306)."""
    import jax.numpy as jnp
    from lattigo_tpu.ring.ring import Ring
    from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator

    n = 32
    q = NTTFriendlyPrimesGenerator(40, 2 * n).next_alternating_prime()
    ring = Ring(n, [q])
    rng = np.random.default_rng(3)
    a = rng.integers(0, q, (1, n), dtype=np.uint64)
    for k in [0, 1, 5, n - 1, n, n + 3, 2 * n - 1, -1, -n, 3 * n + 2]:
        got = np.asarray(ring.mul_by_monomial(jnp.asarray(a), k))
        want = np.zeros(n, dtype=object)
        for j in range(n):
            d = (j + k) % (2 * n)
            sign = 1 if d < n else -1
            want[d % n] = (want[d % n] + sign * int(a[0, j])) % q
        assert np.array_equal(got[0], want.astype(np.uint64)), k


def test_partial_traces_sum_matches_rotation_fold():
    """Hoisted PartialTracesSum (ref inner_sum.go:147) == plaintext fold."""
    params = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, log_q=(50, 40), log_p=(55,), log_default_scale=40))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(5), 3)
    sk = kgen.gen_secret_key(k_sk)
    enc = ckks.Encoder(params)

    offset, n_rot = 2, 3
    ev0 = ckks.Evaluator(params)
    gks = kgen.gen_galois_keys(
        k_gk, ev0.galois_elements_for_partial_traces_sum(offset, n_rot), sk)
    ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(galois_keys=gks))

    slots = params.max_slots
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, slots)
    ct = rlwe.Encryptor(params, sk).encrypt(k_ct, enc.encode(v))
    out = ev.partial_traces_sum(ct, offset, n_rot)
    got = np.real(enc.decode(rlwe.Decryptor(params, sk).decrypt(out)))
    want = sum(np.roll(v, -i * offset) for i in range(n_rot))
    ckks.verify_test_vectors(want, got, min_precision=20.0)
