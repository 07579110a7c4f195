"""Rescaling / basis extension / automorphism / sampler tests vs big-int oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lattigo_tpu.ring import Ring
from lattigo_tpu.ring import sampling
from lattigo_tpu.ring import automorphism as auto
from lattigo_tpu.ring.basis_extension import BasisExtender, Decomposer
from lattigo_tpu.ring.scaling import div_by_last_modulus, div_by_last_modulus_many
from lattigo_tpu.utils.primes import generate_ntt_primes

RNG = np.random.default_rng(2)
LOGN = 6
N = 1 << LOGN


@pytest.fixture(scope="module")
def rings():
    primes = generate_ntt_primes(50, 2 * N, 7)
    ring_q = Ring(N, primes[:4])
    ring_p = Ring(N, primes[4:])
    return ring_q, ring_p


def rand_big_int_poly(Q):
    return [int(x) for x in RNG.integers(0, 1 << 62, size=N)] if Q is None else [
        int(RNG.integers(0, 1 << 62)) * int(RNG.integers(0, 1 << 62)) % Q for _ in range(N)
    ]


def test_div_round_by_last_modulus(rings):
    ring, _ = rings
    Q = ring.modulus_at_level(ring.max_level)
    x = rand_big_int_poly(Q)
    p = ring.from_int_coeffs(x)
    got = div_by_last_modulus(ring, p)
    ql = ring.moduli[ring.max_level]
    want = [((xi + ql // 2) // ql) % ring.modulus_at_level(ring.max_level - 1) for xi in x]
    back = ring.to_int_coeffs(got, level=ring.max_level - 1, centered=False)
    assert back == want


def test_div_floor_by_last_modulus_ntt(rings):
    ring, _ = rings
    Q = ring.modulus_at_level(ring.max_level)
    x = rand_big_int_poly(Q)
    p = ring.ntt(ring.from_int_coeffs(x))
    got = ring.intt(
        div_by_last_modulus(ring, p, ntt_domain=True, round_div=False),
        level=ring.max_level - 1,
    )
    ql = ring.moduli[ring.max_level]
    want = [(xi // ql) % ring.modulus_at_level(ring.max_level - 1) for xi in x]
    back = ring.to_int_coeffs(got, level=ring.max_level - 1, centered=False)
    assert back == want


def test_div_by_last_modulus_many(rings):
    ring, _ = rings
    Q = ring.modulus_at_level(ring.max_level)
    x = rand_big_int_poly(Q)
    p = ring.from_int_coeffs(x)
    got = div_by_last_modulus_many(ring, p, 2)
    q2, q3 = ring.moduli[2], ring.moduli[3]
    want = [
        (((xi + q3 // 2) // q3 + q2 // 2) // q2) % ring.modulus_at_level(1) for xi in x
    ]
    back = ring.to_int_coeffs(got, level=1, centered=False)
    assert back == want


def test_mod_up_q_to_p_centered(rings):
    ring_q, ring_p = rings
    be = BasisExtender(ring_q, ring_p)
    Q = ring_q.modulus_at_level(ring_q.max_level)
    x = rand_big_int_poly(Q)
    p = ring_q.from_int_coeffs(x)
    got = np.asarray(be.mod_up_q_to_p(p, ring_q.max_level))
    for j, pj in enumerate(ring_p.moduli):
        want = np.array(
            [(xi - Q if xi > Q // 2 else xi) % pj for xi in x], dtype=np.uint64
        )
        np.testing.assert_array_equal(got[j], want)


def test_mod_down_qp_to_q(rings):
    ring_q, ring_p = rings
    be = BasisExtender(ring_q, ring_p)
    level = ring_q.max_level
    Q = ring_q.modulus_at_level(level)
    P = be.p_modulus
    xs = [int(RNG.integers(0, 1 << 60)) * int(RNG.integers(0, 1 << 60)) % (Q * P) for _ in range(N)]
    xq = ring_q.from_int_coeffs(xs)
    xp = ring_p.from_int_coeffs(xs)
    got = be.mod_down_qp_to_q(xq, xp, level)
    back = ring_q.to_int_coeffs(got, centered=False)
    for g, x in zip(back, xs):
        want = ((x + P // 2) // P) % Q  # round(x/P): centered remainder variant
        # centered remainder rounding: allow ±1 on exact-tie boundary
        assert (g - want) % Q in (0, 1, Q - 1)


def test_mod_down_ntt_domain(rings):
    ring_q, ring_p = rings
    be = BasisExtender(ring_q, ring_p)
    level = ring_q.max_level
    Q = ring_q.modulus_at_level(level)
    P = be.p_modulus
    xs = [int(RNG.integers(0, 1 << 60)) * int(RNG.integers(0, 1 << 60)) % (Q * P) for _ in range(N)]
    xq = ring_q.ntt(ring_q.from_int_coeffs(xs))
    xp = ring_p.ntt(ring_p.from_int_coeffs(xs))
    got = ring_q.intt(be.mod_down_qp_to_q(xq, xp, level, ntt_domain=True))
    back = ring_q.to_int_coeffs(got, centered=False)
    for g, x in zip(back, xs):
        want = ((x + P // 2) // P) % Q
        assert (g - want) % Q in (0, 1, Q - 1)


def test_decomposer(rings):
    ring_q, ring_p = rings
    dec = Decomposer(ring_q, ring_p)
    level = ring_q.max_level
    Q = ring_q.modulus_at_level(level)
    x = rand_big_int_poly(Q)
    p = ring_q.from_int_coeffs(x)
    for d in range(dec.num_digits(level)):
        lo, hi = dec.digit_range(level, d)
        W = 1
        for m in ring_q.moduli[lo:hi]:
            W *= m
        yq, yp = dec.decompose_single(p, level, d)
        yq, yp = np.asarray(yq), np.asarray(yp)
        for j, m in enumerate(ring_q.moduli[: level + 1] + ring_p.moduli):
            want = np.array(
                [
                    ((xi % W) - W if (xi % W) > W // 2 else (xi % W)) % m
                    for xi in x
                ],
                dtype=np.uint64,
            )
            got = yq[j] if j <= level else yp[j - level - 1]
            np.testing.assert_array_equal(got, want, err_msg=f"digit {d} limb {j}")


def test_automorphism_ntt_vs_coeff(rings):
    ring, _ = rings
    x = jnp.asarray(
        np.stack([RNG.integers(0, q, N, dtype=np.uint64) for q in ring.moduli])
    )
    for gal in (3, 5, 2 * N - 1, 7):
        via_coeff = ring.ntt(auto.apply_coeff(x, N, gal, ring.q))
        via_ntt = auto.automorphism_ntt(ring.ntt(x), N, gal)
        np.testing.assert_array_equal(np.asarray(via_coeff), np.asarray(via_ntt))


def test_automorphism_is_action(rings):
    ring, _ = rings
    x = jnp.asarray(
        np.stack([RNG.integers(0, q, N, dtype=np.uint64) for q in ring.moduli])
    )
    # σ_5 ∘ σ_5 == σ_25
    a = auto.apply_coeff(auto.apply_coeff(x, N, 5, ring.q), N, 5, ring.q)
    b = auto.apply_coeff(x, N, 25 % (2 * N), ring.q)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_samplers(rings):
    ring, _ = rings
    key = jax.random.key(42)
    u = np.asarray(sampling.uniform(key, ring))
    q = np.array(ring.moduli).reshape(-1, 1)
    assert (u < q).all()

    t = sampling.ternary(key, ring, sampling.Ternary(p=1 / 3))
    tn = np.asarray(t)
    for i, qi in enumerate(ring.moduli):
        assert set(np.unique(tn[i])) <= {0, 1, qi - 1}

    th = sampling.ternary(key, ring, sampling.Ternary(hamming_weight=20))
    thn = np.asarray(th)[0]
    assert (thn != 0).sum() == 20

    g = sampling.discrete_gaussian(key, ring)
    gn = np.asarray(g)[0].astype(np.int64)
    q0 = ring.moduli[0]
    centered = np.where(gn > q0 // 2, gn - q0, gn)
    assert (np.abs(centered) <= 20).all()
    assert 1.0 < centered.std() < 6.0

    # per-limb lifting consistency: same signed value in every limb
    g2 = np.asarray(g)
    c0 = np.where(g2[0] > ring.moduli[0] // 2, g2[0].astype(np.int64) - ring.moduli[0], g2[0])
    c1 = np.where(g2[1] > ring.moduli[1] // 2, g2[1].astype(np.int64) - ring.moduli[1], g2[1])
    np.testing.assert_array_equal(c0, c1)


def test_keyed_prng_deterministic(rings):
    ring, _ = rings
    a = sampling.KeyedPRNG(b"seed").uniform_poly(ring)
    b = sampling.KeyedPRNG(b"seed").uniform_poly(ring)
    c = sampling.KeyedPRNG(b"other").uniform_poly(ring)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_mod_up_mxu_contraction_bit_exact():
    """The int8 digit-matmul ModUp contraction (MXU path) matches the u64
    MAC path exactly, centered and floor."""
    from lattigo_tpu.ring import basis_extension as be
    from lattigo_tpu.ring import modops
    from lattigo_tpu.utils.primes import generate_ntt_primes

    n = 256
    src = generate_ntt_primes(28, 2 * n, 6)
    dst = generate_ntt_primes(27, 2 * n, 9)
    consts = be.ModUpConstants(src, dst)
    assert consts.mxu
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, (3, n)) for q in src], axis=-2).astype(np.uint64))
    dst_q = np.array(dst, np.uint64)[:, None]
    dst_qinv = np.array(
        [modops.gen_mred_constant(q) for q in dst], np.uint64)[:, None]
    bh = np.array(
        [modops.gen_bred_constant(q)[0] for q in dst], np.uint64)[:, None]
    for centered in (True, False):
        want = np.asarray(be.mod_up(x, consts, dst_q, dst_qinv, bh, centered))
        y = modops.mred(x, consts.qhatinv, consts.src_q, consts.src_qinv)
        v = be._overflow_count(y, consts, centered)
        got = np.asarray(be._mod_up_contract_mxu(y, v, consts, dst_q, bh))
        np.testing.assert_array_equal(got, want)


def test_mod_up_large_src_to_small_dst_exact():
    """Regression: Q→{T} conversion with ≥2^52 source primes and a tiny
    destination modulus (the BGV decode path). The dst-small Montgomery
    fast path must not see unreduced 52+-bit operands (a·b overflowed u64
    and corrupted every coefficient)."""
    from lattigo_tpu.ring import basis_extension as be
    from lattigo_tpu.ring import modops
    from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator

    t = 0x10001
    n = 512
    for log_q0 in (46, 52, 55, 60):
        g0 = NTTFriendlyPrimesGenerator(log_q0, 2048)
        g1 = NTTFriendlyPrimesGenerator(45, 2048)
        src = [g0.next_alternating_prime(),
               g1.next_alternating_prime(), g1.next_alternating_prime()]
        consts = be.ModUpConstants(src, [t])
        assert consts.prereduce_src == (log_q0 >= modops.SMALL_Q_BITS or
                                        45 >= modops.SMALL_Q_BITS)
        rng = np.random.default_rng(log_q0)
        xs = rng.integers(-(t // 2), t // 2, n)
        resid = jnp.asarray(np.stack(
            [np.mod(xs, q) for q in src]).astype(np.uint64))
        dst_q = np.array([t], np.uint64)[:, None]
        dst_qinv = np.array([modops.gen_mred_constant(t)], np.uint64)[:, None]
        bh = np.array([modops.gen_bred_constant(t)[0]], np.uint64)[:, None]
        got = np.asarray(be.mod_up(resid, consts, dst_q, dst_qinv, bh,
                                   centered=True))[0]
        np.testing.assert_array_equal(got, np.mod(xs, t).astype(np.uint64))
