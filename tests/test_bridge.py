"""DomainSwitcher: standard ↔ conjugate-invariant CKKS bridging."""

import numpy as np
import jax
import pytest

from lattigo_tpu import rlwe
from lattigo_tpu.ring.ring import CONJUGATE_INVARIANT
from lattigo_tpu.schemes import ckks
from lattigo_tpu.schemes.ckks.encoder import CIEncoder
from lattigo_tpu.schemes.ckks.bridge import DomainSwitcher, gen_ring_swap_keys


def test_domain_switcher_roundtrip():
    # one modulus chain serves both rings (NthRoot = 4·256 for both)
    n_ci = 256
    gen_q = __import__(
        "lattigo_tpu.utils.primes", fromlist=["x"]).NTTFriendlyPrimesGenerator
    gq = gen_q(50, 4 * n_ci)
    g40 = gen_q(40, 4 * n_ci)
    gp = gen_q(55, 4 * n_ci)
    q_moduli = (gq.next_alternating_prime(), g40.next_alternating_prime())
    p_moduli = (gp.next_alternating_prime(),)

    params_std = ckks.Parameters(ckks.ParametersLiteral(
        log_n=9, q=q_moduli, p=p_moduli, log_default_scale=40))
    params_ci = ckks.Parameters(ckks.ParametersLiteral(
        log_n=8, q=q_moduli, p=p_moduli, log_default_scale=40,
        ring_type=CONJUGATE_INVARIANT))

    k_std, k_ci, k_swap, k_ct = jax.random.split(jax.random.PRNGKey(0), 4)
    sk_std = rlwe.KeyGenerator(params_std).gen_secret_key(k_std)
    sk_ci = rlwe.KeyGenerator(params_ci).gen_secret_key(k_ci)
    std_to_ci, ci_to_std = gen_ring_swap_keys(k_swap, params_std,
                                              sk_std, sk_ci)
    sw = DomainSwitcher(params_std, params_ci, std_to_ci, ci_to_std)

    enc_std = ckks.Encoder(params_std)
    enc_ci = CIEncoder(params_ci)
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params_std.max_slots) + \
        1j * rng.uniform(-1, 1, params_std.max_slots)

    ct = rlwe.Encryptor(params_std, sk_std).encrypt(k_ct, enc_std.encode(v))

    # ComplexToReal: CI ct holding Re(v) at doubled scale
    ct_ci = sw.complex_to_real(ct)
    got_re = enc_ci.decode(rlwe.Decryptor(params_ci, sk_ci).decrypt(ct_ci))
    assert np.abs(got_re - np.real(v)).max() < 1e-7, (
        f"C2R err {np.abs(got_re - np.real(v)).max():.2e}")

    # RealToComplex: back to the standard ring, imaginary part ~0
    ct_back = sw.real_to_complex(ct_ci)
    got = enc_std.decode(rlwe.Decryptor(params_std, sk_std).decrypt(ct_back))
    assert np.abs(got - np.real(v)).max() < 1e-6, (
        f"R2C err {np.abs(got - np.real(v)).max():.2e}")
