"""Noise-budget telemetry (ref ring/ring.go:615 Log2OfStandardDeviation,
the -print-noise test flag, and core/rgsw/utils.go NoiseRGSWCiphertext).

These are the observability analogs the reference exposes instead of a
tracing subsystem (SURVEY.md §5): decrypt-side empirical noise statistics
against a known plaintext, for calibrating parameter choices and catching
noise-budget regressions in tests.
"""

from __future__ import annotations

import math

import numpy as np


def log2_std(values) -> float:
    """log2 of the standard deviation of centered integer samples."""
    v = np.array([float(x) for x in values])
    s = v.std()
    return math.log2(s) if s > 0 else float("-inf")


def ciphertext_noise(params, sk, ct, pt_value=None):
    """Centered noise polynomial of ct (optionally minus a known plaintext).

    Returns the integer coefficient vector e with ct decrypting to
    pt + e. Host-side; intended for tests and parameter calibration.
    """
    from lattigo_tpu.rlwe.encryption import Decryptor

    dec = Decryptor(params, sk)
    pt = dec.decrypt(ct)
    v = pt.value
    if pt.is_ntt:
        v = params.ring_q.intt(v, pt.level)
    if pt_value is not None:
        w = pt_value
        lvl = min(pt.level, w.shape[-2] - 1)
        w2 = w[..., : lvl + 1, :]
        v = params.ring_q.sub(v[..., : lvl + 1, :], w2, lvl)
        level = lvl
    else:
        level = pt.level
    return params.ring_q.to_int_coeffs(np.asarray(v), level, centered=True)


def log2_noise_std(params, sk, ct, pt_value=None) -> float:
    """log2 std of the ciphertext noise — the noise-budget gauge used by
    the reference's rlwe tests against analytic bounds."""
    return log2_std(ciphertext_noise(params, sk, ct, pt_value))
