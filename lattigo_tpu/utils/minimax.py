"""Minimax (Remez) polynomial approximation over interval unions.

TPU-native analog of ``utils/bignum/minimax_approximation.go`` (Remez
exchange with extrema scanning) and
``circuits/ckks/minimax/minimax_composite_polynomial.go``
(GenMinimaxCompositePolynomial): host-side tooling that produces the
polynomials consumed by the sign/comparison circuits.

Implementation: classical one-point-exchange-free full Remez on a
Chebyshev basis (odd-only basis for sign-like targets), solved in float64
— accurate to ~2^-45 minimax error, sufficient for the CKKS precision
this library currently targets (the reference's big-float solver is the
upgrade path for >45-bit composites).
"""

from __future__ import annotations

import numpy as np

from lattigo_tpu.circuits.polynomial import Polynomial, CHEBYSHEV


def _cheb_basis(x: np.ndarray, degrees: list[int]) -> np.ndarray:
    """T_d(x) columns for d in degrees; x in [-1, 1]."""
    t = np.arccos(np.clip(x, -1.0, 1.0))
    return np.cos(np.outer(t, degrees))


def _dense_grid(intervals, points_per_interval=2000):
    xs = []
    for a, b in intervals:
        xs.append(0.5 * (a + b) + 0.5 * (b - a)
                  * -np.cos(np.linspace(0, np.pi, points_per_interval)))
    return np.concatenate(xs)


def remez(f, intervals, degree: int, odd: bool = False,
          iters: int = 30) -> Polynomial:
    """Minimax approximation of f over a union of intervals.

    Returns a Polynomial in Chebyshev basis over the hull [min a, max b].
    ``odd=True`` restricts to odd Chebyshev polynomials (sign-like targets;
    intervals must then be symmetric and only the positive part given).
    """
    lo = min(a for a, _ in intervals)
    hi = max(b for _, b in intervals)
    if odd:
        lo = -hi
    scale = 2.0 / (hi - lo)

    def to_cheb(x):
        return (x - lo) * scale - 1.0

    degrees = (list(range(1, degree + 1, 2)) if odd
               else list(range(0, degree + 1)))
    n = len(degrees)

    grid = _dense_grid(intervals)
    fg = np.array([f(x) for x in grid])

    # initial reference: n+1 Chebyshev-spread points over the union
    idx = np.linspace(0, len(grid) - 1, n + 1).astype(int)
    ref = grid[idx]

    coeffs = None
    for _ in range(iters):
        fr = np.array([f(x) for x in ref])
        A = _cheb_basis(to_cheb(ref), degrees)
        signs = np.power(-1.0, np.arange(n + 1))
        M = np.concatenate([A, signs[:, None]], axis=1)
        sol = np.linalg.solve(M, fr)
        coeffs = sol[:n]

        err = _cheb_basis(to_cheb(grid), degrees) @ coeffs - fg
        # pick n+1 alternating local extrema of |err|
        ext = [0]
        for i in range(1, len(grid) - 1):
            if (err[i] - err[i - 1]) * (err[i + 1] - err[i]) <= 0:
                ext.append(i)
        ext.append(len(grid) - 1)
        ext = np.array(ext)
        # keep the n+1 largest alternating ones
        order = ext[np.argsort(-np.abs(err[ext]))]
        chosen: list[int] = []
        for i in sorted(order[: 4 * (n + 1)]):
            if not chosen or np.sign(err[i]) != np.sign(err[chosen[-1]]):
                chosen.append(i)
            elif abs(err[i]) > abs(err[chosen[-1]]):
                chosen[-1] = i
        if len(chosen) < n + 1:
            break
        best = np.array(chosen[: n + 1])
        new_ref = grid[best]
        if np.allclose(new_ref, ref, rtol=0, atol=1e-12):
            ref = new_ref
            break
        ref = new_ref

    full = np.zeros(degree + 1, dtype=np.complex128)
    for d, c in zip(degrees, coeffs):
        full[d] = c
    return Polynomial(list(full), basis=CHEBYSHEV, interval=(lo, hi))


def gen_minimax_composite_sign(alpha: int, degrees: list[int]) -> list[Polynomial]:
    """Composite minimax sign: p_k ∘ … ∘ p_1 ≈ sign on ±[2^-alpha, 1]
    (ref GenMinimaxCompositePolynomial, minimax_composite_polynomial.go:14).

    Each stage narrows the uncertainty band: stage i approximates sign on
    ±[eps_i, 1+delta] and its output lands within ±(1 ± eps_{i+1}).
    """
    polys = []
    eps = 2.0 ** -alpha
    lo = eps
    for i, d in enumerate(degrees):
        hi = 1.0 + (0.0 if i == 0 else err_prev)  # noqa: F821 (defined below)
        p = remez(lambda x: 1.0, [(lo, hi if i else 1.0)], d, odd=True)
        # evaluate achieved error on the interval
        grid = _dense_grid([(lo, hi if i else 1.0)])
        degs = list(range(1, d + 1, 2))
        vals = _cheb_basis(
            (grid - p.interval[0]) * (2.0 / (p.interval[1] - p.interval[0])) - 1.0,
            degs) @ np.array([p.coeffs[k] for k in degs], dtype=np.complex128)
        err_prev = float(np.max(np.abs(vals.real - 1.0)))
        polys.append(p)
        lo = 1.0 - err_prev
    return polys
