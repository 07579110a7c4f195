"""Han–Ki cosine interpolation for EvalMod (CosDiscrete).

TPU-native analog of ``utils/cosine/cosine_approx.go`` (ia.cr/2019/688,
"Better Bootstrapping for Approximate Homomorphic Encryption"): a
polynomial approximation of cos(2π(x − 0.25)/2^r) over x ∈ [−K, K] whose
interpolation nodes cluster in ±1/dev neighbourhoods of the integers —
the only places EvalMod inputs can land (dev = message ratio 2^{log_mr}).
This reaches a given accuracy at far lower degree than full-interval
Chebyshev interpolation when K/2^r > 1.

Returned coefficients are in the Chebyshev basis of the variable
v = x·2^r/K (the reference's [−K/2^r, K/2^r] interval convention,
cosine_approx.go:265 T[i][1] = x/(K/scfac)); :mod:`circuits.mod1`
evaluates them with the matching input normalisation.

Precision: numpy longdouble (64-bit mantissa on x86) instead of the
reference's 256-bit big floats — adequate for ≤ 50-bit targets.
"""

from __future__ import annotations

import math

import numpy as np

_LD = np.longdouble
_PI = _LD("3.14159265358979323846264338327950288")
_LOG2_2PI = math.log2(2 * math.pi)


def _gen_degrees(degree: int, k: int, dev: float):
    """Node count per interval [i ± 1/dev] (ref cosine_approx.go:82)."""
    degbdd = degree + 1
    totdeg = 2 * k - 1
    err = 1.0 / dev
    deg = [1] * k
    temp = 0.0
    for i in range(1, 2 * k):
        temp -= math.log2(i)
    temp += (2 * k - 1) * _LOG2_2PI
    temp += math.log2(err)
    bdd = [0.0] * k
    for i in range(k):
        bdd[i] = temp
        for j in range(1, k - i):
            bdd[i] += math.log2(j + err)
        for j in range(1, k + i):
            bdd[i] += math.log2(j + err)

    for _ in range(200):
        if totdeg >= degbdd:
            break
        maxi = int(np.argmax(bdd))
        if maxi != 0:
            if totdeg + 2 > degbdd:
                break
            for i in range(k):
                bdd[i] -= math.log2(totdeg + 1)
                bdd[i] -= math.log2(totdeg + 2)
                bdd[i] += 2.0 * _LOG2_2PI
                if i != maxi:
                    bdd[i] += math.log2(abs(i - maxi) + err)
                    bdd[i] += math.log2(i + maxi + err)
                else:
                    bdd[i] += math.log2(err) - 1.0
                    bdd[i] += math.log2(2.0 * i + err)
            totdeg += 2
        else:
            bdd[0] -= math.log2(totdeg + 1)
            bdd[0] += math.log2(err) - 1.0
            bdd[0] += _LOG2_2PI
            for i in range(1, k):
                bdd[i] -= math.log2(totdeg + 1)
                bdd[i] += _LOG2_2PI
                bdd[i] += math.log2(i + err)
            totdeg += 1
        deg[maxi] += 1
    return deg, totdeg


def _gen_nodes(deg, dev: float, totdeg: int, k: int, scnum: int):
    """Nodes ±i ± cos(πj/deg_i)/dev and f(nodes) (ref :159)."""
    scfac = _LD(1 << scnum)
    inter = _LD(1.0) / _LD(dev)
    nodes = np.zeros(totdeg, dtype=_LD)
    cnt = 1 if deg[0] % 2 != 0 else 0
    for i in range(k - 1, 0, -1):
        for j in range(deg[i]):
            t = np.cos(_PI * _LD(2 * j) / _LD(2 * deg[i])) * inter
            nodes[cnt] = _LD(i) + t
            cnt += 1
            nodes[cnt] = -nodes[cnt - 1]
            cnt += 1
    for j in range(deg[0] // 2):
        t = np.cos(_PI * _LD(2 * j) / _LD(2 * deg[0])) * inter
        nodes[cnt] = t
        cnt += 1
        nodes[cnt] = -nodes[cnt - 1]
        cnt += 1
    y = np.cos(2 * _PI * (nodes - _LD(0.25)) / scfac)
    return nodes, y


def approximate_cos(k: int, degree: int, dev: float, scnum: int) -> list[float]:
    """Chebyshev-basis coefficients (variable x·2^scnum/K) of the Han–Ki
    interpolant of cos(2π(x−0.25)/2^scnum) on [−K, K] (ref :30)."""
    deg, totdeg = _gen_degrees(degree, k, dev)
    nodes, y = _gen_nodes(deg, dev, totdeg, k, scnum)

    scfac = _LD(1 << scnum)
    # divided differences (Newton form), ref solve():248
    y = np.array(y, dtype=_LD)
    for j in range(1, totdeg):
        for i in range(totdeg - j):
            y[i] = (y[i + 1] - y[i]) / (nodes[i + j] - nodes[i])

    totdeg += 1
    kb = _LD(k)
    x = (kb / scfac) * np.cos(_PI * np.arange(totdeg, dtype=_LD)
                              / _LD(totdeg - 1))

    # evaluate the Newton interpolant at the x points
    p = np.full(totdeg, y[0], dtype=_LD)
    for j in range(1, totdeg - 1):
        p = p * (x - nodes[j]) + y[j]

    # Chebyshev basis in v = x/(K/scfac): build and solve T c = p
    T = np.zeros((totdeg, totdeg), dtype=_LD)
    v = x / (kb / scfac)
    T[:, 0] = 1.0
    T[:, 1] = v
    for j in range(2, totdeg):
        T[:, j] = 2.0 * v * T[:, j - 1] - T[:, j - 2]

    # Gaussian elimination with partial pivoting in longdouble
    Tm = T.copy()
    pv = p.copy()
    n = totdeg
    for i in range(n - 1):
        mi = i + int(np.argmax(np.abs(Tm[i:, i])))
        if mi != i:
            Tm[[i, mi]] = Tm[[mi, i]]
            pv[[i, mi]] = pv[[mi, i]]
        Tm[i, i + 1:] /= Tm[i, i]
        pv[i] /= Tm[i, i]
        Tm[i, i] = 1.0
        for j2 in range(i + 1, n):
            pv[j2] -= Tm[j2, i] * pv[i]
            Tm[j2, i + 1:] -= Tm[j2, i] * Tm[i, i + 1:]
            Tm[j2, i] = 0.0
    c = np.zeros(n, dtype=_LD)
    c[n - 1] = pv[n - 1] / Tm[n - 1, n - 1]
    for i in range(n - 2, -1, -1):
        c[i] = pv[i] - np.dot(Tm[i, i + 1:], c[i + 1:])
    return [float(ci) for ci in c[: totdeg - 1]]
