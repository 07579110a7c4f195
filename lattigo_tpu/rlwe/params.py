"""RLWE parameter sets: the single source of truth for every layer above.

TPU-native analog of ``core/rlwe/params.go``: a :class:`Parameters` object
owns the Q/P modulus chains, the :class:`~lattigo_tpu.ring.Ring` objects
(with all device-resident NTT/reduction tables), the noise distributions,
and the Galois-element helpers. Parameters are host-side static metadata —
they never cross into traced code except through their constant tables, so
each (params, level) pair compiles exactly one XLA program.
"""

from __future__ import annotations

import functools
import json
from dataclasses import dataclass, field, asdict

from lattigo_tpu.ring.ring import Ring, STANDARD, CONJUGATE_INVARIANT
from lattigo_tpu.ring.ringqp import RingQP
from lattigo_tpu.ring.basis_extension import BasisExtender, Decomposer
from lattigo_tpu.ring import sampling
from lattigo_tpu.ring.sampling import DiscreteGaussian, Ternary, Uniform, DEFAULT_XE, DEFAULT_XS
from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator

__all__ = [
    "ParametersLiteral", "Parameters",
    "DiscreteGaussian", "Ternary", "Uniform", "DEFAULT_XE", "DEFAULT_XS",
]


@dataclass(frozen=True)
class ParametersLiteral:
    """User-facing parameter literal (ref core/rlwe/params.go:54-84).

    Exactly one of (``q``) / (``log_q``) must be given; ``p``/``log_p`` are
    optional (no key-switching auxiliary basis when absent).
    """

    log_n: int
    q: tuple[int, ...] | None = None
    p: tuple[int, ...] | None = None
    log_q: tuple[int, ...] | None = None
    log_p: tuple[int, ...] | None = None
    xe: object = DEFAULT_XE
    xs: object = DEFAULT_XS
    ring_type: str = STANDARD
    ntt_flag: bool = True        # fresh cts/pts live in the NTT domain
    default_scale: float = 1.0

    def to_json(self) -> str:
        d = asdict(self)
        d["xe"] = {"type": type(self.xe).__name__, **getattr(self.xe, "__dict__", {})}
        d["xs"] = {"type": type(self.xs).__name__, **getattr(self.xs, "__dict__", {})}
        return json.dumps(d)

    @staticmethod
    def from_json(s: str) -> "ParametersLiteral":
        """Inverse of :meth:`to_json` (polymorphic distributions, ref
        ring/sampler.go:156 ParametersFromMap)."""
        d = json.loads(s)
        dists = {"DiscreteGaussian": DiscreteGaussian, "Ternary": Ternary,
                 "Uniform": Uniform}
        for k in ("xe", "xs"):
            spec = dict(d[k])
            cls = dists[spec.pop("type")]
            d[k] = cls(**spec)
        for k in ("q", "p", "log_q", "log_p"):
            if d.get(k) is not None:
                d[k] = tuple(d[k])
        return ParametersLiteral(**d)


def gen_moduli(log_n: int, nth_root: int, log_q: tuple[int, ...],
               log_p: tuple[int, ...]) -> tuple[list[int], list[int]]:
    """Draw NTT-friendly primes per requested bit size (ref params.go:811).

    One generator per distinct bit size; sizes are assigned in order so the
    chain stays balanced around each 2^b.
    """
    gens: dict[int, NTTFriendlyPrimesGenerator] = {}

    def draw(b: int) -> int:
        if b not in gens:
            gens[b] = NTTFriendlyPrimesGenerator(b, nth_root)
        return gens[b].next_alternating_prime()

    q = [draw(b) for b in log_q]
    p = [draw(b) for b in log_p]
    return q, p


class Parameters:
    """Immutable resolved parameter set; safe to share across threads/jits."""

    def __init__(self, literal: ParametersLiteral):
        lit = literal
        if (lit.q is None) == (lit.log_q is None):
            raise ValueError("exactly one of q / log_q must be set")
        if lit.p is not None and lit.log_p is not None:
            raise ValueError("at most one of p / log_p may be set")
        self.literal = lit
        self.log_n = lit.log_n
        self.n = 1 << lit.log_n
        self.ring_type = lit.ring_type
        # NthRoot of the cyclotomic: 2N standard, 4N conjugate-invariant
        # (ref ring/ring.go NthRoot; CI ring embeds in the 4N-th cyclotomic).
        self.nth_root = (2 if lit.ring_type == STANDARD else 4) * self.n

        if lit.q is not None:
            q = list(lit.q)
            p = list(lit.p) if lit.p is not None else []
        else:
            q, p = gen_moduli(lit.log_n, self.nth_root, tuple(lit.log_q),
                              tuple(lit.log_p or ()))
        self.q_moduli = q
        self.p_moduli = p

        self.ring_q = Ring(self.n, q, lit.ring_type)
        self.ring_p = Ring(self.n, p, lit.ring_type) if p else None
        self.ring_qp = RingQP(self.ring_q, self.ring_p)

        self.xe = lit.xe
        self.xs = lit.xs
        self.ntt_flag = lit.ntt_flag
        self.default_scale = lit.default_scale

        # Build the key-switch machinery eagerly: constructing its jnp
        # tables lazily inside a jit trace would capture tracers.
        _ = self.basis_extender, self.decomposer

    # -- chain geometry -------------------------------------------------------

    @property
    def max_level(self) -> int:
        return len(self.q_moduli) - 1

    @property
    def max_level_p(self) -> int:
        return len(self.p_moduli) - 1

    def q_big_int(self, level: int | None = None) -> int:
        return self.ring_q.modulus_at_level(
            self.max_level if level is None else level)

    def p_big_int(self) -> int:
        r = 1
        for p in self.p_moduli:
            r *= p
        return r

    def log_q_big(self, level: int | None = None) -> float:
        return self.q_big_int(level).bit_length()

    # -- key-switching machinery (lazily built, cached) -------------------------

    @functools.cached_property
    def basis_extender(self) -> BasisExtender | None:
        if self.ring_p is None:
            return None
        return BasisExtender(self.ring_q, self.ring_p)

    @functools.cached_property
    def decomposer(self) -> Decomposer | None:
        if self.ring_p is None:
            return None
        return Decomposer(self.ring_q, self.ring_p)

    # -- noise ------------------------------------------------------------------

    def noise_fresh_sk(self) -> float:
        """σ of fresh sk-encryption noise (ref params.go:382)."""
        return getattr(self.xe, "sigma", 3.2)

    def noise_fresh_pk(self) -> float:
        """σ of fresh pk-encryption noise (ref params.go:362, P-rescaled)."""
        sigma = getattr(self.xe, "sigma", 3.2)
        if isinstance(self.xs, Ternary):
            if self.xs.hamming_weight:
                h = self.xs.hamming_weight
            else:
                h = int(self.n * (1 - self.xs.p))
        else:
            h = self.n
        import math
        return sigma * math.sqrt(h + 2.0)

    # -- Galois elements ---------------------------------------------------------

    @property
    def galois_gen(self) -> int:
        """Generator of the rotation subgroup: 5 (ref params.go GaloisGen)."""
        return 5

    def galois_element(self, k: int) -> int:
        """Galois element for a cyclic column rotation by k (ref :571)."""
        return pow(self.galois_gen, k, self.nth_root)

    def galois_element_inverse(self, gal_el: int) -> int:
        return pow(gal_el, -1, self.nth_root)

    @property
    def galois_element_order_two(self) -> int:
        """Row-swap / conjugation element: NthRoot−1 (ref :604)."""
        return self.nth_root - 1

    # -- misc ---------------------------------------------------------------------

    def __repr__(self) -> str:
        return (f"Parameters(logN={self.log_n}, logQ={[q.bit_length() for q in self.q_moduli]}, "
                f"logP={[p.bit_length() for p in self.p_moduli]}, ring={self.ring_type})")

    def __eq__(self, other) -> bool:
        return (isinstance(other, Parameters)
                and self.n == other.n
                and self.q_moduli == other.q_moduli
                and self.p_moduli == other.p_moduli
                and self.ring_type == other.ring_type)

    def __hash__(self) -> int:
        return hash((self.n, tuple(self.q_moduli), tuple(self.p_moduli), self.ring_type))
