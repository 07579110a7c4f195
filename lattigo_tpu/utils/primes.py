"""NTT-friendly prime generation and primitive-root search.

Host-side number theory used at parameter-generation time. Mirrors the
behaviour of the reference's ``ring/primes.go`` (NTTFriendlyPrimesGenerator:
primes ≡ 1 mod 2N wandering up/down from 2^b) and ``ring/subring.go:163``
(primitive-root search via factorisation of q-1), re-implemented from the
mathematical definitions on top of sympy.
"""

from __future__ import annotations

import sympy


def is_prime(x: int) -> bool:
    return sympy.isprime(x)


class NTTFriendlyPrimesGenerator:
    """Generates primes ≡ 1 mod NthRoot, alternating above/below 2^bit_size.

    Behavioural analog of ``ring/primes.go:16-196``: successive calls walk
    outward from 2^bit_size in steps of NthRoot, preferring to alternate
    up/down so the generated moduli stay balanced around 2^bit_size.
    """

    def __init__(self, bit_size: int, nth_root: int):
        if nth_root <= 0 or nth_root & (nth_root - 1):
            raise ValueError(f"nth_root must be a power of two, got {nth_root}")
        if bit_size > 61:
            raise ValueError(f"bit_size must be <= 61, got {bit_size}")
        self.bit_size = bit_size
        self.nth_root = nth_root
        center = 1 << bit_size
        # First candidates ≡ 1 mod nth_root straddling 2^bit_size.
        self._next_up = center + 1
        self._next_down = center + 1 - nth_root
        self._prefer_up = True

    def _advance_up(self) -> int:
        while True:
            self._next_up += self.nth_root
            if self._next_up.bit_length() > self.bit_size + 1:
                raise ValueError("ran out of upstream primes for bit size")
            if is_prime(self._next_up):
                return self._next_up

    def _advance_down(self) -> int:
        while True:
            self._next_down -= self.nth_root
            if self._next_down.bit_length() < self.bit_size or self._next_down <= self.nth_root:
                raise ValueError("ran out of downstream primes for bit size")
            if is_prime(self._next_down):
                return self._next_down

    def next_alternating_prime(self) -> int:
        """Next prime, alternating above/below 2^bit_size (balanced chain)."""
        if self._prefer_up:
            self._prefer_up = False
            try:
                return self._advance_up()
            except ValueError:
                return self._advance_down()
        else:
            self._prefer_up = True
            try:
                return self._advance_down()
            except ValueError:
                return self._advance_up()

    def next_upstream_prime(self) -> int:
        return self._advance_up()

    def next_downstream_prime(self) -> int:
        return self._advance_down()

    def next_alternating_primes(self, k: int) -> list[int]:
        return [self.next_alternating_prime() for _ in range(k)]


def generate_ntt_primes(bit_size: int, nth_root: int, k: int) -> list[int]:
    """k balanced NTT-friendly primes of ~bit_size bits for a given 2N-th root."""
    return NTTFriendlyPrimesGenerator(bit_size, nth_root).next_alternating_primes(k)


def primitive_root(q: int, factors: list[int] | None = None) -> int:
    """Smallest-found generator of (Z/qZ)* for prime q.

    Same contract as the reference's ``ring/subring.go:163-196``: find g with
    g^((q-1)/p) != 1 for every prime factor p of q-1.
    """
    if factors is None:
        factors = list(sympy.factorint(q - 1).keys())
    order = q - 1
    g = 2
    while True:
        if all(pow(g, order // p, q) != 1 for p in factors):
            return g
        g += 1


def primitive_nth_root(q: int, n: int) -> int:
    """A primitive n-th root of unity mod prime q (requires n | q-1)."""
    if (q - 1) % n != 0:
        raise ValueError(f"{n} does not divide q-1 for q={q}")
    g = primitive_root(q)
    psi = pow(g, (q - 1) // n, q)
    # Guaranteed primitive since g is a generator.
    return psi
