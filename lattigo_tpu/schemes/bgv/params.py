"""BGV/BFV parameters: RLWE parameters + plaintext modulus T.

TPU-native analog of ``schemes/bgv/params.go``: adds the plaintext ring
R_T (reusing the generic :class:`~lattigo_tpu.ring.Ring` over the single
modulus T for slot packing) and the T-scaling constants used by the
unified BGV/BFV evaluator (see ``schemes/bgv/README.md``: plaintexts are
stored MSB-encoded as m·T^{-1} mod Q; tensoring pre-multiplies by T).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace

import numpy as np
import jax.numpy as jnp

from lattigo_tpu import rlwe
from lattigo_tpu.ring.ring import Ring


@dataclass(frozen=True)
class ParametersLiteral(rlwe.ParametersLiteral):
    """RLWE literal + PlaintextModulus T (ref schemes/bgv/params.go:35)."""

    t: int = 65537


class Parameters(rlwe.Parameters):
    """Resolved BGV/BFV parameters (ref schemes/bgv/params.go:76)."""

    def __init__(self, literal: ParametersLiteral):
        super().__init__(replace(literal, ntt_flag=True))
        t = literal.t
        if t in self.q_moduli:
            raise ValueError("T must be coprime to Q")
        self.t = t
        # Slot geometry: T ≡ 1 mod 2^{logMaxDim+1} gives 2 x maxDim/?? slots.
        # Full batching requires T ≡ 1 mod 2N (ref params.go:166-202); we
        # support the full-slot case and scalar (non-batched) T otherwise.
        self.max_slots = self.n if (t - 1) % (2 * self.n) == 0 else 0
        self.ring_t = Ring(self.n, [t]) if self.max_slots else None

        # Per-level scaling constants.
        lq = len(self.q_moduli)
        # T·2^128 mod q_i — one mred(x, ·) gives Montgomery form of T·x
        # (ref evaluator.go:38 tMontgomery).
        tm = np.array([((t << 128) % q) for q in self.q_moduli],
                      dtype=np.uint64).reshape(lq, 1)
        self.t_mont2 = jnp.asarray(tm)
        # MForm(T^{-1} mod q_i) — used at encoding (MSB form m·T^{-1}).
        tinv = np.array([((pow(t, -1, q) << 64) % q) for q in self.q_moduli],
                        dtype=np.uint64).reshape(lq, 1)
        self.tinv_mont = jnp.asarray(tinv)
        # [q_l^{-1} mod T] for scale tracking across rescaling.
        self.qinv_mod_t = [pow(q % t, -1, t) for q in self.q_moduli]

        # Build the BFV double basis eagerly — constructing Ring tables
        # lazily inside a jit trace would capture tracers.
        _ = self.ring_qmul

    @property
    def plaintext_modulus(self) -> int:
        return self.t

    # -- BFV double basis (ref params.go:204 RingQMul) -------------------------

    @functools.cached_property
    def ring_qmul(self):
        """Auxiliary basis QMul with |QMul| ≥ |Q|·N·T for exact tensoring."""
        from lattigo_tpu.utils.primes import NTTFriendlyPrimesGenerator
        gen = NTTFriendlyPrimesGenerator(61, self.nth_root)
        primes = []
        need = len(self.q_moduli)
        while len(primes) < need:
            c = gen.next_alternating_prime()
            if c not in self.q_moduli and c != self.t:
                primes.append(c)
        return Ring(self.n, primes)


    def scale_mul(self, s1: int, s2: int) -> int:
        return s1 * s2 % self.t

    def scale_div_q(self, s: int, level: int) -> int:
        """Scale update after dropping q_level (ref evaluator.go Rescale)."""
        return s * self.qinv_mod_t[level] % self.t
