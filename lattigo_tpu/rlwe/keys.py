"""Key material containers + key generation.

TPU-native analog of ``core/rlwe/keys.go`` + ``keygenerator.go`` +
``gadgetciphertext.go``. All key generation is functional: it consumes a
JAX PRNG key and returns immutable pytrees. Key polynomials live in the
NTT + Montgomery domain over R_QP (exactly the reference's convention,
``core/rlwe/keys.go:18``), so every key-switch MAC is a single
``mred_lazy`` with no per-use domain conversion.

Gadget layout: an RNS gadget over Q at level l with |P| = alpha splits the
l+1 limbs into beta = ceil((l+1)/alpha) digits; the gadget vector entry for
digit d is the CRT indicator of the digit's limb group scaled by P, i.e. in
RNS rows: P mod q_j on rows [d·alpha, (d+1)·alpha), 0 elsewhere
(ref gadgetciphertext.go:172 AddPolyTimesGadgetVectorToGadgetCiphertext).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lattigo_tpu.ring import modops, sampling
from lattigo_tpu.ring.ringqp import QPPoly, RingQP, stack as qp_stack
from lattigo_tpu.rlwe.params import Parameters


def _mform_int(a: int, q: int) -> int:
    return (a << 64) % q


@struct.dataclass
class SecretKey:
    """s ∈ R_QP in NTT + Montgomery form (ref keys.go:18)."""

    value: QPPoly


@struct.dataclass
class PublicKey:
    """(p0, p1) = (-a·s + e, a) ∈ R_QP², NTT + Montgomery; leading axis 2."""

    value: QPPoly


@struct.dataclass
class GadgetCiphertext:
    """Gadget-RLWE encryption: value.q u64[beta, 2, LQ, N] (+ P part).

    Row (d, 0) = -a_d·s + e_d + m·g_d, row (d, 1) = a_d, both NTT+Montgomery
    (ref gadgetciphertext.go:19).

    ``base2`` > 0 selects the power-of-two gadget (ref gadgetciphertext.go:20
    BaseTwoDecomposition, active only when |P| ≤ 1 as in the reference):
    rows are ordered (limb i, digit j) → i·max_digits + j with gadget factor
    P·2^{base2·j}·CRT_i.
    """

    value: QPPoly
    base2: int = struct.field(pytree_node=False, default=0)

    @property
    def beta(self) -> int:
        return self.value.q.shape[-4]

    @property
    def level_q(self) -> int:
        return self.value.q.shape[-2] - 1


@struct.dataclass
class CompressedGadgetCiphertext:
    """Seeded gadget ciphertext: stores only the c0 rows + the PRNG seed.

    The uniform c1 rows are re-derived from the seed on :meth:`expand`,
    halving key material on the wire (ref keys.go:298-424 compressed EVKs,
    re-expanded on load via the seeded PRNG).
    """

    c0: QPPoly  # [beta, LQ/LP, N], NTT+Montgomery
    seed: bytes = struct.field(pytree_node=False, default=b"")

    def expand(self, params: Parameters) -> GadgetCiphertext:
        level_q = self.c0.q.shape[-2] - 1
        beta = self.c0.q.shape[-3]
        c1 = _seeded_gadget_c1(params, self.seed, beta, level_q)
        rows = [qp_stack([QPPoly(self.c0.q[..., d, :, :], self.c0.p[..., d, :, :]),
                          c1[d]]) for d in range(beta)]
        return GadgetCiphertext(qp_stack(rows))


def compress_gadget(gadget: GadgetCiphertext,
                    seed: bytes) -> CompressedGadgetCiphertext:
    """Strip the (seed-derived) c1 rows from a gadget ciphertext generated
    with ``gadget_encrypt(..., seed=seed)``."""
    return CompressedGadgetCiphertext(
        c0=QPPoly(gadget.value.q[..., 0, :, :], gadget.value.p[..., 0, :, :]),
        seed=seed)


def _seeded_gadget_c1(params: Parameters, seed: bytes, beta: int,
                      level_q: int) -> list[QPPoly]:
    """The beta uniform NTT+Montgomery QP rows derived from a seed."""
    prng = sampling.KeyedPRNG(seed)
    rqp = params.ring_qp
    out = []
    for _ in range(beta):
        q = prng.uniform_poly(params.ring_q, level_q)
        pp = (prng.uniform_poly(params.ring_p)
              if params.ring_p is not None else None)
        out.append(rqp.mform(QPPoly(q, pp), level_q))
    return out


@struct.dataclass
class EvaluationKey:
    """Key-switch key sk_in → sk_out (ref keys.go:293)."""

    gadget: GadgetCiphertext


@struct.dataclass
class RelinearizationKey:
    """EVK for s² → s (ref keys.go:542)."""

    gadget: GadgetCiphertext


@struct.dataclass
class GaloisKey:
    """EVK enabling X^i → X^{i·gal_el} (ref keys.go:577)."""

    gadget: GadgetCiphertext
    gal_el: int = struct.field(pytree_node=False, default=0)


class KeyGenerator:
    """Functional key generator (ref keygenerator.go:14)."""

    def __init__(self, params: Parameters):
        self.params = params

    # -- secret / public keys ---------------------------------------------------

    def gen_secret_key(self, key, dist=None) -> SecretKey:
        """Sample sk from params.xs, or an explicit distribution (e.g. a
        sparse Ternary for bootstrapping encapsulation keys)."""
        p = self.params
        x = sampling.signed(key, p.n, p.xs if dist is None else dist)
        return self.secret_key_from_signed(x)

    def secret_key_from_signed(self, x) -> SecretKey:
        """Encode explicit signed coefficients as a SecretKey — carries one
        party secret across parameter sets (ref mpckks/transform.go:29
        WithParams, where skOut is the same secret in the output ring)."""
        p = self.params
        qp = p.ring_qp.lift_signed(x)
        qp = p.ring_qp.ntt(qp)
        return SecretKey(p.ring_qp.mform(qp))

    def gen_public_key(self, key, sk: SecretKey) -> PublicKey:
        p = self.params
        ka, ke = jax.random.split(key)
        a = p.ring_qp.uniform(ka)                       # NTT-domain uniform
        e = p.ring_qp.ntt(p.ring_qp.sample_signed(ke, p.xe))
        a_s = p.ring_qp.mul_mont(a, sk.value)           # plain a·s
        p0 = p.ring_qp.sub(e, a_s)
        return PublicKey(qp_stack([p.ring_qp.mform(p0), p.ring_qp.mform(a)]))

    # -- gadget encryption --------------------------------------------------------

    def _gadget_scalars(self, level_q: int) -> np.ndarray:
        """MForm(P mod q_j) per Q row (gadget factor), u64[level_q+1, 1]."""
        p = self.params
        P = p.p_big_int() if p.ring_p is not None else 1
        vals = [_mform_int(P % q, q) for q in p.q_moduli[: level_q + 1]]
        return jnp.asarray(np.array(vals, dtype=np.uint64).reshape(level_q + 1, 1))

    def _gadget_scalars_base2(self, level_q: int, w: int) -> jnp.ndarray:
        """MForm(P·2^{w·j} mod q_i) for row (i, j), u64[rows, lq+1, 1]; zero
        on limbs ≠ i and on digits past ceil(log2 q_i / w) (those digits of
        any value < q_i are zero anyway)."""
        p = self.params
        P = p.p_big_int() if p.ring_p is not None else 1
        lq = level_q + 1
        moduli = p.q_moduli[:lq]
        max_dig = max((q - 1).bit_length() for q in moduli)
        max_dig = -(-max_dig // w)
        g = np.zeros((lq * max_dig, lq, 1), dtype=np.uint64)
        for i, q in enumerate(moduli):
            for j in range(-(-(q - 1).bit_length() // w)):
                g[i * max_dig + j, i, 0] = _mform_int(
                    (P << (w * j)) % q, q)
        return jnp.asarray(g)

    def gadget_encrypt_base2(self, key, m_q, sk_out: SecretKey, base2: int,
                             level_q: int | None = None) -> GadgetCiphertext:
        """Power-of-two gadget encryption (ref gadgetciphertext.go:180 with
        BaseTwoDecomposition > 0; requires |P| ≤ 1 like the reference's
        BaseTwoDecompositionVectorSize)."""
        p = self.params
        assert len(p.p_moduli) <= 1, "base-2 gadget requires |P| <= 1"
        level_q = p.max_level if level_q is None else level_q
        rqp = p.ring_qp
        rq = p.ring_q
        gfac = self._gadget_scalars_base2(level_q, base2)  # [rows, lq, 1]
        rows = []
        for r in range(gfac.shape[0]):
            key, ka, ke = jax.random.split(key, 3)
            a = rqp.uniform(ka, level_q)
            c1 = rqp.mform(a, level_q)
            a_s = rqp.mul_mont(a, rqp.at_level(sk_out.value, level_q), level_q)
            e = rqp.ntt(rqp.sample_signed(ke, p.xe, level_q), level_q)
            c0 = rqp.mform(rqp.sub(e, a_s, level_q), level_q)
            term = modops.mred(m_q, gfac[r], rq.q[: level_q + 1],
                               rq.qinv[: level_q + 1])
            c0 = QPPoly(modops.add_mod(c0.q, term, rq.q[: level_q + 1]), c0.p)
            rows.append(qp_stack([c0, c1]))
        return GadgetCiphertext(qp_stack(rows), base2=base2)

    def gadget_encrypt(self, key, m_q, sk_out: SecretKey,
                       level_q: int | None = None,
                       row: int = 0, seed: bytes | None = None,
                       base2: int = 0) -> GadgetCiphertext:
        """Gadget-encrypt m (Q part, NTT+Montgomery, u64[lq+1, N]) under sk_out.

        ``row`` selects which component carries m·g: 0 (standard, EVKs) or
        1 (the RGSW "c1" half: rows (−a·s+e, a+m·g), ref core/rgsw/elements.go).
        When ``seed`` is given, the uniform c1 rows are derived from the
        deterministic KeyedPRNG so the result can be shipped compressed
        (see :class:`CompressedGadgetCiphertext`; requires ``row == 0``).
        ``base2`` > 0 switches to the power-of-two gadget.
        """
        assert seed is None or row == 0, "seeded c1 incompatible with RGSW row 1"
        if base2 > 0:
            assert row == 0 and seed is None
            return self.gadget_encrypt_base2(key, m_q, sk_out, base2, level_q)
        p = self.params
        if p.ring_p is None:
            raise NotImplementedError(
                "RNS gadget encryption requires an auxiliary P basis "
                "(use base2 > 0 for P-less key switching)")
        level_q = p.max_level if level_q is None else level_q
        alpha = len(p.p_moduli)
        beta = -(-(level_q + 1) // alpha)
        gfac = self._gadget_scalars(level_q)   # [lq+1, 1] MForm(P mod q_j)
        rqp = p.ring_qp
        rq = p.ring_q
        lq = level_q + 1

        c1_seeded = (None if seed is None
                     else _seeded_gadget_c1(p, seed, beta, level_q))
        rows = []
        for d in range(beta):
            key, ka, ke = jax.random.split(key, 3)
            if c1_seeded is None:
                a = rqp.uniform(ka, level_q)
                c1 = rqp.mform(a, level_q)
                a_s = rqp.mul_mont(a, rqp.at_level(sk_out.value, level_q),
                                   level_q)
            else:
                c1 = c1_seeded[d]  # already M-form; imform for the product
                a = rqp.imform(c1, level_q)
                a_s = rqp.mul_mont(a, rqp.at_level(sk_out.value, level_q),
                                   level_q)
            e = rqp.ntt(rqp.sample_signed(ke, p.xe, level_q), level_q)
            c0 = rqp.mform(rqp.sub(e, a_s, level_q), level_q)
            lo, hi = d * alpha, min((d + 1) * alpha, lq)
            # m·g_d on the digit's own rows (both operands M-form → M-form).
            term = modops.mred(
                m_q[..., lo:hi, :], gfac[lo:hi], rq.q[lo:hi], rq.qinv[lo:hi])
            tgt = c0 if row == 0 else c1
            tgt_q = tgt.q.at[..., lo:hi, :].set(
                modops.add_mod(tgt.q[..., lo:hi, :], term, rq.q[lo:hi]))
            if row == 0:
                rows.append(qp_stack([QPPoly(tgt_q, c0.p), c1]))
            else:
                rows.append(qp_stack([c0, QPPoly(tgt_q, c1.p)]))
        return GadgetCiphertext(qp_stack(rows))

    # -- evaluation keys ------------------------------------------------------------

    def gen_evaluation_key(self, key, sk_in: SecretKey, sk_out: SecretKey,
                           base2: int = 0) -> EvaluationKey:
        """EVK re-encrypting from sk_in to sk_out (ref keygenerator.go:245)."""
        return EvaluationKey(self.gadget_encrypt(key, sk_in.value.q, sk_out,
                                                 base2=base2))

    def gen_relinearization_key(self, key, sk: SecretKey,
                                base2: int = 0) -> RelinearizationKey:
        """RLK: gadget encryption of s² under s (ref keygenerator.go:99)."""
        p = self.params
        s2 = p.ring_q.mul_mont(sk.value.q, sk.value.q)  # M-form of s²
        return RelinearizationKey(self.gadget_encrypt(key, s2, sk, base2=base2))

    def gen_galois_key(self, key, gal_el: int, sk: SecretKey) -> GaloisKey:
        """GK for X^i → X^{i·gal_el}: encrypt sk under σ_{gal_el^{-1}}(sk).

        The gadget product then re-encrypts from s to σ^{-1}(s); applying
        σ afterwards lands back on s (ref keygenerator.go:139-161). Keyswitch
        before permutation is what makes hoisting possible.
        """
        p = self.params
        gal_inv = p.galois_element_inverse(gal_el)
        sk_out = SecretKey(p.ring_qp.automorphism_ntt(sk.value, gal_inv))
        gadget = self.gadget_encrypt(key, sk.value.q, sk_out)
        return GaloisKey(gadget, gal_el)

    def gen_galois_keys(self, key, gal_els: list[int], sk: SecretKey,
                        chunk: int = 8,
                        levels: dict[int, int] | None = None
                        ) -> dict[int, GaloisKey]:
        """All Galois keys in a few jitted+vmapped device calls.

        The per-key work (automorphism gather + gadget encryption) has
        identical shapes across Galois elements, so the whole set batches
        over a stacked index tensor — one compile, ceil(G/chunk) device
        launches — instead of thousands of eager ops over the device link
        (the reference's analog is goroutine-parallel keygen; the TPU-native
        analog is a batch axis). ``chunk`` bounds peak device memory
        (one key at logN=16/30 limbs is ~200 MB).

        ``levels``: optional gal_el → level_q map producing LEVEL-SCOPED
        keys — a key generated at level l has ceil((l+1)/alpha) gadget
        rows of l+1+|P| limbs instead of the full chain, a multi-x memory
        saving when most rotations happen far down the modulus chain (the
        bootstrap's S2C stages). A key must be generated at (at least) the
        highest level it will ever be used at; the gadget product slices
        rows/limbs down for lower levels.
        """
        from lattigo_tpu.ring import automorphism as auto
        p = self.params
        if not gal_els:
            return {}
        if p.ring_p is None:
            # base2/P-less paths keep the eager route
            keys = jax.random.split(key, len(gal_els))
            return {g: self.gen_galois_key(k, g, sk)
                    for g, k in zip(gal_els, keys)}
        if levels is not None:
            # group by level; one batched pass per distinct level
            out: dict[int, GaloisKey] = {}
            by_level: dict[int, list[int]] = {}
            for g in gal_els:
                by_level.setdefault(levels.get(g, p.max_level), []).append(g)
            for lvl, els in sorted(by_level.items()):
                key, sub = jax.random.split(key)
                out.update(self._gen_galois_keys_level(
                    sub, els, sk, chunk, lvl))
            return out
        return self._gen_galois_keys_level(key, gal_els, sk, chunk,
                                           p.max_level)

    def _gen_galois_keys_level(self, key, gal_els: list[int], sk: SecretKey,
                               chunk: int, level_q: int
                               ) -> dict[int, GaloisKey]:
        from lattigo_tpu.ring import automorphism as auto
        p = self.params
        ci = p.ring_q.ring_type == "conjugate_invariant"
        idx_fn = auto._ntt_index_ci_np if ci else auto._ntt_index_np
        idx_np = np.stack([idx_fn(p.n, p.galois_element_inverse(g))
                           for g in gal_els])
        keys = jax.random.split(key, len(gal_els))

        # MXU NTT weight tables ride the jit boundary as arguments — closed
        # over they inline as HLO constants and exhaust memory at logN>=15
        # (see ring/tables.py)
        from lattigo_tpu.ring.tables import TableThreader
        threader = TableThreader(p.ring_q, p.ring_p)

        jits = getattr(self, "_gk_batched_jits", None)
        if jits is None:
            jits = self._gk_batched_jits = {}
        jit_fn = jits.get(level_q)
        if jit_fn is None:
            def batched(tabs, ks, idx, sk_q, sk_p):
                old = threader.install(tabs)
                try:
                    def one(k, ix):
                        sk_out = SecretKey(QPPoly(auto.apply_ntt(sk_q, ix),
                                                  auto.apply_ntt(sk_p, ix)))
                        return self.gadget_encrypt(k, sk_q, sk_out,
                                                   level_q=level_q)
                    return jax.vmap(one)(ks, idx)
                finally:
                    threader.install(old)
            jit_fn = jits[level_q] = jax.jit(batched)

        out: dict[int, GaloisKey] = {}
        for lo in range(0, len(gal_els), chunk):
            hi = min(lo + chunk, len(gal_els))
            ks, idx = keys[lo:hi], idx_np[lo:hi]
            if hi - lo < chunk:  # pad: reuse the one compiled program
                pad = chunk - (hi - lo)
                ks = jnp.concatenate([ks, keys[lo:lo + 1].repeat(pad, 0)])
                idx = np.concatenate([idx, idx[:1].repeat(pad, 0)])
            stacked = jit_fn(threader.state(), ks, jnp.asarray(idx),
                             sk.value.q, sk.value.p)
            for i, g in enumerate(gal_els[lo:hi]):
                out[g] = GaloisKey(jax.tree.map(lambda x: x[i], stacked), g)
        return out


@struct.dataclass
class EvaluationKeySet:
    """In-memory EVK set (ref keys.go:717 MemEvaluationKeySet)."""

    relinearization_key: RelinearizationKey | None = None
    galois_keys: dict = struct.field(default_factory=dict)  # gal_el -> GaloisKey

    def galois_key(self, gal_el: int) -> GaloisKey:
        if gal_el not in self.galois_keys:
            from lattigo_tpu.rlwe.errors import MissingGaloisKeyError
            raise MissingGaloisKeyError(gal_el)
        return self.galois_keys[gal_el]
