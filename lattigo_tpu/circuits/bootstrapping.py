"""CKKS bootstrapping: ScaleDown → ModUp → CoeffsToSlots → EvalMod → SlotsToCoeffs.

TPU-native analog of ``circuits/ckks/bootstrapping`` (pipeline ref
evaluator.go:518). Round-1 scope: full-slot bootstrapping on the standard
ring with exact Fraction scale bookkeeping; sparse-secret encapsulation,
ring packing of sparse ciphertexts, and META-BTS iterations are later
stages (SURVEY.md §2.4).

Scale plumbing (all static, resolved at trace time):
* ScaleDown brings the ciphertext to level 0; its scale Δ₀ defines the
  message ratio q₀/Δ₀ ≳ 2^{log_message_ratio}.
* ModUp lifts [c0,c1] centered from q₀ to the full chain; relabeling the
  scale to q₀ makes slot values y = m/q₀ + I after CoeffsToSlots.
* EvalMod returns slots ≈ m/q₀; the final relabel scale ← Δ·Δ₀/q₀ restores
  the true message — metadata only, no device work.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from flax import struct
from fractions import Fraction

import numpy as np
import jax.numpy as jnp

from lattigo_tpu.ring import modops
from lattigo_tpu.circuits import dft as dft_mod
from lattigo_tpu.circuits.mod1 import Mod1Evaluator, Mod1Parameters
from lattigo_tpu.rlwe.elements import Ciphertext


# Circuit orders (ref bootstrapping/parameters_literal.go:144 CircuitOrder):
# the standard pipeline, and the "slim" reordering of Chen-Han
# (ia.cr/2018/067) where homomorphic decoding runs first so a circuit can
# execute in the coefficient domain between S2C and ModUp.
MODUP_THEN_ENCODE = "modup-then-encode"   # ScaleDown→ModUp→C2S→EvalMod→S2C
DECODE_THEN_MODUP = "decode-then-modup"   # S2C→ScaleDown→ModUp→C2S→EvalMod


@dataclass
class BootstrappingParameters:
    """ref bootstrapping/parameters_literal.go:15 (subset)."""

    c2s_levels: list[int] = field(default_factory=lambda: [1, 1, 1, 1])
    s2c_levels: list[int] = field(default_factory=lambda: [1, 1, 1])
    mod1: Mod1Parameters = field(default_factory=Mod1Parameters)
    residual_levels: int = 1   # levels available to the user after bootstrap
    # Sparse-secret encapsulation (ia.cr/2022/024, ref EphemeralSecretWeight):
    # ModUp runs under an ephemeral sparse key of this Hamming weight, which
    # shrinks the EvalMod integer bound K. None disables encapsulation.
    ephemeral_secret_weight: int | None = None
    # ref parameters_literal.go:147-148 — see MODUP_THEN_ENCODE above.
    circuit_order: str = MODUP_THEN_ENCODE


@struct.dataclass
class BootstrappingKeys:
    """Encapsulation key pair (ref bootstrapping/keys.go:15). A pytree so
    it can cross jit boundaries as an argument."""

    evk_dense_to_sparse: object = None   # rlwe.EvaluationKey
    evk_sparse_to_dense: object = None


class BootstrappingEvaluator:
    """ref bootstrapping/evaluator.go:22."""

    def __init__(self, params, ckks_eval, encoder, bts_params: BootstrappingParameters):
        self.params = params
        self.ev = ckks_eval
        self.encoder = encoder
        self.btp = bts_params
        # Plaintext-side tracing hook (ref bootstrapping/evaluator.go:22-48
        # SkDebug): set to the secret key to print per-stage decryptions
        # when running eagerly (outside jit). See :meth:`with_sk_debug`.
        self.sk_debug = None

        L = params.max_level
        # C2S consumes exactly one matrix level per entry: the 0.5
        # conjugation split is a free scale-metadata change (see
        # DFTEvaluator.coeffs_to_slots), matching the reference budget.
        n_c2s = len(bts_params.c2s_levels)
        n_s2c = len(bts_params.s2c_levels)
        mod1_depth = self._mod1_depth(bts_params.mod1)
        self.level_c2s_top = L
        self.level_mod1_top = L - n_c2s
        if bts_params.circuit_order == MODUP_THEN_ENCODE:
            # level layout (top to bottom): C2S | EvalMod | S2C | residual | q0
            self.level_s2c_top = self.level_mod1_top - mod1_depth
            assert self.level_s2c_top - n_s2c >= bts_params.residual_levels, (
                f"modulus chain too short: need ≥ "
                f"{n_c2s + mod1_depth + n_s2c + bts_params.residual_levels + 1} levels")
        elif bts_params.circuit_order == DECODE_THEN_MODUP:
            # slim layout (top to bottom): C2S | EvalMod | slots circuit | S2C | q0
            # S2C sits directly above q0 so the decoded ciphertext lands at
            # level 0 ready for ModUp (ref slim example chain ordering).
            self.level_s2c_top = n_s2c
            assert (self.level_mod1_top - mod1_depth - n_s2c
                    >= bts_params.residual_levels), (
                f"modulus chain too short: need ≥ "
                f"{n_c2s + mod1_depth + n_s2c + bts_params.residual_levels + 1} levels")
        else:
            raise ValueError(
                f"invalid circuit_order {bts_params.circuit_order!r}")

        # fold ALL free constants into the last C2S matrix: the 0.5 of the
        # conjugation split, EvalMod's interval map 1/K (the Chebyshev
        # variable is u = y/K for every mod1 type — see mod1._gen_poly),
        # and — when the mod1 working scale is pinned — the anticipation
        # factor 2^log_scale/q0 that the post-C2S relabel divides back out
        # (ref bootstrapping/evaluator.go:190 C2SScaling = qDiv/(K·qDiff)).
        m1 = bts_params.mod1
        in_const = 1.0 / m1.k
        # Pinning the working scale keeps the Chebyshev power basis at the
        # (≈ equal) EvalMod chain primes instead of drifting by Δ_in/q_em
        # per doubling — drifting scales amplify RLWE noise into message
        # error (measured: 6+ bits at logN=13 with Δ_in=q0=2^55, q_em=2^60).
        self._mod1_scale = (None if m1.log_scale is None
                           else Fraction(2) ** m1.log_scale)
        # ModUp amplification (ref evaluator.go:709 "Scale the message from
        # Q0/|m| to QL/|m|"): the lifted payload m + q0·I is TINY against
        # the full chain, so it is multiplied by round(2^log_scale/q0) ≈
        # 2^17 at N15QP768 as an EXACT integer scalar right after the lift
        # — before the sparse→dense switch and before every C2S rotation.
        # Every downstream key-switch/ModDown/rescale rounding error then
        # lands on a 2^17×-larger payload, i.e. is suppressed by the same
        # factor relative to the message. Folding the full factor into the
        # C2S matrices instead (rounds 1–4) leaves the first-stage rotation
        # noise amplified by the whole factor — measured as the ~1.3
        # bits/logN precision slope of the published presets.
        if self._mod1_scale is None:
            self._modup_scalar = 1
            anticipate = 1.0
        else:
            q0_f = Fraction(params.q_moduli[0])
            self._modup_scalar = max(1, round(float(self._mod1_scale / q0_f)))
            # residual (non-integer) part of the division by q0, folded
            # into the C2S constants; ≈ 1 once the scalar took the bulk
            anticipate = float(self._mod1_scale / (q0_f * self._modup_scalar))
        self.dft = dft_mod.DFTEvaluator(
            params, ckks_eval, encoder,
            c2s_levels=bts_params.c2s_levels,
            s2c_levels=bts_params.s2c_levels,
            level_q_c2s=self.level_c2s_top,
            level_q_s2c=self.level_s2c_top,
            c2s_scaling=0.5 * in_const * anticipate)
        self.mod1 = Mod1Evaluator(ckks_eval, bts_params.mod1)

    def with_sk_debug(self, sk) -> "BootstrappingEvaluator":
        """Enable plaintext-side stage tracing (ref SkDebug,
        bootstrapping/evaluator.go:22-48): every pipeline stage of an
        *eager* (non-jitted) :meth:`bootstrap` call decrypts its output
        and prints level / scale / magnitude. A no-op under jit — tracers
        cannot be decrypted; run the eager path to debug."""
        self.sk_debug = sk
        return self

    def _debug(self, tag: str, ct: Ciphertext) -> None:
        if self.sk_debug is None:
            return
        import jax
        if isinstance(ct.value, jax.core.Tracer):
            return
        from lattigo_tpu.rlwe.encryption import Decryptor
        got = self.encoder.decode(
            Decryptor(self.params, self.sk_debug).decrypt(ct))
        mag = float(np.abs(got).max())
        print(f"[sk_debug] {tag}: level={ct.level} "
              f"scale=2^{float(np.log2(float(ct.scale))):.2f} "
              f"|slots|max={mag:.4g}")

    @staticmethod
    def _mod1_depth(m1: Mod1Parameters) -> int:
        # Paterson-Stockmeyer (exactly bit_length(degree) levels) +
        # double-angle squarings (r) + optional arcsine — matching the
        # reference budget exactly (ref mod1_parameters.go:57 Depth():
        # the interval map is a free scale-metadata change and P-S is
        # depth-exact since the recursePS rewrite).
        from lattigo_tpu.circuits.mod1 import COS_DISCRETE, SIN_CONTINUOUS
        degree = m1.degree
        if m1.mod1_type == COS_DISCRETE:
            degree = max(degree, 2 * m1.k - 1)  # ref parameters_literal Depth()
        r = 0 if m1.mod1_type == SIN_CONTINUOUS else m1.double_angle
        poly_depth = max(1, degree.bit_length())
        arcsine = (max(1, m1.arcsine_degree.bit_length())
                   if m1.arcsine_degree > 0 else 0)
        return poly_depth + r + arcsine

    def with_evaluator(self, ckks_eval) -> "BootstrappingEvaluator":
        self.ev = ckks_eval
        self.dft.with_evaluator(ckks_eval)
        self.mod1.ev = ckks_eval
        self.mod1.poly_eval.ev = ckks_eval
        return self

    def gen_encapsulation_keys(self, key, sk) -> BootstrappingKeys:
        """Ephemeral sparse key + the dense↔sparse switching EVKs
        (ref bootstrapping/keys.go:69 GenEvaluationKeys)."""
        if self.btp.ephemeral_secret_weight is None:
            return BootstrappingKeys()
        import jax
        from lattigo_tpu.ring.sampling import Ternary
        from lattigo_tpu.rlwe.keys import KeyGenerator

        kgen = KeyGenerator(self.params)
        k_sk, k_d2s, k_s2d = jax.random.split(key, 3)
        sk_sparse = kgen.gen_secret_key(
            k_sk, dist=Ternary(hamming_weight=self.btp.ephemeral_secret_weight))
        return BootstrappingKeys(
            evk_dense_to_sparse=kgen.gen_evaluation_key(k_d2s, sk, sk_sparse),
            evk_sparse_to_dense=kgen.gen_evaluation_key(k_s2d, sk_sparse, sk),
        )

    def galois_elements(self) -> list[int]:
        return self.dft.galois_elements()

    def galois_element_levels(self) -> dict[int, int]:
        """gal_el → required key level (see DFTEvaluator
        .galois_element_levels) — pass to gen_galois_keys(levels=...)."""
        return self.dft.galois_element_levels()

    @property
    def minimum_input_level(self) -> int:
        """Lowest level a ciphertext may have on entry (ref
        bootstrapping/bootstrapper.go MinimumInputLevel). In the standard
        order ScaleDown brings the input to level 0 regardless, so any
        level is acceptable; in the slim order the input must still cover
        the SlotsToCoeffs matrices."""
        if self.btp.circuit_order == DECODE_THEN_MODUP:
            return self.level_s2c_top
        return 0

    @property
    def output_level(self) -> int:
        """Level of the bootstrapped output (ref OutputLevel)."""
        if self.btp.circuit_order == DECODE_THEN_MODUP:
            return self.level_mod1_top - self._mod1_depth(self.btp.mod1)
        return self.level_s2c_top - len(self.btp.s2c_levels)

    # -- stages ----------------------------------------------------------------

    def _scale_down_factor(self, level: int, scale):
        """(integer scale-up, current message ratio) of ScaleDown at
        (level, scale) — shared by :meth:`scale_down` and the jitted
        wrapper's metadata-only Δ₀ computation."""
        mr = Fraction(2) ** self.btp.mod1.log_message_ratio
        cur_ratio = Fraction(self.params.q_big_int(level)) / Fraction(scale)
        return int(cur_ratio / mr + Fraction(1, 2)), cur_ratio

    def scale_down_label(self, level: int, scale) -> Fraction:
        """Δ₀ that :meth:`scale_down` produces from (level, scale) — pure
        metadata (the jitted pipeline uses this to relabel the output)."""
        s_int, _ = self._scale_down_factor(level, scale)
        s = Fraction(scale) * max(s_int, 1)
        for l in range(level, 0, -1):
            s /= Fraction(self.params.q_moduli[l])
        return s

    def scale_down(self, ct: Ciphertext) -> Ciphertext:
        """Bring the ciphertext to level 0 at scale Δ₀ ≈ q0/2^log_message_ratio
        (ref ScaleDown :566): multiplies by round((Q_l/Δ)/(q0/2^mr)) — pinning
        the message ratio the Mod1 approximation was generated for — then
        rescales to level 0. Exact-Fraction labels keep the (tiny) rounding
        drift visible to the final relabel."""
        ev = self.ev
        p = self.params
        s_int, cur_ratio = self._scale_down_factor(ct.level, ct.scale)
        if s_int < 1:
            raise ValueError(
                f"initial Q/scale = 2^{float(np.log2(float(cur_ratio))):.1f} "
                f"below the target message ratio 2^{self.btp.mod1.log_message_ratio}"
                " — lower log_message_ratio or the input scale")
        if s_int > 1:
            ct = ev.scale_up(ct, s_int)
        while ct.level > 0:
            ct = ev.rescale(ct)
        return ct

    def mod_up(self, ct: Ciphertext) -> Ciphertext:
        """Centered lift of a level-0 ct into the full chain (ref :616)."""
        p = self.params
        L = p.max_level
        q0 = p.q_moduli[0]
        v = ct.value
        if ct.is_ntt:
            v = p.ring_q.intt(v, 0)
        x = v[..., 0, :]  # [..., d+1, N] residues mod q0 (limb axis squeezed)
        half = jnp.uint64(q0 >> 1)
        q = p.ring_q.q[: L + 1]
        bhi = p.ring_q.bred_hi[: L + 1]
        xb = x[..., None, :]
        pos = modops.bred_add(xb, q, bhi)
        neg_mag = modops.bred_add(jnp.uint64(q0) - xb, q, bhi)
        neg = jnp.where(neg_mag == 0, neg_mag, q - neg_mag)
        lifted = jnp.where(xb > half, neg, pos)
        lifted = p.ring_q.ntt(lifted, L)
        # relabel scale to q0: slot values become m/q0 + I
        out = ct.replace(value=lifted, is_ntt=True, scale=Fraction(q0))
        # Amplify the payload toward the EvalMod working scale (exact
        # integer multiply — ref evaluator.go:709; see __init__): must
        # happen HERE, before the sparse→dense switch in the caller, so
        # that even that key-switch noise is suppressed by the factor.
        if self._modup_scalar > 1:
            out = self.ev.scale_up(out, self._modup_scalar)
        return out

    def slots_to_coeffs(self, ct: Ciphertext,
                        ct_im: Ciphertext | None = None) -> Ciphertext:
        """Homomorphic decoding stage (ref bootstrapper.go SlotsToCoeffs);
        with ``ct_im=None`` the single complex ciphertext is transformed
        directly. Public so the slim order can interleave a
        coefficient-domain circuit (ref slim example step 1)."""
        if ct.level > self.level_s2c_top:
            ct = ct.at_level(self.level_s2c_top)
        if ct_im is not None and ct_im.level > self.level_s2c_top:
            ct_im = ct_im.at_level(self.level_s2c_top)
        return self.dft.slots_to_coeffs(ct, ct_im)

    def coeffs_to_slots(self, ct: Ciphertext):
        """Homomorphic encoding stage (ref bootstrapper.go CoeffsToSlots).

        When the mod1 working scale is pinned, the outputs are RELABELED to
        2^log_scale (exact metadata division that undoes the anticipation
        factor folded into the C2S matrices — ref EvaluateAndScaleNew's
        ``res.Scale = evm.ScalingFactor()``, mod1_evaluator.go:46)."""
        ct_re, ct_im = self.dft.coeffs_to_slots(ct)
        if self._mod1_scale is not None:
            ct_re = ct_re.replace(scale=self._mod1_scale)
            ct_im = ct_im.replace(scale=self._mod1_scale)
        return ct_re, ct_im

    def eval_mod(self, ct: Ciphertext) -> Ciphertext:
        """Homomorphic modular reduction stage (ref bootstrapper.go
        EvalMod). Expects CoeffsToSlots output (the interval map was
        folded into the C2S matrices)."""
        return self.mod1.evaluate(ct, pre_mapped=True)

    # -- full pipeline ------------------------------------------------------------

    def bootstrap(self, ct: Ciphertext,
                  keys: BootstrappingKeys | None = None) -> Ciphertext:
        """ref Bootstrap:219 / bootstrap:518.

        With encapsulation keys, ModUp runs under the ephemeral sparse
        secret: switch down at level 0 (cheap), lift, switch back at the
        top (ref bootstrap:616 EvkDenseToSparse/EvkSparseToDense).
        """
        ev = self.ev
        p = self.params
        slim = self.btp.circuit_order == DECODE_THEN_MODUP
        if slim:
            # slim order (ref DecodeThenModUp): decode first, so the
            # message sits in the coefficients before the modulus raise.
            ct = self.slots_to_coeffs(ct)
        ct0 = self.scale_down(ct)
        delta0 = Fraction(ct0.scale)
        q0 = Fraction(p.q_moduli[0])

        self._debug("scale_down", ct0)
        if keys is not None and keys.evk_dense_to_sparse is not None:
            ct0 = ev.apply_evaluation_key(ct0, keys.evk_dense_to_sparse)
        up = self.mod_up(ct0)
        if keys is not None and keys.evk_sparse_to_dense is not None:
            up = ev.apply_evaluation_key(up, keys.evk_sparse_to_dense)
        self._debug("mod_up", up)
        ct_re, ct_im = self.coeffs_to_slots(up)
        self._debug("coeffs_to_slots re", ct_re)
        self._debug("coeffs_to_slots im", ct_im)
        ct_re = self.mod1.evaluate(ct_re, pre_mapped=True)
        ct_im = self.mod1.evaluate(ct_im, pre_mapped=True)
        self._debug("eval_mod re", ct_re)
        self._debug("eval_mod im", ct_im)
        if slim:
            # already in the slots domain: recombine the halves (ref slim
            # example step 6: Mul(imag, 1i); Add(real, imag)).
            out = ev.add(ct_re, ev.mul_by_i(ct_im))
        else:
            out = self.dft.slots_to_coeffs(ct_re, ct_im)
        # undo the q0 relabel: poly = Δ'·m/q0 → scale = Δ'·Δ₀/q0
        out = out.replace(scale=Fraction(out.scale) * delta0 / q0)
        self._debug("slots_to_coeffs (final)", out)
        return out

    def bootstrap_meta(self, ct: Ciphertext, iterations: int = 2,
                       log_prec: int = 8,
                       keys: BootstrappingKeys | None = None) -> Ciphertext:
        """META-BTS: iterate bootstrapping on the residual error to gain
        ~log_prec bits per extra iteration (ia.cr/2022/024; ref
        bootstrapping/evaluator.go:315-460 IterationsParameters).

        Round i re-bootstraps diff = (ct − out)·2^log_prec — the VALUE is
        multiplied up (exact, level-free) so the residual error becomes a
        full-size message at the same scale and the bootstrap's fixed
        absolute precision applies to it undiminished; the correction's
        scale is then relabeled ×2^log_prec so it folds back at error
        units. (Shrinking the scale label instead is a no-op: it raises
        the message ratio by exactly the factor the iteration would gain.)
        """
        ev = self.ev
        out = self.bootstrap(ct, keys)
        for _ in range(iterations - 1):
            down = out.at_level(0)
            diff = ev.sub(ct, down)                      # −err at ct.scale
            # amplify the error into the message range: value ×2^log_prec
            diff = ev.mul_scalar_int(diff, 1 << log_prec)
            corr = self.bootstrap(diff, keys)
            # relabel so corr reads in error units, then fold into out
            corr = corr.replace(
                scale=Fraction(corr.scale) * (1 << log_prec))
            out = ev.add(out.at_level(min(out.level, corr.level)),
                         corr.at_level(min(out.level, corr.level)))
        return out

    def bootstrap_many(self, cts: list[Ciphertext],
                       keys: BootstrappingKeys | None = None,
                       log_slots: int | None = None,
                       bootstrap_fn=None) -> list[Ciphertext]:
        """Batch bootstrap (ref BootstrapMany:229).

        Full-slot ciphertexts: on TPU the batch axis makes this native; a
        list API is kept for parity. SPARSE ciphertexts (``log_slots`` <
        log_max_slots, slots replicated 2^g times so coefficients sit at
        stride 2^g, g = log_max_slots − log_slots): groups of up to 2^g
        are INTERLEAVED into one full ciphertext with the ring-packing
        tree, bootstrapped once, and unpacked — amortizing one bootstrap
        over the whole group (ref PackAndSwitchN1ToN2 /
        UnpackAndSwitchN2ToN1, bootstrapping/evaluator.go:857,891; the
        pack/unpack galois elements are ``packing_galois_elements``).
        ``bootstrap_fn`` substitutes a compiled pipeline (e.g.
        :meth:`jitted`) for the per-(packed-)ciphertext refresh."""
        p = self.params
        fn = bootstrap_fn or (lambda c: self.bootstrap(c, keys))
        if log_slots is None or (1 << log_slots) >= p.max_slots:
            return [fn(c) for c in cts]
        from lattigo_tpu.rlwe.ring_packing import RingPackingEvaluator
        rp = RingPackingEvaluator(self.ev)
        g = p.max_slots.bit_length() - 1 - log_slots
        out: list[Ciphertext] = []
        for lo in range(0, len(cts), 1 << g):
            # pack at the minimum input level so the pack-tree galois keys
            # can stay level-scoped (packing_galois_elements)
            grp = [c.at_level(self.minimum_input_level)
                   if c.level > self.minimum_input_level else c
                   for c in cts[lo: lo + (1 << g)]]
            packed = rp.pack(dict(enumerate(grp)), input_log_gap=g)
            boot = fn(packed)
            out.extend(rp.unpack(boot, g)[: len(grp)])
        return out

    def evaluate_conjugate_invariant(
            self, ct_left: Ciphertext, ct_right: Ciphertext | None = None,
            switcher=None, keys: BootstrappingKeys | None = None):
        """Bootstrap one or two CONJUGATE-INVARIANT-ring ciphertexts with a
        single standard-ring bootstrap (ref EvaluateConjugateInvariant,
        bootstrapping/evaluator.go:460): the real-slot cts are bridged to
        the standard 2N ring, packed as the real and imaginary halves of
        one complex ciphertext, bootstrapped once, then split back.

        ``switcher`` is a :class:`~lattigo_tpu.schemes.ckks.bridge
        .DomainSwitcher` whose standard side is this evaluator's
        parameters. Returns (ct_left', ct_right' | None) in the CI ring at
        the bootstrap output level; exact-Fraction scale labels absorb the
        conjugation fold's ×2 (the reference compensates with an explicit
        0.5 relabel, evaluator.go:498)."""
        assert switcher is not None, "evaluate_conjugate_invariant needs a DomainSwitcher"
        ev = self.ev
        up = switcher.real_to_complex(ct_left)
        if ct_right is not None:
            up = ev.add(up, ev.mul_by_i(switcher.real_to_complex(ct_right)))
        out = self.bootstrap(up, keys)
        left = switcher.complex_to_real(out)
        right = None
        if ct_right is not None:
            # Re(−i·m) = Im(m): extract the imaginary half
            right = switcher.complex_to_real(ev.mul_by_minus_i(out))
        return left, right

    def packing_galois_elements(self, log_slots: int) -> dict[int, int]:
        """gal_el → level for the sparse bootstrap_many pack/unpack tree
        (pack runs at the input level, unpack at the output level)."""
        from lattigo_tpu.rlwe.ring_packing import RingPackingEvaluator
        p = self.params
        rp = RingPackingEvaluator(self.ev)
        g = p.max_slots.bit_length() - 1 - log_slots
        logn = p.log_n
        lvls: dict[int, int] = {}
        for el in rp.galois_elements_for_pack(log_start=logn - g):
            lvls[el] = max(lvls.get(el, 0), self.minimum_input_level)
        for el in rp.galois_elements_for_unpack(g):
            lvls[el] = max(lvls.get(el, 0), self.output_level)
        return lvls

    def jitted(self, example: Ciphertext,
               keys: BootstrappingKeys | None = None,
               split: bool = True,
               stream: tuple = ()):
        """Compiled pipeline: returns f(ct) → ct (metadata — scales,
        levels — is static, captured from ``example``). Batch axes on
        ``example`` carry through, making ``BootstrapMany`` a leading
        batch dimension instead of a loop.

        With ``split`` (default) each stage — ScaleDown+ModUp, C2S,
        EvalMod, S2C — compiles as its own XLA program (EvalMod is one
        program reused for the real and imaginary halves): a monolithic
        program for the full pipeline is several tens of MB of HLO and
        can exceed compiler memory limits at production sizes, while the
        stage programs stay small and the four dispatches are negligible
        against seconds of compute. ``split=False`` keeps the single
        fused program.

        ``stream``: subset of {"c2s", "s2c"} naming DFT-matrix groups
        (plus the Galois keys used ONLY by that group) to keep
        HOST-resident between uses: each group is device_put right before
        its stage dispatch and released after, trading ~size/BW of
        host→device transfer per bootstrap for HBM headroom. The logN=16
        presets' encoded DFT matrices are ~2.8 GB and their C2S Galois
        keys ~.15 GB each — streaming is what lets a 25-limb chain fit a
        16 GB chip (round-4 plan: "streamed/host-resident key upload").
        Requires ``split``.
        """
        import jax

        if not split:
            meta = dict(is_ntt=example.is_ntt, scale=example.scale)
            out_meta: dict = {}

            def raw(v):
                out = self.bootstrap(Ciphertext(value=v, **meta), keys)
                out_meta["is_ntt"] = out.is_ntt
                out_meta["scale"] = out.scale
                return out.value

            shape = jax.eval_shape(
                raw, jax.ShapeDtypeStruct(example.value.shape,
                                          example.value.dtype))
            jfn = jax.jit(raw)

            def wrapped(ct: Ciphertext) -> Ciphertext:
                return Ciphertext(value=jfn(ct.value), **out_meta)

            wrapped.out_shape = shape
            wrapped.out_meta = dict(out_meta)
            return wrapped

        p = self.params

        # All key material and encoded DFT matrices cross the jit boundary
        # as ARGUMENTS (they are pytrees): closed-over device arrays would
        # be inlined into the HLO as literal constants — gigabytes of
        # module text at production sizes, which breaks compilers long
        # before the compute does. Inside the trace they are temporarily
        # installed back onto the evaluator objects.
        has_keys = keys is not None

        # NTT weight tables (MXU kernels) are device arrays of up to
        # hundreds of MB at logN>=15: closed over a jit they inline as HLO
        # constants and exhaust memory, so they ride the state dict too
        # (see ring/tables.py).
        from lattigo_tpu.ring.tables import TableThreader
        threader = TableThreader(p.ring_q, p.ring_p)

        stream = tuple(stream)
        host_groups: dict = {}
        resident_evk = self.ev.evk
        if stream:
            assert set(stream) <= {"c2s", "s2c"}, f"bad stream groups {stream}"
            # Galois elements used by exactly one matrix group stream with
            # it; shared ones (and the relin key) stay device-resident.
            used = {"c2s": set(), "s2c": set()}
            for lt in self.dft.c2s_mats:
                used["c2s"].update(lt.galois_elements(p))
            used["c2s"].add(p.galois_element_order_two)
            for lt in self.dft.s2c_mats:
                used["s2c"].update(lt.galois_elements(p))
            from lattigo_tpu.rlwe.keys import EvaluationKeySet
            gks = dict(resident_evk.galois_keys)
            for g in stream:
                mats = self.dft.c2s_mats if g == "c2s" else self.dft.s2c_mats
                own = {el: gks[el] for el in sorted(used[g]) if el in gks}
                host_groups[g] = jax.device_get((mats, own))
            # device-resident: only keys no streamed group uses (plus the
            # relin key) — EvalMod runs with the relin key alone, so its
            # stage sees none of the multi-GB rotation-key set
            streamed_els = set()
            for g in stream:
                streamed_els |= used[g]
            gks = {el: k for el, k in gks.items() if el not in streamed_els}
            resident_evk = EvaluationKeySet(
                relinearization_key=resident_evk.relinearization_key,
                galois_keys=gks)
            self.ev.evk = resident_evk
            # drop the device copies: the host versions are authoritative
            if "c2s" in host_groups:
                self.dft.c2s_mats = host_groups["c2s"][0]
            if "s2c" in host_groups:
                self.dft.s2c_mats = host_groups["s2c"][0]

        def group_state(g):
            """(mats, evk) for a DFT-matrix stage — device-put fresh per
            call when the group is streamed (freed when the call's state
            goes out of scope)."""
            if g in host_groups:
                mats, own = jax.device_put(host_groups[g])
                merged = type(resident_evk)(
                    relinearization_key=resident_evk.relinearization_key,
                    galois_keys={**resident_evk.galois_keys, **own})
                return mats, merged
            mats = self.dft.c2s_mats if g == "c2s" else self.dft.s2c_mats
            return mats, resident_evk

        def big_state(stage):
            """Exactly the device state the stage's program consumes."""
            st = dict(evk=resident_evk, ntt=threader.state())
            if stage == "pre" and has_keys:
                st["keys"] = keys
            if stage in ("c2s", "s2c"):
                st[stage], st["evk"] = group_state(stage)
            return st

        def install(st):
            nonlocal keys
            old = dict(evk=self.ev.evk, c2s=self.dft.c2s_mats,
                       s2c=self.dft.s2c_mats, ntt=threader.state(),
                       keys=keys)
            self.ev.evk = st["evk"]
            if "c2s" in st:
                self.dft.c2s_mats = st["c2s"]
            if "s2c" in st:
                self.dft.s2c_mats = st["s2c"]
            threader.install(st["ntt"])
            if "keys" in st:
                keys = st["keys"]
            return old

        def uninstall(old):
            nonlocal keys
            self.ev.evk = old["evk"]
            self.dft.c2s_mats = old["c2s"]
            self.dft.s2c_mats = old["s2c"]
            threader.install(old["ntt"])
            keys = old["keys"]

        def jit_stage(fn, examples, stage):
            """jit a (ct, ...) → ct | (ct, ct) stage with static metadata
            threading; returns (wrapped, example_outputs)."""
            metas = [dict(is_ntt=e.is_ntt, scale=e.scale) for e in examples]
            info: dict = {}

            def raw(st, *vals):
                old = install(st)
                try:
                    cts = [Ciphertext(value=v, **m)
                           for v, m in zip(vals, metas)]
                    out = fn(*cts)
                finally:
                    uninstall(old)
                outs = out if isinstance(out, tuple) else (out,)
                info["meta"] = [dict(is_ntt=o.is_ntt, scale=o.scale)
                                for o in outs]
                info["tuple"] = isinstance(out, tuple)
                return tuple(o.value for o in outs)

            state = big_state(stage)
            shapes = jax.eval_shape(
                raw, jax.eval_shape(lambda s: s, state),
                *[jax.ShapeDtypeStruct(e.value.shape, e.value.dtype)
                  for e in examples])
            del state
            jfn = jax.jit(raw)

            def wrapped(*cts):
                vals = jfn(big_state(stage), *[c.value for c in cts])
                outs = tuple(Ciphertext(value=v, **m)
                             for v, m in zip(vals, info["meta"]))
                return outs if info["tuple"] else outs[0]

            ex_out = tuple(Ciphertext(value=s, **m)
                           for s, m in zip(shapes, info["meta"]))
            return wrapped, ex_out

        def pre(ct):
            ct0 = self.scale_down(ct)
            if keys is not None and keys.evk_dense_to_sparse is not None:
                ct0 = self.ev.apply_evaluation_key(ct0, keys.evk_dense_to_sparse)
            up = self.mod_up(ct0)
            if keys is not None and keys.evk_sparse_to_dense is not None:
                up = self.ev.apply_evaluation_key(up, keys.evk_sparse_to_dense)
            return up

        f_pre, (ex_up,) = jit_stage(pre, [example], "pre")
        f_c2s, (ex_re, ex_im) = jit_stage(self.coeffs_to_slots, [ex_up], "c2s")
        f_mod1, (ex_m,) = jit_stage(
            lambda ct: self.mod1.evaluate(ct, pre_mapped=True), [ex_re], "mod1")
        f_s2c, (ex_out,) = jit_stage(
            lambda a, b: self.dft.slots_to_coeffs(a, b), [ex_m, ex_m], "s2c")

        # Δ₀ after ScaleDown (pure metadata) for the final q0 relabel
        delta0 = self.scale_down_label(example.level, example.scale)
        q0 = Fraction(p.q_moduli[0])

        def _sync(c):
            # with streamed state, serialize stage dispatches: an enqueued
            # next-stage program must not allocate while the previous
            # stage's streamed buffers are still live
            if host_groups:
                jax.block_until_ready(c.value)
            return c

        def wrapped(ct: Ciphertext) -> Ciphertext:
            up = _sync(f_pre(ct))
            ct_re, ct_im = f_c2s(up)
            _sync(ct_im)
            ct_re = _sync(f_mod1(ct_re))
            ct_im = _sync(f_mod1(ct_im))
            out = f_s2c(ct_re, ct_im)
            return out.replace(scale=Fraction(out.scale) * delta0 / q0)

        wrapped.out_meta = dict(is_ntt=ex_out.is_ntt,
                                scale=Fraction(ex_out.scale) * delta0 / q0)
        wrapped.out_shape = jax.ShapeDtypeStruct(ex_out.value.shape,
                                                 ex_out.value.dtype)
        # Expose the compiled stage functions for per-stage diagnosis
        # (decrypt between stages; each is a small cached XLA program —
        # see diag_bootstrap_stages.py and the verify skill's stage-jit
        # pattern): pre = ScaleDown+ModUp(+encapsulation), c2s → (re, im),
        # mod1 (one program, reused for both halves), s2c(re, im) — the
        # final q0 relabel (×delta0/q0) is NOT applied by the raw s2c.
        wrapped.stages = dict(pre=f_pre, c2s=f_c2s, mod1=f_mod1, s2c=f_s2c)
        return wrapped


class SecretKeyBootstrapper:
    """Debug decrypt-then-reencrypt "bootstrapper" (ref
    bootstrapping/sk_bootstrapper.go:68): implements the same interface as
    :class:`BootstrappingEvaluator` but refreshes by decrypting with the
    secret key, re-encoding at the top level, and re-encrypting. Use it to
    test level-hungry circuits (minimax composites, inverse, …) without
    paying for real bootstrapping; ``counter`` records how many
    bootstraps the circuit consumed.
    """

    def __init__(self, params, encoder, sk, key):
        from lattigo_tpu.rlwe.encryption import Decryptor, Encryptor

        self.params = params
        self.encoder = encoder
        self.dec = Decryptor(params, sk)
        self.enc = Encryptor(params, sk)
        self.key = key
        self.counter = 0

    @property
    def minimum_input_level(self) -> int:
        return 0

    @property
    def output_level(self) -> int:
        return self.params.max_level

    def bootstrap(self, ct: Ciphertext) -> Ciphertext:
        import jax

        values = self.encoder.decode(self.dec.decrypt(ct))
        pt = self.encoder.encode(values)
        self.key, sub = jax.random.split(self.key)
        self.counter += 1
        return self.enc.encrypt(sub, pt)

    def bootstrap_many(self, cts: list[Ciphertext]) -> list[Ciphertext]:
        return [self.bootstrap(c) for c in cts]
