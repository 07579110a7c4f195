"""Localize the published-preset precision slope: per-stage bootstrap error.

Usage: PYTHONPATH=. python diag_bootstrap_stages.py [log_n] [preset]

Context (round 4 measurement): published preset recipes lose ~1.3 bits per
logN step (N15QP768: 13.9 bits at logN=9, 11.3 at logN=11 on CPU, 6.1 at
the full logN=15 on chip — exactly on the line, so it is a recipe-scaling
property, not a TPU numeric issue; the reference publishes 15.4 at logN=15).

This script measures, at matched structure on CPU:
  - post-EvalMod slot error vs the EXACT level-0 integer payload m_int/q0
    (amplified x2^log_message_ratio into message units),
  - final end-to-end error.
Run it at two log_n values and compare slopes: if the post-EvalMod error
carries the ~1.3 bits/logN slope, the loss is at or before EvalMod;
otherwise it is in SlotsToCoeffs.

Stages run through BootstrappingEvaluator.jitted's exposed ``.stages``
(small per-stage XLA programs, persistent-cached under /tmp/jax_cache so
repeat runs skip the compile).
"""
import sys
import time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
from dataclasses import replace
from fractions import Fraction

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import ckks
from lattigo_tpu.circuits import bootstrapping as bts
from lattigo_tpu.circuits import bootstrapping_presets as bp
from lattigo_tpu.circuits.dft import bit_reversal_permutation

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 9
PRESET = sys.argv[2] if len(sys.argv) > 2 else "N15QP768_H192_H32"

residual, lit = getattr(bp, PRESET)
residual = replace(residual, log_n=log_n)
full, btp_p = bp.build_bootstrapping_parameters(residual, lit)
params = ckks.Parameters(full)
kgen = rlwe.KeyGenerator(params)
k_sk, k_rlk, k_gk, k_ct = jax.random.split(jax.random.PRNGKey(0), 4)
sk = kgen.gen_secret_key(k_sk)
rlk = kgen.gen_relinearization_key(k_rlk, sk)
enc = ckks.Encoder(params)
b = bts.BootstrappingEvaluator(params, ckks.Evaluator(
    params, rlwe.EvaluationKeySet(relinearization_key=rlk)), enc, btp_p)
gks = kgen.gen_galois_keys(k_gk, b.galois_elements(), sk,
                           levels=b.galois_element_levels())
ev = ckks.Evaluator(params, rlwe.EvaluationKeySet(
    relinearization_key=rlk, galois_keys=gks))
b.with_evaluator(ev)
keys = b.gen_encapsulation_keys(jax.random.PRNGKey(7), sk)
dec = rlwe.Decryptor(params, sk)

rng = np.random.default_rng(1)
n = params.max_slots
v = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
ct = rlwe.Encryptor(params, sk).encrypt(
    k_ct, enc.encode(v)).at_level(b.minimum_input_level)

# exact level-0 integer payload (includes input RLWE noise — that is the
# signal the pipeline must preserve)
ct0 = b.scale_down(ct)
q0 = params.q_moduli[0]
pt0 = dec.decrypt(ct0, out_ntt=False)
m_int = np.array(
    [int(x) for x in params.ring_q.to_int_coeffs(
        np.asarray(pt0.value), 0, centered=True)], dtype=np.float64)
delta0 = Fraction(ct0.scale)

t0 = time.time()
fn = b.jitted(ct, keys=keys)
st = fn.stages
up = st["pre"](ct)
ct_re, ct_im = st["c2s"](up)
m_re = st["mod1"](ct_re)
m_im = st["mod1"](ct_im)
print(f"[{time.time()-t0:.0f}s] pre/c2s/mod1 done", file=sys.stderr)

# --- post-C2S audit: decrypt the C2S outputs and compare against the
# EXACT full-chain payload M = m + q0*I (decrypted from `up` as centered
# big-ints). Expected slots (up to the folded constants) are M[pr]/q0;
# a least-squares scalar fit absorbs the folded 1/K-and-anticipation
# factor so the residual is pure C2S-added noise. This splits the mod1
# slot error into "C2S injects it" vs "the EvalMod evaluation injects it".
perm0 = bit_reversal_permutation(n)
pt_up = dec.decrypt(up, out_ntt=False)
# the pre stage amplifies by round(2^evalmod_scale/q0) (exact integer
# multiply, ref evaluator.go:709) — divide it back out exactly
s_up = round(Fraction(up.scale) / Fraction(q0))
M = np.array([float((int(x) + (s_up >> 1)) // s_up)
              for x in params.ring_q.to_int_coeffs(
    np.asarray(pt_up.value), up.level, centered=True)])

# encapsulation noise: the dense->sparse + sparse->dense key switches
# around ModUp add eps directly to the level-0 payload (M mod q0 = m_int +
# eps). eps is NOT visible to the downstream stage audits (they use M as
# ground truth) but lands on the message at full 2^ratio amplification.
m_after = ((M % q0) + q0 / 2) % q0 - q0 / 2
eps = m_after - m_int
ratio_f = float(Fraction(q0) / delta0)
eps_msg = np.sqrt((eps ** 2).mean()) * np.sqrt(2 * n) * ratio_f / q0
print(f"logN={log_n} {PRESET}: encapsulation noise rms {np.sqrt((eps**2).mean()):.3g} "
      f"max {np.abs(eps).max():.3g} coeff units -> ~2^{np.log2(max(eps_msg, 1e-300)):.1f} "
      f"message units (rms-based)")
c2s_re = enc.decode(dec.decrypt(ct_re)).real
c2s_im = enc.decode(dec.decrypt(ct_im)).real
for tag, got_h, exp_h in (("re", c2s_re, M[:n][perm0] / q0),
                          ("im", c2s_im, M[n:][perm0] / q0)):
    cfit = np.dot(exp_h, got_h) / np.dot(exp_h, exp_h)
    res = np.abs(got_h - cfit * exp_h) / abs(cfit)   # payload/q0 units
    print(f"logN={log_n} {PRESET}: post-C2S {tag}: fit c={cfit:.6g} "
          f"residual rms 2^{np.log2(np.sqrt((res**2).mean())):.1f} "
          f"max 2^{np.log2(res.max()):.1f} (payload/q0 units, "
          f"|payload| rms 2^{np.log2(np.sqrt((exp_h**2).mean())):.1f})")

# post-EvalMod slots hold m_k/q0 (first half) and m_{k+n}/q0, bit-reversed;
# decode() divides by the ct scale so values come out in m/q0 units
dec_re = enc.decode(dec.decrypt(m_re))
dec_im = enc.decode(dec.decrypt(m_im))
# the halves should be REAL: any imaginary component is error that the
# re + i*im recombination folds straight into the final output (the
# real-part error of one half cannot cancel the imag-part of the other)
imag_err = max(np.abs(dec_re.imag).max(), np.abs(dec_im.imag).max())
print(f"logN={log_n} {PRESET}: post-EvalMod IMAG component = "
      f"2^{np.log2(imag_err):.1f} (m/q0 units) -> "
      f"{-np.log2(imag_err * float(Fraction(q0) / delta0)):.1f} bits "
      f"in message units")
got_re = dec_re.real
got_im = dec_im.real
perm = bit_reversal_permutation(n)
exp_re = m_int[:n] / q0
exp_im = m_int[n:] / q0

# Pure-math EvalMod on the MEASURED C2S outputs: splits the post-EvalMod
# error into (a) the ladder's RLWE noise (got − model) and (b) the
# polynomial approximation error (model − m/q0). Whichever dominates is
# the next precision target.
from numpy.polynomial import chebyshev as _cheb
_m1 = b.mod1
_cf = np.array([float(c) for c in _m1._poly.coeffs])


def _math_mod1(u):
    c = _cheb.chebval(u, _cf)
    si = _m1._sqrt2pi
    for _ in range(_m1._r):
        c = 2 * c * c - si * si
        si = si * si
    return c


_model = _math_mod1(np.stack([c2s_re, c2s_im]))
_gotm = np.stack([got_re, got_im])
_expm = np.stack([exp_re[perm], exp_im[perm]])
for _name, _d in (("ladder RLWE (got-model)", _gotm - _model),
                  ("approx (model-exp)", _model - _expm),
                  ("total (got-exp)", _gotm - _expm)):
    _a = np.abs(_d)
    # a |mean| >> rms/sqrt(#slots) is a DC bias: it lands on the slots
    # whose embedding root is closest to 1 (slot 0, exponent 5^0 = 1)
    # with gain ~1.27n after SlotsToCoeffs + decode — the worst-slot tail
    print(f"logN={log_n} {PRESET}: EvalMod split {_name}: rms 2^"
          f"{np.log2(np.sqrt((_a**2).mean())):.1f} max 2^{np.log2(_a.max()):.1f}"
          f" mean 2^{np.log2(abs(_d.mean()) + 1e-300):.1f} (m/q0 units)")
best = None
for tag, pr in (("bitrev", perm), ("identity", np.arange(n))):
    e = max(np.abs(got_re - exp_re[pr]).max(),
            np.abs(got_im - exp_im[pr]).max())
    if best is None or e < best[1]:
        best = (tag, e)
ratio = float(Fraction(q0) / delta0)
e_mod1_msg = best[1] * ratio
print(f"logN={log_n} {PRESET}: post-EvalMod err ({best[0]}) = "
      f"2^{np.log2(best[1]):.1f} (m/q0 units) -> "
      f"{-np.log2(e_mod1_msg):.1f} bits in message units")

out = st["s2c"](m_re, m_im)

# RAW S2C audit (pre-relabel): S2C inverts the C2S packing, so the output
# COEFFICIENTS are the measured slot values directly: coeff[pr(j)] =
# scale*dec_re[j], coeff[pr(j)+n] = scale*dec_im[j]. Any difference is
# error ADDED by the homomorphic S2C itself (given its actual input),
# in coefficient units.
pt_got = dec.decrypt(out, out_ntt=False)
got_c = np.array([float(x) for x in params.ring_q.to_int_coeffs(
    np.asarray(pt_got.value), out.level, centered=True)])
sc = float(Fraction(out.scale))
pr = perm if best[0] == "bitrev" else np.arange(n)
exp_c = np.zeros(2 * n)
exp_c[pr] = sc * got_re
exp_c[pr + n] = sc * got_im
dc = got_c - exp_c
print(f"logN={log_n} {PRESET}: raw-S2C added coeff err max={np.abs(dc).max():.3g} "
      f"rms={np.sqrt((dc**2).mean()):.3g} (scale 2^{np.log2(sc):.1f}) -> "
      f"slot units ~2^{np.log2(np.abs(dc).max() * np.sqrt(n) / sc):.1f}")

# SLOT-domain view of the S2C-added error in final message units: if its
# max >> rms·sqrt(ln n) the error is coherent (concentrated on a few
# slots — structural, e.g. a mis-quantized diagonal), which an rms coeff
# audit cannot see. Print the top offender slots.
scale_final = sc * float(delta0 / Fraction(q0))
err_sl = enc.coeffs_to_slots(dc) / scale_final
mag = np.abs(err_sl)
top = np.argsort(mag)[::-1][:6]
print(f"logN={log_n} {PRESET}: S2C-added SLOT err (msg units): "
      f"rms 2^{np.log2(np.sqrt((mag**2).mean())):.1f} "
      f"max 2^{np.log2(mag.max()):.1f} at slots {top.tolist()} "
      f"(mags {[float(f'{mag[t]:.3g}') for t in top]})")

# Exact linear decomposition of the final error: err_total = err_pre +
# err_s2c, where err_pre = decode(exp_c)/scale − v carries EVERYTHING
# through EvalMod (input noise, encapsulation, C2S, EvalMod) and err_s2c
# = decode(dc)/scale is the S2C-added part. err_in isolates the input
# ciphertext's own noise (m_int vs v) as the floor no pipeline can beat.
err_pre = enc.coeffs_to_slots(exp_c) / scale_final - v
err_in = enc.coeffs_to_slots(m_int) / float(delta0) - v
for tag, e in (("err_in (input ct noise)", err_in),
               ("err_pre (everything thru EvalMod)", err_pre)):
    m_ = np.abs(e)
    print(f"logN={log_n} {PRESET}: {tag}: rms 2^"
          f"{np.log2(np.sqrt((m_**2).mean())):.1f} max 2^{np.log2(m_.max()):.1f}")

# Worst-slot structure probe: the e2e max sits several bits above the
# Gaussian max/rms bound — fit the error against data-dependent
# intermodulation terms (the EvalMod error is a deterministic function of
# the coefficients, so its decode is correlated with powers of v). A big
# R² on a term means the tail is that deterministic product, not noise.
_topp = np.argsort(np.abs(err_pre))[::-1][:6]
print(f"logN={log_n} {PRESET}: err_pre top slots {_topp.tolist()} "
      f"(mags {[float(f'{abs(err_pre[t]):.3g}') for t in _topp]})")
_basis = {"v2": v * v, "cv2": np.conj(v) ** 2, "av2v": np.abs(v) ** 2 * v,
          "v3": v ** 3, "one": np.ones_like(v)}
for _nm, _bv in _basis.items():
    _c = np.vdot(_bv, err_pre) / np.vdot(_bv, _bv)
    _res = err_pre - _c * _bv
    _drop = np.sqrt((np.abs(err_pre) ** 2).mean()
                    / max((np.abs(_res) ** 2).mean(), 1e-300))
    if _drop > 1.05:
        print(f"logN={log_n} {PRESET}: err_pre ~ {_nm}: |c|=2^"
              f"{np.log2(abs(_c) + 1e-300):.1f} rms drop x{_drop:.2f} "
              f"max-after 2^{np.log2(np.abs(_res).max()):.1f}")

out = out.replace(scale=Fraction(out.scale) * delta0 / Fraction(q0))
got = enc.decode(dec.decrypt(out))
err = np.abs(got - v).max()
print(f"logN={log_n} {PRESET}: end-to-end {-np.log2(err):.1f} bits")

# Structure probe: is the final error a systematic scalar (scale-label
# mismatch — err ∝ v) rather than noise? Fit got ≈ c·v and report the
# residual; a drop of several bits with |c−1| ≈ err means the loss is a
# deterministic multiplicative term, fixable exactly in metadata.
d = got - v
c = np.vdot(v, got).real / np.vdot(v, v).real
res = np.abs(got - c * v).max()
print(f"logN={log_n} {PRESET}: scalar fit c-1={c-1:.3e} -> residual "
      f"{-np.log2(res):.1f} bits (vs {-np.log2(err):.1f} raw); "
      f"err-vs-v corr={abs(np.vdot(v, d)) / (np.linalg.norm(v) * np.linalg.norm(d)):.3f}")
