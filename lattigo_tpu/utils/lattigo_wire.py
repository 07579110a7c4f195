"""Lattigo-compatible binary wire format (checkpoint / transport interop).

Implements the reference library's ``WriteTo``/``ReadFrom`` byte layout for
the core object types, so checkpoints and shares produced by this framework
can be loaded by a Go Lattigo process and vice versa (SURVEY.md §5
"checkpoint/resume: same wire formats").

Byte layout (all integers little-endian, ref utils/buffer/writer.go:163):

- ``structs.Vector[uint64]``  -> u64 length, then raw LE u64 data
  (ref utils/structs/vector.go:41-120).
- ``structs.Matrix[T]``       -> u64 #rows, then each row as a Vector
  (ref utils/structs/matrix.go:82-104).
- ``ring.Poly``               -> its coefficient Matrix[uint64]
  (ref ring/poly.go:132-140).
- ``ringqp.Poly``             -> Q Poly then P Poly; an absent basis is a
  0-row matrix (ref ring/ringqp/poly.go WriteTo).
- ``rlwe.Element[T]``         -> u8 has-metadata flag, fixed-size MetaData
  JSON, then Vector[Poly] (ref core/rlwe/element.go:314-369).
- ``rlwe.MetaData``           -> JSON with hex-string booleans and 39-digit
  scientific-notation big-float scales, fixed byte width
  (ref core/rlwe/metadata.go:30-37, scale.go:170-200).
- ``rlwe.SecretKey``          -> its ringqp.Poly (ref core/rlwe/keys.go:18).
- ``rlwe.PublicKey``          -> VectorQP = Vector[ringqp.Poly]
  (ref core/rlwe/keys.go:95,207,250).
- ``rlwe.GadgetCiphertext``   -> u64 BaseTwoDecomposition, then
  Matrix[VectorQP] (ref core/rlwe/gadgetciphertext.go:19-22 + WriteTo).
- ``rlwe.EvaluationKey``      -> GadgetCiphertext (+ 32-byte seed iff
  compressed/degree-0) (ref core/rlwe/keys.go:293-349).
- ``rlwe.GaloisKey``          -> u64 GaloisElement, u64 NthRoot, then the
  EvaluationKey (ref core/rlwe/keys.go:577-581 + WriteTo).

NTT/Montgomery-domain polynomials are written verbatim: the NTT tables and
Montgomery form here are bit-exact with the reference (gated by
tests/test_lattigo_vectors.py), so domain-transformed coefficients agree.
"""

from __future__ import annotations

import json
import struct as _struct
from decimal import Decimal, ROUND_HALF_EVEN, localcontext
from fractions import Fraction
from typing import Any

import numpy as np

# ---------------------------------------------------------------------------
# primitives (ref utils/buffer + utils/structs)
# ---------------------------------------------------------------------------


def _w_u64(x: int) -> bytes:
    return _struct.pack("<Q", x)


def _r_u64(b: memoryview, off: int) -> tuple[int, int]:
    return _struct.unpack_from("<Q", b, off)[0], off + 8


def write_u64_vector(v: np.ndarray) -> bytes:
    """structs.Vector[uint64] (ref utils/structs/vector.go:86-104)."""
    v = np.ascontiguousarray(np.asarray(v, dtype="<u8"))
    assert v.ndim == 1
    return _w_u64(v.shape[0]) + v.tobytes()


def read_u64_vector(b: memoryview, off: int) -> tuple[np.ndarray, int]:
    ln, off = _r_u64(b, off)
    v = np.frombuffer(b, dtype="<u8", count=ln, offset=off).copy()
    return v, off + 8 * ln


def write_poly(coeffs: np.ndarray) -> bytes:
    """ring.Poly = Matrix[uint64]: u64 #limbs then one Vector per limb
    (ref ring/poly.go:132, utils/structs/matrix.go:82)."""
    coeffs = np.atleast_2d(np.asarray(coeffs, dtype=np.uint64))
    out = [_w_u64(coeffs.shape[0])]
    for row in coeffs:
        out.append(write_u64_vector(row))
    return b"".join(out)


def read_poly(b: memoryview, off: int) -> tuple[np.ndarray, int]:
    rows, off = _r_u64(b, off)
    if rows == 0:
        return np.zeros((0, 0), dtype=np.uint64), off
    data = []
    for _ in range(rows):
        row, off = read_u64_vector(b, off)
        data.append(row)
    return np.stack(data), off


def write_qp_poly(q: np.ndarray | None, p: np.ndarray | None) -> bytes:
    """ringqp.Poly: Q coefficients then P coefficients; absent basis = empty
    matrix (ref ring/ringqp/poly.go WriteTo)."""
    empty = np.zeros((0, 0), dtype=np.uint64)
    return write_poly(q if q is not None else empty) + write_poly(
        p if p is not None else empty)


def read_qp_poly(b: memoryview, off: int):
    q, off = read_poly(b, off)
    p, off = read_poly(b, off)
    return (q if q.size else None), (p if p.size else None), off


# ---------------------------------------------------------------------------
# MetaData (fixed-width JSON, ref core/rlwe/metadata.go + scale.go)
# ---------------------------------------------------------------------------

SCALE_PRECISION_LOG10 = 39  # ceil(128 / log2(10)), ref scale.go:17


def _go_float_text(x) -> str:
    """big.Float.Text('e', 39): 'd.<39 digits>e±dd' (ref scale.go:174).

    The reference rounds its 128-bit binary mantissa to 39 decimal digits;
    values here are exact rationals/ints, so direct decimal rounding agrees
    whenever the value is exactly representable in 128 bits (always true
    for the power-of-two / integer scales used in practice).
    """
    f = Fraction(x)
    if f == 0:
        return "0." + "0" * SCALE_PRECISION_LOG10 + "e+00"
    sign = "-" if f < 0 else ""
    f = abs(f)
    with localcontext() as ctx:
        ctx.prec = SCALE_PRECISION_LOG10 + 10
        d = Decimal(f.numerator) / Decimal(f.denominator)
        exp = d.adjusted()
        mant = d.scaleb(-exp).quantize(
            Decimal(1).scaleb(-SCALE_PRECISION_LOG10), rounding=ROUND_HALF_EVEN)
        if mant >= 10:  # rounding overflowed to the next decade
            mant = (mant / 10).quantize(
                Decimal(1).scaleb(-SCALE_PRECISION_LOG10),
                rounding=ROUND_HALF_EVEN)
            exp += 1
    return f"{sign}{mant}e{exp:+03d}"


def _scale_json(value, mod: int | None) -> dict:
    return {"Value": _go_float_text(value), "Mod": _go_float_text(mod or 0)}


def _hex8(flag: bool | int) -> str:
    return f"0x{int(flag):02x}"


def write_metadata(*, scale=1.0, scale_mod: int | None = None,
                   log_dimensions: tuple[int, int] = (0, 0),
                   is_batched: bool = True, is_bit_reversed: bool = False,
                   is_ntt: bool = True, is_montgomery: bool = False) -> bytes:
    """rlwe.MetaData: fixed-width JSON (ref metadata.go:30-37,68-77)."""
    rows, cols = log_dimensions
    meta = {
        "PlaintextMetaData": {
            "Scale": _scale_json(scale, scale_mod),
            "IsBatched": _hex8(is_batched),
            "IsBitReversed": _hex8(is_bit_reversed),
            "LogDimensions": [_hex8(rows & 0xFF), _hex8(cols & 0xFF)],
        },
        "CiphertextMetaData": {
            "IsNTT": _hex8(is_ntt),
            "IsMontgomery": _hex8(is_montgomery),
        },
    }
    raw = json.dumps(meta, separators=(",", ":")).encode()
    # ref BinarySize contracts: Scale=21+2*(39+6)=111, Pt=84+Scale,
    # Ct=38, MetaData=44+Pt+Ct (metadata.go:30-31,151-152 + ct BinarySize)
    assert len(raw) == 44 + (84 + 111) + 38, len(raw)
    return raw


METADATA_SIZE = 44 + (84 + 111) + 38  # = 277 bytes, always


def read_metadata(b: memoryview, off: int) -> tuple[dict, int]:
    raw = bytes(b[off:off + METADATA_SIZE])
    meta = json.loads(raw)
    pt, ct = meta["PlaintextMetaData"], meta["CiphertextMetaData"]

    def _num(s: str):
        d = Decimal(s)
        f = Fraction(d)
        return int(f) if f.denominator == 1 else f

    mod = _num(pt["Scale"]["Mod"])
    out = {
        "scale": _num(pt["Scale"]["Value"]),
        "scale_mod": int(mod) if mod else None,
        "is_batched": int(pt["IsBatched"], 16) == 1,
        "is_bit_reversed": int(pt["IsBitReversed"], 16) == 1,
        "log_dimensions": (int(pt["LogDimensions"][0], 16),
                           int(pt["LogDimensions"][1], 16)),
        "is_ntt": int(ct["IsNTT"], 16) == 1,
        "is_montgomery": int(ct["IsMontgomery"], 16) == 1,
    }
    return out, off + METADATA_SIZE


# ---------------------------------------------------------------------------
# Elements (Ciphertext / Plaintext)
# ---------------------------------------------------------------------------


def write_element(polys: np.ndarray, **meta) -> bytes:
    """rlwe.Element[ring.Poly]: u8 flag + MetaData + Vector[Poly]
    (ref element.go:335-369). ``polys``: u64[degree+1, limbs, N]."""
    polys = np.asarray(polys, dtype=np.uint64)
    if polys.ndim == 2:
        polys = polys[None]
    out = [b"\x01", write_metadata(**meta), _w_u64(polys.shape[0])]
    for p in polys:
        out.append(write_poly(p))
    return b"".join(out)


def read_element(b: bytes | memoryview, off: int = 0):
    """Returns (value u64[degree+1, limbs, N], metadata dict, next offset)."""
    b = memoryview(b)
    has_meta = b[off]
    off += 1
    meta: dict[str, Any] = {}
    if has_meta:
        meta, off = read_metadata(b, off)
    count, off = _r_u64(b, off)
    polys = []
    for _ in range(count):
        p, off = read_poly(b, off)
        polys.append(p)
    return np.stack(polys), meta, off


def ciphertext_to_bytes(ct, *, scale=None, scale_mod=None,
                        log_dimensions=(0, 0), is_batched=True) -> bytes:
    """Serialize a (non-batched) lattigo_tpu Ciphertext/Plaintext."""
    value = np.asarray(ct.value)
    if value.ndim == 2:           # plaintext
        value = value[None]
    assert value.ndim == 3, "batched ciphertexts: serialize each element"
    return write_element(
        value,
        scale=ct.scale if scale is None else scale,
        scale_mod=scale_mod,
        log_dimensions=log_dimensions,
        is_batched=is_batched,
        is_ntt=ct.is_ntt,
        is_montgomery=ct.is_montgomery,
    )


def ciphertext_from_bytes(data: bytes):
    """Returns a lattigo_tpu Ciphertext (degree>=1) or Plaintext (degree 0)."""
    from lattigo_tpu.rlwe.elements import Ciphertext, Plaintext

    value, meta, _ = read_element(data)
    kw = dict(is_ntt=meta.get("is_ntt", True),
              is_montgomery=meta.get("is_montgomery", False),
              scale=meta.get("scale", 1.0))
    if value.shape[0] == 1:
        return Plaintext(value=value[0], **kw)
    return Ciphertext(value=value, **kw)


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------


def secret_key_to_bytes(sk) -> bytes:
    """ref core/rlwe/keys.go:18 (NTT+Montgomery-domain ringqp.Poly)."""
    return write_qp_poly(np.asarray(sk.value.q),
                         None if sk.value.p is None else np.asarray(sk.value.p))


def secret_key_from_bytes(data: bytes):
    from lattigo_tpu.ring.ringqp import QPPoly
    from lattigo_tpu.rlwe.keys import SecretKey

    q, p, _ = read_qp_poly(memoryview(data), 0)
    return SecretKey(value=QPPoly(q=np.asarray(q), p=p))


def _write_vector_qp(qs, ps) -> bytes:
    """rlwe.VectorQP = Vector[ringqp.Poly] (ref keys.go:95)."""
    out = [_w_u64(len(qs))]
    for q, p in zip(qs, ps):
        out.append(write_qp_poly(q, p))
    return b"".join(out)


def _read_vector_qp(b: memoryview, off: int):
    ln, off = _r_u64(b, off)
    qs, ps = [], []
    for _ in range(ln):
        q, p, off = read_qp_poly(b, off)
        qs.append(q)
        ps.append(p)
    return qs, ps, off


def public_key_to_bytes(pk) -> bytes:
    """ref core/rlwe/keys.go:207,250: VectorQP of length 2."""
    q = np.asarray(pk.value.q)
    p = None if pk.value.p is None else np.asarray(pk.value.p)
    return _write_vector_qp([q[i] for i in range(q.shape[0])],
                            [None if p is None else p[i]
                             for i in range(q.shape[0])])


def public_key_from_bytes(data: bytes):
    from lattigo_tpu.ring.ringqp import QPPoly
    from lattigo_tpu.rlwe.keys import PublicKey

    qs, ps, _ = _read_vector_qp(memoryview(data), 0)
    q = np.stack(qs)
    p = None if ps[0] is None else np.stack(ps)
    return PublicKey(value=QPPoly(q=q, p=p))


def _base2_digit_counts(q_moduli, base2: int) -> list[int]:
    """Per-limb power-of-two digit counts (ref params.go:523
    BaseTwoDecompositionVectorSize: (logqi + w − 1) / w)."""
    return [-(-((q - 1).bit_length()) // base2) for q in q_moduli]


def gadget_ciphertext_to_bytes(g, q_moduli=None) -> bytes:
    """ref core/rlwe/gadgetciphertext.go: u64 base2 + Matrix[VectorQP].

    lattigo_tpu layout value.q = u64[rows, deg+1, LQ, N] maps to the
    reference's [beta][digits] matrix: with base2=0 the matrix is
    [beta][1]; with base2=w>0 the flat rows (limb i, digit j) at
    i·max_dig+j become matrix row i with exactly digits_i columns
    (ref gadgetciphertext.go:33-37) — the zero-padded flat rows past
    digits_i are dropped. ``q_moduli`` (the Q chain up to the gadget's
    level) is required for base2 > 0 to recover the per-limb counts.
    """
    q = np.asarray(g.value.q)
    p = None if g.value.p is None else np.asarray(g.value.p)
    base2 = int(getattr(g, "base2", 0))
    rows = q.shape[0]
    out = [_w_u64(base2)]
    if base2 > 0:
        if q_moduli is None:
            raise ValueError(
                "base-2^w gadget serialization needs q_moduli (the Q chain "
                "up to the gadget's level) to recover per-limb digit counts")
        lq = q.shape[-2]
        digits = _base2_digit_counts(q_moduli[:lq], base2)
        max_dig = rows // lq
        out.append(_w_u64(lq))
        for i in range(lq):
            out.append(_w_u64(digits[i]))
            for j in range(digits[i]):
                r = i * max_dig + j
                out.append(_write_vector_qp(
                    [q[r, d] for d in range(q.shape[1])],
                    [None if p is None else p[r, d]
                     for d in range(q.shape[1])]))
        return b"".join(out)
    out.append(_w_u64(rows))
    for i in range(rows):
        out.append(_w_u64(1))  # one column per row group
        out.append(_write_vector_qp(
            [q[i, d] for d in range(q.shape[1])],
            [None if p is None else p[i, d] for d in range(q.shape[1])]))
    return b"".join(out)


def gadget_ciphertext_from_bytes(data: bytes):
    """Inverse of :func:`gadget_ciphertext_to_bytes`. For base2 > 0 the
    per-limb rows are re-padded to the flat (limb, digit) layout with
    zero rows (the evaluator masks digits past each limb's count, so the
    padding content is never read — see keys._gadget_scalars_base2)."""
    from lattigo_tpu.ring.ringqp import QPPoly
    from lattigo_tpu.rlwe.keys import GadgetCiphertext

    b = memoryview(data)
    base2, off = _r_u64(b, 0)
    rows, off = _r_u64(b, off)
    row_q, row_p, counts = [], [], []
    for _ in range(rows):
        cols, off = _r_u64(b, off)
        counts.append(cols)
        assert base2 > 0 or cols == 1, "unsupported gadget matrix layout"
        for _ in range(cols):
            qs, ps, off = _read_vector_qp(b, off)
            row_q.append(np.stack(qs))
            row_p.append(None if ps[0] is None else np.stack(ps))
    if base2 > 0:
        max_dig = max(counts)
        pad_q, pad_p, k = [], [], 0
        for c in counts:
            for j in range(max_dig):
                if j < c:
                    pad_q.append(row_q[k])
                    pad_p.append(row_p[k])
                    k += 1
                else:
                    pad_q.append(np.zeros_like(pad_q[-1]))
                    pad_p.append(None if pad_p[-1] is None
                                 else np.zeros_like(pad_p[-1]))
        row_q, row_p = pad_q, pad_p
    q = np.stack(row_q)
    p = None if row_p[0] is None else np.stack(row_p)
    return GadgetCiphertext(value=QPPoly(q=q, p=p), base2=int(base2)), off


def evaluation_key_to_bytes(evk, q_moduli=None) -> bytes:
    """ref core/rlwe/keys.go:293-349 (uncompressed: gadget ct only).
    ``q_moduli`` is required for base-2^w gadgets (see
    gadget_ciphertext_to_bytes)."""
    return gadget_ciphertext_to_bytes(evk.gadget, q_moduli)


def evaluation_key_from_bytes(data: bytes):
    from lattigo_tpu.rlwe.keys import EvaluationKey

    g, _ = gadget_ciphertext_from_bytes(data)
    return EvaluationKey(gadget=g)


def relinearization_key_to_bytes(rlk, q_moduli=None) -> bytes:
    return evaluation_key_to_bytes(rlk, q_moduli)


def relinearization_key_from_bytes(data: bytes):
    from lattigo_tpu.rlwe.keys import RelinearizationKey

    g, _ = gadget_ciphertext_from_bytes(data)
    return RelinearizationKey(gadget=g)


def galois_key_to_bytes(gk, nth_root: int) -> bytes:
    """ref core/rlwe/keys.go:577-581: u64 gal_el, u64 NthRoot, EVK."""
    return (_w_u64(int(gk.gal_el)) + _w_u64(int(nth_root))
            + gadget_ciphertext_to_bytes(gk.gadget))


def galois_key_from_bytes(data: bytes):
    from lattigo_tpu.rlwe.keys import GaloisKey

    b = memoryview(data)
    gal_el, off = _r_u64(b, 0)
    _nth_root, off = _r_u64(b, off)
    g, _ = gadget_ciphertext_from_bytes(bytes(b[off:]))
    return GaloisKey(gadget=g, gal_el=int(gal_el))
