"""Native C++ XOF (lattigo_tpu/native) vs the pure-Python hashlib path.

The native library must be a bit-identical drop-in for KeyedPRNG: same
stream words, same counter advancement, same uniform residues. If no C++
toolchain is present the native loader returns None and these tests skip
(the library then runs on the Python fallback everywhere).
"""

import hashlib

import numpy as np
import pytest

from lattigo_tpu import native


def _py_stream(key: bytes, counter: int, count: int):
    words = []
    while len(words) < count:
        h = hashlib.blake2b(
            counter.to_bytes(8, "little"), key=key[:64]).digest()
        words.extend(
            int.from_bytes(h[i:i + 8], "little") for i in range(0, 64, 8))
        counter += 1
    return np.array(words[:count], dtype=np.uint64), counter


requires_native = pytest.mark.skipif(
    native.load() is None, reason="no C++ toolchain for native library")


@requires_native
@pytest.mark.parametrize("key", [b"", b"k", b"0123456789abcdef" * 4])
@pytest.mark.parametrize("count", [1, 7, 8, 9, 64, 1000])
def test_fill_matches_hashlib(key, count):
    got, ctr = native.xof_fill_u64(key, 5, count)
    want, want_ctr = _py_stream(key, 5, count)
    assert ctr == want_ctr
    np.testing.assert_array_equal(got, want)


@requires_native
def test_uniform_mod_q_matches_python_reduction():
    key, n, q = b"crs-seed", 256, (1 << 45) - (1 << 14) + 1
    got, ctr = native.xof_uniform_mod_q(key, 0, q, n)
    hi, c1 = _py_stream(key, 0, n)
    lo, c2 = _py_stream(key, c1, n)
    assert ctr == c2
    want = ((hi.astype(object) << 64) | lo.astype(object)) % q
    np.testing.assert_array_equal(got, want.astype(np.uint64))
    assert got.max() < q


@requires_native
def test_keyed_prng_same_stream_with_and_without_native(monkeypatch):
    from lattigo_tpu.ring.sampling import KeyedPRNG

    a = KeyedPRNG(b"seed")
    native_words = a.read_u64(100)

    monkeypatch.setenv("LATTIGO_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    b = KeyedPRNG(b"seed")
    py_words = b.read_u64(100)
    np.testing.assert_array_equal(native_words, py_words)
    assert a.counter == b.counter


def test_blake2b_keyed_vector():
    # RFC 7693-style sanity: hashlib agrees with itself on the exact
    # construction KeyedPRNG uses (guards accidental drift in the spec
    # the native code was written against).
    h = hashlib.blake2b((7).to_bytes(8, "little"), key=b"xyz").digest()
    assert len(h) == 64
