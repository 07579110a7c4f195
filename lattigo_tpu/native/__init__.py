"""Native (C++) host-runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; this package holds the native
host-side runtime pieces (the analog of the reference's compiled-Go
performance layer for host work): currently the BLAKE2b keyed XOF behind
:class:`lattigo_tpu.ring.sampling.KeyedPRNG`.

The shared library is compiled on first import with the system g++ and
cached next to the source; if no compiler is available the callers fall
back to their pure-Python implementations (bit-identical, just slower).
Set ``LATTIGO_TPU_NO_NATIVE=1`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "xof.cpp")
_LIB = os.path.join(_HERE, "_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    # per-process temp name: concurrent first imports (parallel pytest
    # workers) must not interleave writes before the atomic replace
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return False
    os.replace(tmp, _LIB)
    return True


def load() -> ctypes.CDLL | None:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LATTIGO_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.xof_fill_u64.restype = ctypes.c_uint64
        lib.xof_fill_u64.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
        ]
        lib.xof_uniform_mod_q.restype = ctypes.c_uint64
        lib.xof_uniform_mod_q.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
        ]
        _lib = lib
        return _lib


def xof_fill_u64(key: bytes, counter: int, count: int):
    """count stream words from block `counter`; (np.uint64[count], next_counter).

    Returns None if the native library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    import numpy as np

    out = np.empty(count, dtype=np.uint64)
    nxt = lib.xof_fill_u64(
        key, len(key), counter,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), count)
    return out, int(nxt)


def xof_uniform_mod_q(key: bytes, counter: int, q: int, n: int):
    """n uniform residues mod q (consumes 2n words); None if unavailable."""
    lib = load()
    if lib is None or n % 8:
        return None
    import numpy as np

    out = np.empty(n, dtype=np.uint64)
    nxt = lib.xof_uniform_mod_q(
        key, len(key), counter, q,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n)
    return out, int(nxt)
