"""Bit-exactness gate against the reference's committed NTT test vectors.

The reference commits 6 known-answer vectors (N=16..512, two 60-bit primes)
in ``ring/ntt_test.go:9-89``; its own test asserts NTT(poly) == polyNTT and
INTT round-trip. We parse those vectors out of the (read-only) reference
tree at test time and assert our negacyclic NTT matches **bit-exactly per
prime** (BASELINE.json config 1 / SURVEY.md §4 "exactness for ring ... against
Lattigo-generated vectors").

Skipped when the reference tree is not present (e.g. a user checkout).
"""

import os
import re

import numpy as np
import pytest

from lattigo_tpu.ring.ring import Ring

REF = "/root/reference/ring/ntt_test.go"


def _parse_reference_vectors():
    src = open(REF).read()
    body = src[src.index("= []struct"):src.index("func TestNTT")]
    entries = []
    for chunk in re.split(r"\n\t\{\n", body)[1:]:
        n = int(re.match(r"\s*(\d+),", chunk).group(1))
        qis = [int(x) for x in
               re.search(r"\[\]uint64\{([^}]*)\}", chunk).group(1).split(",")]
        polys = re.findall(r"Poly\{\[\]\[\]uint64\{(.*?)\}\}", chunk, re.S)
        rows = lambda p: [[int(x) for x in r.split(",") if x.strip()]
                          for r in re.findall(r"\{([^{}]*)\}", p)]
        entries.append((n, qis, np.array(rows(polys[0]), dtype=np.uint64),
                        np.array(rows(polys[1]), dtype=np.uint64)))
    return entries


pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not available")


@pytest.mark.parametrize("idx", range(6))
def test_ntt_bit_exact_vs_lattigo_vectors(idx):
    n, qis, poly, poly_ntt = _parse_reference_vectors()[idx]
    ring = Ring(n, qis)
    got = np.asarray(ring.ntt(poly))
    np.testing.assert_array_equal(got, poly_ntt,
                                  err_msg=f"forward NTT N={n} not bit-exact")
    back = np.asarray(ring.intt(got))
    np.testing.assert_array_equal(back, poly,
                                  err_msg=f"INTT round-trip N={n} not bit-exact")
