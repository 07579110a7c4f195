"""Typed error model for evaluation-key lookups.

TPU-native analog of the reference's descriptive key-lookup errors
(ref core/rlwe/evaluator.go:68-91 CheckAndGetGaloisKey /
CheckAndGetRelinearizationKey and core/rlwe/keys.go:747 MemEvaluationKeySet
lookups): a missing key is an *expected user error* — the message must say
which key and how to generate it, not trip a bare assert deep in a trace.
"""

from __future__ import annotations


class MissingKeyError(KeyError):
    """An evaluation key required by the requested operation is absent."""


class MissingGaloisKeyError(MissingKeyError):
    def __init__(self, gal_el: int, rotation: int | None = None):
        self.gal_el = gal_el
        self.rotation = rotation
        hint = "" if rotation is None else f" (slot rotation by {rotation})"
        super().__init__(
            f"GaloisKey for element {gal_el}{hint} is missing from the "
            f"EvaluationKeySet — generate it with "
            f"KeyGenerator.gen_galois_keys(key, [{gal_el}], sk)")

    def __str__(self) -> str:  # KeyError quotes its arg; keep it readable
        return self.args[0]


class MissingRelinearizationKeyError(MissingKeyError):
    def __init__(self):
        super().__init__(
            "RelinearizationKey is missing from the EvaluationKeySet — "
            "generate it with KeyGenerator.gen_relinearization_key(key, sk)")

    def __str__(self) -> str:
        return self.args[0]
