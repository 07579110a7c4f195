"""Threading large NTT weight tables through jit boundaries.

The MXU NTT engines (:mod:`lattigo_tpu.ring.ntt_mxu`,
:mod:`lattigo_tpu.ring.ntt_u64_mxu`) hold per-prime weight stacks that
reach hundreds of MB at logN ≥ 15. A jitted function that closes over a
Ring inlines those device arrays into the HLO as CONSTANTS
(`mlir.ir_constant`), which exhausts compiler and device memory at
production sizes. Long-lived jitted pipelines must instead pass them as
ARGUMENTS: capture them with :class:`TableThreader`, hand the state pytree
to `jax.jit` as an input, and ``install`` it (turning the engine
attributes into tracers) for the duration of the traced body.

Used by ``rlwe.KeyGenerator.gen_galois_keys`` and
``circuits.bootstrapping.BootstrappingEvaluator.jitted``.
"""

from __future__ import annotations


class TableThreader:
    """Collects the threadable tables of one or more Rings."""

    def __init__(self, *rings):
        self.engines = [
            r._pallas for r in rings
            if r is not None and r._pallas is not None
            and hasattr(r._pallas, "get_tables")
        ]

    def state(self):
        """Pytree of all engine tables (pass as a jit argument)."""
        return [e.get_tables() for e in self.engines]

    def install(self, st):
        """Swap the given (possibly traced) tables in; returns the old
        state for restoration."""
        old = self.state()
        for e, tabs in zip(self.engines, st):
            e.set_tables(tabs)
        return old
