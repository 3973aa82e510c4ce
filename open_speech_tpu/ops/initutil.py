"""Parameter-init compilation helper.

Random parameter initialization builds hundreds of small, distinctly-
shaped arrays; eagerly each one is its own XLA compile (measured ~500 ms
per op in the TPU-relay interpreter — minutes per model). Tracing the
whole init as ONE jitted program turns that into a single compile that
also lands in the persistent compilation cache, so server start-up pays
it once ever. Checkpoint-conversion paths build numpy-first and are
unaffected.
"""

from __future__ import annotations

import jax


def jit_init(*, static_argnames=("cfg", "dtype")):
    """Wrap a parameter-init fn in jax.jit with config/dtype static.

    Returns the jitted callable directly (jax.jit preserves
    __name__/__doc__ and exposes .lower()/.clear_cache() for compile-cost
    debugging — the exact concern this module exists for)."""

    def deco(fn):
        return jax.jit(fn, static_argnames=static_argnames)

    return deco
