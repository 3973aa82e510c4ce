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

import functools

import jax


def jit_init(*, static_argnames=("cfg", "dtype")):
    """Wrap a parameter-init fn in jax.jit with config/dtype static."""

    def deco(fn):
        jitted = jax.jit(fn, static_argnames=static_argnames)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            return jitted(*args, **kwargs)

        return wrapper

    return deco
