"""Weight-only int8 quantization for whisper.

The reference serves CT2 int8 checkpoints (``STT_COMPUTE_TYPE=int8``,
src/config.py + src/backends/faster_whisper.py:40). Here the analog is
weight-only int8 with per-output-channel scales: linear weights and the
token embedding are stored as int8 + f32 scale and dequantized inside the
matmul. On TPU decode is HBM-bandwidth-bound (every step re-reads the
decoder weights and logits matrix), so halving weight bytes converts
directly into decode throughput; matmul compute stays bf16 through the MXU
with the dequant fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_tensor(w: jax.Array, axis: int = -1):
    """Per-channel symmetric int8: returns {"q": int8, "s": f32 scales}."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def dequantize(pack) -> jax.Array:
    return pack["q"].astype(jnp.bfloat16) * pack["s"].astype(jnp.bfloat16)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"q", "s"}


def quantize_whisper_params(params):
    """Quantize every linear weight + token embedding in a whisper pytree.

    Layernorm/conv/bias/positional params stay in their original dtype
    (tiny, and precision-sensitive). One jitted program quantizes the
    whole tree — per-leaf eager ops pay a compile + relay roundtrip each
    on a remote-attached TPU (same pathology ops/initutil.py documents).
    """
    return _quantize_impl(params)


@jax.jit
def _quantize_impl(params):
    def walk(tree, path=()):
        out = {}
        for key, value in tree.items():
            if isinstance(value, dict):
                out[key] = walk(value, path + (key,))
            elif key == "w" and value.ndim >= 2 and "conv" not in path[-1]:
                out[key] = quantize_tensor(value, axis=-2)
            elif key == "tok_emb":
                out[key] = quantize_tensor(value, axis=-1)
            else:
                out[key] = value
        return out

    return walk(params)


def dequant_size_ratio(params, qparams) -> float:
    """Bytes(quantized) / bytes(original) — for logging."""

    def nbytes(tree):
        return sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
        )

    return nbytes(qparams) / max(1, nbytes(params))
