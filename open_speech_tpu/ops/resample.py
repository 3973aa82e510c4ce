"""Polyphase resampling on device.

Replaces the reference's scipy-backed paths (``scipy.signal.resample_poly`` at
src/streaming.py:77-79 and src/composer.py:167-173) with a single XLA
``conv_general_dilated``: upsample-by-``up`` is the conv's LHS dilation,
downsample-by-``down`` is its stride, so the whole polyphase structure is one
fused device op that XLA maps onto the MXU/VPU. Filter design (Kaiser-windowed
sinc, beta=5.0, 10 taps per phase) matches scipy's defaults so outputs agree
with the reference to float tolerance.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _kaiser(n: int, beta: float) -> np.ndarray:
    """Kaiser window of length n (numpy has i0)."""
    m = np.arange(n, dtype=np.float64)
    alpha = (n - 1) / 2.0
    arg = beta * np.sqrt(np.maximum(0.0, 1.0 - ((m - alpha) / alpha) ** 2))
    return np.i0(arg) / np.i0(beta)


def _firwin_lowpass(num_taps: int, cutoff: float, beta: float = 5.0) -> np.ndarray:
    """Kaiser-windowed sinc lowpass; ``cutoff`` normalized to Nyquist=1.

    Matches scipy.signal.firwin(num_taps, cutoff, window=("kaiser", beta))
    with scale=True (unity DC gain).
    """
    m = np.arange(num_taps, dtype=np.float64) - (num_taps - 1) / 2.0
    h = cutoff * np.sinc(cutoff * m)
    h *= _kaiser(num_taps, beta)
    return h / h.sum()


@lru_cache(maxsize=64)
def _design(up: int, down: int) -> np.ndarray:
    """Anti-aliasing filter for an up/down pair (scipy resample_poly design)."""
    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = _firwin_lowpass(2 * half_len + 1, 1.0 / max_rate) * up
    return h.astype(np.float32)


def resample_poly(x: jax.Array, up: int, down: int) -> jax.Array:
    """Polyphase resample along the last axis; scipy.resample_poly semantics.

    Output length is ``ceil(n * up / down)``. Works on [..., n] float arrays.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return x
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)  # ceil
    h = jnp.asarray(_design(up, down))
    half_len = (h.shape[0] - 1) // 2

    lead_shape = x.shape[:-1]
    lhs = x.reshape(-1, 1, n_in).astype(jnp.float32)  # [B, C=1, W]
    rhs = h.reshape(1, 1, -1)  # [O=1, I=1, W]
    # Dilated conv: position p of the up-dilated signal aligns with full-conv
    # index p + half_len; we want samples p = j*down for j in [0, n_out).
    dilated_len = (n_in - 1) * up + 1
    needed = (n_out - 1) * down + h.shape[0]
    pad_l = half_len
    pad_r = max(0, needed - dilated_len - pad_l)
    y = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(down,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(up,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    return y[..., 0, :n_out].reshape(*lead_shape, n_out)


def resample_pcm16(pcm: bytes, src_rate: int, dst_rate: int) -> bytes:
    """int16 PCM bytes at src_rate -> int16 PCM bytes at dst_rate.

    Device-accelerated drop-in for the reference streaming resampler
    (src/streaming.py:55-91).
    """
    if src_rate == dst_rate or not pcm:
        return bytes(pcm)
    x = np.frombuffer(pcm, dtype="<i2").astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x), dst_rate, src_rate))
    return np.clip(np.round(y), -32768, 32767).astype("<i2").tobytes()
