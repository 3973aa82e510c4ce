"""Vocoder building blocks: ISTFT synthesis, AdaIN, HiFiGAN-style resblocks.

These are the device-side primitives under the JAX Kokoro (ISTFTNet) and
Piper (VITS/HiFiGAN) decoders — the compute the reference delegates to
PyTorch (src/tts/backends/kokoro.py:207) and onnxruntime (piper). Everything
is expressed as convolutions/matmuls so XLA tiles it onto the MXU:

  - ``istft``: magnitude+phase frames -> waveform. The overlap-add is a
    single transposed convolution whose kernel is the synthesis window times
    an identity across frequency taps — no scatter, fully fused.
  - ``adain1d``: instance-norm + style-conditioned affine (StyleTTS2 core).
  - ``resblock1``: HiFiGAN multi-dilation residual stack.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp


@lru_cache(maxsize=8)
def _synthesis_basis(n_fft: int, hop: int) -> tuple[np.ndarray, np.ndarray]:
    """(idft bases [n_bins*2, n_fft], ola window kernel [n_fft, n_fft, 1])."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    # irfft synthesis: x[n] = (1/n_fft) * sum_k w_k * (re_k cos - im_k sin)
    scale = np.full((n_bins, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    cos_b = np.cos(ang) * scale
    sin_b = -np.sin(ang) * scale
    window = np.hanning(n_fft + 1)[:-1].astype(np.float64)
    return (
        np.concatenate([cos_b, sin_b], axis=0).astype(np.float32),
        window.astype(np.float32),
    )


def istft(mag: jax.Array, phase: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Inverse STFT: mag/phase [B, T, n_bins] -> waveform [B, T*hop].

    Windowed frames are synthesized by one matmul against the inverse-DFT
    basis; overlap-add + window-square normalization run as transposed convs.
    """
    basis, window = _synthesis_basis(n_fft, hop)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    spec = jnp.concatenate([re, im], axis=-1)  # [B, T, 2*n_bins]
    frames = spec @ jnp.asarray(basis)  # [B, T, n_fft]
    frames = frames * jnp.asarray(window)[None, None, :]

    b, t, _ = frames.shape
    # OLA as conv_transpose: treat n_fft as input channels, kernel places each
    # channel at its tap offset. conv_transpose applies the kernel spatially
    # flipped, so the anti-diagonal identity puts channel i at offset i.
    kernel = jnp.asarray(
        np.eye(n_fft, dtype=np.float32)[::-1].copy()[:, :, None]
    )  # [W, I, O]
    out = jax.lax.conv_transpose(
        frames, kernel, strides=(hop,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[..., 0]  # [B, (T-1)*hop + n_fft]
    # window-square normalization (constant per output position)
    wsq = jnp.asarray(window**2)[None, :, None]
    ones = jnp.ones((1, t, 1), frames.dtype) * wsq.transpose(0, 2, 1)
    norm = jax.lax.conv_transpose(
        ones, kernel, strides=(hop,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[..., 0]
    out = out / jnp.maximum(norm, 1e-6)
    # center-trim: frame i begins at i*hop in the padded signal, so sample m
    # of the original lives at OLA index m + n_fft//2
    pad = n_fft // 2
    # with hop > n_fft/2 the OLA buffer ((t-1)*hop + n_fft) ends before
    # pad + t*hop; zero-extend so the contract ([B, T*hop]) always holds
    short = pad + t * hop - out.shape[1]
    if short > 0:
        out = jnp.pad(out, ((0, 0), (0, short)))
    return out[:, pad : pad + t * hop]


def adain1d(x: jax.Array, style: jax.Array, p) -> jax.Array:
    """Adaptive instance norm: x [B, T, C], style [B, S] -> [B, T, C].

    p: {"w": [S, 2C], "b": [2C]} producing per-channel gain/bias from style.
    NOTE: instance-norm statistics span the whole time axis, which makes the
    op non-streamable; generators that vocode in blocks use ``style_mod``.
    """
    mean = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    gb = style @ p["w"] + p["b"]  # [B, 2C]
    c = x.shape[-1]
    gamma, beta = gb[:, :c], gb[:, c:]
    return xn * (1.0 + gamma[:, None, :]) + beta[:, None, :]


def style_mod(x: jax.Array, style: jax.Array, p) -> jax.Array:
    """Streaming-safe style conditioning: per-channel affine from style only.

    Same parameter shape as adain1d but no data-dependent normalization, so
    block-wise vocoding is exact up to the conv receptive field.
    """
    gb = style @ p["w"] + p["b"]
    c = x.shape[-1]
    gamma, beta = gb[:, :c], gb[:, c:]
    return x * (1.0 + gamma[:, None, :]) + beta[:, None, :]


def conv1d(
    x: jax.Array,
    p,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    pad: int | None = None,
) -> jax.Array:
    """x [B, T, C_in], p["w"] [K, C_in/groups, C_out].

    Default padding is torch-style 'same' ((k-1)d//2 per side); pass ``pad``
    for an explicit symmetric padding (e.g. strided convs with pad != same).
    """
    k = p["w"].shape[0]
    if pad is None:
        lo = (k - 1) * dilation // 2
        hi = (k - 1) * dilation - lo
    else:
        lo = hi = pad
    x = x.astype(p["w"].dtype)  # bf16 weights carry the compute dtype
    t_out = (x.shape[1] + lo + hi - (k - 1) * dilation - 1) // stride + 1
    if groups == 1 and k > 1 and t_out * k <= 2048:
        # streaming-block shapes (short T, wide C): one im2col matmul beats
        # XLA's conv path by ~20× on CPU and keeps the MXU busy on TPU; the
        # k× input duplication is why this gates on small T·k
        xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
        cols = jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    xp, j * dilation, j * dilation + (t_out - 1) * stride + 1,
                    stride=stride, axis=1,
                )
                for j in range(k)
            ],
            axis=-1,
        )  # [B, T_out, K*C_in]
        w_flat = p["w"].reshape(k * p["w"].shape[1], p["w"].shape[2])
        out = cols @ w_flat
    else:
        out = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(stride,),
            padding=[(lo, hi)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
        )
    return out + p["b"] if "b" in p else out


def conv_transpose1d(
    x: jax.Array, p, stride: int, pad: int | None = None, groups: int = 1
) -> jax.Array:
    """Upsampling transposed conv matching torch ``ConvTranspose1d`` semantics.

    x [B, T, C_in] → [B, (T-1)*stride - 2*pad + K, C_out]. With the HiFiGAN
    convention pad=(K-stride)//2 and even K-stride this is exactly T*stride.
    p["w"] is *kernel-flipped* relative to the torch ConvTranspose1d weight
    and converters store ``w.transpose(2,0,1)[::-1]`` in every non-depthwise
    case: dense → [K, C_in, C_out], grouped → [K, C_in, C_out/groups]
    (torch's weight is [C_in, C_out/groups, K]). Depthwise (groups == C_in
    == C_out) stores ``w.transpose(2,1,0)[::-1]`` → [K, 1, C].

    Computed as one matmul + overlap-add rather than an input-dilated
    (lhs_dilation) convolution: every output sample is a sum of ≤⌈K/stride⌉
    shifted per-input-position projections, so the FLOPs land on the MXU as
    a single [T, C_in]·[C_in, K·C_out] contraction (XLA lowers lhs-dilated
    convs to a far slower path — 100×+ on CPU, and off the fast conv core
    path on TPU for these tall-skinny audio shapes).
    """
    w = p["w"]
    k = w.shape[0]
    if pad is None:
        pad = (k - stride) // 2
    x = x.astype(w.dtype)
    b, t, _ = x.shape
    # per-position projections y[b, t, k, c_out]; the kernel is stored
    # flipped for the old correlation form, so unflip to address taps as
    # torch does: out[t*stride + j] += x[t] @ W_tap[j]
    w = w[::-1]
    if groups == 1:
        y = jnp.einsum("btc,kcd->btkd", x, w)
    elif w.shape[1] == 1:  # depthwise: w [K, 1, C]
        y = x[:, :, None, :] * w[None, :, 0, :][:, None]
    else:
        # grouped: w [K, C_in, C_out/groups] (the documented
        # transpose(2,0,1)[::-1] of torch's [C_in, C_out/g, K]); group gi
        # contracts input slice gi over its own C_out/g output block
        cin_g = w.shape[1] // groups
        xg = x.reshape(b, t, groups, cin_g)
        wg = w.reshape(k, groups, cin_g, w.shape[2])
        y = jnp.einsum("btgc,kgcd->btkgd", xg, wg).reshape(
            b, t, k, groups * w.shape[2]
        )
    c_out = y.shape[-1]
    n_shift = -(-k // stride)
    if n_shift * stride != k:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, n_shift * stride - k), (0, 0)))
    full_len = (t - 1) * stride + k
    buf = jnp.zeros((b, (t + n_shift - 1) * stride, c_out), y.dtype)
    for i in range(n_shift):
        piece = y[:, :, i * stride : (i + 1) * stride].reshape(
            b, t * stride, c_out
        )
        buf = buf.at[:, i * stride : i * stride + t * stride].add(piece)
    out = buf[:, pad : full_len - pad]
    return out + p["b"] if "b" in p else out


def resblock1(x: jax.Array, p, dilations=(1, 3, 5), mask=None) -> jax.Array:
    """HiFiGAN ResBlock1: pairs of dilated convs with leaky-relu.

    ``mask`` [B, T, 1] re-zeros padded positions after every conv so
    bias-activated garbage in the padding can never leak back into the
    valid tail through the 'same'-padded convs — with it, a padded-bucket
    run equals an exact-length run on the valid prefix."""
    for i, d in enumerate(dilations):
        h = jax.nn.leaky_relu(x, 0.1)
        h = conv1d(h, p[f"c1_{i}"], dilation=d)
        if mask is not None:
            h = h * mask
        h = jax.nn.leaky_relu(h, 0.1)
        h = conv1d(h, p[f"c2_{i}"], dilation=1)
        if mask is not None:
            h = h * mask
        x = x + h
    return x


def init_resblock1(key, channels: int, kernel: int = 3, dilations=(1, 3, 5), dtype=jnp.float32):
    ks = jax.random.split(key, 2 * len(dilations))
    p = {}
    for i, _d in enumerate(dilations):
        for j, name in enumerate((f"c1_{i}", f"c2_{i}")):
            p[name] = {
                "w": jax.random.normal(ks[2 * i + j], (kernel, channels, channels), dtype)
                * (kernel * channels) ** -0.5,
                "b": jnp.zeros((channels,), dtype),
            }
    return p


def layer_norm(x: jax.Array, p, eps: float = 1e-5) -> jax.Array:
    """Channel-axis LayerNorm, f32 statistics (torch nn.LayerNorm parity).

    Shared by the VITS (piper) and StyleTTS2 (kokoro) stacks — one
    implementation so numerics fixes cannot drift between models."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mean) * jax.lax.rsqrt(var + eps)) * p["g"] + p["b"]).astype(
        x.dtype
    )


def compress_durations(pred_dur: jax.Array, budget: int) -> jax.Array:
    """Scale integer frame durations [B, T] into a frame budget.

    No-op (bit-identical) when the total fits — torch parity holds for
    every utterance the reference could render. When over budget,
    rounding happens on the CUMULATIVE grid (round the scaled ends, then
    diff): per-duration round()/ceil()/floor-at-1 after scaling can
    overshoot the budget (e.g. every scaled duration at 1.875 rounds to
    2), which would clip n_frames and silently cut the utterance tail —
    the exact failure compression exists to prevent. Monotone ends keep
    the diffs >= 0 and the compressed total lands exactly on the budget.
    """
    total = jnp.sum(pred_dur, axis=1, keepdims=True)
    scale = jnp.minimum(1.0, budget / jnp.maximum(total, 1.0))
    ends_r = jnp.round(jnp.cumsum(pred_dur * scale, axis=1))
    comp = jnp.diff(ends_r, axis=1, prepend=0.0)
    return jnp.where(scale < 1.0, comp, pred_dur)
