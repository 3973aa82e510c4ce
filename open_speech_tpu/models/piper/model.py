"""Piper VITS in JAX — the actual piper inference graph, weight-loadable.

TPU-native counterpart of the reference's onnxruntime Piper backend
(src/tts/backends/piper_backend.py:296 loads PiperVoice ONNX graphs). This
implements the VITS synthesis graph those ONNX files contain, so converted
checkpoints (models/piper/convert.py) reproduce the voices:

  phoneme ids
    → text encoder (relative-position MHA window 4, post-LN, conv FFN)
    → prior stats (m, logs) + stochastic duration predictor
      (DDSConv context + inverse spline flows, noise_scale_w)
    → hard monotonic length regulation (ceil durations)
    → sampled latent z_p → inverse residual-coupling flow (WaveNet blocks)
    → HiFiGAN decoder → waveform.

``length_scale = 1/speed`` matches the reference's speed mapping
(src/tts/backends/piper_backend.py:381). Multi-speaker models condition
every stage on a speaker embedding (``gin`` channels), mirroring piper's
speaker_id_map path (:408-417).

TPU-first shape discipline: phoneme and frame axes are padded to static
buckets (``max_phonemes``/``max_frames``); length regulation is a
searchsorted gather instead of the reference graph's dynamic attention
matrix, so one compiled program serves every request.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.initutil import jit_init

from open_speech_tpu.ops.vocoder import (
    compress_durations,
    conv1d,
    conv_transpose1d,
    layer_norm,
    resblock1,
)

SAMPLE_RATE = 22_050

_MASK_VAL = -1e4  # VITS masked_fill value


@dataclass(frozen=True)
class PiperConfig:
    n_phonemes: int = 256  # piper num_symbols
    hidden: int = 192  # inter_channels == hidden_channels
    ffn_filter: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    rel_window: int = 4
    # stochastic duration predictor
    dp_filter: int = 192
    dp_kernel: int = 3
    dp_flows: int = 4
    dp_dds_layers: int = 3
    dp_bins: int = 10
    dp_tail: float = 5.0
    # residual coupling flow
    flow_layers: int = 4
    wn_kernel: int = 5
    wn_layers: int = 4
    # HiFiGAN decoder
    upsample_rates: tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernels: tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial: int = 512
    resblock_kernels: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    # speakers
    n_speakers: int = 1
    gin: int = 0  # 0 → unconditioned (single speaker)
    # inference defaults (piper voice json "inference" block)
    noise_scale: float = 0.667
    noise_scale_w: float = 0.8
    sample_rate: int = SAMPLE_RATE
    # serving buckets
    max_phonemes: int = 128
    max_frames: int = 512

    @property
    def samples_per_frame(self) -> int:
        r = 1
        for u in self.upsample_rates:
            r *= u
        return r


# ──────────────────────────────────────────────────────────────────────
# init (random weights, same pytree the converter produces)
# ──────────────────────────────────────────────────────────────────────


def _conv_init(key, k, cin, cout, dtype, groups: int = 1):
    w = jax.random.normal(key, (k, cin // groups, cout), dtype)
    return {"w": w * (k * cin) ** -0.5, "b": jnp.zeros((cout,), dtype)}


def _ln_init(c, dtype):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


@jit_init()
def init_piper_params(key, cfg: PiperConfig, dtype=jnp.float32):
    n_keys = 64 + 24 * cfg.n_layers + 40 * cfg.dp_flows + 24 * cfg.flow_layers
    n_keys += 16 * len(cfg.upsample_rates) * (1 + 2 * len(cfg.resblock_kernels) * 3)
    ks = iter(jax.random.split(key, n_keys))
    h, hd = cfg.hidden, cfg.hidden // cfg.n_heads

    params: dict = {
        "emb": jax.random.normal(next(ks), (cfg.n_phonemes, h), dtype) * h**-0.5,
        "enc": [],
        "proj": _conv_init(next(ks), 1, h, 2 * h, dtype),
    }
    for _ in range(cfg.n_layers):
        params["enc"].append(
            {
                "rel_k": jax.random.normal(next(ks), (2 * cfg.rel_window + 1, hd), dtype)
                * hd**-0.5,
                "rel_v": jax.random.normal(next(ks), (2 * cfg.rel_window + 1, hd), dtype)
                * hd**-0.5,
                "q": _conv_init(next(ks), 1, h, h, dtype),
                "k": _conv_init(next(ks), 1, h, h, dtype),
                "v": _conv_init(next(ks), 1, h, h, dtype),
                "o": _conv_init(next(ks), 1, h, h, dtype),
                "ln1": _ln_init(h, dtype),
                "ffn1": _conv_init(next(ks), cfg.kernel_size, h, cfg.ffn_filter, dtype),
                "ffn2": _conv_init(next(ks), cfg.kernel_size, cfg.ffn_filter, h, dtype),
                "ln2": _ln_init(h, dtype),
            }
        )

    def dds(channels):
        return {
            "sep": [
                _conv_init(next(ks), cfg.dp_kernel, channels, channels, dtype, groups=channels)
                for _ in range(cfg.dp_dds_layers)
            ],
            "c1x1": [
                _conv_init(next(ks), 1, channels, channels, dtype)
                for _ in range(cfg.dp_dds_layers)
            ],
            "n1": [_ln_init(channels, dtype) for _ in range(cfg.dp_dds_layers)],
            "n2": [_ln_init(channels, dtype) for _ in range(cfg.dp_dds_layers)],
        }

    params["dp"] = {
        "pre": _conv_init(next(ks), 1, h, cfg.dp_filter, dtype),
        "convs": dds(cfg.dp_filter),
        "proj": _conv_init(next(ks), 1, cfg.dp_filter, cfg.dp_filter, dtype),
        "ea": {"m": jnp.zeros((2,), dtype), "logs": jnp.zeros((2,), dtype)},
        "cf": [
            {
                "pre": _conv_init(next(ks), 1, 1, cfg.dp_filter, dtype),
                "convs": dds(cfg.dp_filter),
                "proj": _conv_init(
                    next(ks), 1, cfg.dp_filter, 3 * cfg.dp_bins - 1, dtype
                ),
            }
            for _ in range(cfg.dp_flows)
        ],
    }
    if cfg.gin:
        params["dp"]["cond"] = _conv_init(next(ks), 1, cfg.gin, cfg.dp_filter, dtype)

    half = h // 2
    params["flow"] = []
    for _ in range(cfg.flow_layers):
        layer = {
            "pre": _conv_init(next(ks), 1, half, h, dtype),
            "in": [
                _conv_init(next(ks), cfg.wn_kernel, h, 2 * h, dtype)
                for _ in range(cfg.wn_layers)
            ],
            "rs": [
                _conv_init(
                    next(ks), 1, h, 2 * h if j < cfg.wn_layers - 1 else h, dtype
                )
                for j in range(cfg.wn_layers)
            ],
            "post": _conv_init(next(ks), 1, h, half, dtype),
        }
        # VITS zero-inits the coupling post conv so the flow starts as identity
        layer["post"]["w"] = jnp.zeros_like(layer["post"]["w"])
        if cfg.gin:
            layer["cond"] = _conv_init(
                next(ks), 1, cfg.gin, 2 * h * cfg.wn_layers, dtype
            )
        params["flow"].append(layer)

    ch = cfg.upsample_initial
    dec: dict = {"pre": _conv_init(next(ks), 7, h, ch, dtype), "ups": [], "res": []}
    for u, kk in zip(cfg.upsample_rates, cfg.upsample_kernels):
        cout = ch // 2
        dec["ups"].append(_conv_init(next(ks), kk, ch, cout, dtype))
        stage = []
        for rk, rds in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            blk = {}
            for i, _d in enumerate(rds):
                blk[f"c1_{i}"] = _conv_init(next(ks), rk, cout, cout, dtype)
                blk[f"c2_{i}"] = _conv_init(next(ks), rk, cout, cout, dtype)
            stage.append(blk)
        dec["res"].append(stage)
        ch = cout
    dec["post"] = _conv_init(next(ks), 7, ch, 1, dtype)
    if cfg.gin:
        dec["cond"] = _conv_init(next(ks), 1, cfg.gin, cfg.upsample_initial, dtype)
    params["dec"] = dec

    if cfg.n_speakers > 1:
        params["emb_g"] = (
            jax.random.normal(next(ks), (cfg.n_speakers, cfg.gin), dtype) * 0.1
        )
    return params


# ──────────────────────────────────────────────────────────────────────
# text encoder (VITS attentions.Encoder: post-LN, relative-position MHA)
# ──────────────────────────────────────────────────────────────────────


_ln = layer_norm  # VITS LayerNorm == the shared channel-axis form


def _rel_embed(emb: jax.Array, t: int, window: int) -> jax.Array:
    """Slice/pad the learned relative embeddings [2w+1, d] to [2t-1, d]."""
    pad = max(t - 1 - window, 0)
    start = max(window + 1 - t, 0)
    padded = jnp.pad(emb, ((pad, pad), (0, 0)))
    return padded[start : start + 2 * t - 1]


def _rel_to_abs(x: jax.Array) -> jax.Array:
    """[B, H, T, 2T-1] relative logits → [B, H, T, T] absolute."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, t * 2 * t)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
    return x.reshape(b, h, t + 1, 2 * t - 1)[:, :, :t, t - 1 :]


def _abs_to_rel(x: jax.Array) -> jax.Array:
    """[B, H, T, T] attention → [B, H, T, 2T-1] relative buckets."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t * t + t * (t - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))
    return x.reshape(b, h, t, 2 * t)[:, :, :, 1:]


def _rel_attention(x, lp, cfg: PiperConfig, attn_mask):
    b, t, h = x.shape
    nh, hd = cfg.n_heads, h // cfg.n_heads
    q = conv1d(x, lp["q"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = conv1d(x, lp["k"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = conv1d(x, lp["v"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    scale = hd**-0.5
    scores = jnp.einsum("bhld,bhmd->bhlm", q * scale, k)
    rel_k = _rel_embed(lp["rel_k"], t, cfg.rel_window)
    scores = scores + _rel_to_abs(jnp.einsum("bhld,md->bhlm", q * scale, rel_k))
    scores = jnp.where(attn_mask, scores, _MASK_VAL)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhlm,bhmd->bhld", w, v)
    rel_v = _rel_embed(lp["rel_v"], t, cfg.rel_window)
    out = out + jnp.einsum("bhlm,md->bhld", _abs_to_rel(w), rel_v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, h)
    return conv1d(out, lp["o"])


def text_encoder(params, cfg: PiperConfig, tokens, mask):
    """tokens [B, P] int32, mask [B, P, 1] → (x, m_p, logs_p), all [B, P, ·]."""
    x = params["emb"][tokens] * math.sqrt(cfg.hidden) * mask
    attn_mask = (mask[..., 0][:, None, :, None] * mask[..., 0][:, None, None, :]) > 0
    for lp in params["enc"]:
        y = _rel_attention(x, lp, cfg, attn_mask)
        x = _ln(x + y, lp["ln1"])
        y = conv1d(jax.nn.relu(conv1d(x * mask, lp["ffn1"])) * mask, lp["ffn2"])
        x = _ln(x + y * mask, lp["ln2"])
    x = x * mask
    stats = conv1d(x, params["proj"]) * mask
    m_p, logs_p = stats[..., : cfg.hidden], stats[..., cfg.hidden :]
    return x, m_p, logs_p


# ──────────────────────────────────────────────────────────────────────
# stochastic duration predictor (inverse pass only)
# ──────────────────────────────────────────────────────────────────────


def _dds_conv(cp, x, mask, cfg: PiperConfig, g=None):
    """VITS DDSConv: dilated separable conv stack with channel LN + GELU."""
    c = x.shape[-1]
    if g is not None:
        x = x + g
    for i in range(cfg.dp_dds_layers):
        y = conv1d(x * mask, cp["sep"][i], dilation=cfg.dp_kernel**i, groups=c)
        y = jax.nn.gelu(_ln(y, cp["n1"][i]), approximate=False)
        y = conv1d(y, cp["c1x1"][i])
        y = jax.nn.gelu(_ln(y, cp["n2"][i]), approximate=False)
        x = x + y
    return x * mask


def _rq_spline_inverse(inputs, uw, uh, ud, cfg: PiperConfig):
    """Inverse piecewise rational-quadratic spline with linear tails.

    inputs [B,T]; uw/uh [B,T,bins]; ud [B,T,bins-1]. Constants match VITS
    transforms.py (min bin width/height 1e-3, min derivative 1e-3).
    """
    nb, tail = cfg.dp_bins, cfg.dp_tail
    min_bw = min_bh = min_d = 1e-3
    inside = (inputs >= -tail) & (inputs <= tail)
    x = jnp.clip(inputs, -tail, tail)

    const = math.log(math.exp(1.0 - min_d) - 1.0)
    ud = jnp.pad(ud, ((0, 0), (0, 0), (1, 1)), constant_values=const)

    widths = jax.nn.softmax(uw, axis=-1)
    widths = min_bw + (1.0 - min_bw * nb) * widths
    cumw = jnp.pad(jnp.cumsum(widths, -1), ((0, 0), (0, 0), (1, 0)))
    cumw = 2.0 * tail * cumw - tail
    cumw = cumw.at[..., 0].set(-tail).at[..., -1].set(tail)
    widths = cumw[..., 1:] - cumw[..., :-1]

    derivs = min_d + jax.nn.softplus(ud)

    heights = jax.nn.softmax(uh, axis=-1)
    heights = min_bh + (1.0 - min_bh * nb) * heights
    cumh = jnp.pad(jnp.cumsum(heights, -1), ((0, 0), (0, 0), (1, 0)))
    cumh = 2.0 * tail * cumh - tail
    cumh = cumh.at[..., 0].set(-tail).at[..., -1].set(tail)
    heights = cumh[..., 1:] - cumh[..., :-1]

    # bucket by heights (inverse direction), torch: sum(x >= cum) - 1
    located = cumh.at[..., -1].add(1e-6)
    idx = jnp.sum(x[..., None] >= located, axis=-1) - 1
    idx = jnp.clip(idx, 0, nb - 1)[..., None]

    in_cw = jnp.take_along_axis(cumw, idx, -1)[..., 0]
    in_w = jnp.take_along_axis(widths, idx, -1)[..., 0]
    in_ch = jnp.take_along_axis(cumh, idx, -1)[..., 0]
    in_h = jnp.take_along_axis(heights, idx, -1)[..., 0]
    delta = jnp.take_along_axis(heights / widths, idx, -1)[..., 0]
    d0 = jnp.take_along_axis(derivs, idx, -1)[..., 0]
    d1 = jnp.take_along_axis(derivs, idx + 1, -1)[..., 0]

    dy = x - in_ch
    a = dy * (d0 + d1 - 2.0 * delta) + in_h * (delta - d0)
    b = in_h * d0 - dy * (d0 + d1 - 2.0 * delta)
    c = -delta * dy
    disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    root = 2.0 * c / (-b - jnp.sqrt(disc))
    return jnp.where(inside, root * in_w + in_cw, inputs)


def _conv_flow_inverse(fp, z, mask, g, cfg: PiperConfig):
    x0, x1 = z[..., 0:1], z[..., 1:2]
    h = conv1d(x0, fp["pre"])
    h = _dds_conv(fp["convs"], h, mask, cfg, g=g)
    h = conv1d(h, fp["proj"]) * mask
    s = cfg.dp_filter**-0.5
    uw = h[..., : cfg.dp_bins] * s
    uh = h[..., cfg.dp_bins : 2 * cfg.dp_bins] * s
    ud = h[..., 2 * cfg.dp_bins :]
    x1 = _rq_spline_inverse(x1[..., 0], uw, uh, ud, cfg)[..., None]
    return jnp.concatenate([x0, x1], axis=-1) * mask


def sdp_log_durations(params, cfg: PiperConfig, x, mask, g_vec, noise):
    """Inverse SDP: log durations [B, P, 1] from encoder output + noise.

    noise [B, P, 2], already scaled by noise_scale_w. Flow order mirrors
    VITS inference: reversed(flows)[:-2] + [ElementwiseAffine] — i.e. the
    first ConvFlow is unused ("remove a useless vflow").
    """
    dp = params["dp"]
    h = conv1d(x, dp["pre"])
    if g_vec is not None:
        h = h + _cond(g_vec, dp["cond"])
    h = _dds_conv(dp["convs"], h, mask, cfg)
    h = conv1d(h, dp["proj"]) * mask

    z = noise
    for i in reversed(range(1, cfg.dp_flows)):
        z = z[..., ::-1]  # Flip
        z = _conv_flow_inverse(dp["cf"][i], z, mask, h, cfg)
    z = z[..., ::-1]  # final Flip before the ElementwiseAffine
    z = (z - dp["ea"]["m"]) * jnp.exp(-dp["ea"]["logs"]) * mask
    return z[..., 0:1]


# ──────────────────────────────────────────────────────────────────────
# residual coupling flow + HiFiGAN decoder
# ──────────────────────────────────────────────────────────────────────


def _cond(g_vec, p):
    """Speaker conditioning: 1x1 conv of a constant-in-time vector."""
    return (g_vec @ p["w"][0] + p["b"])[:, None, :]


def _wn(fp, x, mask, g_vec, cfg: PiperConfig):
    h = cfg.hidden
    out = jnp.zeros_like(x)
    g_all = _cond(g_vec, fp["cond"]) if g_vec is not None else None
    for j in range(cfg.wn_layers):
        x_in = conv1d(x, fp["in"][j])
        if g_all is not None:
            x_in = x_in + g_all[..., j * 2 * h : (j + 1) * 2 * h]
        acts = jnp.tanh(x_in[..., :h]) * jax.nn.sigmoid(x_in[..., h:])
        rs = conv1d(acts, fp["rs"][j])
        if j < cfg.wn_layers - 1:
            x = (x + rs[..., :h]) * mask
            out = out + rs[..., h:]
        else:
            out = out + rs
    return out * mask


def flow_inverse(params, cfg: PiperConfig, z, mask, g_vec):
    half = cfg.hidden // 2
    for fp in reversed(params["flow"]):
        z = z[..., ::-1]  # Flip
        x0, x1 = z[..., :half], z[..., half:]
        h = conv1d(x0, fp["pre"]) * mask
        h = _wn(fp, h, mask, g_vec, cfg)
        m = conv1d(h, fp["post"]) * mask
        x1 = (x1 - m) * mask
        z = jnp.concatenate([x0, x1], axis=-1)
    return z


def generator(params, cfg: PiperConfig, z, g_vec, fmask=None):
    """HiFiGAN decoder. ``fmask`` [B, F, 1] marks valid frames: padded-
    bucket runs re-zero after every conv so bias garbage in frames beyond
    n_frames never contaminates the valid audio tail (real piper runs
    exact-length, i.e. sees zero padding there)."""
    dec = params["dec"]
    m = fmask
    x = conv1d(z, dec["pre"])
    if g_vec is not None:
        x = x + _cond(g_vec, dec["cond"])
    if m is not None:
        x = x * m
    for i, (u, kk) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        x = jax.nn.leaky_relu(x, 0.1)
        x = conv_transpose1d(x, dec["ups"][i], u, pad=(kk - u) // 2)
        if m is not None:
            m = jnp.repeat(m, u, axis=1)
            x = x * m
        acc = None
        for j, rds in enumerate(cfg.resblock_dilations):
            r = resblock1(x, dec["res"][i][j], dilations=rds, mask=m)
            acc = r if acc is None else acc + r
        x = acc / len(cfg.resblock_kernels)
    x = jax.nn.leaky_relu(x, 0.01)  # torch F.leaky_relu default slope
    return jnp.tanh(conv1d(x, dec["post"]))[..., 0]


# ──────────────────────────────────────────────────────────────────────
# full inference
# ──────────────────────────────────────────────────────────────────────


@partial(jax.jit, static_argnames=("cfg",))
def synthesize_vits(
    params,
    cfg: PiperConfig,
    phonemes,
    ph_len,
    speaker_id,
    speed,
    rng,
    dp_noise=None,
    z_noise=None,
):
    """VITS inference.

    phonemes [B, max_phonemes]; ph_len [B]; speaker_id [B]; speed [B];
    rng: PRNG key (ignored when explicit ``dp_noise`` [B, P, 2] /
    ``z_noise`` [B, F, hidden] are given — parity tests inject the same
    noise into the torch oracle). Returns (audio [B, max_frames*spf],
    n_frames [B]).
    """
    b = phonemes.shape[0]
    p_max, f_max = cfg.max_phonemes, cfg.max_frames
    mask = (jnp.arange(p_max)[None, :] < ph_len[:, None]).astype(jnp.float32)[
        ..., None
    ]

    g_vec = params["emb_g"][speaker_id] if "emb_g" in params else None

    x, m_p, logs_p = text_encoder(params, cfg, phonemes, mask)

    k1, k2 = jax.random.split(rng)
    if dp_noise is None:
        dp_noise = jax.random.normal(k1, (b, p_max, 2)) * cfg.noise_scale_w
    logw = sdp_log_durations(params, cfg, x, mask, g_vec, dp_noise)
    w = jnp.exp(logw) * mask / speed[:, None, None]  # length_scale = 1/speed
    w_ceil = jnp.ceil(w)[..., 0]  # [B, P]
    # compress over-long utterances into the frame bucket instead of
    # truncating (no-op when they fit; masked rows stay zero); cumulative
    # rounding — per-duration ceil() after scaling strictly overshoots
    # the budget and would clip the utterance tail (see
    # ops.vocoder.compress_durations, the shared scheme)
    w_ceil = compress_durations(w_ceil, f_max)
    ends = jnp.cumsum(w_ceil, axis=1)
    n_frames = jnp.clip(ends[:, -1].astype(jnp.int32), 1, f_max)

    # hard monotonic alignment: frame t belongs to the phoneme whose
    # cumulative duration first exceeds t (VITS generate_path semantics)
    t_pos = jnp.arange(f_max, dtype=jnp.float32) + 0.5
    idx = jax.vmap(lambda e: jnp.searchsorted(e, t_pos))(ends)
    idx = jnp.clip(idx, 0, jnp.maximum(ph_len[:, None] - 1, 0))
    m_f = jnp.take_along_axis(m_p, idx[..., None], axis=1)
    logs_f = jnp.take_along_axis(logs_p, idx[..., None], axis=1)
    fmask = (jnp.arange(f_max)[None, :] < n_frames[:, None]).astype(jnp.float32)[
        ..., None
    ]

    if z_noise is None:
        z_noise = jax.random.normal(k2, m_f.shape)
    z_p = m_f + z_noise * jnp.exp(logs_f) * cfg.noise_scale
    z = flow_inverse(params, cfg, z_p, fmask, g_vec)
    audio = generator(params, cfg, z * fmask, g_vec, fmask)
    return audio, n_frames
