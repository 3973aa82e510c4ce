"""Kokoro-82M in JAX — the actual KModel graph, weight-loadable.

TPU-native counterpart of the reference's torch Kokoro backend
(src/tts/backends/kokoro.py:194-212 loads hexgrad KPipeline). This is the
real kokoro architecture (StyleTTS2-derived), not a sketch, so converted
checkpoints (models/kokoro/convert.py) reproduce the shipped voices:

  phoneme ids
    → PL-BERT (ALBERT: factorized 128-dim embeddings, one shared
      768-wide transformer layer iterated 12×) → linear to 512
    → prosody predictor: style-conditioned DurationEncoder (biLSTM +
      AdaLayerNorm pairs), duration head (sigmoid-sum over 50 bins),
      shared biLSTM + AdaIN residual stacks for F0/energy at 2× frames
    → text encoder (emb + 3 weight-normed convs + biLSTM)
    → hard alignment expansion (repeat-interleave durations)
    → ISTFTNet decoder: AdaIN residual encode/decode with F0/N/asr
      residual injection, then a harmonic-source generator (sine
      harmonics from F0 → STFT features summed into upsample stages,
      snake activations) → exp/sin spectrum → inverse STFT.

Voice identity is a 256-dim reference vector (first 128 decoder style,
last 128 prosody style), selected per utterance length from the voice
pack — blending stays a weighted vector average (reference
src/tts/backends/kokoro.py:289-308).

TPU-first shape discipline: phoneme/frame axes are padded to static
buckets; every time-dependent statistic (instance norms, LSTM reversal,
ISTFT normalization) is computed under an explicit validity mask so one
compiled program serves all lengths and matches the reference's
exact-length math on the valid prefix.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.initutil import jit_init

from open_speech_tpu.ops.vocoder import (
    compress_durations,
    conv1d,
    conv_transpose1d,
    layer_norm,
)

SAMPLE_RATE = 24_000


@dataclass(frozen=True)
class KokoroConfig:
    n_symbols: int = 178
    # PL-BERT (ALBERT)
    plbert_emb: int = 128
    plbert_hidden: int = 768
    plbert_heads: int = 12
    plbert_interm: int = 2048
    plbert_layers: int = 12
    max_positions: int = 512
    # prosody predictor / text encoder
    hidden: int = 512
    style_dim: int = 128  # per-component; the full voice vector is 2×this
    max_dur: int = 50
    text_kernel: int = 5
    text_depth: int = 3
    dur_layers: int = 3
    # istftnet decoder
    dec_mid: int = 1024
    dec_blocks: int = 4  # decode stack depth (last block upsamples)
    asr_res_dim: int = 64
    upsample_rates: tuple[int, ...] = (10, 6)
    upsample_kernels: tuple[int, ...] = (20, 12)
    resblock_kernels: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    noise_res_kernels: tuple[int, ...] = (7, 11)
    gen_n_fft: int = 20
    gen_hop: int = 5
    harmonics: int = 8
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 10.0
    sample_rate: int = SAMPLE_RATE
    # serving buckets (alignment frames; 1 frame = 25 ms at 24 kHz)
    max_phonemes: int = 256
    max_frames: int = 480

    @property
    def upsample_total(self) -> int:
        r = 2  # predictor F0 path runs at 2× alignment frames
        for u in self.upsample_rates:
            r *= u
        return r * self.gen_hop

    @property
    def samples_per_frame(self) -> int:
        return self.upsample_total  # 600 for (10,6)×5

    @property
    def voice_dim(self) -> int:
        return 2 * self.style_dim


# ──────────────────────────────────────────────────────────────────────
# shared primitives
# ──────────────────────────────────────────────────────────────────────


# shared duration/norm primitives live in ops/vocoder (piper uses the same
# scheme); re-exported here because callers/tests import them from this module
_ln = layer_norm


def _linear(x, p):
    return x @ p["w"] + p["b"]


def _masked_instance_norm(x, mask, eps=1e-5):
    """InstanceNorm1d statistics over valid time positions only.

    x [B, T, C]; mask [B, T, 1]. Matches torch's exact-length instance norm
    on the valid prefix. Statistics always accumulate in f32 — bf16 sums
    over hundreds of frames lose the variance.
    """
    dt = x.dtype
    x = x.astype(jnp.float32)
    cnt = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    mean = (x * mask).sum(axis=1, keepdims=True) / cnt
    var = (((x - mean) * mask) ** 2).sum(axis=1, keepdims=True) / cnt
    return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(dt)


def _adain(x, style, p, mask):
    """AdaIN1d: masked instance norm + style affine; output re-masked."""
    gb = _linear(style, p)  # [B, 2C]
    c = x.shape[-1]
    gamma, beta = gb[:, None, :c], gb[:, None, c:]
    xn = _masked_instance_norm(x, mask)
    return ((1.0 + gamma) * xn + beta) * mask


def _snake(x, alpha):
    """Snake activation x + sin²(αx)/α (istftnet AdaINResBlock1)."""
    return x + (1.0 / alpha) * jnp.sin(alpha * x) ** 2


def _lstm_scan(p, x):
    """Unidirectional LSTM over [B, T, In] → [B, T, H] (torch gate order)."""
    b, _, _ = x.shape
    hdim = p["wh"].shape[0]
    h0 = jnp.zeros((b, hdim), x.dtype)
    c0 = jnp.zeros((b, hdim), x.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt @ p["wi"] + h @ p["wh"] + p["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def bilstm(p, x, lengths):
    """Bidirectional LSTM with per-row valid lengths (pack_padded semantics).

    x [B, T, In]; lengths [B] → [B, T, 2H], zero beyond each row's length.
    """
    t = x.shape[1]
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)[..., None]
    fwd = _lstm_scan(p["fw"], x * mask)
    # reverse each row within its valid length, scan, un-reverse
    idx = jnp.clip(lengths[:, None] - 1 - jnp.arange(t)[None, :], 0, t - 1)
    xr = jnp.take_along_axis(x * mask, idx[..., None], axis=1)
    bwd_r = _lstm_scan(p["bw"], xr)
    bwd = jnp.take_along_axis(bwd_r, idx[..., None], axis=1)
    return jnp.concatenate([fwd, bwd], axis=-1) * mask


# ──────────────────────────────────────────────────────────────────────
# PL-BERT (ALBERT)
# ──────────────────────────────────────────────────────────────────────


def albert_encode(params, cfg: KokoroConfig, tokens, mask):
    """ALBERT last hidden state. tokens [B, T]; mask [B, T, 1] → [B, T, 768]."""
    bp = params["bert"]
    t = tokens.shape[1]
    emb = (
        bp["word_emb"][tokens]
        + bp["pos_emb"][jnp.arange(t)][None]
        + bp["type_emb"][0][None, None]
    )
    h = _ln(emb, bp["emb_ln"], eps=1e-12)
    h = _linear(h, bp["emb_map"])  # [B, T, 768]

    nh = cfg.plbert_heads
    hd = cfg.plbert_hidden // nh
    add_mask = (1.0 - mask[..., 0])[:, None, None, :] * -1e9  # [B,1,1,T]

    for _ in range(cfg.plbert_layers):  # one shared layer, iterated
        b = h.shape[0]
        q = _linear(h, bp["q"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = _linear(h, bp["k"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = _linear(h, bp["v"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k) * hd**-0.5 + add_mask
        ctx = jnp.einsum("bhlm,bhmd->bhld", jax.nn.softmax(scores, -1), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, cfg.plbert_hidden)
        h = _ln(h + _linear(ctx, bp["att_o"]), bp["att_ln"], eps=1e-12)
        f = jax.nn.gelu(_linear(h, bp["ffn"]), approximate=True)  # gelu_new
        h = _ln(h + _linear(f, bp["ffn_o"]), bp["out_ln"], eps=1e-12)
    return h


# ──────────────────────────────────────────────────────────────────────
# text encoder (StyleTTS2 TextEncoder)
# ──────────────────────────────────────────────────────────────────────


def text_encode(params, cfg: KokoroConfig, tokens, lengths, mask):
    te = params["text_enc"]
    x = te["emb"][tokens] * mask
    for blk in te["cnn"]:
        x = conv1d(x, blk["conv"])
        x = _ln(x, blk["ln"])
        x = jax.nn.leaky_relu(x, 0.2) * mask
    return bilstm(te["lstm"], x, lengths)  # [B, T, 512]


# ──────────────────────────────────────────────────────────────────────
# prosody predictor
# ──────────────────────────────────────────────────────────────────────


def _adaln(x, style, p):
    """AdaLayerNorm: LN without affine, then style-predicted (1+γ)·x+β."""
    gb = _linear(style, p)  # [B, 2C]
    c = x.shape[-1]
    gamma, beta = gb[:, None, :c], gb[:, None, c:]
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    xn = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return ((1.0 + gamma) * xn + beta).astype(x.dtype)


def duration_encode(params, cfg: KokoroConfig, d_en, style, lengths, mask):
    """DurationEncoder: [biLSTM(+style), AdaLayerNorm] pairs.

    d_en [B, T, 512]; style [B, 128] → [B, T, 512+128].
    """
    pe = params["pred"]
    t = d_en.shape[1]
    s_seq = jnp.tile(style[:, None, :], (1, t, 1))
    x = jnp.concatenate([d_en, s_seq], axis=-1) * mask
    for layer in pe["dur_enc"]:
        x = bilstm(layer["lstm"], x, lengths)  # [B, T, 512]
        x = _adaln(x, style, layer["adaln"])
        x = jnp.concatenate([x, s_seq], axis=-1) * mask
    return x  # [B, T, 640]


def _adain_res_blk(x, style, p, mask, upsample: bool = False):
    """StyleTTS2 AdainResBlk1d (leaky-relu 0.2, /sqrt(2) merge)."""
    # shortcut
    sc = x
    if upsample:
        sc = jnp.repeat(sc, 2, axis=1)  # nearest 2× upsample
    if "sc" in p:
        sc = conv1d(sc, p["sc"])
    # residual
    h = _adain(x, style, p["n1"], mask)
    h = jax.nn.leaky_relu(h, 0.2)
    if upsample:
        # depthwise ConvTranspose1d(k=3, stride=2, pad=1, output_pad=1)
        c = h.shape[-1]
        h = jax.lax.conv_general_dilated(
            h.astype(p["pool"]["w"].dtype), p["pool"]["w"],
            window_strides=(1,), padding=[(1, 2)],
            lhs_dilation=(2,), dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=c,
        ) + p["pool"]["b"]
        mask = jnp.repeat(mask, 2, axis=1)
    h = conv1d(h, p["c1"]) * mask
    h = _adain(h, style, p["n2"], mask)
    h = jax.nn.leaky_relu(h, 0.2)
    h = conv1d(h, p["c2"]) * mask
    return (h + sc * mask) / math.sqrt(2.0), mask


def f0n_predict(params, cfg: KokoroConfig, en, style, frames):
    """F0/energy curves at 2× alignment frames. en [B, F, 640] → two [B, 2F]."""
    pe = params["pred"]
    fmask = (
        jnp.arange(en.shape[1])[None, :] < frames[:, None]
    ).astype(jnp.float32)[..., None]
    x = bilstm(pe["shared"], en, frames)  # [B, F, 512]

    def head(blocks, proj):
        h, m = x, fmask
        h, m = _adain_res_blk(h, style, blocks[0], m)
        h, m = _adain_res_blk(h, style, blocks[1], m, upsample=True)
        h, m = _adain_res_blk(h, style, blocks[2], m)
        return conv1d(h, proj)[..., 0] * m[..., 0]  # [B, 2F]

    return head(pe["F0"], pe["F0_proj"]), head(pe["N"], pe["N_proj"])


# ──────────────────────────────────────────────────────────────────────
# istftnet decoder
# ──────────────────────────────────────────────────────────────────────


def _gen_res_block(x, style, p, mask, dilations):
    """istftnet AdaINResBlock1 with snake activations (kernel size is
    carried by the conv weights themselves)."""
    for i, d in enumerate(dilations):
        h = _adain(x, style, p["ad1"][i], mask)
        h = _snake(h, p["a1"][i]) * mask
        h = conv1d(h, p["c1"][i], dilation=d) * mask
        h = _adain(h, style, p["ad2"][i], mask)
        h = _snake(h, p["a2"][i]) * mask
        h = conv1d(h, p["c2"][i]) * mask
        x = x + h
    return x


def _stft_mag_phase(x, n_fft, hop):
    """torch.stft(center=True, reflect) magnitude+phase. x [B, S]."""
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (xp.shape[1] - n_fft) // hop + 1
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = xp[:, idx] * np.hanning(n_fft + 1)[:-1].astype(np.float32)
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    re = frames @ jnp.asarray(np.cos(ang), jnp.float32)
    im = frames @ jnp.asarray(-np.sin(ang), jnp.float32)
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    phase = jnp.arctan2(im, re)
    return mag, phase  # [B, F, bins]


def _istft(mag, phase, n_fft, hop, frame_mask):
    """torch.istft(center=True) with masked window normalization.

    Frame synthesis shares ops.vocoder's cached inverse-DFT basis; the
    overlap-add here differs from ops.vocoder.istft in masking dead frames
    out of the window-square normalization (batched variable length) and in
    the (T-1)·hop trim torch.istft uses."""
    from open_speech_tpu.ops.vocoder import _synthesis_basis

    basis, window = _synthesis_basis(n_fft, hop)
    re = mag * jnp.cos(phase) * frame_mask
    im = mag * jnp.sin(phase) * frame_mask
    spec = jnp.concatenate([re, im], axis=-1)  # [B, T, 2*n_bins]
    frames = (spec @ jnp.asarray(basis)) * window

    b, t, _ = frames.shape
    kernel = jnp.asarray(np.eye(n_fft, dtype=np.float32)[::-1].copy()[:, :, None])
    ola = jax.lax.conv_transpose(
        frames, kernel, strides=(hop,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[..., 0]
    wsq = (jnp.ones((b, t, 1)) * frame_mask) * (window**2)[None, None, :]
    norm = jax.lax.conv_transpose(
        wsq, kernel, strides=(hop,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[..., 0]
    out = ola / jnp.maximum(norm, 1e-9)
    pad = n_fft // 2
    return out[:, pad : pad + (t - 1) * hop]  # [B, (T-1)*hop]


def harmonic_source(params, cfg: KokoroConfig, f0_curve, rand_phase, sine_noise):
    """SourceModuleHnNSF: F0 → merged harmonic sine source [B, S].

    f0_curve [B, 2F] (Hz); rand_phase [B, H+1] initial phases (0 for the
    fundamental); sine_noise [B, S, H+1].
    """
    up = cfg.upsample_total // 2  # samples per 2F-frame
    nh = cfg.harmonics + 1
    # cumulative phase needs f32: bf16 loses the fractional cycle count
    f0_curve = f0_curve.astype(jnp.float32)
    f0 = jnp.repeat(f0_curve, up, axis=1)[..., None]  # nearest upsample [B,S,1]
    fn = f0 * jnp.arange(1, nh + 1, dtype=jnp.float32)[None, None, :]
    rad = (fn / cfg.sample_rate) % 1.0
    rad = rad.at[:, 0, :].add(rand_phase)
    # linear downsample by `up`, cumsum phase, linear upsample back
    b, s, _ = rad.shape
    # F.interpolate(mode='linear', align_corners=False): half-pixel linear,
    # no antialiasing (jax.image.resize antialiases by default — disable)
    rad_d = jax.image.resize(rad, (b, s // up, nh), method="linear", antialias=False)
    phase = jnp.cumsum(rad_d, axis=1) * 2.0 * np.pi
    phase = jax.image.resize(phase * up, (b, s, nh), method="linear", antialias=False)
    sines = jnp.sin(phase)
    uv = (f0 > cfg.voiced_threshold).astype(jnp.float32)
    sine_waves = sines * cfg.sine_amp
    noise_amp = uv * cfg.noise_std + (1.0 - uv) * cfg.sine_amp / 3.0
    sine_waves = sine_waves * uv + noise_amp * sine_noise
    merged = jnp.tanh(_linear(sine_waves, params["dec"]["gen"]["src_linear"]))
    return merged[..., 0]  # [B, S]


def decode_audio(params, cfg: KokoroConfig, asr, f0_curve, n_curve, style, frames):
    """istftnet Decoder: asr [B, F, 512], curves [B, 2F], style [B, 128]."""
    dp = params["dec"]
    f_max = asr.shape[1]
    amask = (jnp.arange(f_max)[None, :] < frames[:, None]).astype(jnp.float32)[
        ..., None
    ]
    mask2 = jnp.repeat(amask, 2, axis=1)

    f0 = conv1d(f0_curve[..., None] * mask2, dp["f0_conv"], stride=2) * amask
    n = conv1d(n_curve[..., None] * mask2, dp["n_conv"], stride=2) * amask
    x = jnp.concatenate([asr * amask, f0, n], axis=-1)
    x, _ = _adain_res_blk(x, style, dp["encode"], amask)
    asr_res = conv1d(asr * amask, dp["asr_res"]) * amask
    res = True
    m = amask
    for i, blk in enumerate(dp["decode"]):
        if res:
            x = jnp.concatenate([x, asr_res, f0, n], axis=-1)
        up = i == len(dp["decode"]) - 1
        x, m = _adain_res_blk(x, style, blk, m, upsample=up)
        if up:
            res = False
    return x, m  # [B, 2F, 512], mask


def _gen_stack(params, cfg: KokoroConfig, x, style, har0, har1, m, first: bool):
    """istftnet Generator body over an x window.

    x [B, T, C] at the decode frame rate with validity mask ``m`` [B, T, 1];
    ``har0`` is the harmonic STFT-feature window in pre-pad alignment (fed
    to the strided intermediate noise convs), ``har1`` the window in padded
    alignment for the final stage. ``first=True`` applies the stream-start
    ReflectionPad1d((1,0)); interior blocks instead receive ``har1`` offset
    by +1 frame so block outputs land on the same global sample grid.
    """
    gp = params["dec"]["gen"]
    nk = len(cfg.resblock_kernels)
    n_ups = len(cfg.upsample_rates)
    for i, (u, kk) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        x = jax.nn.leaky_relu(x, 0.1) * m
        stride_f0 = 1
        for r in cfg.upsample_rates[i + 1 :]:
            stride_f0 *= r
        if i + 1 < n_ups:
            # torch: Conv1d(22, c, k=2*stride_f0, stride=stride_f0, pad=stride_f0//2)
            x_src = conv1d(
                har0, gp["noise_convs"][i],
                stride=stride_f0, pad=stride_f0 // 2,
            )
        else:
            x_src = conv1d(har1, gp["noise_convs"][i])
        x = conv_transpose1d(x, gp["ups"][i], u, pad=(kk - u) // 2)
        m = jnp.repeat(m, u, axis=1)
        if i == n_ups - 1 and first:
            # ReflectionPad1d((1, 0)); har frames = samples/hop + 1
            x = jnp.concatenate([x[:, 1:2], x], axis=1)
            m = jnp.concatenate([m[:, :1], m], axis=1)
        x_src = x_src[:, : x.shape[1]]
        src_m = m[:, : x_src.shape[1]]
        x_src = _gen_res_block(
            x_src, style, gp["noise_res"][i], src_m, (1, 3, 5)
        )
        pad_len = x.shape[1] - x_src.shape[1]
        if pad_len:
            x_src = jnp.pad(x_src, ((0, 0), (0, pad_len), (0, 0)))
        x = (x + x_src) * m
        acc = None
        # nk (= len(resblock_kernels)) is the block count per stage; the
        # dilations tuple may be longer when a checkpoint-inferred config
        # shrinks the kernel list, so index it rather than enumerate it
        for j in range(nk):
            r = _gen_res_block(
                x, style, gp["res"][i * nk + j], m, cfg.resblock_dilations[j]
            )
            acc = r if acc is None else acc + r
        x = acc / nk * m
    x = jax.nn.leaky_relu(x, 0.01) * m
    # spectrum + inverse STFT in f32: exp() and phase wrap are precision-
    # sensitive regardless of the conv compute dtype
    spec_all = conv1d(x, gp["post"]).astype(jnp.float32)
    n_bins = cfg.gen_n_fft // 2 + 1
    mag = jnp.exp(spec_all[..., :n_bins])
    phase = jnp.sin(spec_all[..., n_bins:])
    return _istft(mag, phase, cfg.gen_n_fft, cfg.gen_hop, m)


def har_features(params, cfg: KokoroConfig, f0_curve, rand_phase, sine_noise):
    """Harmonic source → STFT features [B, Fr, n_fft+2] (frame-rate, cheap)."""
    har = harmonic_source(params, cfg, f0_curve, rand_phase, sine_noise)
    har_mag, har_phase = _stft_mag_phase(har, cfg.gen_n_fft, cfg.gen_hop)
    return jnp.concatenate([har_mag, har_phase], axis=-1)


def generate_waveform(
    params, cfg: KokoroConfig, x, style, f0_curve, frames, rand_phase, sine_noise,
    har_feat=None,
):
    """istftnet Generator. x [B, 2F, C]; returns audio [B, 2F*up*hop].

    ``har_feat`` overrides the harmonic-source STFT features (parity tests
    inject torch's, because the ±π phase branch on symmetric bins is
    fp-noise-dependent and phase is consumed as a raw conv feature).
    """
    if har_feat is None:
        har_feat = har_features(params, cfg, f0_curve, rand_phase, sine_noise)
    m = (
        jnp.arange(x.shape[1])[None, :] < 2 * frames[:, None]
    ).astype(jnp.float32)[..., None]
    return _gen_stack(params, cfg, x, style, har_feat, har_feat, m, first=True)


# ──────────────────────────────────────────────────────────────────────
# full pipeline
# ──────────────────────────────────────────────────────────────────────


@partial(jax.jit, static_argnames=("cfg",))
def encode_utterance(params, cfg: KokoroConfig, phonemes, ph_len, style, speed):
    """Front half: durations, alignment, F0/N, asr frames.

    style [B, 2*style_dim] (voice vector: [:128] decoder, [128:] prosody).
    Returns ((asr, f0, n, s_dec), n_frames).
    """
    p_max = cfg.max_phonemes
    mask = (jnp.arange(p_max)[None, :] < ph_len[:, None]).astype(jnp.float32)[
        ..., None
    ]
    s_pred = style[:, cfg.style_dim :]
    s_dec = style[:, : cfg.style_dim]

    bert_h = albert_encode(params, cfg, phonemes, mask)
    d_en = _linear(bert_h, params["bert_encoder"]) * mask  # [B, T, 512]

    d = duration_encode(params, cfg, d_en, s_pred, ph_len, mask)  # [B,T,640]
    x = bilstm(params["pred"]["lstm"], d, ph_len)  # [B, T, 512]
    dur_logits = _linear(x, params["pred"]["dur_proj"])  # [B, T, max_dur]
    duration = jax.nn.sigmoid(dur_logits).sum(-1) / speed[:, None]
    pred_dur = jnp.maximum(jnp.round(duration), 1.0) * mask[..., 0]
    pred_dur = compress_durations(pred_dur, cfg.max_frames) * mask[..., 0]

    ends = jnp.cumsum(pred_dur, axis=1)
    n_frames = jnp.clip(ends[:, -1].astype(jnp.int32), 1, cfg.max_frames)
    t_pos = jnp.arange(cfg.max_frames, dtype=jnp.float32) + 0.5
    idx = jax.vmap(lambda e: jnp.searchsorted(e, t_pos))(ends)
    idx = jnp.clip(idx, 0, jnp.maximum(ph_len[:, None] - 1, 0))

    en = jnp.take_along_axis(d, idx[..., None], axis=1)  # [B, F, 640]
    f0, n = f0n_predict(params, cfg, en, s_pred, n_frames)  # [B, 2F]

    t_en = text_encode(params, cfg, phonemes, ph_len, mask)  # [B, T, 512]
    asr = jnp.take_along_axis(t_en, idx[..., None], axis=1)  # [B, F, 512]
    return (asr, f0, n, s_dec), n_frames


def _source_noise(rng, b: int, nh: int, s_total: int):
    """Harmonic-source randomness: phase offsets + sine dither.

    rng [2] draws batch-shaped (legacy single-key callers); rng [B, 2]
    draws PER ROW so a request's audio is independent of which batch
    bucket it lands in (TTS batcher determinism invariant)."""
    if rng.ndim == 2:
        def draw(k):
            ka, kb = jax.random.split(k)
            rp = jnp.concatenate(
                [jnp.zeros((1,)), jax.random.uniform(ka, (nh - 1,))]
            )
            return rp, jax.random.normal(kb, (s_total, nh))

        return jax.vmap(draw)(rng)
    k1, k2 = jax.random.split(rng)
    rand_phase = jnp.concatenate(
        [jnp.zeros((b, 1)), jax.random.uniform(k1, (b, nh - 1))], axis=1
    )
    return rand_phase, jax.random.normal(k2, (b, s_total, nh))


@partial(jax.jit, static_argnames=("cfg", "wire_i16"))
def vocode(params, cfg: KokoroConfig, g, n_frames, rng, *, wire_i16=False):
    """Back half: istftnet decode + harmonic-source generation.

    ``rng`` may be a single key or per-row keys [B, 2] (same contract as
    ``vocode_streaming``). ``wire_i16=True`` returns int16 PCM — the same
    wire format the streaming paths use (audio leaves the server as
    16-bit PCM anyway), halving the device→host bytes; through a relayed
    chip the transfer, not the FLOPs, dominates batch synthesis wall
    time (measured: 0.14 s device vs 0.26-0.54 s f32 transfer at B=16)."""
    asr, f0, n, s_dec = g
    x, _ = decode_audio(params, cfg, asr, f0, n, s_dec, n_frames)
    b = asr.shape[0]
    nh = cfg.harmonics + 1
    s_total = cfg.max_frames * cfg.samples_per_frame
    rand_phase, sine_noise = _source_noise(rng, b, nh, s_total)
    audio = generate_waveform(
        params, cfg, x, s_dec, f0, n_frames, rand_phase, sine_noise
    )
    return _wire(audio, wire_i16)


def synthesize_frames(params, cfg: KokoroConfig, phonemes, ph_len, style, speed,
                      rng=None):
    """Full synthesis: (audio [B, max_frames*spf], n_frames [B])."""
    g, n_frames = encode_utterance(params, cfg, phonemes, ph_len, style, speed)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    audio = vocode(params, cfg, g, n_frames, rng)
    pad = cfg.max_frames * cfg.samples_per_frame - audio.shape[1]
    if pad > 0:
        audio = jnp.pad(audio, ((0, 0), (0, pad)))
    return audio, n_frames


@partial(jax.jit, static_argnames=("cfg", "nb", "h"))
def _vocode_block_first(params, cfg: KokoroConfig, x, har, style, frames, *,
                        nb: int, h: int):
    """Stream-start generator block: x-frames [0, nb+h), reflect-padded."""
    length = nb + h
    spf2 = cfg.samples_per_frame // 2
    hpx = spf2 // cfg.gen_hop
    xb = x[:, :length]
    har0 = har[:, : length * hpx]
    har1 = har[:, : length * hpx + 1]
    m = (
        jnp.arange(length)[None, :] < 2 * frames[:, None]
    ).astype(jnp.float32)[..., None]
    return _gen_stack(params, cfg, xb, style, har0, har1, m, first=True)


@partial(jax.jit, static_argnames=("cfg", "nb", "h", "wire_i16"))
def _vocode_block_interior(params, cfg: KokoroConfig, x_pad, har_pad, style,
                           frames, a, *, nb: int, h: int,
                           wire_i16: bool = False):
    """Interior generator block: core x-frames [a, a+nb) with halo h.

    ``x_pad``/``har_pad`` are the utterance arrays pre-padded so a fixed
    dynamic_slice never clamps (global x-frame g lives at index g+h; har
    frame f at f + h*hpx). Output samples cover the global range
    [(a-h)*spf2 + hop, (a+nb+h)*spf2) — the caller trims the halo.
    """
    length = nb + 2 * h
    spf2 = cfg.samples_per_frame // 2
    hpx = spf2 // cfg.gen_hop
    xb = jax.lax.dynamic_slice_in_dim(x_pad, a, length, axis=1)
    har0 = jax.lax.dynamic_slice_in_dim(har_pad, a * hpx, length * hpx, axis=1)
    har1 = jax.lax.dynamic_slice_in_dim(
        har_pad, a * hpx + 1, length * hpx, axis=1
    )
    gidx = (a - h) + jnp.arange(length)
    m = (
        (gidx[None, :] >= 0) & (gidx[None, :] < 2 * frames[:, None])
    ).astype(jnp.float32)[..., None]
    return _wire(
        _gen_stack(params, cfg, xb, style, har0, har1, m, first=False),
        wire_i16,
    )


def _wire(audio, i16: bool):
    """Device-side wire format: int16 halves the host transfer (the audio
    leaves the server as 16-bit PCM anyway)."""
    if not i16:
        return audio
    return (jnp.clip(audio, -1.0, 1.0) * 32767.0).astype(jnp.int16)


def _unwire(arr: np.ndarray) -> np.ndarray:
    if arr.dtype == np.int16:
        return (arr.astype(np.float32) / 32767.0)
    return np.asarray(arr, np.float32)


@partial(jax.jit, static_argnames=("cfg", "nb", "h", "wire_i16"))
def _vocode_first(params, cfg: KokoroConfig, g, n_frames, rng, *,
                  nb: int, h: int, wire_i16: bool = False):
    """The TTFA-critical program, and ONLY it: istftnet decode, the
    harmonic source truncated to the first block's sample span, and the
    first generator block — one fused dispatch (through a remote device
    relay the dispatch round-trips, not the FLOPs, dominate first-audio
    latency at batch 1).

    The truncation is bit-exact: threefry draws of a (S, H) normal are a
    prefix of the (S_total, H) draws for the same key (flat row-major
    counter order), the phase cumsum is a prefix scan, and the linear
    down/up resample and reflect-STFT are local — one x-frame of slack
    keeps their edge effects past the last frame the block reads. The
    full-utterance features the interior blocks need are built by
    ``_vocode_rest``, dispatched off the critical path."""
    asr, f0, n, s_dec = g
    x, _ = decode_audio(params, cfg, asr, f0, n, s_dec, n_frames)
    b = asr.shape[0]
    nh = cfg.harmonics + 1
    spf2 = cfg.samples_per_frame // 2
    length = min(nb + h + 1, 2 * cfg.max_frames)  # +1 x-frame of slack
    rand_phase, sine_noise = _source_noise(rng, b, nh, length * spf2)
    har = har_features(
        params, cfg, f0[:, :length], rand_phase, sine_noise
    )
    first = _vocode_block_first(params, cfg, x, har, s_dec, n_frames, nb=nb, h=h)
    return _wire(first, wire_i16), x


@partial(jax.jit, static_argnames=("cfg", "nb", "h"))
def _vocode_rest(params, cfg: KokoroConfig, g, n_frames, rng, x, *,
                 nb: int, h: int):
    """Full-utterance harmonic features + the halo-padded arrays interior
    blocks slice. Dispatched right after ``_vocode_first`` but BEFORE the
    host blocks on the first audio, so its device time hides behind the
    first block's transfer and playback slack instead of adding to TTFA.
    Same rng as ``_vocode_first`` — the shared noise prefix keeps block
    outputs bit-identical to the fused single-program path."""
    asr, f0, n, s_dec = g
    b = asr.shape[0]
    nh = cfg.harmonics + 1
    s_total = cfg.max_frames * cfg.samples_per_frame
    rand_phase, sine_noise = _source_noise(rng, b, nh, s_total)
    har = har_features(params, cfg, f0, rand_phase, sine_noise)
    spf2 = cfg.samples_per_frame // 2
    hpx = spf2 // cfg.gen_hop
    x_pad = jnp.pad(x, ((0, 0), (h, nb + h), (0, 0)))
    har_pad = jnp.pad(har, ((0, 0), (h * hpx, (nb + h) * hpx + 1), (0, 0)))
    return x_pad, har_pad


def vocode_streaming(params, cfg: KokoroConfig, g, n_frames, rng=None,
                     block_frames: int = 64, halo_frames: int = 16,
                     first_block_frames: int | None = None,
                     wire: str = "f32"):
    """Yield audio in blocks with O(block) latency and device memory.

    TPU-first streaming split: the frame-rate passes (istftnet decode,
    harmonic source + its STFT features) run once per utterance — they are
    cheap; the sample-rate generator (the FLOPs and activation memory) runs
    per block over a receptive-field halo, so time-to-first-audio and peak
    memory scale with the block, not the utterance (full-utterance B=64
    activations overflow a v5e's HBM).

    Block outputs land on the exact global sample grid (the stream-start
    ReflectionPad is compensated by a +1 har-frame offset on interior
    blocks). The one approximation: AdaIN statistics inside the generator
    span block+halo instead of the utterance — output is bit-exact vs
    ``vocode`` when the utterance fits one block, and statistically close
    beyond that (bounded in tests).
    """
    asr, f0, n, s_dec = g
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    i16 = wire == "i16"
    spf2 = cfg.samples_per_frame // 2
    nb = 2 * block_frames  # x-frames per interior block
    # the first block can be smaller: TTFA is paid on it, and later blocks
    # only need to keep ahead of real-time playback
    nb1 = 2 * (first_block_frames if first_block_frames else block_frames)
    h = min(2 * halo_frames, min(nb, nb1))
    n2 = 2 * cfg.max_frames
    if n2 < max(nb, nb1) + h:  # tiny frame bucket: single full-window render
        # rng passes through as-is: per-row keys keep the batched==solo
        # determinism invariant on this path too (vocode handles both forms)
        audio = vocode(params, cfg, g, n_frames, rng)
        total_x = int(np.max(np.asarray(n_frames))) * 2
        yield np.asarray(audio[:, : total_x * spf2], np.float32)
        return

    # Dispatch the first block BEFORE reading n_frames back: the program
    # consumes g/n_frames as device arrays, so the host sync (a full relay
    # round-trip after an encode_utterance that usually hasn't finished)
    # would serialize in front of the TTFA-critical dispatch. Reordered,
    # the readback overlaps the first block's device time.
    audio, x = _vocode_first(
        params, cfg, g, n_frames, rng, nb=nb1, h=h, wire_i16=i16
    )
    total_x = int(np.max(np.asarray(n_frames))) * 2
    first_len = min(nb1, total_x)
    yield _unwire(np.asarray(audio[:, : first_len * spf2]))
    if total_x <= nb1:
        return
    # the full-utterance features dispatch only AFTER the first audio is
    # on the host (queueing them earlier puts them ahead of the first
    # block's device->host transfer and re-inflates TTFA); from here they
    # hide behind the first block's playback slack
    x_pad, har_pad = _vocode_rest(params, cfg, g, n_frames, rng, x, nb=nb, h=h)
    a = nb1
    while a < total_x:
        blk = _vocode_block_interior(
            params, cfg, x_pad, har_pad, s_dec, n_frames,
            jnp.int32(a), nb=nb, h=h, wire_i16=i16,
        )
        start = h * spf2 - cfg.gen_hop
        end = start + min(nb, total_x - a) * spf2
        yield _unwire(np.asarray(blk[:, start:end]))
        a += nb


def vocode_blocks(params, cfg: KokoroConfig, g, n_frames, style=None, rng=None,
                  block_frames: int = 64):
    """Yield the utterance in sample blocks (per-sentence streaming).

    Delegates to ``vocode_streaming``: generation itself is blockwise, so
    first-audio latency and device memory are O(block) — the property the
    reference's stream-collapsing postprocess destroyed (SURVEY §3.3).
    ``style`` is accepted for backward compatibility (the decoder style now
    travels inside ``g``).
    """
    yield from vocode_streaming(
        params, cfg, g, n_frames, rng=rng, block_frames=block_frames
    )


# ──────────────────────────────────────────────────────────────────────
# random init (same pytree the converter emits)
# ──────────────────────────────────────────────────────────────────────


def _rand_lin(key, d_in, d_out, dtype):
    return {
        "w": jax.random.normal(key, (d_in, d_out), dtype) * d_in**-0.5,
        "b": jnp.zeros((d_out,), dtype),
    }


def _rand_conv(key, k, cin, cout, dtype, groups=1):
    return {
        "w": jax.random.normal(key, (k, cin // groups, cout), dtype)
        * (k * cin) ** -0.5,
        "b": jnp.zeros((cout,), dtype),
    }


def _rand_lstm(key, d_in, h, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mk = lambda ka, kb: {
        "wi": jax.random.normal(ka, (d_in, 4 * h), dtype) * d_in**-0.5,
        "wh": jax.random.normal(kb, (h, 4 * h), dtype) * h**-0.5,
        "b": jnp.zeros((4 * h,), dtype),
    }
    return {"fw": mk(k1, k2), "bw": mk(k3, k4)}


@jit_init()
def init_kokoro_params(key, cfg: KokoroConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 512))
    h512, sty = cfg.hidden, cfg.style_dim
    H = cfg.plbert_hidden

    def ln(c):
        return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    def adain_blk(cin, cout, upsample=False):
        p = {
            "c1": _rand_conv(next(ks), 3, cin, cout, dtype),
            "c2": _rand_conv(next(ks), 3, cout, cout, dtype),
            "n1": _rand_lin(next(ks), sty, 2 * cin, dtype),
            "n2": _rand_lin(next(ks), sty, 2 * cout, dtype),
        }
        if upsample:
            p["pool"] = _rand_conv(next(ks), 3, cin, cin, dtype, groups=cin)
        if cin != cout:
            p["sc"] = {"w": jax.random.normal(next(ks), (1, cin, cout), dtype) * cin**-0.5}
        return p

    def gen_blk(c, n=3):
        return {
            "c1": [_rand_conv(next(ks), 3, c, c, dtype) for _ in range(n)],
            "c2": [_rand_conv(next(ks), 3, c, c, dtype) for _ in range(n)],
            "ad1": [_rand_lin(next(ks), sty, 2 * c, dtype) for _ in range(n)],
            "ad2": [_rand_lin(next(ks), sty, 2 * c, dtype) for _ in range(n)],
            "a1": [jnp.ones((c,), dtype) for _ in range(n)],
            "a2": [jnp.ones((c,), dtype) for _ in range(n)],
        }

    params: dict = {
        "bert": {
            "word_emb": jax.random.normal(next(ks), (cfg.n_symbols, cfg.plbert_emb), dtype) * 0.02,
            "pos_emb": jax.random.normal(next(ks), (cfg.max_positions, cfg.plbert_emb), dtype) * 0.02,
            "type_emb": jax.random.normal(next(ks), (2, cfg.plbert_emb), dtype) * 0.02,
            "emb_ln": ln(cfg.plbert_emb),
            "emb_map": _rand_lin(next(ks), cfg.plbert_emb, H, dtype),
            "q": _rand_lin(next(ks), H, H, dtype),
            "k": _rand_lin(next(ks), H, H, dtype),
            "v": _rand_lin(next(ks), H, H, dtype),
            "att_o": _rand_lin(next(ks), H, H, dtype),
            "att_ln": ln(H),
            "ffn": _rand_lin(next(ks), H, cfg.plbert_interm, dtype),
            "ffn_o": _rand_lin(next(ks), cfg.plbert_interm, H, dtype),
            "out_ln": ln(H),
        },
        "bert_encoder": _rand_lin(next(ks), H, h512, dtype),
        "pred": {
            "dur_enc": [
                {
                    "lstm": _rand_lstm(next(ks), h512 + sty, h512 // 2, dtype),
                    "adaln": _rand_lin(next(ks), sty, 2 * h512, dtype),
                }
                for _ in range(cfg.dur_layers)
            ],
            "lstm": _rand_lstm(next(ks), h512 + sty, h512 // 2, dtype),
            "dur_proj": _rand_lin(next(ks), h512, cfg.max_dur, dtype),
            "shared": _rand_lstm(next(ks), h512 + sty, h512 // 2, dtype),
            "F0": [
                adain_blk(h512, h512),
                adain_blk(h512, h512 // 2, upsample=True),
                adain_blk(h512 // 2, h512 // 2),
            ],
            "F0_proj": _rand_conv(next(ks), 1, h512 // 2, 1, dtype),
            "N": [
                adain_blk(h512, h512),
                adain_blk(h512, h512 // 2, upsample=True),
                adain_blk(h512 // 2, h512 // 2),
            ],
            "N_proj": _rand_conv(next(ks), 1, h512 // 2, 1, dtype),
        },
        "text_enc": {
            "emb": jax.random.normal(next(ks), (cfg.n_symbols, h512), dtype) * h512**-0.5,
            "cnn": [
                {
                    "conv": _rand_conv(next(ks), cfg.text_kernel, h512, h512, dtype),
                    "ln": ln(h512),
                }
                for _ in range(cfg.text_depth)
            ],
            "lstm": _rand_lstm(next(ks), h512, h512 // 2, dtype),
        },
    }
    mid = cfg.dec_mid
    gen_in = h512
    dec: dict = {
        "encode": adain_blk(h512 + 2, mid),
        "decode": [
            adain_blk(mid + cfg.asr_res_dim + 2, mid)
            for _ in range(cfg.dec_blocks - 1)
        ]
        + [adain_blk(mid + cfg.asr_res_dim + 2, gen_in, upsample=True)],
        "f0_conv": _rand_conv(next(ks), 3, 1, 1, dtype),
        "n_conv": _rand_conv(next(ks), 3, 1, 1, dtype),
        "asr_res": _rand_conv(next(ks), 1, h512, cfg.asr_res_dim, dtype),
    }
    n_feat = cfg.gen_n_fft + 2
    ch = gen_in
    gen: dict = {
        "src_linear": _rand_lin(next(ks), cfg.harmonics + 1, 1, dtype),
        "ups": [],
        "res": [],
        "noise_convs": [],
        "noise_res": [],
    }
    for i, (u, kk) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        cout = ch // 2
        gen["ups"].append(_rand_conv(next(ks), kk, ch, cout, dtype))
        for rk in cfg.resblock_kernels:
            blk = gen_blk(cout)
            # fix conv kernels to rk
            blk["c1"] = [_rand_conv(next(ks), rk, cout, cout, dtype) for _ in range(3)]
            blk["c2"] = [_rand_conv(next(ks), rk, cout, cout, dtype) for _ in range(3)]
            gen["res"].append(blk)
        if i + 1 < len(cfg.upsample_rates):
            stride_f0 = 1
            for r in cfg.upsample_rates[i + 1 :]:
                stride_f0 *= r
            gen["noise_convs"].append(
                _rand_conv(next(ks), 2 * stride_f0, n_feat, cout, dtype)
            )
        else:
            gen["noise_convs"].append(_rand_conv(next(ks), 1, n_feat, cout, dtype))
        nr = gen_blk(cout)
        nrk = cfg.noise_res_kernels[i]
        nr["c1"] = [_rand_conv(next(ks), nrk, cout, cout, dtype) for _ in range(3)]
        nr["c2"] = [_rand_conv(next(ks), nrk, cout, cout, dtype) for _ in range(3)]
        gen["noise_res"].append(nr)
        ch = cout
    gen["post"] = _rand_conv(next(ks), 7, ch, n_feat, dtype)
    dec["gen"] = gen
    params["dec"] = dec
    return params


# Reduced geometry with the full kokoro topology (real upsample/istft
# rates, every module present) for CI and CPU-backend tests: same graph,
# ~100x fewer FLOPs. Selected via OS_KOKORO_GEOMETRY=tiny.
TINY_CONFIG = KokoroConfig(
    plbert_emb=32,
    plbert_hidden=64,
    plbert_heads=4,
    plbert_interm=128,
    plbert_layers=2,
    hidden=64,
    style_dim=16,
    # random-init duration ≈ sigmoid-sum ≈ max_dur/2 frames per phoneme;
    # keep it small so test utterances fit the frame bucket at 0.5x speed
    max_dur=8,
    text_depth=2,
    dur_layers=2,
    dec_mid=96,
    asr_res_dim=16,
    max_phonemes=128,
    max_frames=160,
)


def resolve_kokoro_config() -> KokoroConfig:
    """Serving geometry: kokoro-82M unless OS_KOKORO_GEOMETRY=tiny."""
    import os

    if os.environ.get("OS_KOKORO_GEOMETRY", "").lower() == "tiny":
        return TINY_CONFIG
    return KokoroConfig()


def voice_vector(name: str, voice_dim: int = 256) -> np.ndarray:
    """Deterministic per-voice vector fallback (no checkpoint present).

    ``voice_dim`` is the FULL voice-pack row length — decoder style plus
    prosody style concatenated, i.e. ``cfg.voice_dim == 2 * cfg.style_dim``
    (passing ``cfg.style_dim`` would yield a half-length vector that slices
    into an empty prosody half downstream).

    With a converted voice pack, use models/kokoro/convert.convert_voice_pack
    and select the row for the utterance length instead.
    """
    import hashlib

    seed = int.from_bytes(
        hashlib.sha256(name.encode()).digest()[:4], "little"
    )
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(voice_dim) * 0.1).astype(np.float32)
