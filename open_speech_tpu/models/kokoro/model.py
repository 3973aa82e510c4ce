"""Kokoro-style TTS in JAX: StyleTTS2-lite architecture, ISTFTNet decoder.

TPU-native counterpart of the reference's torch Kokoro backend
(src/tts/backends/kokoro.py:207 loads KPipeline on CUDA). Pipeline:

  phoneme ids -> conv+biLSTM text encoder -> style-conditioned duration
  predictor -> length regulation (searchsorted gather, static frame bucket)
  -> F0/energy predictors -> ISTFTNet generator (2 transposed-conv upsample
  stages x (10,6), multi-receptive-field resblocks, AdaIN style conditioning)
  -> magnitude+phase -> ISTFT (n_fft 20, hop 5) -> 24 kHz waveform.

Matches kokoro-82M's generator geometry (24 kHz, 300 samples/frame) so
converted weights drop into the same shapes; random init keeps every code
path exercisable without weights (none are downloadable in this deployment).

Voice identity is a 256-d style vector; blending is the weighted average of
vectors on device — the semantics of the reference's tensor-pack blend
(src/tts/backends/kokoro.py:289-308).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.vocoder import (
    conv1d,
    conv_transpose1d,
    init_resblock1,
    istft,
    resblock1,
    style_mod,
)
from open_speech_tpu.text.g2p import N_PHONEMES

SAMPLE_RATE = 24_000


@dataclass(frozen=True)
class KokoroConfig:
    n_phonemes: int = N_PHONEMES
    hidden: int = 512
    style_dim: int = 256
    # generator geometry (kokoro-82M ISTFTNet): 10*6 upsample, istft hop 5
    upsample_rates: tuple[int, ...] = (10, 6)
    istft_n_fft: int = 20
    istft_hop: int = 5
    resblock_kernels: tuple[int, ...] = (3, 7, 11)
    max_frames: int = 512  # static frame bucket (512 frames = 6.4 s @ 80 Hz)
    max_phonemes: int = 128

    @property
    def samples_per_frame(self) -> int:
        r = self.istft_hop
        for u in self.upsample_rates:
            r *= u
        return r  # 300 -> 80 frames/s at 24 kHz


def _lin(key, d_in, d_out, dtype):
    return {
        "w": jax.random.normal(key, (d_in, d_out), dtype) * d_in**-0.5,
        "b": jnp.zeros((d_out,), dtype),
    }


def _conv(key, k, cin, cout, dtype):
    return {
        "w": jax.random.normal(key, (k, cin, cout), dtype) * (k * cin) ** -0.5,
        "b": jnp.zeros((cout,), dtype),
    }


def _lstm(key, d_in, hidden, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "wi": jax.random.normal(k1, (d_in, 4 * hidden), dtype) * d_in**-0.5,
        "wh": jax.random.normal(k2, (hidden, 4 * hidden), dtype) * hidden**-0.5,
        "b": jnp.zeros((4 * hidden,), dtype),
    }


def init_kokoro_params(key, cfg: KokoroConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 64))
    h, s = cfg.hidden, cfg.style_dim
    params = {
        "embed": jax.random.normal(next(ks), (cfg.n_phonemes, h), dtype) * 0.02,
        "enc_conv1": _conv(next(ks), 5, h, h, dtype),
        "enc_conv2": _conv(next(ks), 5, h, h, dtype),
        "enc_conv3": _conv(next(ks), 5, h, h, dtype),
        "enc_lstm_f": _lstm(next(ks), h, h // 2, dtype),
        "enc_lstm_b": _lstm(next(ks), h, h // 2, dtype),
        # duration predictor (style-conditioned)
        "dur_conv1": _conv(next(ks), 3, h + s, h // 2, dtype),
        "dur_conv2": _conv(next(ks), 3, h // 2, h // 2, dtype),
        "dur_out": _lin(next(ks), h // 2, 1, dtype),
        # F0 / energy predictors over frames
        "f0_conv1": _conv(next(ks), 3, h, h // 2, dtype),
        "f0_adain": {"w": jax.random.normal(next(ks), (s, h), dtype) * s**-0.5,
                     "b": jnp.zeros((h,), dtype)},
        "f0_out": _lin(next(ks), h // 2, 1, dtype),
        "en_out": _lin(next(ks), h // 2, 1, dtype),
        # generator
        "gen_pre": _conv(next(ks), 7, h + 2, h, dtype),
    }
    ch = h
    for i, _u in enumerate(cfg.upsample_rates):
        cout = ch // 2
        params[f"up_{i}"] = _conv(next(ks), 2 * cfg.upsample_rates[i], ch, cout, dtype)
        params[f"up_adain_{i}"] = {
            "w": jax.random.normal(next(ks), (s, 2 * cout), dtype) * s**-0.5,
            "b": jnp.zeros((2 * cout,), dtype),
        }
        for j, kker in enumerate(cfg.resblock_kernels):
            params[f"res_{i}_{j}"] = init_resblock1(next(ks), cout, kker, dtype=dtype)
        ch = cout
    n_bins = cfg.istft_n_fft // 2 + 1
    params["gen_post"] = _conv(next(ks), 7, ch, 2 * n_bins, dtype)
    return params


def _bilstm(x, pf, pb):
    """x [B, T, D] -> [B, T, 2*hidden] (forward + backward scan)."""

    def cell(p):
        hidden = p["wh"].shape[0]

        def step(carry, xt):
            hx, cx = carry
            gates = xt @ p["wi"] + hx @ p["wh"] + p["b"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * cx + jax.nn.sigmoid(i) * jnp.tanh(g)
            hn = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (hn, c), hn

        return step, hidden

    b = x.shape[0]
    step_f, hid = cell(pf)
    init = (jnp.zeros((b, hid), x.dtype), jnp.zeros((b, hid), x.dtype))
    _, hf = jax.lax.scan(step_f, init, x.transpose(1, 0, 2))
    step_b, _ = cell(pb)
    _, hb = jax.lax.scan(step_b, init, x.transpose(1, 0, 2)[::-1])
    return jnp.concatenate([hf, hb[::-1]], axis=-1).transpose(1, 0, 2)


@partial(jax.jit, static_argnames=("cfg",))
def encode_utterance(params, cfg: KokoroConfig, phonemes, ph_len, style, speed):
    """Text side of synthesis: frame features ready for the vocoder.

    Returns (g [B, max_frames, hidden+2], n_frames [B]) — everything up to
    the generator input, so the vocoder can run incrementally in frame
    blocks for streaming (TTFA = this + one block instead of the full
    utterance).
    """
    b = phonemes.shape[0]
    mask = (jnp.arange(cfg.max_phonemes)[None, :] < ph_len[:, None]).astype(
        jnp.float32
    )

    x = params["embed"][phonemes] * mask[..., None]
    x = jax.nn.relu(conv1d(x, params["enc_conv1"]))
    x = jax.nn.relu(conv1d(x, params["enc_conv2"]))
    x = jax.nn.relu(conv1d(x, params["enc_conv3"]))
    x = _bilstm(x, params["enc_lstm_f"], params["enc_lstm_b"])  # [B, T, h]
    x = x * mask[..., None]

    sty_tiled = jnp.tile(style[:, None, :], (1, cfg.max_phonemes, 1))
    d = jnp.concatenate([x, sty_tiled], axis=-1)
    d = jax.nn.relu(conv1d(d, params["dur_conv1"]))
    d = jax.nn.relu(conv1d(d, params["dur_conv2"]))
    dur = jax.nn.softplus(d @ params["dur_out"]["w"] + params["dur_out"]["b"])[..., 0]
    dur = (1.0 + dur * 8.0) / speed[:, None]
    dur = dur * mask
    total = jnp.sum(dur, axis=1, keepdims=True)
    scale = jnp.minimum(1.0, (cfg.max_frames - 1) / jnp.maximum(total, 1.0))
    dur = dur * scale
    ends = jnp.cumsum(dur, axis=1)
    n_frames = jnp.minimum(
        jnp.ceil(ends[:, -1]).astype(jnp.int32), cfg.max_frames
    )

    frame_pos = jnp.arange(cfg.max_frames, dtype=jnp.float32) + 0.5
    idx = jax.vmap(lambda e: jnp.searchsorted(e, frame_pos))(ends)
    idx = jnp.minimum(idx, ph_len[:, None] - 1)
    frames = jnp.take_along_axis(x, idx[..., None], axis=1)
    fmask = (
        jnp.arange(cfg.max_frames)[None, :] < n_frames[:, None]
    ).astype(jnp.float32)[..., None]
    frames = frames * fmask

    f = jax.nn.relu(conv1d(frames, params["f0_conv1"]))
    f0 = f @ params["f0_out"]["w"] + params["f0_out"]["b"]
    energy = jax.nn.sigmoid(f @ params["en_out"]["w"] + params["en_out"]["b"])
    return jnp.concatenate([frames, f0, energy], axis=-1), n_frames


@partial(jax.jit, static_argnames=("cfg",))
def vocode(params, cfg: KokoroConfig, g, style):
    """ISTFTNet generator: frame features [B, F, hidden+2] -> audio [B, F*spf]."""
    g = conv1d(g, params["gen_pre"])
    for i, u in enumerate(cfg.upsample_rates):
        g = jax.nn.leaky_relu(g, 0.1)
        g = conv_transpose1d(g, params[f"up_{i}"], u)
        g = style_mod(g, style, params[f"up_adain_{i}"])
        acc = None
        for j in range(len(cfg.resblock_kernels)):
            r = resblock1(g, params[f"res_{i}_{j}"])
            acc = r if acc is None else acc + r
        g = acc / len(cfg.resblock_kernels)
    g = jax.nn.leaky_relu(g, 0.1)
    g = conv1d(g, params["gen_post"])
    n_bins = cfg.istft_n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(g[..., :n_bins], -8.0, 4.0))
    phase = jnp.pi * jnp.tanh(g[..., n_bins:])
    return istft(mag, phase, cfg.istft_n_fft, cfg.istft_hop)


def vocode_blocks(
    params,
    cfg: KokoroConfig,
    g,
    n_frames,
    style,
    block_frames: int = 64,
    overlap: int = 16,
    first_block: int = 24,
):
    """Streaming vocoder: yield audio chunks block by block.

    Each block carries ``overlap`` context frames on both sides (the conv
    stack's receptive field) which are trimmed from the emitted samples, so
    chunk boundaries are seamless up to the receptive-field approximation.
    Every block is the same static shape -> one compiled program, TTFA = one
    block instead of the whole utterance.
    """
    total = int(np.max(np.asarray(n_frames)))
    spf = cfg.samples_per_frame
    # right padding only: the first block uses the convs' implicit zero
    # padding on the left (explicit zero frames would pass through conv
    # biases and diverge from whole-utterance output at the onset)
    padded = jnp.pad(g, ((0, 0), (0, block_frames + 2 * overlap), (0, 0)))
    start = 0
    # the first block is smaller: TTFA = encode + ~0.3 s of vocoder work
    size = min(first_block, block_frames)
    while start < total:
        window = size + 2 * overlap
        slice_start = max(0, start - overlap)
        left_trim = start - slice_start
        block = jax.lax.dynamic_slice_in_dim(padded, slice_start, window, axis=1)
        audio = vocode(params, cfg, block, style)
        valid = min(size, total - start)
        chunk = audio[:, left_trim * spf : (left_trim + valid) * spf]
        yield np.asarray(chunk, np.float32)
        start += size
        size = block_frames


@partial(jax.jit, static_argnames=("cfg",))
def synthesize_frames(params, cfg: KokoroConfig, phonemes, ph_len, style, speed):
    """Synthesize one utterance bucket.

    phonemes: [B, max_phonemes] int32 (padded); ph_len: [B] valid counts;
    style: [B, style_dim]; speed: [B] float.
    Returns (audio [B, max_frames*samples_per_frame], n_frames [B]).
    """
    b = phonemes.shape[0]
    mask = (jnp.arange(cfg.max_phonemes)[None, :] < ph_len[:, None]).astype(
        jnp.float32
    )

    x = params["embed"][phonemes] * mask[..., None]
    x = jax.nn.relu(conv1d(x, params["enc_conv1"]))
    x = jax.nn.relu(conv1d(x, params["enc_conv2"]))
    x = jax.nn.relu(conv1d(x, params["enc_conv3"]))
    x = _bilstm(x, params["enc_lstm_f"], params["enc_lstm_b"])  # [B, T, h]
    x = x * mask[..., None]

    # durations (frames per phoneme)
    sty_tiled = jnp.tile(style[:, None, :], (1, cfg.max_phonemes, 1))
    d = jnp.concatenate([x, sty_tiled], axis=-1)
    d = jax.nn.relu(conv1d(d, params["dur_conv1"]))
    d = jax.nn.relu(conv1d(d, params["dur_conv2"]))
    dur = jax.nn.softplus(d @ params["dur_out"]["w"] + params["dur_out"]["b"])[..., 0]
    dur = (1.0 + dur * 8.0) / speed[:, None]  # 1..~9 frames per phoneme
    dur = dur * mask
    # cap total at the bucket
    total = jnp.sum(dur, axis=1, keepdims=True)
    scale = jnp.minimum(1.0, (cfg.max_frames - 1) / jnp.maximum(total, 1.0))
    dur = dur * scale
    ends = jnp.cumsum(dur, axis=1)  # [B, T_ph]
    n_frames = jnp.minimum(
        jnp.ceil(ends[:, -1]).astype(jnp.int32), cfg.max_frames
    )

    # length regulation: frame j belongs to phoneme searchsorted(ends, j+0.5)
    frame_pos = jnp.arange(cfg.max_frames, dtype=jnp.float32) + 0.5
    idx = jax.vmap(lambda e: jnp.searchsorted(e, frame_pos))(ends)  # [B, F]
    idx = jnp.minimum(idx, ph_len[:, None] - 1)
    frames = jnp.take_along_axis(x, idx[..., None], axis=1)  # [B, F, h]
    fmask = (
        jnp.arange(cfg.max_frames)[None, :] < n_frames[:, None]
    ).astype(jnp.float32)[..., None]
    frames = frames * fmask

    # F0 / energy
    f = jax.nn.relu(conv1d(frames, params["f0_conv1"]))
    f0 = (f @ params["f0_out"]["w"] + params["f0_out"]["b"])
    energy = jax.nn.sigmoid(f @ params["en_out"]["w"] + params["en_out"]["b"])

    # generator
    g = jnp.concatenate([frames, f0, energy], axis=-1)
    g = conv1d(g, params["gen_pre"])
    for i, u in enumerate(cfg.upsample_rates):
        g = jax.nn.leaky_relu(g, 0.1)
        g = conv_transpose1d(g, params[f"up_{i}"], u)
        g = style_mod(g, style, params[f"up_adain_{i}"])
        acc = None
        for j in range(len(cfg.resblock_kernels)):
            r = resblock1(g, params[f"res_{i}_{j}"])
            acc = r if acc is None else acc + r
        g = acc / len(cfg.resblock_kernels)
    g = jax.nn.leaky_relu(g, 0.1)
    g = conv1d(g, params["gen_post"])  # [B, F*60, 2*n_bins]
    n_bins = cfg.istft_n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(g[..., :n_bins], -8.0, 4.0))
    phase = jnp.pi * jnp.tanh(g[..., n_bins:])
    audio = istft(mag, phase, cfg.istft_n_fft, cfg.istft_hop)
    return audio, n_frames


def voice_vector(name: str, style_dim: int = 256) -> np.ndarray:
    """Deterministic per-voice style vector.

    Stand-in for kokoro's trained voice packs: the same voice name always
    maps to the same vector (so blends/weights behave reproducibly); a
    weight converter replaces this with real pack vectors when present.
    """
    seed = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(style_dim).astype(np.float32)
