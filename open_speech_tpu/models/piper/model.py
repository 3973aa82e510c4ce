"""Piper-style VITS in JAX.

TPU-native counterpart of the reference's onnxruntime Piper backend
(src/tts/backends/piper_backend.py:296 loads PiperVoice ONNX graphs). VITS
inference path:

  phoneme ids -> transformer text encoder -> prior (mu, logs) + duration
  predictor -> length regulation -> sampled latent z -> inverse affine-
  coupling flow -> HiFiGAN decoder (upsample 8*8*2*2 = hop 256) -> waveform.

Geometry follows piper's medium voices (22.05 kHz, 256 samples/frame).
``length_scale = 1/speed`` matches the reference's speed mapping
(src/tts/backends/piper_backend.py:381). Multi-speaker models condition on a
speaker embedding (config ``n_speakers``), mirroring piper's speaker_id_map
path (:408-417).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.attention import mha_reference
from open_speech_tpu.ops.vocoder import (
    conv1d,
    conv_transpose1d,
    init_resblock1,
    resblock1,
)
from open_speech_tpu.text.g2p import N_PHONEMES

SAMPLE_RATE = 22_050


@dataclass(frozen=True)
class PiperConfig:
    n_phonemes: int = N_PHONEMES
    hidden: int = 192
    n_heads: int = 2
    n_layers: int = 2
    n_speakers: int = 1
    speaker_dim: int = 64
    upsample_rates: tuple[int, ...] = (8, 8, 2, 2)
    upsample_initial: int = 256
    resblock_kernels: tuple[int, ...] = (3, 7, 11)
    max_frames: int = 512
    max_phonemes: int = 128
    noise_scale: float = 0.667

    @property
    def samples_per_frame(self) -> int:
        r = 1
        for u in self.upsample_rates:
            r *= u
        return r  # 256


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


def init_piper_params(key, cfg: PiperConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 96))
    h = cfg.hidden
    params: dict = {
        "embed": jax.random.normal(next(ks), (cfg.n_phonemes, h), dtype) * h**-0.5,
        "blocks": [],
        "proj_stats": _conv(next(ks), 1, h, 2 * h, dtype),  # mu, logs
        "dur_conv1": _conv(next(ks), 3, h + cfg.speaker_dim, 256, dtype),
        "dur_conv2": _conv(next(ks), 3, 256, 256, dtype),
        "dur_out": _lin(next(ks), 256, 1, dtype),
        "spk_embed": jax.random.normal(
            next(ks), (max(cfg.n_speakers, 1), cfg.speaker_dim), dtype
        )
        * 0.1,
    }
    for _ in range(cfg.n_layers):
        params["blocks"].append(
            {
                "ln1_g": jnp.ones((h,), jnp.float32),
                "ln1_b": jnp.zeros((h,), jnp.float32),
                "q": _lin(next(ks), h, h, dtype),
                "k": _lin(next(ks), h, h, dtype),
                "v": _lin(next(ks), h, h, dtype),
                "o": _lin(next(ks), h, h, dtype),
                "ln2_g": jnp.ones((h,), jnp.float32),
                "ln2_b": jnp.zeros((h,), jnp.float32),
                "ff1": _conv(next(ks), 3, h, 4 * h, dtype),
                "ff2": _conv(next(ks), 3, 4 * h, h, dtype),
            }
        )
    # flow: 2 affine coupling layers over the latent (split channels)
    for i in range(2):
        params[f"flow_{i}"] = {
            "pre": _conv(next(ks), 1, h // 2 + cfg.speaker_dim, h, dtype),
            "mid": _conv(next(ks), 5, h, h, dtype),
            "post": _conv(next(ks), 1, h, h, dtype),  # shift + log-scale
        }
    # HiFiGAN decoder
    params["gen_pre"] = _conv(next(ks), 7, h, cfg.upsample_initial, dtype)
    ch = cfg.upsample_initial
    for i, u in enumerate(cfg.upsample_rates):
        cout = ch // 2
        params[f"up_{i}"] = _conv(next(ks), 2 * u, ch, cout, dtype)
        for j, kk in enumerate(cfg.resblock_kernels):
            params[f"res_{i}_{j}"] = init_resblock1(next(ks), cout, kk, dtype=dtype)
        ch = cout
    params["gen_post"] = _conv(next(ks), 7, ch, 1, dtype)
    return params


def _ln(x, g, b):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mean) * jax.lax.rsqrt(var + 1e-5)) * g + b).astype(x.dtype)


def _encoder(params, cfg, x, mask):
    h = cfg.hidden
    for bp in params["blocks"]:
        xn = _ln(x, bp["ln1_g"], bp["ln1_b"])
        q = (xn @ bp["q"]["w"] + bp["q"]["b"]).reshape(
            x.shape[0], -1, cfg.n_heads, h // cfg.n_heads
        ).transpose(0, 2, 1, 3)
        k = (xn @ bp["k"]["w"] + bp["k"]["b"]).reshape(
            x.shape[0], -1, cfg.n_heads, h // cfg.n_heads
        ).transpose(0, 2, 1, 3)
        v = (xn @ bp["v"]["w"] + bp["v"]["b"]).reshape(
            x.shape[0], -1, cfg.n_heads, h // cfg.n_heads
        ).transpose(0, 2, 1, 3)
        att = mha_reference(q, k, v)
        att = att.transpose(0, 2, 1, 3).reshape(x.shape[0], -1, h)
        x = x + (att @ bp["o"]["w"] + bp["o"]["b"]) * mask
        xn = _ln(x, bp["ln2_g"], bp["ln2_b"])
        ff = jax.nn.relu(conv1d(xn, bp["ff1"]))
        x = x + conv1d(ff, bp["ff2"]) * mask
    return x


def _flow_inverse(params, cfg, z, spk):
    """Invert the affine coupling stack (inference direction)."""
    h = cfg.hidden
    for i in reversed(range(2)):
        fp = params[f"flow_{i}"]
        z = z[..., ::-1]  # channel flip between layers
        za, zb = z[..., : h // 2], z[..., h // 2 :]
        cond = jnp.concatenate(
            [za, jnp.tile(spk[:, None, :], (1, za.shape[1], 1))], axis=-1
        )
        hmid = jax.nn.relu(conv1d(cond, fp["pre"]))
        hmid = jax.nn.relu(conv1d(hmid, fp["mid"]))
        stats = conv1d(hmid, fp["post"])
        shift, log_scale = stats[..., : h // 2], stats[..., h // 2 :]
        log_scale = jnp.tanh(log_scale)
        zb = (zb - shift) * jnp.exp(-log_scale)
        z = jnp.concatenate([za, zb], axis=-1)
    return z


@partial(jax.jit, static_argnames=("cfg",))
def synthesize_vits(params, cfg: PiperConfig, phonemes, ph_len, speaker_id, speed, rng):
    """VITS inference.

    phonemes [B, max_phonemes]; ph_len [B]; speaker_id [B]; speed [B];
    rng: PRNG key. Returns (audio [B, max_frames*256], n_frames [B]).
    """
    b = phonemes.shape[0]
    mask = (
        jnp.arange(cfg.max_phonemes)[None, :] < ph_len[:, None]
    ).astype(jnp.float32)[..., None]
    spk = params["spk_embed"][speaker_id]  # [B, spk_dim]

    x = params["embed"][phonemes] * mask
    x = _encoder(params, cfg, x, mask)
    stats = conv1d(x, params["proj_stats"])
    mu, logs = stats[..., : cfg.hidden], stats[..., cfg.hidden :]

    # durations (length_scale = 1/speed, reference piper semantics)
    d = jnp.concatenate(
        [x, jnp.tile(spk[:, None, :], (1, cfg.max_phonemes, 1))], axis=-1
    )
    d = jax.nn.relu(conv1d(d, params["dur_conv1"]))
    d = jax.nn.relu(conv1d(d, params["dur_conv2"]))
    dur = jax.nn.softplus(d @ params["dur_out"]["w"] + params["dur_out"]["b"])[..., 0]
    dur = (1.0 + dur * 6.0) / speed[:, None]
    dur = dur * mask[..., 0]
    total = jnp.sum(dur, axis=1, keepdims=True)
    scale = jnp.minimum(1.0, (cfg.max_frames - 1) / jnp.maximum(total, 1.0))
    dur = dur * scale
    ends = jnp.cumsum(dur, axis=1)
    n_frames = jnp.minimum(jnp.ceil(ends[:, -1]).astype(jnp.int32), cfg.max_frames)

    frame_pos = jnp.arange(cfg.max_frames, dtype=jnp.float32) + 0.5
    idx = jax.vmap(lambda e: jnp.searchsorted(e, frame_pos))(ends)
    idx = jnp.minimum(idx, ph_len[:, None] - 1)
    mu_f = jnp.take_along_axis(mu, idx[..., None], axis=1)
    logs_f = jnp.take_along_axis(logs, idx[..., None], axis=1)
    fmask = (
        jnp.arange(cfg.max_frames)[None, :] < n_frames[:, None]
    ).astype(jnp.float32)[..., None]

    noise = jax.random.normal(rng, mu_f.shape, mu_f.dtype)
    z_p = mu_f + noise * jnp.exp(jnp.clip(logs_f, -7.0, 2.0)) * cfg.noise_scale
    z = _flow_inverse(params, cfg, z_p, spk) * fmask

    g = conv1d(z, params["gen_pre"])
    for i, u in enumerate(cfg.upsample_rates):
        g = jax.nn.leaky_relu(g, 0.1)
        g = conv_transpose1d(g, params[f"up_{i}"], u)
        acc = None
        for j in range(len(cfg.resblock_kernels)):
            r = resblock1(g, params[f"res_{i}_{j}"])
            acc = r if acc is None else acc + r
        g = acc / len(cfg.resblock_kernels)
    g = jax.nn.leaky_relu(g, 0.1)
    audio = jnp.tanh(conv1d(g, params["gen_post"]))[..., 0]
    return audio, n_frames
