"""Pocket-TTS in JAX: low-latency TTS with audio-conditioned style.

Fills the reference's pocket-tts slot (src/tts/backends/pocket_tts_backend.py,
torch/optional) and the documented-but-absent Qwen3-TTS voice-clone surface
(docs/QWEN3-TTS-INTEGRATION.md; the API kept ``voice_design`` /
``reference_audio`` / ``clone_transcript`` fields, src/tts/models.py:15-18).

Architecture: the StyleTTS-family generator stack shared with kokoro (text
encoder -> duration/F0 -> ISTFTNet) with the style vector produced by a
*reference encoder* instead of a fixed voice pack:

  - ``style_from_audio``: log-mel of the reference clip -> conv stack ->
    masked mean/std pooling -> style projection (the clone path — any voice
    from a few seconds of WAV);
  - ``style_from_text``: a deterministic text-description embedding (the
    voice_design path);
  - 8 named speakers = 8 fixed style vectors (pocket-tts's speaker set).

Per-voice style vectors are cacheable by the serving layer (reference
pocket-tts caches per-voice prompt state, :127-134).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.initutil import jit_init

from open_speech_tpu.models.kokoro.model import (
    KokoroConfig,
    init_kokoro_params,
    synthesize_frames,
)
from open_speech_tpu.ops.mel import log_mel_spectrogram
from open_speech_tpu.ops.vocoder import conv1d

SAMPLE_RATE = 24_000


@dataclass(frozen=True)
class PocketConfig:
    base: KokoroConfig = KokoroConfig()
    ref_mels: int = 80
    ref_max_frames: int = 800  # 8 s of reference audio @ 100 fps

    @property
    def style_dim(self) -> int:
        return self.base.style_dim

    @property
    def voice_dim(self) -> int:
        # full conditioning vector: decoder style ‖ prosody style
        return self.base.voice_dim

    @property
    def samples_per_frame(self) -> int:
        return self.base.samples_per_frame


@jit_init()
def init_pocket_params(key, cfg: PocketConfig, dtype=jnp.float32):
    k_gen, k_ref1, k_ref2, k_proj, k_spk = jax.random.split(key, 5)
    params = {"gen": init_kokoro_params(k_gen, cfg.base, dtype)}
    params["ref_conv1"] = {
        "w": jax.random.normal(k_ref1, (5, cfg.ref_mels, 128), dtype)
        * (5 * cfg.ref_mels) ** -0.5,
        "b": jnp.zeros((128,), dtype),
    }
    params["ref_conv2"] = {
        "w": jax.random.normal(k_ref2, (5, 128, 128), dtype) * (5 * 128) ** -0.5,
        "b": jnp.zeros((128,), dtype),
    }
    params["ref_proj"] = {
        "w": jax.random.normal(k_proj, (256, cfg.voice_dim), dtype) * 256**-0.5,
        "b": jnp.zeros((cfg.voice_dim,), dtype),
    }
    params["speakers"] = (
        jax.random.normal(k_spk, (8, cfg.voice_dim), dtype) * 0.5
    )
    return params


@partial(jax.jit, static_argnames=("cfg",))
def style_from_audio(params, cfg: PocketConfig, ref_mel, n_frames):
    """Reference clip -> style vector.

    ref_mel: [B, ref_mels, ref_max_frames] (padded log-mel); n_frames: [B].
    """
    x = ref_mel.transpose(0, 2, 1)  # [B, T, mels]
    mask = (
        jnp.arange(cfg.ref_max_frames)[None, :] < n_frames[:, None]
    ).astype(jnp.float32)[..., None]
    h = jax.nn.relu(conv1d(x, params["ref_conv1"])) * mask
    h = jax.nn.relu(conv1d(h, params["ref_conv2"])) * mask
    denom = jnp.maximum(mask.sum(axis=1), 1.0)
    mean = h.sum(axis=1) / denom
    var = (jnp.square(h - mean[:, None, :]) * mask).sum(axis=1) / denom
    stats = jnp.concatenate([mean, jnp.sqrt(var + 1e-5)], axis=-1)  # [B,256]
    return stats @ params["ref_proj"]["w"] + params["ref_proj"]["b"]


def style_from_text(description: str, style_dim: int = 256) -> np.ndarray:
    """voice_design text -> deterministic style vector.

    A trained model maps descriptions through a text encoder; without weights
    this hashes the normalized description so equal prompts give equal voices
    and different prompts differ.
    """
    seed = int.from_bytes(
        hashlib.sha256(description.strip().lower().encode()).digest()[:4],
        "little",
    )
    rng = np.random.default_rng(seed)
    return rng.standard_normal(style_dim).astype(np.float32) * 0.5


def compute_ref_mel(audio_16k: np.ndarray, cfg: PocketConfig):
    """Reference PCM (16 kHz mono float) -> padded log-mel + frame count."""
    hop = 160
    max_samples = cfg.ref_max_frames * hop
    clip = np.asarray(audio_16k, np.float32)[:max_samples]
    n_frames = max(1, len(clip) // hop)
    padded = np.zeros(max_samples, np.float32)
    padded[: len(clip)] = clip
    mel = log_mel_spectrogram(jnp.asarray(padded), n_mels=cfg.ref_mels)
    return mel[None], jnp.asarray([n_frames], jnp.int32)


def synthesize_pocket(params, cfg: PocketConfig, phonemes, ph_len, style, speed):
    """Generate audio from phonemes + style (shared generator stack)."""
    return synthesize_frames(params["gen"], cfg.base, phonemes, ph_len, style, speed)
