"""GE2E speaker encoder (resemblyzer VoiceEncoder) in JAX.

Gives the diarizer (models/diarize.py) a *convertible real topology*: the
widely-distributed resemblyzer ``pretrained.pt`` d-vector model — a
3-layer LSTM(40→256) + Linear(256→256) + ReLU with L2-normalized output,
trained with the GE2E loss. The reference's diarization runs pyannote on
torch/CUDA (src/diarization/pyannote_diarizer.py); this is the
TPU-native slot with the same contract (windowed speaker embeddings →
clustering), parity-proven against a torch oracle of the same graph
(tests/test_ge2e.py).

Front-end: resemblyzer's mel — power mel spectrogram (librosa defaults:
n_fft 400, hop 160, 40 slaney-normalized bands, periodic Hann,
center/reflect), NO log — reproduced here from ops.mel's DFT/filterbank
bases.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.initutil import jit_init
from open_speech_tpu.ops.mel import _dft_bases, mel_filterbank

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160


@dataclass(frozen=True)
class GE2EConfig:
    n_mels: int = 40
    hidden: int = 256
    layers: int = 3
    embed_dim: int = 256


def ge2e_mel(audio: jnp.ndarray, n_mels: int = 40) -> jnp.ndarray:
    """Power mel frames [T, n_mels] (resemblyzer wav_to_mel_spectrogram)."""
    audio = jnp.asarray(audio, jnp.float32).reshape(-1)
    pad = N_FFT // 2
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - N_FFT) // HOP
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    cos_b, sin_b = _dft_bases(N_FFT)
    frames = x[idx]
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    power = re**2 + im**2  # [T, n_bins]
    mel = power @ jnp.asarray(mel_filterbank(n_mels).T)  # [T, n_mels]
    return mel


@jit_init()
def init_ge2e_params(key, cfg: GE2EConfig = GE2EConfig(), dtype=jnp.float32):
    ks = iter(jax.random.split(key, 2 * cfg.layers + 2))

    def lstm(d_in):
        return {
            "wi": jax.random.normal(next(ks), (d_in, 4 * cfg.hidden), dtype)
            * d_in**-0.5,
            "wh": jax.random.normal(next(ks), (cfg.hidden, 4 * cfg.hidden), dtype)
            * cfg.hidden**-0.5,
            "b": jnp.zeros((4 * cfg.hidden,), dtype),
        }

    return {
        "lstm": [lstm(cfg.n_mels if i == 0 else cfg.hidden)
                 for i in range(cfg.layers)],
        "proj": {
            "w": jax.random.normal(
                next(ks), (cfg.hidden, cfg.embed_dim), dtype
            ) * cfg.hidden**-0.5,
            "b": jnp.zeros((cfg.embed_dim,), dtype),
        },
    }


def convert_ge2e(src) -> tuple[dict, GE2EConfig]:
    """resemblyzer checkpoint (path / state-dict mapping) → JAX pytree.

    Torch keys: lstm.weight_ih_l{k} [4H, In], lstm.weight_hh_l{k} [4H, H],
    lstm.bias_*_l{k} [4H] (i,f,g,o gate order — same as our scan),
    linear.weight [E, H], linear.bias [E].
    """
    from open_speech_tpu.models.ckptutil import load_state_dict

    src = load_state_dict(src, strip_prefixes=("module.",))

    layers = sorted(
        int(k.split("_l")[-1]) for k in src if k.startswith("lstm.weight_ih_l")
    )
    hidden = src["lstm.weight_hh_l0"].shape[1]
    cfg = GE2EConfig(
        n_mels=src["lstm.weight_ih_l0"].shape[1],
        hidden=hidden,
        layers=len(layers),
        embed_dim=src["linear.weight"].shape[0],
    )
    params = {
        "lstm": [
            {
                "wi": jnp.asarray(src[f"lstm.weight_ih_l{k}"].T),
                "wh": jnp.asarray(src[f"lstm.weight_hh_l{k}"].T),
                "b": jnp.asarray(
                    src[f"lstm.bias_ih_l{k}"] + src[f"lstm.bias_hh_l{k}"]
                ),
            }
            for k in layers
        ],
        "proj": {
            "w": jnp.asarray(src["linear.weight"].T),
            "b": jnp.asarray(src["linear.bias"]),
        },
    }
    return params, cfg


def _lstm_layer(p, x):
    """[B, T, In] → (outputs [B, T, H], last hidden [B, H])."""
    b = x.shape[0]
    h0 = jnp.zeros((b, p["wh"].shape[0]), x.dtype)
    c0 = jnp.zeros((b, p["wh"].shape[0]), x.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt @ p["wi"] + h @ p["wh"] + p["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    (h_last, _), hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(hs, 0, 1), h_last


@jax.jit
def ge2e_embed(params, mels: jnp.ndarray) -> jnp.ndarray:
    """mels [B, T, n_mels] → L2-normalized d-vectors [B, embed_dim]."""
    x = mels
    h_last = None
    for p in params["lstm"]:
        x, h_last = _lstm_layer(p, x)
    e = jax.nn.relu(h_last @ params["proj"]["w"] + params["proj"]["b"])
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)


def find_ge2e_checkpoint() -> Path | None:
    """OS_DIARIZER_CKPT_PATH, then resemblyzer's bundled location."""
    import os

    env = os.environ.get("OS_DIARIZER_CKPT_PATH", "")
    candidates = [Path(env)] if env else []
    candidates += [
        Path.home() / ".cache" / "resemblyzer" / "pretrained.pt",
    ]
    for c in candidates:
        if c.is_file():
            return c
    return None
