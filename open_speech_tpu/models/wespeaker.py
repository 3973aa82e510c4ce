"""WeSpeaker ResNet34 speaker embedding (pyannote 3.1's embedding model) in JAX.

The reference's diarization pipeline (src/diarization/pyannote_diarizer.py:22,
pyannote/speaker-diarization-3.1) embeds speakers with
wespeaker-voxceleb-resnet34-LM: kaldi 80-dim log fbank (CMN) -> ResNet34
(m_channels=32, blocks 3/4/6/3) -> temporal statistics pooling (TSTP:
mean ++ std over time of the flattened channelxfreq map) -> Linear(5120->256).
This module is that model's TPU-native slot; `convert_wespeaker` maps the
released torch state_dict onto the pytree (BatchNorms folded into per-channel
scale/bias at load — inference only), parity-proven against a same-graph
torch oracle in tests/test_wespeaker.py.

Convs run as NHWC lax convs — MXU-shaped — with the feature axis as image
height ([B, 80, T, 1] in) so the torch [B, 1, F, T] geometry is preserved
under a layout transpose the compiler folds away.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.initutil import jit_init
from open_speech_tpu.ops.mel import _dft_bases_raw

SAMPLE_RATE = 16000
FRAME_LEN = 400   # 25 ms
FRAME_HOP = 160   # 10 ms
N_FFT = 512       # kaldi rounds 400 up to the next power of two


@dataclass(frozen=True)
class WeSpeakerConfig:
    n_mels: int = 80
    m_channels: int = 32
    num_blocks: tuple = (3, 4, 6, 3)
    embed_dim: int = 256

    @property
    def stats_dim(self) -> int:
        # channels*freq after 3 stride-2 stages, x2 for mean++std
        return 2 * (8 * self.m_channels) * (self.n_mels // 8)


def _kaldi_mel_banks(n_mels: int = 80, n_fft: int = N_FFT,
                     sample_rate: float = 16000.0,
                     low_freq: float = 20.0, high_freq: float = 0.0):
    """Kaldi mel filterbank: triangles in mel space over FFT bins, no
    normalization (torchaudio.compliance.kaldi semantics, vad-style)."""
    if high_freq <= 0:
        high_freq = sample_rate / 2 + high_freq
    to_mel = lambda hz: 1127.0 * np.log(1.0 + hz / 700.0)  # noqa: E731
    mel_low, mel_high = to_mel(low_freq), to_mel(high_freq)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)
    bins = np.arange(n_fft // 2 + 1)
    fft_mel = to_mel(bins * sample_rate / n_fft)  # mel of each FFT bin
    banks = np.zeros((n_mels, len(bins)), np.float32)
    for m in range(n_mels):
        left = mel_low + m * mel_delta
        center = left + mel_delta
        right = center + mel_delta
        up = (fft_mel - left) / (center - left)
        down = (right - fft_mel) / (right - center)
        banks[m] = np.maximum(0.0, np.minimum(up, down))
    return banks  # [n_mels, n_fft//2+1]


@partial(jax.jit, static_argnames=("n_mels",))
def kaldi_fbank(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """float32 waveform [B, S] (±1 range) -> kaldi log-fbank [B, T, n_mels].

    torchaudio.compliance.kaldi.fbank with dither=0 as wespeaker uses it:
    int16 scaling, per-frame DC removal, pre-emphasis 0.97, povey window,
    snip-edges framing, power spectrum, kaldi mel banks, log(max(x, eps)),
    then per-utterance cepstral mean subtraction.
    """
    x = jnp.asarray(audio, jnp.float32) * 32768.0
    n_frames = 1 + (x.shape[-1] - FRAME_LEN) // FRAME_HOP
    idx = jnp.arange(n_frames)[:, None] * FRAME_HOP + jnp.arange(FRAME_LEN)
    frames = x[..., idx]  # [B, T, 400]
    frames = frames - frames.mean(axis=-1, keepdims=True)  # remove_dc_offset
    pre = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * pre
    n = jnp.arange(FRAME_LEN)
    povey = (0.5 - 0.5 * jnp.cos(2 * jnp.pi * n / (FRAME_LEN - 1))) ** 0.85
    frames = frames * povey
    frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, N_FFT - FRAME_LEN)])
    cos_b, sin_b = _dft_bases_raw(N_FFT)
    power = (frames @ jnp.asarray(cos_b)) ** 2 + (frames @ jnp.asarray(sin_b)) ** 2
    mel = power @ jnp.asarray(_kaldi_mel_banks(n_mels).T)
    logmel = jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))  # f32 eps
    return logmel - logmel.mean(axis=-2, keepdims=True)  # CMN over time


def _fold_bn(w, b, mean, var, eps=1e-5):
    s = np.asarray(w) / np.sqrt(np.asarray(var) + eps)
    return {"s": jnp.asarray(s), "b": jnp.asarray(np.asarray(b) - np.asarray(mean) * s)}


def convert_wespeaker(src) -> tuple[dict, WeSpeakerConfig]:
    """wespeaker ResNet34 state_dict (path / mapping) -> JAX pytree.

    Torch keys: conv1.weight, bn1.*, layer{1..4}.{i}.conv{1,2}.weight,
    layer{1..4}.{i}.bn{1,2}.*, layer{...}.{i}.shortcut.0.weight +
    .shortcut.1.* (also accepted as 'downsample'), seg_1.{weight,bias}.
    BatchNorms fold into scale/bias; conv weights [O,I,kh,kw] -> HWIO.
    """
    from open_speech_tpu.models.ckptutil import load_state_dict

    src = load_state_dict(
        src, strip_prefixes=("module.", "model.", "speaker_encoder.")
    )

    def bn(prefix):
        return _fold_bn(
            src[f"{prefix}.weight"], src[f"{prefix}.bias"],
            src[f"{prefix}.running_mean"], src[f"{prefix}.running_var"],
        )

    def conv(key):
        return jnp.asarray(src[key].transpose(2, 3, 1, 0))  # OIHW -> HWIO

    m = src["conv1.weight"].shape[0]
    num_blocks = tuple(
        1 + max(
            int(k.split(".")[1]) for k in src if k.startswith(f"layer{li}.")
        )
        for li in range(1, 5)
    )
    cfg = WeSpeakerConfig(
        n_mels=80,
        m_channels=m,
        num_blocks=num_blocks,
        embed_dim=src["seg_1.weight"].shape[0],
    )

    layers = []
    for li in range(1, 5):
        blocks = []
        for bi in range(num_blocks[li - 1]):
            p = f"layer{li}.{bi}"
            short = None
            for name in ("shortcut", "downsample"):
                if f"{p}.{name}.0.weight" in src:
                    short = {
                        "conv": conv(f"{p}.{name}.0.weight"),
                        "bn": bn(f"{p}.{name}.1"),
                    }
            blocks.append(
                {
                    "conv1": conv(f"{p}.conv1.weight"),
                    "bn1": bn(f"{p}.bn1"),
                    "conv2": conv(f"{p}.conv2.weight"),
                    "bn2": bn(f"{p}.bn2"),
                    **({"short": short} if short else {}),
                }
            )
        layers.append(blocks)

    params = {
        "conv1": conv("conv1.weight"),
        "bn1": bn("bn1"),
        "layers": layers,
        "seg": {
            "w": jnp.asarray(src["seg_1.weight"].T),
            "b": jnp.asarray(src["seg_1.bias"]),
        },
    }
    return params, cfg


@jit_init()
def init_wespeaker_params(key, cfg: WeSpeakerConfig = WeSpeakerConfig(),
                          dtype=jnp.float32):
    ks = iter(jax.random.split(key, 64))

    def conv(cin, cout, k=3):
        return jax.random.normal(next(ks), (k, k, cin, cout), dtype) * (
            k * k * cin
        ) ** -0.5

    def bn(c):
        return {"s": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    layers = []
    cin = cfg.m_channels
    for li, n in enumerate(cfg.num_blocks):
        cout = cfg.m_channels * (1 << li)
        blocks = []
        for bi in range(n):
            blk = {
                "conv1": conv(cin if bi == 0 else cout, cout),
                "bn1": bn(cout),
                "conv2": conv(cout, cout),
                "bn2": bn(cout),
            }
            if bi == 0 and (li > 0 or cin != cout):
                blk["short"] = {"conv": conv(cin, cout, k=1), "bn": bn(cout)}
            blocks.append(blk)
        cin = cout
        layers.append(blocks)
    return {
        "conv1": conv(1, cfg.m_channels),
        "bn1": bn(cfg.m_channels),
        "layers": layers,
        "seg": {
            "w": jax.random.normal(
                next(ks), (cfg.stats_dim, cfg.embed_dim), dtype
            ) * cfg.stats_dim**-0.5,
            "b": jnp.zeros((cfg.embed_dim,), dtype),
        },
    }


def _conv2d(x, w, stride=1):
    # torch Conv2d padding semantics: k=3 pads (1,1) both dims regardless of
    # stride (XLA "SAME" would pad asymmetrically under stride 2); k=1 pads 0
    pad = 1 if w.shape[0] == 3 else 0
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _block(x, p, stride):
    h = jax.nn.relu(_conv2d(x, p["conv1"], stride) * p["bn1"]["s"] + p["bn1"]["b"])
    h = _conv2d(h, p["conv2"]) * p["bn2"]["s"] + p["bn2"]["b"]
    if "short" in p:
        x = _conv2d(x, p["short"]["conv"], stride) * p["short"]["bn"]["s"] \
            + p["short"]["bn"]["b"]
    return jax.nn.relu(h + x)


@jax.jit
def wespeaker_embed(params, fbank: jnp.ndarray) -> jnp.ndarray:
    """fbank [B, T, n_mels] -> L2-normalized embeddings [B, embed_dim]."""
    # torch geometry [B, 1, F, T] -> NHWC [B, F, T, 1]
    x = fbank.transpose(0, 2, 1)[..., None]
    x = jax.nn.relu(
        _conv2d(x, params["conv1"]) * params["bn1"]["s"] + params["bn1"]["b"]
    )
    for li, blocks in enumerate(params["layers"]):
        for bi, blk in enumerate(blocks):
            x = _block(x, blk, stride=2 if (li > 0 and bi == 0) else 1)
    # TSTP: [B, F', T', C] -> torch flatten order [B, C*F', T']
    b, f, t, c = x.shape
    x = x.transpose(0, 3, 1, 2).reshape(b, c * f, t)
    mean = x.mean(axis=-1)
    std = jnp.sqrt(x.var(axis=-1, ddof=1) + 1e-7)
    stats = jnp.concatenate([mean, std], axis=-1)
    e = stats @ params["seg"]["w"] + params["seg"]["b"]
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)


def find_wespeaker_checkpoint() -> Path | None:
    """OS_WESPEAKER_CKPT_PATH, then the HF cache layout."""
    from open_speech_tpu.models.ckptutil import find_checkpoint

    return find_checkpoint(
        "OS_WESPEAKER_CKPT_PATH",
        ("models--pyannote--wespeaker-voxceleb-resnet34-LM/"
         "snapshots/*/pytorch_model.bin",),
    )
