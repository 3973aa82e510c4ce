"""PyanNet speaker segmentation (pyannote/segmentation-3.0 topology) in JAX.

The reference's diarization quality comes from pyannote's 3.1 pipeline
(src/diarization/pyannote_diarizer.py:22), whose first stage is a local
*segmentation* model: per-frame speaker activity over 10 s chunks,
overlap-aware via powerset multi-class encoding. This module is that
model's TPU-native slot — the exact PyanNet topology the released
checkpoint uses, so real weights drop into the same pytree:

  waveform [B, 1, 160000]
    -> InstanceNorm1d(1, affine)                       (wav_norm1d)
    -> SincConv(80 analytic filters, k=251, stride=10) (asteroid ParamSincFB)
       |abs| -> MaxPool(3,3) -> InstanceNorm -> LeakyReLU
    -> Conv1d(80->60, k=5) -> MaxPool(3,3) -> InstanceNorm -> LeakyReLU
    -> Conv1d(60->60, k=5) -> MaxPool(3,3) -> InstanceNorm -> LeakyReLU
    -> BiLSTM x4 (hidden 128)
    -> Linear(256->128) -> LeakyReLU -> Linear(128->128) -> LeakyReLU
    -> Linear(128->7) -> log_softmax            (powerset: 3 spk, overlap<=2)

10 s @ 16 kHz -> 589 frames (~17 ms per frame). Powerset classes are the
subsets of {0,1,2} with |s| <= 2 ordered by size then lexicographically:
(), (0), (1), (2), (0,1), (0,2), (1,2) — argmax then set-membership gives
frame-level multilabel speaker activity including overlaps.

Converter (``convert_segmentation``) maps the released torch state_dict
(``sincnet.conv1d.0.filterbank.{low_hz_,band_hz_}``, ``lstm.*_l{0..3}``
with ``_reverse`` halves, ``linear.{0,1}.*``, ``classifier.*``) onto this
pytree; parity vs a same-graph torch oracle is asserted in
tests/test_segmentation.py. The sinc filter synthesis follows asteroid's
ParamSincFB (cos/sin analytic pairs, hamming half-window, 1/(2*band)
normalization); it is isolated in ``sinc_filters`` so it can be checked
against the asteroid implementation in one place.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from itertools import combinations
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.initutil import jit_init

SAMPLE_RATE = 16000
CHUNK_S = 10.0
CHUNK_SAMPLES = int(CHUNK_S * SAMPLE_RATE)  # 160000


@dataclass(frozen=True)
class SegmentationConfig:
    n_sinc: int = 80          # sinc filter pairs output channels (2*40)
    sinc_kernel: int = 251
    sinc_stride: int = 10
    conv_hidden: int = 60
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_hidden: int = 128
    linear_layers: int = 2
    max_speakers: int = 3     # powerset: subsets of this many local speakers
    max_overlap: int = 2      # ... with at most this many simultaneous

    @property
    def n_classes(self) -> int:
        return len(powerset_classes(self.max_speakers, self.max_overlap))


def powerset_classes(max_speakers: int = 3, max_overlap: int = 2):
    """Ordered powerset: subsets by size then lexicographic (pyannote)."""
    classes: list[tuple[int, ...]] = []
    for size in range(max_overlap + 1):
        classes.extend(combinations(range(max_speakers), size))
    return classes


def powerset_to_multilabel(classes_idx: np.ndarray, cfg: SegmentationConfig):
    """argmax class indices [...,] -> binary activity [..., max_speakers]."""
    table = np.zeros((cfg.n_classes, cfg.max_speakers), np.float32)
    for ci, members in enumerate(powerset_classes(cfg.max_speakers, cfg.max_overlap)):
        for m in members:
            table[ci, m] = 1.0
    return table[np.asarray(classes_idx)]


def n_frames(n_samples: int, cfg: SegmentationConfig = SegmentationConfig()) -> int:
    """Output frames for an input length (mirrors the conv/pool chain)."""
    t = (n_samples - cfg.sinc_kernel) // cfg.sinc_stride + 1
    t = (t - 3) // 3 + 1
    t = t - 4            # conv k=5, no padding
    t = (t - 3) // 3 + 1
    t = t - 4
    t = (t - 3) // 3 + 1
    return t


def sinc_filters(
    low_hz: np.ndarray,
    band_hz: np.ndarray,
    kernel_size: int = 251,
    sample_rate: float = 16000.0,
    min_low_hz: float = 50.0,
    min_band_hz: float = 50.0,
) -> np.ndarray:
    """asteroid ParamSincFB filters: [2*n_pairs, kernel_size] float32.

    cos (band-pass) filters then their sin (analytic) pairs, each
    hamming-half-windowed and normalized by 2*band. Pure numpy — the
    filters are constants at inference, materialized once at load.
    """
    low_hz = np.abs(np.asarray(low_hz, np.float64).reshape(-1, 1))
    band_hz = np.abs(np.asarray(band_hz, np.float64).reshape(-1, 1))
    low = min_low_hz + low_hz
    high = np.clip(low + min_band_hz + band_hz, min_low_hz, sample_rate / 2)
    band = (high - low)[:, 0]

    half = kernel_size // 2
    n_lin = np.linspace(0, kernel_size / 2 - 1, num=half)
    window = 0.54 - 0.46 * np.cos(2 * np.pi * n_lin / kernel_size)
    n_ = 2 * np.pi * np.arange(-half, 0.0).reshape(1, -1) / sample_rate

    ft_low = low @ n_
    ft_high = high @ n_
    cos_left = (np.sin(ft_high) - np.sin(ft_low)) / (n_ / 2)
    cos_center = 2 * band.reshape(-1, 1)
    cos_right = np.flip(cos_left, axis=1)
    sin_left = (np.cos(ft_low) - np.cos(ft_high)) / (n_ / 2)
    sin_center = np.zeros_like(cos_center)
    sin_right = -np.flip(sin_left, axis=1)

    def assemble(left, center, right):
        f = np.concatenate([left * window, center, right * window], axis=1)
        return f / (2 * band[:, None])

    return np.concatenate(
        [assemble(cos_left, cos_center, cos_right),
         assemble(sin_left, sin_center, sin_right)],
        axis=0,
    ).astype(np.float32)


def _default_sinc_init(n_pairs: int, sample_rate: float = 16000.0,
                       min_low_hz: float = 50.0, min_band_hz: float = 50.0):
    """Mel-spaced filterbank init (asteroid _initialize_filters)."""
    to_mel = lambda hz: 2595 * np.log10(1 + hz / 700)  # noqa: E731
    to_hz = lambda mel: 700 * (10 ** (mel / 2595) - 1)  # noqa: E731
    low_hz, high_hz = 30.0, sample_rate / 2 - (min_low_hz + min_band_hz)
    mel = np.linspace(to_mel(low_hz), to_mel(high_hz), n_pairs + 1)
    hz = to_hz(mel)
    return hz[:-1].reshape(-1, 1), np.diff(hz).reshape(-1, 1)


def init_segmentation_params(
    key=None, cfg: SegmentationConfig = SegmentationConfig(), dtype=jnp.float32
):
    key = key if key is not None else jax.random.PRNGKey(30)
    return _init_segmentation_impl(key, cfg=cfg, dtype=dtype)


@jit_init()
def _init_segmentation_impl(key, cfg: SegmentationConfig, dtype):
    ks = iter(jax.random.split(key, 4 + 4 * cfg.lstm_layers + cfg.linear_layers + 1))
    low, band = _default_sinc_init(cfg.n_sinc // 2)

    def norm(c):
        return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    def dense(d_in, d_out):
        return {
            "w": jax.random.normal(next(ks), (d_in, d_out), dtype) * d_in**-0.5,
            "b": jnp.zeros((d_out,), dtype),
        }

    def lstm_dir(d_in):
        h = cfg.lstm_hidden
        return {
            "wi": jax.random.normal(next(ks), (d_in, 4 * h), dtype) * d_in**-0.5,
            "wh": jax.random.normal(next(ks), (h, 4 * h), dtype) * h**-0.5,
            "b": jnp.zeros((4 * h,), dtype),
        }

    params = {
        "wav_norm": norm(1),
        "sinc": {
            "low_hz": jnp.asarray(low, dtype),
            "band_hz": jnp.asarray(band, dtype),
            "w": jnp.asarray(
                sinc_filters(low, band, cfg.sinc_kernel).T[:, None, :], dtype
            ),  # [K, 1, 80]
        },
        "norm0": norm(cfg.n_sinc),
        "conv1": {
            "w": jax.random.normal(
                next(ks), (5, cfg.n_sinc, cfg.conv_hidden), dtype
            ) * (5 * cfg.n_sinc) ** -0.5,
            "b": jnp.zeros((cfg.conv_hidden,), dtype),
        },
        "norm1": norm(cfg.conv_hidden),
        "conv2": {
            "w": jax.random.normal(
                next(ks), (5, cfg.conv_hidden, cfg.conv_hidden), dtype
            ) * (5 * cfg.conv_hidden) ** -0.5,
            "b": jnp.zeros((cfg.conv_hidden,), dtype),
        },
        "norm2": norm(cfg.conv_hidden),
        "lstm": [
            {
                "fwd": lstm_dir(cfg.conv_hidden if i == 0 else 2 * cfg.lstm_hidden),
                "bwd": lstm_dir(cfg.conv_hidden if i == 0 else 2 * cfg.lstm_hidden),
            }
            for i in range(cfg.lstm_layers)
        ],
        "linear": [
            dense(2 * cfg.lstm_hidden if i == 0 else cfg.linear_hidden,
                  cfg.linear_hidden)
            for i in range(cfg.linear_layers)
        ],
        "classifier": dense(cfg.linear_hidden, cfg.n_classes),
    }
    return params


def convert_segmentation(src) -> tuple[dict, SegmentationConfig]:
    """pyannote PyanNet state_dict (path / mapping) -> JAX pytree.

    Torch keys (pyannote.audio PyanNet, monolithic bi-LSTM):
      sincnet.wav_norm1d.{weight,bias}                       [1]
      sincnet.conv1d.0.filterbank.{low_hz_,band_hz_}         [40, 1]
      sincnet.conv1d.{1,2}.{weight,bias}     [60,80,5]/[60,60,5], [60]
      sincnet.norm1d.{0,1,2}.{weight,bias}            [80]/[60]/[60]
      lstm.{weight_ih,weight_hh,bias_ih,bias_hh}_l{k}[_reverse]
      linear.{0,1}.{weight,bias}, classifier.{weight,bias}
    Gate order i,f,g,o matches the scan below.
    """
    from open_speech_tpu.models.ckptutil import load_state_dict

    src = load_state_dict(src)

    n_layers = 1 + max(
        int(k.rsplit("_l", 1)[1].removesuffix("_reverse"))
        for k in src
        if k.startswith("lstm.weight_ih_l")
    )
    hidden = src["lstm.weight_hh_l0"].shape[1]
    cfg = SegmentationConfig(
        n_sinc=2 * src["sincnet.conv1d.0.filterbank.low_hz_"].shape[0],
        conv_hidden=src["sincnet.conv1d.1.weight"].shape[0],
        lstm_hidden=hidden,
        lstm_layers=n_layers,
        linear_hidden=src["linear.0.weight"].shape[0],
        linear_layers=1 + max(
            int(k.split(".")[1]) for k in src if k.startswith("linear.")
        ),
    )
    if src["classifier.weight"].shape[0] != cfg.n_classes:
        raise ValueError(
            f"classifier has {src['classifier.weight'].shape[0]} classes; "
            f"expected {cfg.n_classes} (powerset {cfg.max_speakers}/{cfg.max_overlap})"
        )
    low = src["sincnet.conv1d.0.filterbank.low_hz_"]
    band = src["sincnet.conv1d.0.filterbank.band_hz_"]

    def lstm_dir(k, rev):
        sfx = f"_l{k}" + ("_reverse" if rev else "")
        return {
            "wi": jnp.asarray(src[f"lstm.weight_ih{sfx}"].T),
            "wh": jnp.asarray(src[f"lstm.weight_hh{sfx}"].T),
            "b": jnp.asarray(src[f"lstm.bias_ih{sfx}"] + src[f"lstm.bias_hh{sfx}"]),
        }

    params = {
        "wav_norm": {
            "g": jnp.asarray(src["sincnet.wav_norm1d.weight"]),
            "b": jnp.asarray(src["sincnet.wav_norm1d.bias"]),
        },
        "sinc": {
            "low_hz": jnp.asarray(low),
            "band_hz": jnp.asarray(band),
            "w": jnp.asarray(sinc_filters(low, band, cfg.sinc_kernel).T[:, None, :]),
        },
        "norm0": {
            "g": jnp.asarray(src["sincnet.norm1d.0.weight"]),
            "b": jnp.asarray(src["sincnet.norm1d.0.bias"]),
        },
        "conv1": {
            # torch conv [out, in, k] -> ours [k, in, out]
            "w": jnp.asarray(src["sincnet.conv1d.1.weight"].transpose(2, 1, 0)),
            "b": jnp.asarray(src["sincnet.conv1d.1.bias"]),
        },
        "norm1": {
            "g": jnp.asarray(src["sincnet.norm1d.1.weight"]),
            "b": jnp.asarray(src["sincnet.norm1d.1.bias"]),
        },
        "conv2": {
            "w": jnp.asarray(src["sincnet.conv1d.2.weight"].transpose(2, 1, 0)),
            "b": jnp.asarray(src["sincnet.conv1d.2.bias"]),
        },
        "norm2": {
            "g": jnp.asarray(src["sincnet.norm1d.2.weight"]),
            "b": jnp.asarray(src["sincnet.norm1d.2.bias"]),
        },
        "lstm": [
            {"fwd": lstm_dir(k, False), "bwd": lstm_dir(k, True)}
            for k in range(n_layers)
        ],
        "linear": [
            {
                "w": jnp.asarray(src[f"linear.{i}.weight"].T),
                "b": jnp.asarray(src[f"linear.{i}.bias"]),
            }
            for i in range(cfg.linear_layers)
        ],
        "classifier": {
            "w": jnp.asarray(src["classifier.weight"].T),
            "b": jnp.asarray(src["classifier.bias"]),
        },
    }
    return params, cfg


def _instance_norm(x, p, eps: float = 1e-5):
    """x [B, T, C]: normalize over T per (example, channel) + affine."""
    mu = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _maxpool3(x):
    """MaxPool1d(3, stride=3) over the time axis of [B, T, C]."""
    t = (x.shape[1] - 3) // 3 + 1
    return x[:, : t * 3].reshape(x.shape[0], t, 3, x.shape[2]).max(axis=2)


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.01)


def _lstm_dir(p, x, reverse: bool):
    b, _, h4 = x.shape[0], x.shape[1], p["wh"].shape[1]
    h0 = jnp.zeros((b, h4 // 4), x.dtype)
    c0 = jnp.zeros((b, h4 // 4), x.dtype)
    # hoist the input projection out of the scan: one big MXU matmul
    xi = x @ p["wi"] + p["b"]

    def step(carry, zt):
        h, c = carry
        gates = zt + h @ p["wh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(
        step, (h0, c0), jnp.swapaxes(xi, 0, 1), reverse=reverse
    )
    return jnp.swapaxes(hs, 0, 1)


@partial(jax.jit, static_argnames=("cfg",))
def segment_chunks(params, chunks, cfg: SegmentationConfig = SegmentationConfig()):
    """waveform chunks [B, n_samples] -> per-frame log-probs [B, T, classes]."""
    from open_speech_tpu.ops.vocoder import conv1d

    x = chunks[..., None].astype(jnp.float32)  # [B, S, 1]
    x = _instance_norm(x, params["wav_norm"])
    x = conv1d(x, {"w": params["sinc"]["w"]}, stride=cfg.sinc_stride, pad=0)
    x = _leaky(_instance_norm(_maxpool3(jnp.abs(x)), params["norm0"]))
    x = conv1d(x, params["conv1"], pad=0)
    x = _leaky(_instance_norm(_maxpool3(x), params["norm1"]))
    x = conv1d(x, params["conv2"], pad=0)
    x = _leaky(_instance_norm(_maxpool3(x), params["norm2"]))
    for layer in params["lstm"]:
        x = jnp.concatenate(
            [_lstm_dir(layer["fwd"], x, False), _lstm_dir(layer["bwd"], x, True)],
            axis=-1,
        )
    for lin in params["linear"]:
        x = _leaky(x @ lin["w"] + lin["b"])
    logits = x @ params["classifier"]["w"] + params["classifier"]["b"]
    return jax.nn.log_softmax(logits, axis=-1)


def find_segmentation_checkpoint() -> Path | None:
    """OS_SEGMENTATION_CKPT_PATH, then the HF cache layout."""
    from open_speech_tpu.models.ckptutil import find_checkpoint

    return find_checkpoint(
        "OS_SEGMENTATION_CKPT_PATH",
        ("models--pyannote--segmentation-3.0/snapshots/*/pytorch_model.bin",),
    )
