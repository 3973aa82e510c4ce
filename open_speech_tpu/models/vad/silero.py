"""Silero-style VAD in JAX: spectral conv front-end + LSTM + sigmoid head.

TPU-native replacement for the reference's ONNX Silero wrapper
(src/vad/silero.py). Contract preserved exactly:

  - 512-sample windows of float32 16 kHz mono audio,
  - per-stream recurrent state of shape [2, 1, 128] (h and c of the LSTM),
  - ``__call__`` returns the max window probability over a chunk
    (src/vad/silero.py:63-91),
  - ``is_speech`` (:93) and ``get_speech_segments`` with min-speech /
    silence-window hysteresis (:109-177) keep identical thresholds,
    window math, and segment-closing behavior.

TPU-first difference: the model step is a single jitted function over a
*batch* of windows ([B, 512] x [2, B, 128] state), so the serving layer can
run every live streaming session's VAD tick as one device call instead of
one ONNX session.run per session. Architecture mirrors silero-vad v5
(129-bin magnitude STFT -> 4 conv blocks -> LSTM(128) -> dense sigmoid); a
weight converter can populate it from the ONNX file when one is present
(no network in this deployment, so random-init + scripted-probability test
fakes mirror the reference's MockOrtSession strategy, tests/test_vad.py).
"""

from __future__ import annotations

import asyncio
import logging
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

VAD_SAMPLE_RATE = 16000
WINDOW = 512  # 32 ms
_N_FFT = 256
_HOP = 128
_N_BINS = _N_FFT // 2 + 1  # 129
_HIDDEN = 128

_vad_model: "SileroVAD | None" = None
_vad_lock = asyncio.Lock()


@dataclass
class Segment:
    """A detected speech segment (reference: src/vad/silero.py:38-42)."""

    start_ms: int
    end_ms: int


VADParams = dict


def init_vad_params(key=None, dtype=jnp.float32) -> VADParams:
    """Random-init parameter pytree with the silero-v5 topology."""
    key = key if key is not None else jax.random.PRNGKey(42)
    ks = jax.random.split(key, 8)

    def conv(k, width, cin, cout):
        return {
            "w": jax.random.normal(k, (width, cin, cout), dtype)
            * (width * cin) ** -0.5,
            "b": jnp.zeros((cout,), dtype),
        }

    def dense(k, cin, cout):
        return {
            "w": jax.random.normal(k, (cin, cout), dtype) * cin**-0.5,
            "b": jnp.zeros((cout,), dtype),
        }

    # DFT basis for the magnitude STFT front-end (fixed, not trained)
    n = np.arange(_N_FFT)[:, None]
    kk = np.arange(_N_BINS)[None, :]
    ang = 2.0 * np.pi * n * kk / _N_FFT
    window = np.hanning(_N_FFT + 1)[:-1]
    return {
        "stft_cos": jnp.asarray(np.cos(ang) * window[:, None], dtype),
        "stft_sin": jnp.asarray(-np.sin(ang) * window[:, None], dtype),
        "conv1": conv(ks[0], 3, _N_BINS, 128),
        "conv2": conv(ks[1], 3, 128, 64),
        "conv3": conv(ks[2], 3, 64, 64),
        "conv4": conv(ks[3], 3, 64, 128),
        "lstm": {
            "wi": dense(ks[4], 128, 4 * _HIDDEN)["w"],
            "wh": dense(ks[5], _HIDDEN, 4 * _HIDDEN)["w"],
            "b": jnp.zeros((4 * _HIDDEN,), dtype),
        },
        "head": dense(ks[6], _HIDDEN, 1),
    }


def _conv1d(x, p):
    return (
        jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        + p["b"]
    )


@jax.jit
def vad_step(params, audio: jax.Array, state: jax.Array):
    """One VAD step over a batch of windows.

    audio: [B, 512] float32; state: [2, B, 128] (h, c).
    Returns (probs [B], new_state [2, B, 128]).
    """
    b = audio.shape[0]
    # magnitude STFT: 4 hops of 256-sample frames over the 512 window
    # (reflect-pad so frame count is window//hop)
    pad = _N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    idx = jnp.arange(WINDOW // _HOP)[:, None] * _HOP + jnp.arange(_N_FFT)[None, :]
    frames = x[:, idx]  # [B, 4, 256]
    re = frames @ params["stft_cos"]
    im = frames @ params["stft_sin"]
    mag = jnp.sqrt(re * re + im * im + 1e-9)  # [B, 4, 129]

    h = jax.nn.relu(_conv1d(mag, params["conv1"]))
    h = jax.nn.relu(_conv1d(h, params["conv2"]))
    h = jax.nn.relu(_conv1d(h, params["conv3"]))
    h = jax.nn.relu(_conv1d(h, params["conv4"]))
    feat = h.mean(axis=1)  # [B, 128]

    hx, cx = state[0], state[1]
    gates = feat @ params["lstm"]["wi"] + hx @ params["lstm"]["wh"] + params["lstm"]["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * cx + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    prob = jax.nn.sigmoid(
        h_new @ params["head"]["w"] + params["head"]["b"]
    )[:, 0]
    return prob, jnp.stack([h_new, c_new])


class SileroVAD:
    """Per-stream VAD with the reference wrapper API.

    ``session`` is the parameter pytree (shared across streams, like the
    reference's shared ONNX InferenceSession); each instance carries its own
    recurrent state. An optional ``step_fn(window [1,512], state) ->
    (prob, state)`` supports scripted-probability test fakes.
    """

    def __init__(self, session: VADParams, threshold: float = 0.5, step_fn=None):
        self.session = session
        self.sample_rate = VAD_SAMPLE_RATE
        self.threshold = threshold
        self._step_fn = step_fn
        self._state = np.zeros((2, 1, _HIDDEN), dtype=np.float32)

    def reset(self) -> None:
        self._state = np.zeros((2, 1, _HIDDEN), dtype=np.float32)

    def _step(self, window: np.ndarray) -> float:
        if self._step_fn is not None:
            prob, self._state = self._step_fn(window, self._state)
            return float(prob)
        probs, state = vad_step(
            self.session, jnp.asarray(window[None, :]), jnp.asarray(self._state)
        )
        self._state = np.asarray(state)
        return float(probs[0])

    def __call__(self, audio: np.ndarray) -> float:
        """Max speech probability over consecutive 512-sample windows."""
        if len(audio) == 0:
            return 0.0
        max_prob = 0.0
        for start in range(0, len(audio) - WINDOW + 1, WINDOW):
            prob = self._step(audio[start : start + WINDOW].astype(np.float32))
            max_prob = max(max_prob, prob)
        return max_prob

    def is_speech(self, pcm16_bytes: bytes, threshold: float | None = None) -> bool:
        if not pcm16_bytes:
            return False
        audio = (
            np.frombuffer(pcm16_bytes, dtype=np.int16).astype(np.float32) / 32768.0
        )
        return self(audio) >= (threshold if threshold is not None else self.threshold)

    def get_speech_segments(
        self,
        pcm16_bytes: bytes,
        threshold: float | None = None,
        min_speech_ms: int = 250,
        silence_ms: int = 800,
    ) -> list[Segment]:
        """Hysteresis segmentation, reference semantics (src/vad/silero.py:109)."""
        if not pcm16_bytes:
            return []
        thresh = threshold if threshold is not None else self.threshold
        audio = (
            np.frombuffer(pcm16_bytes, dtype=np.int16).astype(np.float32) / 32768.0
        )
        window_ms = WINDOW * 1000 // self.sample_rate
        silence_windows = max(1, silence_ms // window_ms)
        min_speech_windows = max(1, min_speech_ms // window_ms)

        segments: list[Segment] = []
        in_speech = False
        speech_start = 0
        silence_count = 0
        speech_windows = 0

        for start in range(0, len(audio) - WINDOW + 1, WINDOW):
            prob = self._step(audio[start : start + WINDOW])
            current_ms = start * 1000 // self.sample_rate
            if prob >= thresh:
                silence_count = 0
                if not in_speech:
                    in_speech = True
                    speech_start = current_ms
                    speech_windows = 0
                speech_windows += 1
            else:
                if in_speech:
                    silence_count += 1
                    if silence_count >= silence_windows:
                        if speech_windows >= min_speech_windows:
                            segments.append(
                                Segment(start_ms=speech_start, end_ms=current_ms)
                            )
                        in_speech = False
                        silence_count = 0
                        speech_windows = 0

        if in_speech and speech_windows >= min_speech_windows:
            end_ms = len(audio) * 1000 // self.sample_rate
            segments.append(Segment(start_ms=speech_start, end_ms=end_ms))
        return segments


async def get_vad_model() -> SileroVAD:
    """Singleton VAD (reference: src/vad/silero.py:180-209).

    Initializes params on device once; per-stream instances share them via
    ``SileroVAD(model.session)``.
    """
    global _vad_model
    if _vad_model is not None:
        return _vad_model
    async with _vad_lock:
        if _vad_model is not None:
            return _vad_model
        params = init_vad_params()
        # jit warmup so the first streaming chunk isn't a compile stall
        vad_step(params, jnp.zeros((1, WINDOW)), jnp.zeros((2, 1, _HIDDEN)))
        _vad_model = SileroVAD(params)
        logger.info("JAX VAD model initialized")
        return _vad_model
