"""Silero VAD v5 in JAX: STFT conv front-end + conv encoder + LSTM head.

TPU-native replacement for the reference's ONNX Silero wrapper
(src/vad/silero.py). Contract preserved exactly:

  - 512-sample windows of float32 16 kHz mono audio,
  - per-stream recurrent state of shape [2, 1, 128] (h and c of the LSTM),
  - ``__call__`` returns the max window probability over a chunk
    (src/vad/silero.py:63-91),
  - ``is_speech`` (:93) and ``get_speech_segments`` keep identical
    thresholds, window math, and segment semantics (re-derived here as a
    pure run-length pass over a probability track).

The graph mirrors the silero-vad v5 ONNX model the reference downloads
(src/vad/silero.py:196-204): windowed-DFT magnitude via a fixed conv basis
(``stft.forward_basis_buffer`` [258, 1, 256], hop 128, reflect pad 64),
four ReLU conv1d blocks (129→128→64→64→128, strides 1/2/2/1, k=3, pad 1),
an LSTMCell(128), then ReLU → 1x1 conv → sigmoid. ``convert_silero`` maps
the ONNX initializers (parsed without onnxruntime via models/onnx_io.py)
onto the JAX pytree; tests/test_vad_convert.py proves output parity against
a torch replica of the same graph at 1e-5.

TPU-first difference: the model step is a single jitted function over a
*batch* of windows ([B, 512] x [2, B, 128] state), so the serving layer can
run every live streaming session's VAD tick as one device call instead of
one ONNX session.run per session.
"""

from __future__ import annotations

import asyncio
import logging
import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.initutil import jit_init

logger = logging.getLogger(__name__)

VAD_SAMPLE_RATE = 16000
WINDOW = 512  # 32 ms
_N_FFT = 256
_HOP = 128
_PAD = 64  # reflect pad, both sides
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


@jit_init(static_argnames=("dtype",))
def _init_vad_params_impl(key, dtype) -> VADParams:
    """Random-init parameter pytree with the silero-v5 topology."""
    ks = jax.random.split(key, 8)

    def conv(k, width, cin, cout):
        return {
            "w": jax.random.normal(k, (width, cin, cout), dtype)
            * (width * cin) ** -0.5,
            "b": jnp.zeros((cout,), dtype),
        }

    # DFT basis (Hann-windowed), the shape silero's stft conv basis has
    n = np.arange(_N_FFT)[:, None]
    kk = np.arange(_N_BINS)[None, :]
    ang = 2.0 * np.pi * n * kk / _N_FFT
    window = np.hanning(_N_FFT + 1)[:-1]
    return {
        "stft_re": jnp.asarray(np.cos(ang) * window[:, None], dtype),  # [256,129]
        "stft_im": jnp.asarray(-np.sin(ang) * window[:, None], dtype),
        "enc0": conv(ks[0], 3, _N_BINS, 128),
        "enc1": conv(ks[1], 3, 128, 64),
        "enc2": conv(ks[2], 3, 64, 64),
        "enc3": conv(ks[3], 3, 64, 128),
        "lstm": {
            "wi": jax.random.normal(ks[4], (_HIDDEN, 4 * _HIDDEN), dtype)
            * _HIDDEN**-0.5,
            "wh": jax.random.normal(ks[5], (_HIDDEN, 4 * _HIDDEN), dtype)
            * _HIDDEN**-0.5,
            "b": jnp.zeros((4 * _HIDDEN,), dtype),
        },
        "head": {
            "w": jax.random.normal(ks[6], (_HIDDEN, 1), dtype) * _HIDDEN**-0.5,
            "b": jnp.zeros((1,), dtype),
        },
    }


def convert_silero(src: str | Path | bytes | dict) -> VADParams:
    """Silero VAD v5 ONNX weights → JAX pytree.

    ``src`` is an ONNX file path/bytes (reference downloads this file,
    src/vad/silero.py:196-204) or an already-parsed name→array mapping.
    Names are matched by suffix so both ``_model.stft...`` (jit export) and
    ``stft...`` (onnx) prefixes work.
    """
    from open_speech_tpu.models.onnx_io import read_onnx_initializers

    raw = src if isinstance(src, dict) else read_onnx_initializers(src)

    def find(suffix: str) -> np.ndarray:
        matches = [v for k, v in raw.items() if k.endswith(suffix)]
        if not matches:
            raise KeyError(
                f"silero checkpoint missing tensor *{suffix} "
                f"(have: {sorted(raw)[:8]}...)"
            )
        return np.asarray(matches[0], dtype=np.float32)

    basis = find("stft.forward_basis_buffer")  # [258, 1, 256]
    basis = basis.reshape(2 * _N_BINS, _N_FFT)

    def conv(prefix: str) -> dict:
        w = find(f"{prefix}.weight")  # torch [cout, cin, k]
        b = find(f"{prefix}.bias")
        return {"w": jnp.asarray(w.transpose(2, 1, 0)), "b": jnp.asarray(b)}

    w_ih = find("rnn.weight_ih")  # [4H, H], torch gate order i,f,g,o
    w_hh = find("rnn.weight_hh")
    b_ih = find("rnn.bias_ih")
    b_hh = find("rnn.bias_hh")
    head_w = find("decoder.2.weight")  # [1, 128, 1]
    head_b = find("decoder.2.bias")
    return {
        "stft_re": jnp.asarray(basis[:_N_BINS].T),  # [256, 129]
        "stft_im": jnp.asarray(basis[_N_BINS:].T),
        "enc0": conv("encoder.0.reparam_conv"),
        "enc1": conv("encoder.1.reparam_conv"),
        "enc2": conv("encoder.2.reparam_conv"),
        "enc3": conv("encoder.3.reparam_conv"),
        "lstm": {
            "wi": jnp.asarray(w_ih.T),
            "wh": jnp.asarray(w_hh.T),
            "b": jnp.asarray(b_ih + b_hh),
        },
        "head": {
            "w": jnp.asarray(head_w[:, :, 0].T),  # [128, 1]
            "b": jnp.asarray(head_b),
        },
    }


def _conv1d(x, p, stride: int = 1):
    return (
        jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(stride,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        + p["b"]
    )


def _vad_step_impl(params, audio: jax.Array, state: jax.Array):
    # magnitude STFT: reflect pad 64, 256-sample frames, hop 128 → 4 frames
    x = jnp.pad(audio, ((0, 0), (_PAD, _PAD)), mode="reflect")
    n_frames = (x.shape[1] - _N_FFT) // _HOP + 1
    idx = jnp.arange(n_frames)[:, None] * _HOP + jnp.arange(_N_FFT)[None, :]
    frames = x[:, idx]  # [B, F, 256]
    re = frames @ params["stft_re"]
    im = frames @ params["stft_im"]
    mag = jnp.sqrt(re * re + im * im + 1e-12)  # [B, F, 129]

    h = jax.nn.relu(_conv1d(mag, params["enc0"], 1))
    h = jax.nn.relu(_conv1d(h, params["enc1"], 2))
    h = jax.nn.relu(_conv1d(h, params["enc2"], 2))
    h = jax.nn.relu(_conv1d(h, params["enc3"], 1))  # [B, F', 128]

    hx, cx = state[0], state[1]

    def lstm_cell(carry, feat_t):
        hx, cx = carry
        gates = feat_t @ params["lstm"]["wi"] + hx @ params["lstm"]["wh"] + params["lstm"]["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * cx + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    feat_seq = jnp.swapaxes(h, 0, 1)  # [F', B, 128]
    (h_new, c_new), _ = jax.lax.scan(lstm_cell, (hx, cx), feat_seq)
    out = jax.nn.relu(h_new)
    prob = jax.nn.sigmoid(out @ params["head"]["w"] + params["head"]["b"])[:, 0]
    return prob, jnp.stack([h_new, c_new])


@jax.jit
def vad_step(params, audio: jax.Array, state: jax.Array):
    """One VAD step over a batch of windows.

    audio: [B, 512] float32; state: [2, B, 128] (h, c).
    Returns (probs [B], new_state [2, B, 128]).
    """
    return _vad_step_impl(params, audio, state)


@jax.jit
def vad_scan(params, windows: jax.Array, state: jax.Array, n: jax.Array):
    """Sequential windows of ONE stream in a single device call.

    windows: [N, 512] float32 (bucket-padded); state: [2, 1, 128]; n:
    scalar int32 — the real window count. The recurrent state threads
    across windows inside one program, replacing the per-window python
    loop (one dispatch + one host sync per 512-sample window — ~3 device
    round trips for every 100 ms chunk of every streaming session, and
    ~100 for a single realtime segmentation pass). Padded rows still run
    but the returned state is the one after window n-1, so padding never
    corrupts the stream's recurrence.
    """

    def step(st, w):
        prob, st2 = _vad_step_impl(params, w[None], st)
        return st2, (prob[0], st2)

    _, (probs, states) = jax.lax.scan(step, state, windows)
    final = jax.lax.dynamic_index_in_dim(
        states, jnp.maximum(n - 1, 0), axis=0, keepdims=False
    )
    return probs, final


def segments_from_probs(
    probs: np.ndarray,
    *,
    threshold: float,
    window_ms: int,
    min_speech_ms: int,
    silence_ms: int,
    total_ms: int,
) -> list[Segment]:
    """Turn a per-window probability track into speech segments.

    Semantics (matching the reference wrapper, src/vad/silero.py:109-177):
    a segment opens at the first window ≥ threshold; it closes once
    ``silence_ms`` of consecutive sub-threshold windows accumulate, ending
    at the first window of that silence run; segments shorter than
    ``min_speech_ms`` of accumulated speech windows are dropped; a segment
    still open at the end of the track is closed at ``total_ms``.
    """
    need_silence = max(1, silence_ms // window_ms)
    need_speech = max(1, min_speech_ms // window_ms)

    out: list[Segment] = []
    open_at: int | None = None  # ms where the current segment began
    voiced = 0  # speech windows inside the current segment
    quiet_run = 0  # trailing sub-threshold windows

    for w, p in enumerate(np.asarray(probs)):
        t_ms = w * window_ms
        if p >= threshold:
            if open_at is None:
                open_at = t_ms
                voiced = 0
            voiced += 1
            quiet_run = 0
        elif open_at is not None:
            quiet_run += 1
            if quiet_run >= need_silence:
                if voiced >= need_speech:
                    out.append(Segment(start_ms=open_at, end_ms=t_ms))
                open_at, voiced, quiet_run = None, 0, 0

    if open_at is not None and voiced >= need_speech:
        out.append(Segment(start_ms=open_at, end_ms=total_ms))
    return out


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

    def _prob_track(self, audio: np.ndarray) -> np.ndarray:
        """Per-window probabilities over consecutive 512-sample windows.

        All of a chunk's windows run in ONE device call (vad_scan) with
        one host sync; window counts snap to a power-of-two bucket so the
        compiled program set stays a handful of shapes."""
        n = (len(audio) - WINDOW) // WINDOW + 1 if len(audio) >= WINDOW else 0
        if n <= 0:
            return np.zeros((0,), np.float32)
        if self._step_fn is not None:  # scripted test fakes stay stepwise
            probs = [
                self._step(audio[s : s + WINDOW].astype(np.float32))
                for s in range(0, len(audio) - WINDOW + 1, WINDOW)
            ]
            return np.asarray(probs, dtype=np.float32)
        windows = np.ascontiguousarray(
            audio[: n * WINDOW], dtype=np.float32
        ).reshape(n, WINDOW)
        bucket = 1
        while bucket < n:
            bucket *= 2
        if bucket > n:
            windows = np.pad(windows, ((0, bucket - n), (0, 0)))
        probs, state = jax.device_get(
            vad_scan(
                self.session, jnp.asarray(windows),
                jnp.asarray(self._state), jnp.int32(n),
            )
        )
        self._state = state
        return np.asarray(probs[:n], np.float32)

    def __call__(self, audio: np.ndarray) -> float:
        """Max speech probability over consecutive 512-sample windows."""
        if len(audio) == 0:
            return 0.0
        track = self._prob_track(audio)
        return float(track.max()) if track.size else 0.0

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
        audio = (
            np.frombuffer(pcm16_bytes, dtype=np.int16).astype(np.float32) / 32768.0
        )
        return segments_from_probs(
            self._prob_track(audio),
            threshold=threshold if threshold is not None else self.threshold,
            window_ms=WINDOW * 1000 // self.sample_rate,
            min_speech_ms=min_speech_ms,
            silence_ms=silence_ms,
            total_ms=len(audio) * 1000 // self.sample_rate,
        )


def _find_vad_checkpoint() -> Path | None:
    """Locate a silero ONNX file: OS_VAD_ONNX_PATH, then the reference's
    cache dir (~/.cache/silero-vad/silero_vad.onnx)."""
    env = os.environ.get("OS_VAD_ONNX_PATH", "")
    candidates = [Path(env)] if env else []
    candidates.append(Path.home() / ".cache" / "silero-vad" / "silero_vad.onnx")
    for c in candidates:
        if c.is_file():
            return c
    return None


async def get_vad_model() -> SileroVAD:
    """Singleton VAD (reference: src/vad/silero.py:180-209).

    Loads converted silero weights when a checkpoint is present (no network
    egress in this deployment); falls back to random init with a warning so
    the serving stack stays functional for shape/flow testing.
    """
    global _vad_model
    if _vad_model is not None:
        return _vad_model
    async with _vad_lock:
        if _vad_model is not None:
            return _vad_model
        # VAD is control-path work gating the real device programs: run it
        # on the host CPU backend by default (a 128-wide LSTM costs
        # microseconds there) instead of queueing a round trip to the
        # accelerator for every 100 ms chunk of every session. The target
        # device is pinned BEFORE init: initializing on the accelerator
        # default and device_put-ing back was measured at 130+ s through
        # a relayed TPU (each small param leaf pays a relay round trip) —
        # it stalled the first streaming session's session.begin behind a
        # multi-minute transfer. Under jax.default_device the init
        # compiles and runs on the CPU backend and nothing ever crosses
        # the relay. Committed params pin every vad_step/vad_scan call.
        import contextlib

        want = os.environ.get("OS_VAD_DEVICE", "cpu")
        dev = None
        if want != "default":
            # first-time backend init can race concurrent jax work on
            # other threads (observed under load-time precompile: a
            # transient RuntimeError from jax.devices("cpu")) — retry
            # briefly before degrading to the accelerator default
            for attempt in range(3):
                try:
                    dev = jax.devices(want)[0]
                    break
                except RuntimeError:
                    if attempt == 2:
                        logger.warning(
                            "OS_VAD_DEVICE=%s unavailable; using default", want
                        )
                    else:
                        await asyncio.sleep(1.0)
        ctx = jax.default_device(dev) if dev is not None else contextlib.nullcontext()
        with ctx:
            ckpt = _find_vad_checkpoint()
            if ckpt is not None:
                params = convert_silero(ckpt)
                logger.info("JAX VAD model loaded from %s", ckpt)
            else:
                params = init_vad_params()
                logger.warning(
                    "No silero checkpoint found (OS_VAD_ONNX_PATH unset); "
                    "VAD running with random weights — speech probabilities "
                    "are not meaningful"
                )
            if dev is not None:
                params = jax.device_put(params, dev)  # no-op when born there
            # jit warmup so the first streaming chunk isn't a compile stall
            vad_step(params, jnp.zeros((1, WINDOW)), jnp.zeros((2, 1, _HIDDEN)))
            vad_scan(
                params, jnp.zeros((4, WINDOW)), jnp.zeros((2, 1, _HIDDEN)),
                jnp.int32(4),
            )
        _vad_model = SileroVAD(params)
        return _vad_model


def init_vad_params(key=None, dtype=jnp.float32) -> VADParams:
    """Random-init parameter pytree with the silero-v5 topology."""
    key = key if key is not None else jax.random.PRNGKey(42)
    return _init_vad_params_impl(key, dtype)
