"""Pocket-TTS backend: streaming TTS with voice cloning + voice design.

Serving surface parity with the reference pocket-tts backend
(src/tts/backends/pocket_tts_backend.py: 8 speakers :16-25, per-voice cached
prompt state :127-134, native streaming :157-166) plus the extended
capabilities the reference only documents for Qwen3-TTS
(voice_design/reference_audio/clone_transcript, capability-gated at
src/main.py:122-134,716): this backend declares voice_clone and voice_design
True, so those API paths run end to end.
"""

from __future__ import annotations

import hashlib
import logging
import time
from typing import Any, Iterator

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.models.pocket import (
    PocketConfig,
    init_pocket_params,
    style_from_audio,
    style_from_text,
    synthesize_pocket,
)
from open_speech_tpu.models.pocket.model import SAMPLE_RATE, compute_ref_mel
from open_speech_tpu.ops import audio as codec
from open_speech_tpu.text.g2p import get_g2p, split_sentences
from open_speech_tpu.tts.backends.base import (
    DEFAULT_TTS_CAPABILITIES,
    TTSLoadedModelInfo,
    VoiceInfo,
)

logger = logging.getLogger(__name__)

# 8 named speakers (reference pocket-tts speaker set, :16-25)
SPEAKERS = [
    "alice", "bob", "carol", "dave", "eve", "frank", "grace", "henry",
]


class PocketTTSBackend:
    name = "pocket-tts"
    sample_rate = SAMPLE_RATE
    single_speaker = False
    capabilities: dict[str, Any] = {
        **DEFAULT_TTS_CAPABILITIES,
        "streaming": True,
        "voice_clone": True,
        "voice_design": True,
        "speakers": SPEAKERS,
        "speed_control": False,  # reference pocket-tts has no speed control
    }

    @classmethod
    def is_available(cls) -> bool:
        return True

    def __init__(self, device: str = "auto") -> None:
        self._device_arg = device
        from open_speech_tpu.models.kokoro.model import resolve_kokoro_config

        self._cfg = PocketConfig(base=resolve_kokoro_config())
        self._params = None
        self._loaded_at: float | None = None
        self._last_used: float | None = None
        self._g2p = get_g2p()
        # per-voice cached style state (reference :127-134)
        self._style_cache: dict[str, np.ndarray] = {}

    @property
    def _device(self) -> str:
        return (
            jax.default_backend() if self._device_arg == "auto" else self._device_arg
        )

    # ── lifecycle ─────────────────────────────────────────────────────

    def load_model(self, model_id: str = "pocket-tts") -> None:
        if self._params is not None:
            self._last_used = time.time()
            return
        t0 = time.time()
        self._params = init_pocket_params(jax.random.PRNGKey(11), self._cfg)
        self._loaded_at = self._last_used = time.time()
        logger.info("pocket-tts initialized in %.1fs", time.time() - t0)

    def unload_model(self, model_id: str = "pocket-tts") -> None:
        self._params = None
        self._loaded_at = None
        self._style_cache.clear()

    def is_model_loaded(self, model_id: str = "pocket-tts") -> bool:
        return self._params is not None and model_id in ("pocket-tts", self.name)

    def loaded_models(self) -> list[TTSLoadedModelInfo]:
        if self._params is None:
            return []
        return [
            TTSLoadedModelInfo(
                model="pocket-tts",
                backend=self.name,
                device=self._device,
                loaded_at=self._loaded_at or 0.0,
                last_used_at=self._last_used,
            )
        ]

    def list_voices(self) -> list[VoiceInfo]:
        return [
            VoiceInfo(id=f"pocket/{s}", name=s.capitalize(), language="en-us")
            for s in SPEAKERS
        ]

    # ── style resolution ──────────────────────────────────────────────

    def _speaker_style(self, voice: str) -> np.ndarray:
        name = voice.removeprefix("pocket/").lower()
        if name in SPEAKERS:
            idx = SPEAKERS.index(name)
            return np.asarray(self._params["speakers"][idx])
        # unknown name: deterministic embedding so any string is usable
        return style_from_text(name, self._cfg.voice_dim)

    def _clone_style(self, reference_audio: bytes) -> np.ndarray:
        key = hashlib.sha256(reference_audio).hexdigest()
        cached = self._style_cache.get(key)
        if cached is not None:
            return cached
        audio, rate = codec.read_wav(reference_audio)
        if rate != 16000:
            from open_speech_tpu.ops.resample import resample_poly

            audio = np.asarray(resample_poly(jnp.asarray(audio), 16000, rate))
        mel, n_frames = compute_ref_mel(audio, self._cfg)
        style = np.asarray(
            style_from_audio(self._params, self._cfg, mel, n_frames)[0]
        )
        self._style_cache[key] = style
        return style

    # ── synthesis ─────────────────────────────────────────────────────

    def synthesize(
        self,
        text: str,
        voice: str,
        speed: float = 1.0,
        lang_code: str | None = None,
        reference_audio: bytes | None = None,
        clone_transcript: str | None = None,
        voice_design: str | None = None,
    ) -> Iterator[np.ndarray]:
        if self._params is None:
            self.load_model()
        self._last_used = time.time()
        if reference_audio:
            style = self._clone_style(reference_audio)
        elif voice_design:
            style = style_from_text(voice_design, self._cfg.voice_dim)
        else:
            style = self._speaker_style(voice or SPEAKERS[0])
        # no speed control (reference parity): speed pinned to 1.0
        for sentence in split_sentences(text) or [text]:
            ids = self._g2p.to_ids(sentence)[: self._cfg.base.max_phonemes]
            n = len(ids)
            phonemes = np.zeros((1, self._cfg.base.max_phonemes), np.int32)
            phonemes[0, :n] = ids
            audio, n_frames = synthesize_pocket(
                self._params,
                self._cfg,
                jnp.asarray(phonemes),
                jnp.asarray([n], jnp.int32),
                jnp.asarray(style[None, :]),
                jnp.asarray([1.0], jnp.float32),
            )
            samples = int(n_frames[0]) * self._cfg.samples_per_frame
            chunk = np.asarray(audio[0, :samples], np.float32)
            if chunk.size:
                yield chunk
