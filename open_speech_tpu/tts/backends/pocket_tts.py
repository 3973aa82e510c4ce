"""Pocket-TTS backend: streaming Mimi-LM TTS with audio-prompt voice cloning.

Serving surface parity with the reference pocket-tts backend
(src/tts/backends/pocket_tts_backend.py: 8 speakers :16-25, per-voice cached
prompt state :127-134, native streaming generator :157-166) plus the extended
capabilities the reference only documents for Qwen3-TTS
(voice_design/reference_audio/clone_transcript, capability-gated at
src/main.py:122-134,716).

The model behind it is the real Kyutai pocket-tts architecture
(models/pocket/: Mimi codec + delayed-streams LM). Voices ARE audio prompts:

- named speakers resolve to prompt WAVs (``OS_POCKET_VOICES_DIR``; with no
  voice files, a deterministic synthetic prompt per name so the path runs);
- ``reference_audio`` (clone) encodes the user's clip through Mimi and
  teacher-forces it into the LM's KV caches — the reference's
  ``get_state_for_audio_prompt`` flow;
- ``voice_design`` maps the description to a deterministic synthetic prompt
  (with converted weights, a description-conditioned prompt library can be
  dropped into the voices dir).

Prompt states (warmed KV caches) are cached per voice, mirroring
pocket_tts_backend.py:127-134.
"""

from __future__ import annotations

import hashlib
import logging
import os
import time
from pathlib import Path
from typing import Any, Iterator

import numpy as np

import jax

from open_speech_tpu.models.pocket import (
    MIMI_TEST_TINY,
    PocketTTS,
    PromptState,
    TEST_TINY_LM,
)
from open_speech_tpu.models.pocket.model import SAMPLE_RATE
from open_speech_tpu.ops import audio as codec
from open_speech_tpu.tts.backends.base import (
    DEFAULT_TTS_CAPABILITIES,
    TTSLoadedModelInfo,
    VoiceInfo,
)

logger = logging.getLogger(__name__)

# 8 named speakers (reference pocket-tts speaker set, pocket_tts_backend.py:16-25)
SPEAKERS = [
    "alice", "bob", "carol", "dave", "eve", "frank", "grace", "henry",
]

_PROMPT_SECONDS = 0.5  # synthetic fallback prompt length
_PROMPT_CACHE_MAX = 8  # warmed KV caches are large; bound the cache


def _synthetic_prompt(seed_text: str, sample_rate: int) -> np.ndarray:
    """Deterministic speech-band prompt clip for a name/description.

    Stands in for a real prompt WAV when none is installed: a few seeded
    harmonics with an envelope, normalized. Distinct seeds → distinct
    prompts → distinct cloned voices, through the *real* clone machinery.
    """
    seed = int.from_bytes(hashlib.sha256(seed_text.encode()).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    n = int(_PROMPT_SECONDS * sample_rate)
    t = np.arange(n) / sample_rate
    f0 = 80.0 + 160.0 * rng.random()
    sig = np.zeros(n, np.float32)
    for h in range(1, 6):
        sig += (rng.random() * 0.5 / h) * np.sin(
            2 * np.pi * f0 * h * t + rng.random() * 6.28
        ).astype(np.float32)
    sig += 0.05 * rng.standard_normal(n).astype(np.float32)
    env = 0.5 - 0.5 * np.cos(2 * np.pi * np.minimum(t / t[-1], 1.0))
    sig *= env.astype(np.float32)
    peak = np.abs(sig).max() or 1.0
    return (0.6 * sig / peak).astype(np.float32)


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
        self._model: PocketTTS | None = None
        self._loaded_at: float | None = None
        self._last_used: float | None = None
        # per-voice cached prompt state (reference :127-134)
        self._prompt_cache: dict[str, PromptState] = {}

    @property
    def _device(self) -> str:
        return (
            jax.default_backend() if self._device_arg == "auto" else self._device_arg
        )

    # ── lifecycle ─────────────────────────────────────────────────────

    @staticmethod
    def _find_checkpoint() -> Path | None:
        """Locate converted/torch pocket-tts weights: OS_POCKET_CKPT_PATH,
        then the HF cache layout (kyutai/pocket-tts*)."""
        import glob

        env = os.environ.get("OS_POCKET_CKPT_PATH", "")
        if env and Path(env).exists():
            return Path(env)
        hub = Path.home() / ".cache" / "huggingface" / "hub"
        for pat in ("models--kyutai--pocket-tts*/snapshots/*",):
            hits = sorted(glob.glob(str(hub / pat)))
            if hits:
                return Path(hits[0])
        return None

    def load_model(self, model_id: str = "pocket-tts") -> None:
        if self._model is not None:
            self._last_used = time.time()
            return
        t0 = time.time()
        ckpt = self._find_checkpoint()
        if ckpt is not None:
            self._model = PocketTTS.from_checkpoint(ckpt)
            logger.info("pocket-tts weights converted from %s", ckpt)
        else:
            # structurally complete random-init fallback; geometry selectable
            # so CPU tests stay fast while TPU serving can exercise full size
            preset = os.environ.get("OS_POCKET_PRESET", "tiny")
            if preset == "base":
                lm_cfg = mimi_cfg = None
            else:
                from dataclasses import replace

                # tiny geometry, but enough KV context that a voice prompt
                # plus a long sentence still fits (max_ctx//2 prompt cap)
                lm_cfg = replace(TEST_TINY_LM, max_ctx=512)
                mimi_cfg = MIMI_TEST_TINY
            self._model = PocketTTS.random_init(
                jax.random.PRNGKey(11), lm_cfg=lm_cfg, mimi_cfg=mimi_cfg
            )
            logger.warning(
                "No pocket-tts checkpoint found (OS_POCKET_CKPT_PATH unset); "
                "running with random weights — audio is not speech"
            )
        self._warmup()
        self._loaded_at = self._last_used = time.time()
        logger.info("pocket-tts ready in %.1fs", time.time() - t0)

    def _warmup(self) -> None:
        """Compile the serving programs at load (same policy as the whisper
        and kokoro backends): one short unconditioned generation drives the
        bucketed text prefill, the fused LM step, and the Mimi block
        decoder — without it the FIRST /v1/audio/speech on pocket-tts pays
        every compile mid-request (minutes at the real 16x1024 geometry
        through a device relay)."""
        from open_speech_tpu.config import settings

        if not bool(settings.os_precompile_on_load):
            return
        try:
            for _ in self._model.generate_stream("hi", max_frames=4):
                pass
            if settings.os_tts_batcher_enabled:
                from open_speech_tpu.runtime.pocket_batcher import (
                    get_pocket_batcher,
                )

                get_pocket_batcher(self).precompile()
        except Exception:  # noqa: BLE001 — warmup must never block load
            logger.exception("pocket-tts warmup failed")

    def unload_model(self, model_id: str = "pocket-tts") -> None:
        from open_speech_tpu.runtime.pocket_batcher import release_pocket_batcher

        release_pocket_batcher(self)  # free the slot-pool KV HBM
        self._model = None
        self._loaded_at = None
        self._prompt_cache.clear()

    def is_model_loaded(self, model_id: str = "pocket-tts") -> bool:
        return self._model is not None and model_id in ("pocket-tts", self.name)

    def loaded_models(self) -> list[TTSLoadedModelInfo]:
        if self._model is None:
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

    # ── prompt-state resolution (the voice) ───────────────────────────

    def _cache_get(self, key: str) -> PromptState | None:
        """LRU hit: move to the back so hot voices outlive cold ones."""
        state = self._prompt_cache.get(key)
        if state is not None:
            self._prompt_cache.pop(key)
            self._prompt_cache[key] = state
        return state

    def _cache_put(self, key: str, state: PromptState) -> None:
        if len(self._prompt_cache) >= _PROMPT_CACHE_MAX:
            # dict preserves insertion order; with _cache_get refreshing
            # position on hit, the front is the least-recently-used entry
            self._prompt_cache.pop(next(iter(self._prompt_cache)))
        self._prompt_cache[key] = state

    def _prompt_pcm_for_name(self, name: str) -> np.ndarray:
        voices_dir = os.environ.get("OS_POCKET_VOICES_DIR", "")
        if voices_dir:
            wav = Path(voices_dir) / f"{name}.wav"
            if wav.is_file():
                return self._load_prompt_wav(wav.read_bytes())
        return _synthetic_prompt(name, self._model.sample_rate)

    def _load_prompt_wav(self, data: bytes) -> np.ndarray:
        audio, rate = codec.read_wav(data)
        sr = self._model.sample_rate
        if rate != sr:
            import jax.numpy as jnp

            from open_speech_tpu.ops.resample import resample_poly

            audio = np.asarray(resample_poly(jnp.asarray(audio), sr, rate))
        return audio.astype(np.float32)

    def _speaker_state(self, voice: str) -> PromptState:
        name = voice.removeprefix("pocket/").lower()
        state = self._cache_get(name)
        if state is None:
            state = self._model.state_for_audio_prompt(
                self._prompt_pcm_for_name(name)
            )
            self._cache_put(name, state)
        return state

    def _clone_state(self, reference_audio: bytes) -> PromptState:
        key = "sha:" + hashlib.sha256(reference_audio).hexdigest()
        state = self._cache_get(key)
        if state is None:
            pcm = self._load_prompt_wav(reference_audio)
            state = self._model.state_for_audio_prompt(pcm)
            self._cache_put(key, state)
        return state

    def _design_state(self, description: str) -> PromptState:
        key = "design:" + description
        state = self._cache_get(key)
        if state is None:
            pcm = _synthetic_prompt(description, self._model.sample_rate)
            state = self._model.state_for_audio_prompt(pcm)
            self._cache_put(key, state)
        return state

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
        if self._model is None:
            self.load_model()
        self._last_used = time.time()
        if reference_audio:
            state = self._clone_state(reference_audio)
        elif voice_design:
            state = self._design_state(voice_design)
        else:
            state = self._speaker_state(voice or SPEAKERS[0])
        # clone_transcript conditions the prompt text in the reference; the
        # audio prompt already carries the voice, so it is accepted and unused
        # (reference accepts it the same way: pocket_tts_backend.py:157-166).
        # no speed control (reference parity): generation is at model rate
        from open_speech_tpu.config import settings

        if settings.os_tts_batcher_enabled:
            # concurrent sessions share the fused slot-pool LM step +
            # batched Mimi decode instead of one AR loop per thread
            from open_speech_tpu.runtime.pocket_batcher import (
                get_pocket_batcher,
            )

            for chunk in get_pocket_batcher(self).synthesize(text, state):
                if chunk.size:
                    yield chunk
            return
        for block in self._model.generate_stream(text, state):
            chunk = np.asarray(block, np.float32)
            if chunk.size:
                yield chunk
