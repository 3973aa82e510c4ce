"""JAX Piper TTS backend (reference: src/tts/backends/piper_backend.py).

Single-speaker semantics: the model id (``piper/en_US-lessac-medium``)
doubles as the voice selector (reference router passes the model id when
``single_speaker`` is set, src/tts/router.py:156-160). The curated 30-voice
catalog with per-voice quality tiers matches the reference's registry
(:21-202); speed maps to ``length_scale = 1/speed`` (:381). Each voice gets
its own deterministic parameter seed, so distinct voices produce distinct
(random-weight) generators until converted ONNX weights are dropped in.
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
import jax.numpy as jnp

from open_speech_tpu.models.piper import (
    PiperConfig,
    init_piper_params,
)
from open_speech_tpu.models.piper.convert import convert_piper_onnx
from open_speech_tpu.models.piper.model import SAMPLE_RATE
from open_speech_tpu.text.g2p import get_g2p, split_sentences
from open_speech_tpu.text.g2p_langs import base_lang
from open_speech_tpu.tts.backends.base import (
    DEFAULT_TTS_CAPABILITIES,
    TTSLoadedModelInfo,
    VoiceInfo,
)

logger = logging.getLogger(__name__)

# voice id -> (sample_rate, quality); ids match the reference registry
PIPER_VOICES: dict[str, dict[str, Any]] = {
    f"piper/{vid}": {"sample_rate": sr, "quality": q}
    for vid, sr, q in [
        ("en_US-lessac-low", 16000, "low"),
        ("en_US-lessac-medium", 22050, "medium"),
        ("en_US-lessac-high", 22050, "high"),
        ("en_US-amy-medium", 22050, "medium"),
        ("en_US-amy-high", 22050, "high"),
        ("en_US-arctic-medium", 22050, "medium"),
        ("en_US-bryce-medium", 22050, "medium"),
        ("en_US-danny-low", 16000, "low"),
        ("en_US-hfc_female-medium", 22050, "medium"),
        ("en_US-hfc_male-medium", 22050, "medium"),
        ("en_US-joe-medium", 22050, "medium"),
        ("en_US-john-medium", 22050, "medium"),
        ("en_US-kathleen-low", 16000, "low"),
        ("en_US-kusal-medium", 22050, "medium"),
        ("en_US-libritts_r-medium", 22050, "medium"),
        ("en_US-ljspeech-medium", 22050, "medium"),
        ("en_US-ljspeech-high", 22050, "high"),
        ("en_US-norman-medium", 22050, "medium"),
        ("en_US-ryan-low", 16000, "low"),
        ("en_US-ryan-medium", 22050, "medium"),
        ("en_US-ryan-high", 22050, "high"),
        ("en_GB-alan-low", 16000, "low"),
        ("en_GB-alan-medium", 22050, "medium"),
        ("en_GB-cori-medium", 22050, "medium"),
        ("en_GB-cori-high", 22050, "high"),
        ("en_GB-jenny_dioco-medium", 22050, "medium"),
        ("en_GB-northern_english_male-medium", 22050, "medium"),
        ("en_GB-semaine-medium", 22050, "medium"),
        ("en_GB-southern_english_female-low", 16000, "low"),
        ("en_GB-southern_english_female-medium", 22050, "medium"),
    ]
}

DEFAULT_VOICE = "piper/en_US-lessac-medium"


class PiperBackend:
    name = "piper"
    sample_rate = SAMPLE_RATE  # nominal; per-voice rates in PIPER_VOICES
    single_speaker = True  # router passes model id as voice
    capabilities: dict[str, Any] = {
        **DEFAULT_TTS_CAPABILITIES,
        "streaming": True,
        "languages": ["en-us", "en-gb"],
    }

    @classmethod
    def is_available(cls) -> bool:
        return True

    def __init__(self, device: str = "auto") -> None:
        self._device_arg = device
        self._cfg = PiperConfig()
        self._models: dict[str, Any] = {}
        self._loaded_at: dict[str, float] = {}
        self._last_used: dict[str, float] = {}
        self._g2p = get_g2p()

    @property
    def _device(self) -> str:
        return (
            jax.default_backend() if self._device_arg == "auto" else self._device_arg
        )

    def _canonical(self, model_id: str) -> str:
        if model_id in ("piper", self.name, ""):
            return DEFAULT_VOICE
        if not model_id.startswith("piper/"):
            model_id = "piper/" + model_id.removeprefix("piper-")
        return model_id

    # ── lifecycle ─────────────────────────────────────────────────────

    @staticmethod
    def _find_voice_file(short: str) -> Path | None:
        """Locate a piper ONNX voice checkpoint on disk.

        Search order: OS_PIPER_VOICES_DIR, then the conventional local
        caches the piper ecosystem uses.
        """
        roots = []
        env = os.environ.get("OS_PIPER_VOICES_DIR", "")
        if env:
            roots.append(Path(env))
        roots += [
            Path.home() / ".cache" / "piper-voices",
            Path.home() / ".local" / "share" / "piper",
        ]
        for root in roots:
            cand = root / f"{short}.onnx"
            if cand.is_file():
                return cand
        return None

    def load_model(self, model_id: str) -> None:
        mid = self._canonical(model_id)
        if mid in self._models:
            self._last_used[mid] = time.time()
            return
        t0 = time.time()
        short = mid.removeprefix("piper/")
        ckpt = self._find_voice_file(short)
        if mid not in PIPER_VOICES and ckpt is None:
            # registry voices run weightless; ad-hoc voices (any language)
            # need their ONNX file on disk (reference auto-loads downloaded
            # voices, piper_backend.py:350-373)
            raise ValueError(f"Unknown piper voice: {model_id}")
        if ckpt is not None:
            params, cfg, meta = convert_piper_onnx(ckpt)
            cfg = PiperConfig(
                **{
                    **cfg.__dict__,
                    "max_phonemes": self._cfg.max_phonemes,
                    "max_frames": self._cfg.max_frames,
                }
            )
            self._models[mid] = (params, cfg, meta)
            logger.info("piper voice %s converted from %s", mid, ckpt)
        else:
            seed = int.from_bytes(
                hashlib.sha256(mid.encode()).digest()[:4], "little"
            )
            params = init_piper_params(jax.random.PRNGKey(seed), self._cfg)
            self._models[mid] = (params, self._cfg, {})
            logger.warning(
                "piper voice %s running with random weights (no checkpoint "
                "under OS_PIPER_VOICES_DIR)", mid
            )
        now = time.time()
        self._loaded_at[mid] = now
        self._last_used[mid] = now
        logger.info("piper voice %s ready in %.1fs", mid, now - t0)

    def unload_model(self, model_id: str) -> None:
        mid = self._canonical(model_id)
        if mid in self._models:
            from open_speech_tpu.runtime.tts_batcher import (
                release_piper_batcher,
            )

            release_piper_batcher(self, mid)  # free the voice's params
        self._models.pop(mid, None)
        self._loaded_at.pop(mid, None)
        self._last_used.pop(mid, None)

    def is_model_loaded(self, model_id: str) -> bool:
        return self._canonical(model_id) in self._models

    def loaded_models(self) -> list[TTSLoadedModelInfo]:
        return [
            TTSLoadedModelInfo(
                model=mid,
                backend=self.name,
                device=self._device,
                loaded_at=self._loaded_at.get(mid, 0.0),
                last_used_at=self._last_used.get(mid),
            )
            for mid in self._models
        ]

    # ── voices ────────────────────────────────────────────────────────

    def list_voices(self) -> list[VoiceInfo]:
        out = []
        for vid in PIPER_VOICES:
            short = vid.removeprefix("piper/")
            lang = "en-gb" if short.startswith("en_GB") else "en-us"
            out.append(
                VoiceInfo(id=vid, name=short, language=lang, gender="unknown")
            )
        return out

    # ── synthesis ─────────────────────────────────────────────────────

    def _voice_rate(self, mid: str) -> int:
        return PIPER_VOICES.get(mid, {}).get("sample_rate", SAMPLE_RATE)

    def get_sample_rate(self, model_id: str) -> int:
        """Native rate of a specific voice: the converted checkpoint's
        config wins (the .onnx.json declares it), else the registry's
        per-voice rate, else the 22.05 kHz default."""
        mid = self._canonical(model_id.split("#", 1)[0])
        entry = self._models.get(mid)
        if entry is not None:
            rate = getattr(entry[1], "sample_rate", 0)
            if rate:
                return int(rate)
        return self._voice_rate(mid)

    @staticmethod
    def _resolve_speaker(meta: dict, cfg, selector: str | None) -> int:
        """Speaker selector → embedding row (multi-speaker models only)."""
        n = getattr(cfg, "n_speakers", 1)
        if selector is None or n <= 1:
            return 0
        id_map = meta.get("speaker_id_map") or {}
        if selector in id_map:
            return int(id_map[selector]) % n
        try:
            return int(selector) % n
        except ValueError:
            raise ValueError(
                f"Unknown speaker '{selector}'; known: "
                f"{sorted(id_map) or list(range(n))}"
            )

    def synthesize(
        self,
        text: str,
        voice: str,
        speed: float = 1.0,
        lang_code: str | None = None,
    ) -> Iterator[np.ndarray]:
        # multi-speaker voices select the speaker after '#':
        # "piper/<model>#<speaker-name-or-id>" (reference resolves the
        # speaker through the config's speaker_id_map, :408-417)
        speaker_sel = None
        if "#" in voice:
            voice, speaker_sel = voice.split("#", 1)
        mid = self._canonical(voice)
        if mid not in self._models:
            self.load_model(mid)  # auto-load fallback (reference :350-373)
        self._last_used[mid] = time.time()
        params, cfg, meta = self._models[mid]
        speaker_id = self._resolve_speaker(meta, cfg, speaker_sel)
        short = mid.removeprefix("piper/")
        lang = lang_code or base_lang(short)
        if not self._g2p.supports_language(lang):
            raise ValueError(
                f"language_not_supported: piper voice '{short}' needs {lang} "
                "G2P (install espeak-ng for full language coverage)"
            )
        speed = speed if speed and speed > 0 else 1.0
        # the voice json's configured default rate: piper multiplies
        # durations by length_scale, we divide by speed — fold it in so a
        # voice shipped with e.g. 1.1 speaks at its intended rate
        speed_eff = speed / float(meta.get("length_scale") or 1.0)
        from open_speech_tpu.config import settings as _settings
        from open_speech_tpu.runtime.tts_batcher import (
            _piper_rows,
            get_piper_batcher,
        )

        use_batcher = _settings.os_tts_batcher_enabled
        for si, sentence in enumerate(split_sentences(text) or [text]):
            ids = self._g2p.to_ids(
                sentence, id_map=meta.get("phoneme_id_map"), voice=lang
            )
            # an over-long sentence SPLITS across multiple synthesis calls
            # instead of silently dropping its tail words
            for pi in range(0, max(len(ids), 1), cfg.max_phonemes):
                piece = ids[pi : pi + cfg.max_phonemes]
                n = len(piece)
                seed = si * 9973 + pi
                if use_batcher:
                    # concurrent requests share one batched VITS program;
                    # per-row seeded noise keeps output independent of
                    # who the request is batched with
                    for chunk in get_piper_batcher(self, mid).synthesize(
                        piece, speaker_id, speed_eff, seed
                    ):
                        if chunk.size:
                            yield chunk
                    continue
                phonemes = np.zeros((1, cfg.max_phonemes), np.int32)
                phonemes[0, :n] = piece
                audio, n_frames = _piper_rows(
                    params,
                    cfg,
                    jnp.asarray(phonemes),
                    jnp.asarray([n], jnp.int32),
                    jnp.asarray([speaker_id], jnp.int32),
                    jnp.asarray([speed_eff], jnp.float32),
                    jnp.asarray([seed], jnp.uint32),
                )
                samples = int(n_frames[0]) * cfg.samples_per_frame
                chunk = np.asarray(audio[0, :samples], np.float32)
                if chunk.size:
                    yield chunk
