"""Named WAV reference store for voice cloning (reference: src/voice_library.py).

RIFF header validation (:19-21), name sanitization (:130-137), max-count cap
(:56-62), JSON metadata sidecars.
"""

from __future__ import annotations

import json
import logging
import re
import threading
from datetime import datetime, timezone
from pathlib import Path

logger = logging.getLogger(__name__)


class VoiceNotFoundError(KeyError):
    """Raised when a named voice entry does not exist."""


def _is_wav_bytes(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


_EXT_FOR_CONTENT_TYPE = {
    "audio/wav": "wav",
    "audio/x-wav": "wav",
    "audio/mp3": "mp3",
    "audio/mpeg": "mp3",
    "audio/ogg": "ogg",
    "audio/flac": "flac",
}


class VoiceLibraryManager:
    def __init__(self, library_path: str | Path, max_count: int = 0) -> None:
        self.library_path = Path(library_path)
        self.max_count = max_count  # 0 = unlimited
        self._lock = threading.RLock()
        with self._lock:
            self.library_path.mkdir(parents=True, exist_ok=True)

    def save(
        self, name: str, audio_bytes: bytes, content_type: str = "audio/wav"
    ) -> dict:
        safe_name = self._sanitize_name(name)
        if not audio_bytes:
            raise ValueError("Audio data is empty")
        if not _is_wav_bytes(audio_bytes):
            raise ValueError(
                "Reference audio must be WAV format (RIFF/WAVE header "
                "required). Convert MP3/OGG/FLAC to WAV before uploading."
            )
        ext = self._ext(content_type)
        metadata = {
            "name": safe_name,
            "size_bytes": len(audio_bytes),
            "content_type": content_type,
            "created_at": datetime.now(timezone.utc).isoformat(),
        }
        meta_path = self._meta_path(safe_name)
        audio_path = self.library_path / f"{safe_name}.audio.{ext}"
        with self._lock:
            self.library_path.mkdir(parents=True, exist_ok=True)
            if self.max_count > 0 and not meta_path.exists():
                count = sum(1 for _ in self.library_path.glob("*.meta.json"))
                if count >= self.max_count:
                    raise ValueError(
                        f"Voice library is full ({self.max_count} voices max). "
                        "Delete a voice before adding more."
                    )
            for existing in self.library_path.glob(f"{safe_name}.audio.*"):
                if existing != audio_path:
                    existing.unlink(missing_ok=True)
            audio_path.write_bytes(audio_bytes)
            meta_path.write_text(json.dumps(metadata), encoding="utf-8")
        return metadata

    def list_voices(self) -> list[dict]:
        with self._lock:
            voices: list[dict] = []
            for meta_path in self.library_path.glob("*.meta.json"):
                try:
                    item = json.loads(meta_path.read_text(encoding="utf-8"))
                    if not isinstance(item, dict):
                        continue
                    ext = self._ext(item.get("content_type", "audio/wav"))
                    audio_path = (
                        self.library_path / f"{item.get('name', '')}.audio.{ext}"
                    )
                    if not audio_path.exists():
                        logger.warning(
                            "Voice library: audio missing for '%s' — skipping",
                            item.get("name"),
                        )
                        continue
                    voices.append(item)
                except Exception as exc:  # noqa: BLE001
                    logger.warning(
                        "Voice library: skipping corrupted metadata %s (%s)",
                        meta_path, exc,
                    )
            voices.sort(key=lambda x: x.get("name", ""))
            return voices

    def get(self, name: str) -> tuple[bytes, dict]:
        safe_name = self._sanitize_name(name)
        with self._lock:
            meta_path = self._meta_path(safe_name)
            if not meta_path.exists():
                raise VoiceNotFoundError(name)
            metadata = json.loads(meta_path.read_text(encoding="utf-8"))
            ext = self._ext(metadata.get("content_type", "audio/wav"))
            audio_path = self.library_path / f"{safe_name}.audio.{ext}"
            if not audio_path.exists():
                raise VoiceNotFoundError(name)
            return audio_path.read_bytes(), metadata

    def delete(self, name: str) -> None:
        safe_name = self._sanitize_name(name)
        with self._lock:
            meta_path = self._meta_path(safe_name)
            matched = list(self.library_path.glob(f"{safe_name}.audio.*"))
            if not meta_path.exists() and not matched:
                raise VoiceNotFoundError(name)
            meta_path.unlink(missing_ok=True)
            for p in matched:
                p.unlink(missing_ok=True)

    def exists(self, name: str) -> bool:
        with self._lock:
            return self._meta_path(self._sanitize_name(name)).exists()

    def _meta_path(self, safe_name: str) -> Path:
        return self.library_path / f"{safe_name}.meta.json"

    @staticmethod
    def _sanitize_name(name: str) -> str:
        safe = name.strip().lower().replace(" ", "_").replace("-", "_")
        safe = re.sub(r"[^a-z0-9_]", "", safe)[:64]
        if not safe:
            raise ValueError(
                "Voice name must contain at least one alphanumeric character"
            )
        return safe

    @staticmethod
    def _ext(content_type: str) -> str:
        return _EXT_FOR_CONTENT_TYPE.get(content_type.lower().strip(), "wav")
