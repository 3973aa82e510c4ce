"""Pydantic API schemas (reference: src/models.py + src/tts/models.py).

Field names, defaults, and shapes match the reference so clients see
identical JSON.
"""

from __future__ import annotations

import time

from pydantic import BaseModel, Field


class TranscriptionResponse(BaseModel):
    text: str


class Segment(BaseModel):
    id: int
    seek: int
    start: float
    end: float
    text: str
    tokens: list[int] = []
    temperature: float
    avg_logprob: float
    compression_ratio: float
    no_speech_prob: float


class TranscriptionVerboseResponse(BaseModel):
    task: str = "transcribe"
    language: str
    duration: float
    text: str
    segments: list[Segment] = []


class ModelObject(BaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "open-speech"


class ModelListResponse(BaseModel):
    object: str = "list"
    data: list[ModelObject] = []


class LoadedModelInfo(BaseModel):
    model: str
    backend: str
    device: str
    compute_type: str
    loaded_at: float
    last_used_at: float | None = None
    is_default: bool = False
    ttl_remaining: float | None = None


class LoadedModelsResponse(BaseModel):
    models: list[LoadedModelInfo] = []


class PullResponse(BaseModel):
    status: str
    model: str


class HealthResponse(BaseModel):
    status: str = "ok"
    version: str
    models_loaded: int = 0


# ── TTS (reference: src/tts/models.py) ────────────────────────────────


class TTSSpeechRequest(BaseModel):
    """OpenAI-compatible speech request (reference: src/tts/models.py:8-21)."""

    model: str = "kokoro"
    input: str
    voice: str = "alloy"
    response_format: str = "mp3"
    speed: float = Field(default=1.0, ge=0.25, le=4.0)
    voice_design: str | None = None
    reference_audio: str | None = None  # base64 or URL of reference audio
    language: str | None = None
    clone_transcript: str | None = None
    input_type: str = "text"  # "text" | "ssml"
    effects: list[dict] | None = None


class VoiceObject(BaseModel):
    id: str
    name: str
    language: str = "en-us"
    gender: str = "unknown"


class VoiceListResponse(BaseModel):
    voices: list[VoiceObject] = []


class ModelLoadRequest(BaseModel):
    model: str = "kokoro"


class ModelUnloadRequest(BaseModel):
    model: str = "kokoro"
