"""Speaker diarization service (reference: src/diarization/pyannote_diarizer.py).

The reference gates torch/pyannote behind an optional dependency and raises
RuntimeError when missing (:19); the same enablement contract holds here
(STT_DIARIZE_ENABLED), but the model is the JAX embedding diarizer
(models/diarize.py) — windowed speaker embeddings on device, agglomerative
clustering on host. ``attach_text_to_speakers`` keeps the reference's naive
word-allocation behavior (:35-55).
"""

from __future__ import annotations

import numpy as np

from open_speech_tpu.models.diarize import JaxDiarizer
from open_speech_tpu.ops import audio as codec

_shared: JaxDiarizer | None = None


class Diarizer:
    """JAX diarizer behind the reference's enablement gate."""

    def __init__(self) -> None:
        from open_speech_tpu.config import settings

        if not settings.stt_diarize_enabled:
            raise RuntimeError(
                "Diarization is disabled. Set STT_DIARIZE_ENABLED=true"
            )
        global _shared
        if _shared is None:
            _shared = JaxDiarizer()
        self._model = _shared

    def diarize(self, wav_bytes: bytes) -> list[dict]:
        """WAV bytes -> [{speaker, start, end}] turns."""
        audio, sr = codec.read_wav(wav_bytes)
        if len(audio) == 0:
            return []
        if sr != 16000:
            import jax.numpy as jnp

            from open_speech_tpu.ops.resample import resample_poly

            audio = np.asarray(resample_poly(jnp.asarray(audio), 16000, sr))
        return self._model.diarize_audio(audio)


def attach_text_to_speakers(text: str, segments: list[dict]) -> list[dict]:
    """Naively distribute words across speaker turns (reference :35-55)."""
    words = text.split()
    if not segments or not words:
        return segments
    total_dur = sum(s["end"] - s["start"] for s in segments) or 1.0
    out = []
    idx = 0
    for seg in segments:
        share = (seg["end"] - seg["start"]) / total_dur
        count = max(1, int(round(share * len(words))))
        seg_words = words[idx : idx + count]
        idx += count
        out.append({**seg, "text": " ".join(seg_words)})
    if idx < len(words) and out:
        out[-1]["text"] = (out[-1]["text"] + " " + " ".join(words[idx:])).strip()
    return out
