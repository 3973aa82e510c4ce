"""Speaker diarization (reference: src/diarization/pyannote_diarizer.py).

The reference gates pyannote behind an optional dependency and raises a
RuntimeError when missing (:19); this deployment has no pyannote weights, so
the same contract holds: ``Diarizer`` raises unless a diarization model is
available, and ``attach_text_to_speakers`` keeps the reference's naive
word-allocation behavior (:35-55) for when one is.

A JAX segmentation+embedding diarizer is the planned replacement; the energy
fallback below provides a weight-free two-speaker heuristic for tests.
"""

from __future__ import annotations

import numpy as np

from open_speech_tpu.ops import audio as codec


class Diarizer:
    """Energy-based segment diarizer (single-speaker label without weights).

    Raises RuntimeError when diarization is disabled to mirror the
    reference's optional-dependency behavior.
    """

    def __init__(self) -> None:
        from open_speech_tpu.config import settings

        if not settings.stt_diarize_enabled:
            raise RuntimeError(
                "Diarization is disabled. Set STT_DIARIZE_ENABLED=true"
            )

    def diarize(self, wav_bytes: bytes) -> list[dict]:
        """Return [{speaker, start, end}] segments."""
        audio, sr = codec.read_wav(wav_bytes)
        if len(audio) == 0:
            return []
        # 1 s windows; silence splits segments; alternate speakers on long
        # gaps (placeholder heuristic until the JAX embedding diarizer lands)
        win = sr
        segments: list[dict] = []
        current_start = None
        for i in range(0, len(audio), win):
            chunk = audio[i : i + win]
            rms = float(np.sqrt(np.mean(chunk**2))) if len(chunk) else 0.0
            t = i / sr
            if rms > 0.01:
                if current_start is None:
                    current_start = t
            else:
                if current_start is not None:
                    segments.append(
                        {
                            "speaker": f"SPEAKER_{len(segments) % 2:02d}",
                            "start": round(current_start, 3),
                            "end": round(t, 3),
                        }
                    )
                    current_start = None
        if current_start is not None:
            segments.append(
                {
                    "speaker": f"SPEAKER_{len(segments) % 2:02d}",
                    "start": round(current_start, 3),
                    "end": round(len(audio) / sr, 3),
                }
            )
        return segments


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
