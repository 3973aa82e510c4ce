"""Transcript format converters — SRT, VTT, plain text.

Output must be byte-identical to the reference (src/formatters.py and its
duplicate in src/backends/faster_whisper.py:312-344): same timestamp
formatting (truncating, not rounding), same line structure, same fallbacks
when no segments exist. The reference had two divergent copies; this is the
single shared implementation for both the backend and the API layer.
"""

from __future__ import annotations

from typing import Any


def _fmt_time_srt(seconds: float) -> str:
    """HH:MM:SS,mmm with all fields truncated (reference semantics)."""
    h = int(seconds // 3600)
    m = int((seconds % 3600) // 60)
    s = int(seconds % 60)
    ms = int((seconds % 1) * 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"


def _fmt_time_vtt(seconds: float) -> str:
    """HH:MM:SS.mmm (VTT uses a dot where SRT uses a comma)."""
    h = int(seconds // 3600)
    m = int((seconds % 3600) // 60)
    s = int(seconds % 60)
    ms = int((seconds % 1) * 1000)
    return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"


def format_as_text(result: dict[str, Any]) -> str:
    return result.get("text", "").strip()


def format_as_srt(result: dict[str, Any]) -> str:
    segments = result.get("segments", [])
    if not segments:
        text = result.get("text", "").strip()
        if not text:
            return ""
        duration = result.get("duration", 0.0)
        return f"1\n{_fmt_time_srt(0)} --> {_fmt_time_srt(duration)}\n{text}\n"

    lines: list[str] = []
    for i, seg in enumerate(segments, 1):
        text = seg.get("text", "").strip()
        if not text:
            continue
        lines.append(f"{i}")
        lines.append(
            f"{_fmt_time_srt(seg.get('start', 0.0))} --> "
            f"{_fmt_time_srt(seg.get('end', 0.0))}"
        )
        lines.append(text)
        lines.append("")
    return "\n".join(lines)


def format_as_vtt(result: dict[str, Any]) -> str:
    segments = result.get("segments", [])
    lines = ["WEBVTT", ""]

    if not segments:
        text = result.get("text", "").strip()
        if not text:
            return "WEBVTT\n"
        duration = result.get("duration", 0.0)
        lines.append(f"{_fmt_time_vtt(0)} --> {_fmt_time_vtt(duration)}")
        lines.append(text)
        lines.append("")
        return "\n".join(lines)

    for seg in segments:
        text = seg.get("text", "").strip()
        if not text:
            continue
        lines.append(
            f"{_fmt_time_vtt(seg.get('start', 0.0))} --> "
            f"{_fmt_time_vtt(seg.get('end', 0.0))}"
        )
        lines.append(text)
        lines.append("")
    return "\n".join(lines)


def format_transcription(
    result: dict[str, Any], response_format: str
) -> tuple[str, str]:
    """Returns (content, content_type); empty content means emit JSON."""
    if response_format == "text":
        return format_as_text(result), "text/plain"
    if response_format == "srt":
        return format_as_srt(result), "text/plain"
    if response_format == "vtt":
        return format_as_vtt(result), "text/vtt"
    return "", "application/json"


# Segment-object variants (used by the whisper transcribe layer directly)


def segments_to_srt(segments: list) -> str:
    lines = []
    for i, s in enumerate(segments, 1):
        lines.append(
            f"{i}\n{_fmt_time_srt(s.start)} --> {_fmt_time_srt(s.end)}\n"
            f"{s.text.strip()}\n"
        )
    return "\n".join(lines)


def segments_to_vtt(segments: list) -> str:
    lines = ["WEBVTT\n"]
    for s in segments:
        lines.append(
            f"{_fmt_time_vtt(s.start)} --> {_fmt_time_vtt(s.end)}\n"
            f"{s.text.strip()}\n"
        )
    return "\n".join(lines)
