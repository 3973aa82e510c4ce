"""Long-form transcription: seek loop, temperature fallback, segments.

This is the behavior layer the reference outsources to faster-whisper/CT2
(src/backends/faster_whisper.py:217-290): 30 s window seek loop, beam search
at temperature 0 with sampled fallbacks on quality-gate failure
(compression_ratio > 2.4 or avg_logprob < -1.0), <|nospeech|> skipping,
timestamp-token segmentation, and condition-on-previous-text. The output
``Segment``s carry exactly the fields the reference surfaces in verbose_json
(src/backends/faster_whisper.py:251-272).

Device work per window is two jitted programs (encode; decode loop); the seek
logic runs on host between windows, so a T-second file costs
ceil(T/30) window steps regardless of output length.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.models.whisper.decode import (
    DecodeOptions,
    DecodeResult,
    beam_decode,
    compression_ratio,
    detect_language,
    greedy_decode,
)
from open_speech_tpu.models.whisper.model import WhisperConfig, encode
from open_speech_tpu.ops.mel import (
    HOP_LENGTH,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
)

TIME_PER_FRAME = HOP_LENGTH / SAMPLE_RATE  # 0.01 s
# NOTE: the authoritative frames-per-window is cfg.n_audio_ctx * 2 —
# it differs per preset (test-tiny), so no module-level constant here.


@dataclass
class Segment:
    id: int
    seek: int
    start: float
    end: float
    text: str
    tokens: list[int]
    temperature: float
    avg_logprob: float
    compression_ratio: float
    no_speech_prob: float


@dataclass
class TranscriptionInfo:
    language: str
    language_probability: float
    duration: float


@dataclass(frozen=True)
class TranscribeOptions:
    task: str = "transcribe"
    language: str | None = None
    beam_size: int = 5
    temperature: tuple[float, ...] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    compression_ratio_threshold: float = 2.4
    logprob_threshold: float = -1.0
    no_speech_threshold: float = 0.6
    condition_on_previous_text: bool = True
    initial_prompt: str | None = None
    timestamps: bool = True
    max_new_tokens: int = 224


# geometric ladder of mel window counts (last rung = 1 h; longer files
# round up to multiples of it)
_WINDOW_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 120)


@partial(jax.jit, static_argnames=("fpw",))
def _mel_window(mel_full, seek, *, fpw: int):
    """[n_mels, T], scalar seek -> [n_mels, fpw] window (seek is traced)."""
    return jax.lax.dynamic_slice(
        mel_full, (jnp.int32(0), seek), (mel_full.shape[0], fpw)
    )


def _bucket_prev(prev: list[int], room: int) -> list[int]:
    """Trim previous-text conditioning to a bucketed length.

    The decode programs are compiled per prompt shape; an arbitrary-length
    conditioning prefix would mean one XLA compile per window of a long
    file. Trimming to the largest bucket that fits bounds the compile set
    to a handful of shapes (conditioning is a soft prior — dropping a few
    of its oldest tokens does not change semantics).
    """
    prev = prev[-room:]
    keep = 0
    # small buckets (4/8) keep short first segments conditioning the next
    # window (the reference conditions on whatever exists) while the
    # bucket ladder still bounds the compiled prompt shapes
    for b in (4, 8, 16, 32, 64, 128, room):
        if b <= len(prev) and b <= room:
            keep = b
    return prev[len(prev) - keep :] if keep else []


def transcribe(
    params,
    cfg: WhisperConfig,
    tokenizer,
    audio: np.ndarray,
    opts: TranscribeOptions = TranscribeOptions(),
    draft: dict | None = None,
) -> tuple[list[Segment], TranscriptionInfo]:
    """Transcribe float32 16 kHz mono audio of any length.

    ``draft``: optional ``{"params", "cfg", "gamma"}`` of a smaller model —
    the temperature-0 greedy attempt then runs speculative draft-and-verify
    (models/whisper/speculative.py; emitted tokens identical to plain
    greedy). Ignored for beam search and sampled fallback temperatures.
    """
    sp = tokenizer.special
    audio = np.asarray(audio, dtype=np.float32).reshape(-1)
    duration = len(audio) / SAMPLE_RATE
    n_frames_total = len(audio) // HOP_LENGTH
    # window geometry follows the encoder: stride-2 conv halves frames, so a
    # window is n_audio_ctx*2 feature frames (3000 = 30 s for real configs)
    frames_per_window = cfg.n_audio_ctx * 2
    window_samples = frames_per_window * HOP_LENGTH

    # features for the whole file in one shot (stays on device). The device
    # must see a BOUNDED shape set or every distinct upload length / seek
    # offset compiles its own tiny program (~0.3 s each through a TPU
    # relay): audio is zero-padded ON HOST to a geometric ladder of window
    # counts plus one extra silent window, so mel has one shape per ladder
    # rung and the tail window slice never clamps.
    n_windows = max(1, -(-len(audio) // window_samples))
    n_windows = next(
        (b for b in _WINDOW_BUCKETS if b >= n_windows),
        -(-n_windows // _WINDOW_BUCKETS[-1]) * _WINDOW_BUCKETS[-1],
    )
    padded = np.zeros((n_windows + 1) * window_samples, np.float32)
    padded[: len(audio)] = audio
    mel_full = log_mel_spectrogram(jnp.asarray(padded), n_mels=cfg.n_mels)

    language = opts.language
    language_prob = 1.0

    segments: list[Segment] = []
    all_tokens: list[int] = []
    prompt_reset_since = 0
    if opts.initial_prompt:
        all_tokens.extend(tokenizer.encode(" " + opts.initial_prompt.strip()))

    seek = 0
    seg_id = 0
    n_frames_total = max(n_frames_total, 1)
    while seek < n_frames_total:
        # traced-start slice: ONE program per mel shape, not one per seek
        # offset (seek values follow decoded timestamps — unbounded set).
        # The extra silent window above guarantees the slice never clamps.
        window = _mel_window(
            mel_full, jnp.int32(seek), fpw=frames_per_window
        )
        window_frames = min(frames_per_window, n_frames_total - seek)
        time_offset = seek * TIME_PER_FRAME

        enc_out = encode(params, window[None], cfg)
        d_enc_out = (
            encode(draft["params"], window[None], draft["cfg"])
            if draft is not None
            else None
        )

        if language is None:
            codes, probs = detect_language(params, cfg, sp, enc_out)
            language, language_prob = codes[0], float(probs[0])

        # build prompt: optional previous-text conditioning
        prompt: list[int] = []
        if opts.condition_on_previous_text and all_tokens[prompt_reset_since:]:
            prev = _bucket_prev(
                all_tokens[prompt_reset_since:], cfg.n_text_ctx // 2 - 1
            )
            if prev:
                prompt = [sp.startofprev] + prev
        prompt += sp.sot_sequence(
            language or "en", opts.task, timestamps=opts.timestamps
        )

        result = _decode_with_fallback(
            params, cfg, tokenizer, enc_out, np.array([prompt], np.int32),
            opts, draft=draft, d_enc_out=d_enc_out,
        )
        tokens = [int(t) for t in result.tokens[0][: result_len(result)]]
        text = tokenizer.decode(tokens)
        ratio = compression_ratio(text)

        # no-speech skip (whisper heuristic)
        if opts.no_speech_threshold is not None:
            should_skip = float(result.no_speech_prob[0]) > opts.no_speech_threshold
            if (
                opts.logprob_threshold is not None
                and float(result.avg_logprob[0]) > opts.logprob_threshold
            ):
                should_skip = False
            if should_skip:
                seek += window_frames
                continue

        new_segments, seek_advance = _split_segments(
            tokens, tokenizer, time_offset, window_frames
        )
        for seg_tokens, start, end in new_segments:
            seg_text = tokenizer.decode(seg_tokens)
            if not seg_text.strip():
                continue
            segments.append(
                Segment(
                    id=seg_id,
                    seek=seek,
                    start=round(start, 3),
                    end=round(end, 3),
                    text=seg_text,
                    tokens=seg_tokens,
                    temperature=result.temperature,
                    avg_logprob=float(result.avg_logprob[0]),
                    compression_ratio=ratio,
                    no_speech_prob=float(result.no_speech_prob[0]),
                )
            )
            seg_id += 1
            all_tokens.extend(seg_tokens)
        if result.temperature > 0.5:
            # unreliable window: don't condition the next one on it
            prompt_reset_since = len(all_tokens)
        seek += seek_advance

    info = TranscriptionInfo(
        language=language or "en",
        language_probability=language_prob,
        duration=round(duration, 3),
    )
    return segments, info


def result_len(result: DecodeResult) -> int:
    return int(result.lengths[0])


def _decode_with_fallback(
    params, cfg, tokenizer, enc_out, prompt, opts: TranscribeOptions,
    draft: dict | None = None, d_enc_out=None,
) -> DecodeResult:
    sp = tokenizer.special
    suppress = tuple(tokenizer.non_speech_tokens)
    result = None
    for temperature in opts.temperature:
        dopts = DecodeOptions(
            task=opts.task,
            temperature=temperature,
            beam_size=opts.beam_size,
            max_new_tokens=opts.max_new_tokens,
            timestamps=opts.timestamps,
            suppress_tokens=suppress,
        )
        if temperature == 0.0 and opts.beam_size > 1:
            result = beam_decode(params, cfg, sp, enc_out, prompt, dopts)
        elif (
            temperature == 0.0
            and draft is not None
            and d_enc_out is not None
            and prompt.shape[0] == 1
        ):
            from open_speech_tpu.models.whisper.speculative import (
                speculative_greedy_decode,
            )

            result = speculative_greedy_decode(
                params, cfg, draft["params"], draft["cfg"], sp,
                enc_out, d_enc_out, prompt, dopts,
                gamma=int(draft.get("gamma", 4)),
            )
        else:
            result = greedy_decode(
                params, cfg, sp, enc_out, prompt, dopts,
                rng=jax.random.PRNGKey(int(temperature * 1000)),
            )
        tokens = [int(t) for t in result.tokens[0][: result_len(result)]]
        text = tokenizer.decode(tokens)
        needs_fallback = False
        if (
            opts.compression_ratio_threshold is not None
            and compression_ratio(text) > opts.compression_ratio_threshold
        ):
            needs_fallback = True
        if (
            opts.logprob_threshold is not None
            and float(result.avg_logprob[0]) < opts.logprob_threshold
        ):
            needs_fallback = True
        if (
            opts.no_speech_threshold is not None
            and float(result.no_speech_prob[0]) > opts.no_speech_threshold
        ):
            needs_fallback = False  # silence: keep, the caller will skip
        if not needs_fallback:
            break
    return result


def _split_segments(
    tokens: list[int], tokenizer, time_offset: float, window_frames: int
) -> tuple[list[tuple[list[int], float, float]], int]:
    """Split sampled tokens on timestamp pairs.

    Returns (segments [(tokens, start_s, end_s)], seek advance in frames).
    """
    sp = tokenizer.special
    ts = sp.timestamp_begin
    window_dur = window_frames * TIME_PER_FRAME

    segs: list[tuple[list[int], float, float]] = []
    if not tokens:
        return segs, window_frames

    consecutive = [
        i + 1
        for i in range(len(tokens) - 1)
        if tokens[i] >= ts and tokens[i + 1] >= ts
    ]
    if consecutive:
        # windows with multiple complete segments
        last_slice = 0
        for cut in consecutive:
            sliced = tokens[last_slice:cut]
            start_tok, end_tok = sliced[0], sliced[-1]
            segs.append(
                (
                    [t for t in sliced if t < sp.eot],
                    time_offset + (start_tok - ts) * 0.02,
                    time_offset + (end_tok - ts) * 0.02,
                )
            )
            last_slice = cut
        last_ts = tokens[consecutive[-1] - 1]
        seek_advance = round((last_ts - ts) * 0.02 / TIME_PER_FRAME)
        if seek_advance <= 0:
            # degenerate pair at the window start: advancing 1 frame would
            # re-decode the same audio thousands of times; skip the window
            seek_advance = window_frames
        seek_advance = min(seek_advance, window_frames)
    else:
        # single segment covering the window (or ending at a final timestamp)
        timestamps = [t for t in tokens if t >= ts]
        end = time_offset + window_dur
        if timestamps and timestamps[-1] != ts:
            end = time_offset + (timestamps[-1] - ts) * 0.02
        start = time_offset + ((timestamps[0] - ts) * 0.02 if timestamps else 0.0)
        segs.append(([t for t in tokens if t < sp.eot], start, end))
        seek_advance = window_frames
    return segs, seek_advance


# ──────────────────────────────────────────────────────────────────────
# Response formatting (verbose_json schema parity)
# ──────────────────────────────────────────────────────────────────────


def build_response(
    segments: list[Segment],
    info: TranscriptionInfo,
    task: str,
    response_format: str,
) -> dict:
    """Assemble the API response dict (reference schema,
    src/backends/faster_whisper.py:248-281)."""
    from open_speech_tpu.text.formatters import segments_to_srt, segments_to_vtt

    full_text = "".join(s.text for s in segments).strip()
    if response_format == "verbose_json":
        return {
            "task": task,
            "language": info.language,
            "duration": info.duration,
            "text": full_text,
            "segments": [
                {
                    "id": s.id,
                    "seek": int(s.seek),
                    "start": s.start,
                    "end": s.end,
                    "text": s.text,
                    "tokens": list(s.tokens),
                    "temperature": s.temperature,
                    "avg_logprob": s.avg_logprob,
                    "compression_ratio": s.compression_ratio,
                    "no_speech_prob": s.no_speech_prob,
                }
                for s in segments
            ],
        }
    if response_format == "text":
        return {"text": full_text, "raw_text": True}
    if response_format == "srt":
        return {"text": segments_to_srt(segments), "raw_text": True}
    if response_format == "vtt":
        return {"text": segments_to_vtt(segments), "raw_text": True}
    return {"text": full_text}
