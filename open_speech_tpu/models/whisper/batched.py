"""Batched long-form transcription: decode many 30 s windows per device step.

The sequential seek loop (models/whisper/transcribe.py) matches the
reference's CT2 semantics (src/backends/faster_whisper.py:217-290) — one
window decoded at a time, each conditioned on the previous text. That
serializes a T-second file into ceil(T/30) round-trips even though a single
chip finishes a 16-wide batched decode in roughly the time of a 1-wide one
(decode is HBM-bandwidth on the KV cache; the batch rides along).

This module is the TPU analog of faster-whisper's BatchedInferencePipeline
(not used by the reference server but shipped by its engine): cut the file
into ≤30 s chunks at quiet points, batch-encode and batch-decode them with
no cross-window conditioning, and merge the per-chunk segments. Output
schema is identical to the sequential path; text can differ slightly
because conditioning is off (the same trade faster-whisper's batched
pipeline makes).

Chunk cuts snap to the quietest point (short-time RMS, or a caller-supplied
voicedness curve such as Silero VAD probabilities) inside the trailing
seconds of each window, so words are not split mid-phoneme at fixed grid
edges.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from open_speech_tpu.models.whisper.decode import (
    DecodeOptions,
    beam_decode,
    compression_ratio,
    detect_language,
    greedy_decode,
)
from open_speech_tpu.models.whisper.model import WhisperConfig, encode
from open_speech_tpu.models.whisper.transcribe import (
    Segment,
    TranscribeOptions,
    TranscriptionInfo,
    transcribe,
)
from open_speech_tpu.ops.mel import HOP_LENGTH, SAMPLE_RATE, log_mel_spectrogram

import jax

TIME_PER_FRAME = HOP_LENGTH / SAMPLE_RATE  # 0.01 s

# batch-size ladder: one compiled (encode, decode) program pair per rung
BATCH_BUCKETS = (1, 2, 4, 8, 16)

# Canonical conditioning-prefix length for prompted batched uploads: the
# initial_prompt is padded (leading space tokens) or trimmed (oldest
# dropped) to exactly this many tokens, so prompted uploads add ONE
# warmed prompt shape per rung instead of a prev-bucket ladder.
BATCHED_PREV_LEN = 32

_CURVE_HOP = 512  # quietness-curve resolution (32 ms at 16 kHz)


def quietness_curve(audio: np.ndarray, hop: int = _CURVE_HOP) -> np.ndarray:
    """Short-time RMS per ``hop``-sample window (lower = quieter)."""
    n = len(audio) // hop
    if n == 0:
        return np.zeros((0,), np.float32)
    x = audio[: n * hop].astype(np.float32).reshape(n, hop)
    return np.sqrt((x * x).mean(axis=1))


def chunk_boundaries(
    n_samples: int,
    window_samples: int,
    curve: np.ndarray | None = None,
    *,
    curve_hop: int = _CURVE_HOP,
    snap_s: float = 3.0,
    min_chunk_s: float = 5.0,
) -> list[tuple[int, int]]:
    """Cut ``n_samples`` into consecutive chunks of ≤ ``window_samples``.

    Each interior cut snaps to the quietest curve point within the final
    ``snap_s`` seconds of the window (never earlier than ``min_chunk_s``
    into the chunk), so cuts land in pauses rather than mid-word. Cuts are
    aligned to the mel hop so chunk frame counts are exact.
    """
    snap = int(snap_s * SAMPLE_RATE)
    min_chunk = int(min_chunk_s * SAMPLE_RATE)
    out: list[tuple[int, int]] = []
    start = 0
    while start < n_samples:
        end = start + window_samples
        if end >= n_samples:
            out.append((start, n_samples))
            break
        if curve is not None and curve.size and snap > 0:
            lo = max(start + min(min_chunk, window_samples // 2), end - snap)
            w0, w1 = lo // curve_hop, end // curve_hop
            if w1 > w0:
                seg = curve[w0:w1]
                cut = (w0 + int(np.argmin(seg))) * curve_hop
                # keep the quiet point itself in the EARLIER chunk so a
                # trailing word's release tail isn't orphaned
                end = min(max(cut + curve_hop, lo), end)
        end -= end % HOP_LENGTH  # whole mel frames per chunk
        end = max(end, start + HOP_LENGTH)
        out.append((start, end))
        start = end
    return out


def _split_all_segments(
    tokens: list[int], tokenizer, time_offset: float, window_frames: int
) -> list[tuple[list[int], float, float]]:
    """Split one window's tokens on timestamp pairs, KEEPING the tail.

    The sequential splitter (transcribe._split_segments) drops tokens after
    the last consecutive-timestamp pair because the seek loop re-decodes
    that audio; batched windows are decoded exactly once, so the trailing
    group must become a segment too.
    """
    sp = tokenizer.special
    ts = sp.timestamp_begin
    window_dur = window_frames * TIME_PER_FRAME
    segs: list[tuple[list[int], float, float]] = []
    if not tokens:
        return segs

    consecutive = [
        i + 1
        for i in range(len(tokens) - 1)
        if tokens[i] >= ts and tokens[i + 1] >= ts
    ]
    # explicit timestamp tokens can point into the padded-silence tail of
    # a snapped (<30 s) chunk; clamp to the chunk's real duration so
    # segments never overlap the next chunk's start (the sequential seek
    # loop can't produce overlaps — neither may this path)
    def _t(tok: int) -> float:
        return time_offset + min((tok - ts) * 0.02, window_dur)

    last_slice = 0
    for cut in consecutive:
        sliced = tokens[last_slice:cut]
        segs.append(
            (
                [t for t in sliced if t < sp.eot],
                _t(sliced[0]),
                _t(sliced[-1]),
            )
        )
        last_slice = cut
    tail = tokens[last_slice:]
    if any(t < sp.eot for t in tail):
        timestamps = [t for t in tail if t >= ts]
        # a LEADING timestamp marks the start; a TRAILING one the end. A
        # tail with only its leading timestamp runs to the window edge.
        if tail[0] >= ts:
            start = _t(tail[0])
        elif segs:
            start = segs[-1][2]  # continuation of the previous cut
        else:
            start = time_offset
        if tail[-1] >= ts or len(timestamps) > (1 if tail[0] >= ts else 0):
            end = _t(timestamps[-1])
        else:
            end = time_offset + window_dur
        segs.append(([t for t in tail if t < sp.eot], start, max(end, start)))
    return segs


def _bucket(n: int) -> int:
    for b in BATCH_BUCKETS:
        if b >= n:
            return b
    return BATCH_BUCKETS[-1]


def _decode_rows_with_fallback(
    params, cfg: WhisperConfig, tokenizer, enc_out, prompt: np.ndarray,
    opts: TranscribeOptions,
) -> list[dict]:
    """Decode B rows with per-row temperature fallback.

    All rows decode at temperature 0 first (beam by default, like the REST
    path); only rows failing the quality gates re-decode at the next
    temperature, re-batched and padded to the bucket ladder so the compiled
    program set stays bounded.
    """
    sp = tokenizer.special
    suppress = tuple(tokenizer.non_speech_tokens)
    b = int(enc_out.shape[0])
    final: list[dict | None] = [None] * b
    pending = list(range(b))
    for temperature in opts.temperature:
        bucket = _bucket(len(pending))
        idx = pending + [pending[0]] * (bucket - len(pending))
        sub_enc = enc_out[jnp.asarray(idx, jnp.int32)]
        sub_prompt = np.repeat(prompt, bucket, axis=0)  # same sot row per chunk
        dopts = DecodeOptions(
            task=opts.task,
            temperature=temperature,
            beam_size=opts.beam_size,
            max_new_tokens=opts.max_new_tokens,
            timestamps=opts.timestamps,
            suppress_tokens=suppress,
        )
        if temperature == 0.0 and opts.beam_size > 1:
            result = beam_decode(params, cfg, sp, sub_enc, sub_prompt, dopts)
        else:
            result = greedy_decode(
                params, cfg, sp, sub_enc, sub_prompt, dopts,
                rng=jax.random.PRNGKey(int(temperature * 1000)),
            )
        still: list[int] = []
        for j, row in enumerate(pending):
            tokens = [int(t) for t in result.tokens[j][: int(result.lengths[j])]]
            text = tokenizer.decode(tokens)
            ratio = compression_ratio(text)
            entry = {
                "tokens": tokens,
                "avg_logprob": float(result.avg_logprob[j]),
                "no_speech_prob": float(result.no_speech_prob[j]),
                "compression_ratio": ratio,
                "temperature": temperature,
            }
            needs_fallback = False
            if (
                opts.compression_ratio_threshold is not None
                and ratio > opts.compression_ratio_threshold
            ):
                needs_fallback = True
            if (
                opts.logprob_threshold is not None
                and entry["avg_logprob"] < opts.logprob_threshold
            ):
                needs_fallback = True
            if (
                opts.no_speech_threshold is not None
                and entry["no_speech_prob"] > opts.no_speech_threshold
            ):
                needs_fallback = False  # silence: keep, caller will skip
            final[row] = entry
            if needs_fallback and temperature != opts.temperature[-1]:
                still.append(row)
        pending = still
        if not pending:
            break
    return final  # type: ignore[return-value]


def transcribe_batched(
    params,
    cfg: WhisperConfig,
    tokenizer,
    audio: np.ndarray,
    opts: TranscribeOptions = TranscribeOptions(),
    *,
    max_batch: int = 16,
    curve: np.ndarray | None = None,
    snap_cuts: bool = True,
) -> tuple[list[Segment], TranscriptionInfo]:
    """Transcribe long audio by batching independent ≤30 s chunks.

    Single-window audio delegates to the sequential path (identical
    output). ``curve``: optional per-32 ms voicedness/loudness track for
    cut snapping (defaults to short-time RMS of the audio itself).
    """
    sp = tokenizer.special
    audio = np.asarray(audio, dtype=np.float32).reshape(-1)
    duration = len(audio) / SAMPLE_RATE
    frames_per_window = cfg.n_audio_ctx * 2
    window_samples = frames_per_window * HOP_LENGTH

    if len(audio) <= window_samples:
        return transcribe(params, cfg, tokenizer, audio, opts)

    if curve is None and snap_cuts:
        curve = quietness_curve(audio)
    chunks = chunk_boundaries(
        len(audio), window_samples, curve if snap_cuts else None
    )

    # one padded [N, window_samples] block -> one batched mel program per
    # batch-bucket rung (chunks are right-padded with silence, whisper-style)
    n = len(chunks)
    language = opts.language
    language_prob = 1.0

    segments: list[Segment] = []
    seg_id = 0
    max_batch = max(1, min(max_batch, BATCH_BUCKETS[-1]))

    pos = 0
    while pos < n:
        take = min(max_batch, n - pos)
        bucket = _bucket(take)
        block = np.zeros((bucket, window_samples), np.float32)
        for j in range(take):
            s, e = chunks[pos + j]
            block[j, : e - s] = audio[s:e]
        mel = log_mel_spectrogram(jnp.asarray(block), n_mels=cfg.n_mels)
        enc_out = encode(params, mel, cfg)

        if language is None:
            codes, probs = detect_language(params, cfg, sp, enc_out[:1])
            language, language_prob = codes[0], float(probs[0])

        prefix: list[int] = []
        if opts.initial_prompt:
            # chunks are independent, so the style/vocab hint conditions
            # every chunk (sequentially it reaches later windows through
            # prev-text conditioning). The prefix is padded/trimmed to ONE
            # canonical length so the warmed program set stays (rungs x
            # beams x budgets) — a prev-bucket ladder here would multiply
            # it (and un-warmed shapes compile mid-request; round-3 advice)
            fb = min(BATCHED_PREV_LEN, cfg.n_text_ctx // 2 - 1)
            prev = tokenizer.encode(" " + opts.initial_prompt.strip())[-fb:]
            if prev and fb > 0:
                pad = tokenizer.encode(" ")
                filler = pad if len(pad) == 1 else [prev[0]]
                prev = filler * (fb - len(prev)) + prev
                prefix = [sp.startofprev] + prev
        prompt = np.asarray(
            [
                prefix
                + sp.sot_sequence(
                    language or "en", opts.task, timestamps=opts.timestamps
                )
            ],
            np.int32,
        )
        # only real rows enter the fallback machinery: the bucket's silence
        # padding would otherwise fail compression/logprob gates (when
        # no_speech gating is off) and drag discarded re-decode rounds —
        # _decode_rows_with_fallback re-pads to the same rung by
        # duplicating a real row, so the program set is unchanged
        rows = _decode_rows_with_fallback(
            params, cfg, tokenizer, enc_out[:take], prompt, opts
        )
        for j in range(take):
            row = rows[j]
            s, e = chunks[pos + j]
            chunk_frames = (e - s) // HOP_LENGTH
            if opts.no_speech_threshold is not None:
                should_skip = row["no_speech_prob"] > opts.no_speech_threshold
                if (
                    opts.logprob_threshold is not None
                    and row["avg_logprob"] > opts.logprob_threshold
                ):
                    should_skip = False
                if should_skip:
                    continue
            for seg_tokens, start, end in _split_all_segments(
                row["tokens"], tokenizer, s / SAMPLE_RATE, chunk_frames
            ):
                seg_text = tokenizer.decode(seg_tokens)
                if not seg_text.strip():
                    continue
                segments.append(
                    Segment(
                        id=seg_id,
                        seek=s // HOP_LENGTH,
                        start=round(start, 3),
                        end=round(end, 3),
                        text=seg_text,
                        tokens=seg_tokens,
                        temperature=row["temperature"],
                        avg_logprob=row["avg_logprob"],
                        compression_ratio=row["compression_ratio"],
                        no_speech_prob=row["no_speech_prob"],
                    )
                )
                seg_id += 1
        pos += take

    info = TranscriptionInfo(
        language=language or "en",
        language_probability=language_prob,
        duration=round(duration, 3),
    )
    return segments, info
