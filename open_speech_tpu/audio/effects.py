"""Post-synthesis effects chain, executed on device.

Behavior parity target: the reference's five-effect chain and its parameter
surface (src/effects/chain.py:15-74) — normalize (RMS to a LUFS-ish level),
pitch (duration-preserving semitone shift), reverb (exponential-decay FIR
with room presets), podcast_eq (80 Hz high-pass + 3 kHz presence resonator),
robot (100 Hz ring modulator), with unknown effect types ignored.

The DSP itself lives in ops/effects.py as jitted XLA kernels (associative-
scan biquads, FFT reverb, parallel phase vocoder). This module is the host
shim: it buckets the signal to a power-of-two length so repeat traffic hits
compiled programs, threads a device array through the requested stages, and
materializes float32 once at the end.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from open_speech_tpu.ops import effects as fx

SUPPORTED_EFFECTS = {"normalize", "pitch", "reverb", "podcast_eq", "robot"}

# Room presets: decay-tail length and default wet mix per room size. The
# values are the reference's parameter surface (output parity), the
# convolution is ours.
_ROOM_TAIL_MS = {"small": 50, "medium": 120, "large": 300}
_ROOM_DEFAULT_MIX = {"small": 0.25, "medium": 0.4, "large": 0.55}
_FALLBACK_TAIL_MS = 50
_FALLBACK_MIX = 0.3


def _stage_normalize(x, n, sr, spec):
    target_db = float(spec.get("target_lufs", -16))
    amp = jnp.float32(10.0 ** (target_db / 20.0))
    return fx.masked_rms_normalize(x, n, amp)


def _stage_pitch(x, n, sr, spec):
    semitones = round(float(spec.get("semitones", 0)), 2)
    if semitones == 0.0:
        return x
    return fx.pitch_shift(x, n, semitones)


def _stage_reverb(x, n, sr, spec):
    room = spec.get("room", "small")
    tail_ms = _ROOM_TAIL_MS.get(room, _FALLBACK_TAIL_MS)
    mix = float(spec.get("mix", _ROOM_DEFAULT_MIX.get(room, _FALLBACK_MIX)))
    ir_len = max(1, int(sr * tail_ms / 1000))
    return fx.exp_decay_reverb(x, ir_len, jnp.float32(mix))


def _stage_podcast_eq(x, n, sr, spec):
    return fx.podcast_eq(x, sr)


def _stage_robot(x, n, sr, spec):
    return fx.ring_modulate(x, sr)


_STAGES = {
    "normalize": _stage_normalize,
    "pitch": _stage_pitch,
    "reverb": _stage_reverb,
    "podcast_eq": _stage_podcast_eq,
    "robot": _stage_robot,
}


def apply_chain(
    samples: np.ndarray, sample_rate: int, effects: list[dict] | None
) -> np.ndarray:
    """Run the ordered effect list over ``samples`` (float32 mono).

    Each entry is ``{"type": <name>, ...params}``; unsupported types are
    skipped. Returns float32 host audio of the same length.
    """
    samples = np.asarray(samples, dtype=np.float32)
    stages = [
        (_STAGES[e.get("type")], e)
        for e in (effects or [])
        if e.get("type") in _STAGES
    ]
    if not stages or samples.size == 0:
        return samples

    n = samples.shape[0]
    bucket = fx.length_bucket(n)
    x = jnp.asarray(np.pad(samples, (0, bucket - n)))
    n_dev = jnp.int32(n)
    for stage, spec in stages:
        x = stage(x, n_dev, sample_rate, spec)
        if x.shape[0] != bucket:  # pitch resample can round off a sample
            x = jnp.pad(x, (0, max(0, bucket - x.shape[0])))[:bucket]
        # keep the padded tail silent so later masked/spectral stages see
        # zeros, not stage artifacts
        x = jnp.where(jnp.arange(bucket) < n_dev, x, 0.0)
    return np.asarray(x[:n], dtype=np.float32)
