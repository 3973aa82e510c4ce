"""Device-native audio-effects DSP.

The reference's effects chain (src/effects/chain.py:15-74) is host
scipy/librosa: sample-serial ``lfilter`` IIRs, ``fftconvolve`` reverb, a
frame-serial librosa phase vocoder. None of those shapes map to a TPU, so
every stage here is re-derived for XLA:

  * **IIR biquads** (the podcast EQ) are a second-order *affine recurrence*
    ``s[t] = A s[t-1] + u[t]`` evaluated with ``jax.lax.associative_scan`` —
    O(log n) depth on device instead of an O(n) serial loop. The filter
    *design* (bilinear-transform Butterworth high-pass, Orfanidis resonator)
    happens once on host; only the recurrence runs per request.
  * **Reverb** is a single rfft·irfft round trip against a precomputed
    exponential-decay impulse response (linear convolution via a pow2 FFT).
  * **Pitch shift** is a phase vocoder whose phase accumulator — the
    textbook frame-serial loop — is rewritten as an exclusive prefix sum of
    per-frame phase increments (``cumsum``), so analysis, synthesis and the
    final linear resample are all parallel device work.
  * **Normalize / ring-mod** are masked elementwise kernels.

Every kernel takes a bucket-padded ``[n]`` float32 signal plus the true
length as a traced scalar, so serving traffic reuses a small set of
compiled programs (one per pow2 bucket × static effect parameters).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

MIN_BUCKET = 4096


def length_bucket(n: int) -> int:
    """Next power-of-two bucket for a signal of ``n`` samples."""
    return max(MIN_BUCKET, 1 << max(0, (int(n) - 1).bit_length()))


# ── filter design (host, once per sample rate) ────────────────────────


def design_highpass_biquad(cutoff_hz: float, sr: int) -> tuple[np.ndarray, np.ndarray]:
    """2nd-order Butterworth high-pass via the bilinear transform.

    Same prewarped design scipy's ``butter(2, fc/nyq, "high")`` produces
    (tan prewarp, Q = 1/sqrt(2)), computed directly from the analog
    prototype so no scipy is needed at serving time.
    """
    k = math.tan(math.pi * cutoff_hz / sr)
    root2 = math.sqrt(2.0)
    a0 = 1.0 + root2 * k + k * k
    b = np.array([1.0, -2.0, 1.0]) / a0
    a = np.array([1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - root2 * k + k * k) / a0])
    return b, a


def design_peak_biquad(center_hz: float, q: float, sr: int) -> tuple[np.ndarray, np.ndarray]:
    """2nd-order resonant peak (0 dB at center, band-reject outside).

    Orfanidis' peaking-resonator design with -3 dB band edges — the same
    response scipy's ``iirpeak`` computes, which is what the reference's
    "presence peak" actually is.
    """
    w0 = 2.0 * math.pi * center_hz / sr
    beta = math.tan(w0 / (2.0 * q))  # gb = 1/sqrt(2) band edges
    gain = 1.0 / (1.0 + beta)
    b = (1.0 - gain) * np.array([1.0, 0.0, -1.0])
    a = np.array([1.0, -2.0 * gain * math.cos(w0), 2.0 * gain - 1.0])
    return b, a


# ── biquad cascade as an associative scan ─────────────────────────────


def _affine_combine(left, right):
    """Composition law for affine maps s -> A s + c (leading batch axes)."""
    a1, c1 = left
    a2, c2 = right
    return (
        jnp.einsum("...ij,...jk->...ik", a2, a1),
        jnp.einsum("...ij,...j->...i", a2, c1) + c2,
    )


def _biquad_scan(x: jax.Array, b: np.ndarray, a: np.ndarray) -> jax.Array:
    """Run one normalized biquad over ``x`` [n] with zero initial state.

    Feed-forward taps become a 3-tap FIR (pure convolution); the feedback
    recurrence y[t] = u[t] - a1 y[t-1] - a2 y[t-2] is the associative scan
    of (A, u e_0) pairs with constant A = [[-a1, -a2], [1, 0]].
    """
    n = x.shape[0]
    u = (
        b[0] * x
        + b[1] * jnp.pad(x, (1, 0))[:n]
        + b[2] * jnp.pad(x, (2, 0))[:n]
    )
    mat = jnp.broadcast_to(
        jnp.array([[-a[1], -a[2]], [1.0, 0.0]], jnp.float32), (n, 2, 2)
    )
    vec = jnp.stack([u, jnp.zeros_like(u)], axis=-1)
    _, states = jax.lax.associative_scan(_affine_combine, (mat, vec))
    return states[:, 0]


@lru_cache(maxsize=8)
def _podcast_sections(sr: int) -> tuple[tuple[float, ...], ...]:
    """High-pass at 80 Hz then a Q=2 presence resonator at 3 kHz."""
    sections = []
    for b, a in (
        design_highpass_biquad(80.0, sr),
        design_peak_biquad(3000.0, 2.0, sr),
    ):
        sections.append(tuple(float(v) for v in np.concatenate([b, a])))
    return tuple(sections)


@partial(jax.jit, static_argnames=("sections",))
def _eq_kernel(x: jax.Array, sections) -> jax.Array:
    y = x
    for sec in sections:
        b, a = np.asarray(sec[:3]), np.asarray(sec[3:])
        y = _biquad_scan(y, b, a)
    return y


def podcast_eq(x: jax.Array, sr: int) -> jax.Array:
    """Podcast EQ over a (possibly padded) device signal."""
    return _eq_kernel(x.astype(jnp.float32), _podcast_sections(sr))


# ── normalize / ring-mod ──────────────────────────────────────────────


@jax.jit
def masked_rms_normalize(x: jax.Array, n_valid: jax.Array, target_amp: jax.Array) -> jax.Array:
    """Scale so the RMS over the first ``n_valid`` samples hits ``target_amp``.

    Signals below -160 dBFS pass through untouched (matches the reference's
    silence guard).
    """
    mask = jnp.arange(x.shape[0]) < n_valid
    denom = jnp.maximum(n_valid.astype(jnp.float32), 1.0)
    rms = jnp.sqrt(jnp.sum(jnp.where(mask, x * x, 0.0)) / denom)
    scale = jnp.where(rms < 1e-8, 1.0, target_amp / jnp.maximum(rms, 1e-12))
    return x * scale


@partial(jax.jit, static_argnames=("sr", "carrier_hz"))
def ring_modulate(x: jax.Array, sr: int, carrier_hz: float = 100.0) -> jax.Array:
    """Multiply by a sine carrier (the 'robot' voice)."""
    t = jnp.arange(x.shape[0], dtype=jnp.float32) / sr
    return x * jnp.sin((2.0 * math.pi * carrier_hz) * t)


# ── reverb: spectral convolution with a decaying IR ───────────────────


@lru_cache(maxsize=16)
def _decay_ir(ir_len: int) -> np.ndarray:
    ir = np.exp(-np.linspace(0.0, 6.0, ir_len, dtype=np.float64))
    return (ir / ir.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("ir_len",))
def exp_decay_reverb(x: jax.Array, ir_len: int, mix: jax.Array) -> jax.Array:
    """Wet/dry mix of ``x`` with an exponential-decay FIR, via one FFT."""
    n = x.shape[0]
    fft_n = 1 << (n + ir_len - 1).bit_length()
    spec = jnp.fft.rfft(x, fft_n) * jnp.fft.rfft(jnp.asarray(_decay_ir(ir_len)), fft_n)
    wet = jnp.fft.irfft(spec, fft_n)[:n]
    return (1.0 - mix) * x + mix * wet


# ── pitch shift: parallel phase vocoder ───────────────────────────────


_PV_NFFT = 2048
_PV_HOP = 512


@lru_cache(maxsize=2)
def _pv_window(n_fft: int) -> np.ndarray:
    return np.hanning(n_fft + 1)[:-1].astype(np.float32)


@lru_cache(maxsize=32)
def _ola_norm(n_frames: int, n_fft: int, hop: int) -> np.ndarray:
    """Overlap-add window-square normalization (all-same-window case)."""
    w2 = _pv_window(n_fft).astype(np.float64) ** 2
    norm = np.zeros((n_frames - 1) * hop + n_fft)
    for f in range(n_frames):
        norm[f * hop : f * hop + n_fft] += w2
    return np.maximum(norm, 1e-8).astype(np.float32)


def _pv_analysis(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (xp.shape[0] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return jnp.fft.rfft(xp[idx] * jnp.asarray(_pv_window(n_fft)), axis=-1)


def _pv_synthesis(spec: jax.Array, n_fft: int, hop: int, out_len: int) -> jax.Array:
    frames = jnp.fft.irfft(spec, n_fft, axis=-1) * jnp.asarray(_pv_window(n_fft))
    n_frames = frames.shape[0]
    total = (n_frames - 1) * hop + n_fft
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)
    acc = jnp.zeros((total,), jnp.float32).at[idx].add(frames.reshape(-1))
    acc = acc / jnp.asarray(_ola_norm(n_frames, n_fft, hop))
    pad = n_fft // 2
    return jax.lax.dynamic_slice(acc, (pad,), (out_len,))


@partial(jax.jit, static_argnames=("rate", "n_fft", "hop"))
def _stretch_kernel(x: jax.Array, rate: float, n_fft: int, hop: int) -> jax.Array:
    """Time-stretch by ``rate`` with all-parallel phase propagation.

    The per-output-frame phase update ``phi[t] = phi[t-1] + adv + dev[t-1]``
    depends only on *input*-frame phase deviations, so the whole accumulator
    is one exclusive cumsum — no scan, no Python loop.
    """
    spec = _pv_analysis(x, n_fft, hop)
    n_in = spec.shape[0]
    pos = np.arange(0.0, n_in, rate)  # static: rate and n_in are static
    lo = np.minimum(pos.astype(np.int64), n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = jnp.asarray((pos - lo).astype(np.float32))[:, None]

    s_lo, s_hi = spec[lo], spec[hi]
    mag = (1.0 - frac) * jnp.abs(s_lo) + frac * jnp.abs(s_hi)

    adv = jnp.asarray(
        np.linspace(0.0, math.pi * hop, n_fft // 2 + 1, dtype=np.float32)
    )
    dev = jnp.angle(s_hi) - jnp.angle(s_lo) - adv
    dev = dev - 2.0 * math.pi * jnp.round(dev / (2.0 * math.pi))
    step = adv + dev  # [T_out, bins]
    phase = jnp.angle(spec[0]) + jnp.cumsum(step, axis=0) - step  # exclusive
    out_len = int(round(x.shape[0] / rate))
    return _pv_synthesis(mag * jnp.exp(1j * phase), n_fft, hop, out_len)


@partial(jax.jit, static_argnames=("rate",))
def _shift_resample(stretched: jax.Array, n_valid: jax.Array, rate: float) -> jax.Array:
    """Map the stretched signal back onto the original time axis.

    Output sample k reads position k/rate of the stretched signal — linear
    interpolation with traced (value-dynamic, shape-static) positions, so
    one program serves every true length within a bucket.
    """
    out_n = int(round(stretched.shape[0] * rate))
    src_len = jnp.maximum(jnp.round(n_valid.astype(jnp.float32) / rate), 1.0)
    scale = (src_len - 1.0) / jnp.maximum(n_valid.astype(jnp.float32) - 1.0, 1.0)
    pos = jnp.arange(out_n, dtype=jnp.float32) * scale
    lo = jnp.clip(pos.astype(jnp.int32), 0, stretched.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, stretched.shape[0] - 1)
    frac = pos - lo.astype(jnp.float32)
    return (1.0 - frac) * stretched[lo] + frac * stretched[hi]


def pitch_shift(x: jax.Array, n_valid: jax.Array, semitones: float) -> jax.Array:
    """Duration-preserving pitch shift of a bucket-padded signal.

    ``semitones`` is static (rounded to 1/100 tone upstream): stretch by
    2^(-st/12), then resample the stretched result back to the original
    length, which scales every frequency by 2^(st/12).
    """
    rate = float(2.0 ** (-semitones / 12.0))
    stretched = _stretch_kernel(x.astype(jnp.float32), rate, _PV_NFFT, _PV_HOP)
    return _shift_resample(stretched, n_valid, rate)
