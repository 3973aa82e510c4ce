"""Additional ops coverage: attention properties, ISTFT parity, BPE, dsp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.attention import decode_attention, mha_reference


# ── attention reference properties ────────────────────────────────────


def _qkv(b=1, h=2, tq=6, tk=6, d=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(ks[0], (b, h, tq, d)),
        jax.random.normal(ks[1], (b, h, tk, d)),
        jax.random.normal(ks[2], (b, h, tk, d)),
    )


def test_attention_softmax_rows_sum_to_one_effect():
    q, k, v = _qkv()
    ones_v = jnp.ones_like(v)
    out = mha_reference(q, k, ones_v)
    # with constant V, attention output must be exactly that constant
    assert np.allclose(np.asarray(out), 1.0, atol=1e-5)


def test_attention_causal_ignores_future():
    q, k, v = _qkv()
    out_full = mha_reference(q, k, v, causal=True)
    # mutate the "future" keys/values: rows before the end must not change
    k2 = k.at[:, :, -1].set(999.0)
    v2 = v.at[:, :, -1].set(999.0)
    out_mut = mha_reference(q, k2, v2, causal=True)
    assert np.allclose(
        np.asarray(out_full[:, :, :-1]), np.asarray(out_mut[:, :, :-1]),
        atol=1e-5,
    )


def test_attention_kv_length_masks_tail():
    q, k, v = _qkv(tk=8)
    out_masked = mha_reference(q, k, v, kv_length=jnp.array([5]))
    k2 = k.at[:, :, 5:].set(123.0)
    v2 = v.at[:, :, 5:].set(-55.0)
    out_masked2 = mha_reference(q, k2, v2, kv_length=jnp.array([5]))
    assert np.allclose(np.asarray(out_masked), np.asarray(out_masked2), atol=1e-5)


def test_decode_attention_matches_reference():
    q, k, v = _qkv(tq=1, tk=10)
    length = jnp.array([7])
    a = decode_attention(q, k, v, length)
    b = mha_reference(q, k, v, kv_length=length)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# ── ISTFT parity vs direct overlap-add ────────────────────────────────


def test_istft_reconstructs_stft():
    """istft(stft-like frames) must invert framing for a mid-signal region."""
    from open_speech_tpu.ops.vocoder import istft

    n_fft, hop = 20, 5
    rng = np.random.default_rng(0)
    x = rng.standard_normal(400).astype(np.float32)
    # build windowed DFT frames like a forward STFT (center-padded)
    pad = n_fft // 2
    xp = np.pad(x, pad, mode="reflect")
    frames = np.stack(
        [xp[i * hop : i * hop + n_fft] for i in range(len(x) // hop)]
    )
    window = np.hanning(n_fft + 1)[:-1]
    spec = np.fft.rfft(frames * window, axis=-1)
    mag = jnp.asarray(np.abs(spec)[None].astype(np.float32))
    phase = jnp.asarray(np.angle(spec)[None].astype(np.float32))
    rec = np.asarray(istft(mag, phase, n_fft, hop))[0]
    # interior matches the original signal (boundary effects at the edges)
    assert np.allclose(rec[40:-40], x[40 : len(rec) - 40], atol=1e-3)


def test_istft_full_length_when_hop_exceeds_half_fft():
    """Contract: istft returns [B, T*hop] even when hop > n_fft/2 (the OLA
    buffer ends before pad + T*hop there; the tail is zero-extended)."""
    from open_speech_tpu.ops.vocoder import istft

    mag = jnp.ones((1, 10, 9))
    phase = jnp.zeros((1, 10, 9))
    out = istft(mag, phase, n_fft=16, hop=12)
    assert out.shape == (1, 120)


def test_conv_transpose1d_grouped_matches_torch():
    """Grouped (1 < groups < C) branch accepts the documented
    transpose(2,0,1)[::-1] layout and matches torch exactly."""
    torch = pytest.importorskip("torch")
    from open_speech_tpu.ops.vocoder import conv_transpose1d

    torch.manual_seed(0)
    for cin, cout, g, k, s in [(8, 12, 4, 9, 3), (6, 6, 2, 8, 4)]:
        m = torch.nn.ConvTranspose1d(
            cin, cout, k, stride=s, padding=max(0, (k - s) // 2), groups=g
        )
        x = torch.randn(2, cin, 20)
        ref = m(x).detach().numpy()
        w = m.weight.detach().numpy().transpose(2, 0, 1)[::-1].copy()
        p = {
            "w": jnp.asarray(w),
            "b": jnp.asarray(m.bias.detach().numpy()),
        }
        out = np.asarray(
            conv_transpose1d(
                jnp.asarray(x.numpy().transpose(0, 2, 1)),
                p, stride=s, pad=m.padding[0], groups=g,
            )
        ).transpose(0, 2, 1)
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_log_mel_sub_hop_input_does_not_crash():
    """A sub-10 ms clip (shorter than one hop) must yield a finite
    one-frame spectrogram, not an empty-reduction crash."""
    from open_speech_tpu.ops.mel import log_mel_spectrogram

    out = np.asarray(log_mel_spectrogram(jnp.ones(150, jnp.float32) * 0.1))
    assert out.shape[0] == 128 and out.shape[1] >= 1
    assert np.all(np.isfinite(out))


# ── BPE tokenizer with a synthetic vocab ──────────────────────────────


def test_bpe_encode_decode(tmp_path):
    import json

    from open_speech_tpu.models.whisper.tokenizer import WhisperTokenizer

    # tiny synthetic byte-level vocab: single chars + one merge
    from open_speech_tpu.models.whisper.tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    vocab = {}
    for byte, ch in b2u.items():
        vocab[ch] = len(vocab)
    hl = b2u[ord("h")] + b2u[ord("e")]
    vocab[hl] = len(vocab)  # merged token "he"
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        f"#version: 0.2\n{b2u[ord('h')]} {b2u[ord('e')]}\n"
    )
    tok = WhisperTokenizer(str(tmp_path), n_langs=99)
    ids = tok.encode("hello")
    assert ids[0] == vocab[hl]  # merge applied
    assert tok.decode(ids) == "hello"
    # roundtrip with specials stripped
    assert tok.decode(ids + [tok.special.eot, tok.special.sot]) == "hello"
    # unicode survives byte-level encoding
    ids2 = tok.encode("héllo ☃")
    assert tok.decode(ids2) == "héllo ☃"


def test_get_tokenizer_prefers_vocab_dir(tmp_path):
    import json

    from open_speech_tpu.models.whisper.tokenizer import (
        WhisperTokenizer,
        get_tokenizer,
    )

    (tmp_path / "vocab.json").write_text(json.dumps({"a": 0}))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    tok = get_tokenizer(str(tmp_path))
    assert isinstance(tok, WhisperTokenizer)


# ── resampler / mel edge cases ────────────────────────────────────────


def test_resample_identity():
    from open_speech_tpu.ops.resample import resample_poly

    x = jnp.asarray(np.random.default_rng(0).standard_normal(100).astype(np.float32))
    assert np.array_equal(np.asarray(resample_poly(x, 3, 3)), np.asarray(x))


def test_resample_batched_leading_dims():
    from open_speech_tpu.ops.resample import resample_poly

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 3, 160)).astype(np.float32)
    )
    y = resample_poly(x, 1, 2)
    assert y.shape == (2, 3, 80)


def test_mel_batch_dims():
    from open_speech_tpu.ops.mel import log_mel_spectrogram

    audio = jnp.zeros((4, 16000))
    feats = log_mel_spectrogram(audio, n_mels=80)
    assert feats.shape == (4, 80, 100)


# ── encode gating ─────────────────────────────────────────────────────


def test_supported_formats_without_ffmpeg():
    from open_speech_tpu.audio import encode

    formats = encode.supported_formats()
    assert {"wav", "pcm"} <= formats
    if not encode.ffmpeg_available():
        assert "mp3" not in formats


def test_content_types_map():
    from open_speech_tpu.audio.encode import CONTENT_TYPES

    assert CONTENT_TYPES["wav"] == "audio/wav"
    assert CONTENT_TYPES["mp3"] == "audio/mpeg"
    assert CONTENT_TYPES["opus"] == "audio/ogg"


# ── whisper long-form segmentation units ──────────────────────────────


def test_split_segments_consecutive_timestamps():
    from open_speech_tpu.models.whisper.tokenizer import FallbackTokenizer
    from open_speech_tpu.models.whisper.transcribe import _split_segments

    tok = FallbackTokenizer(n_vocab=384, n_langs=2)
    ts = tok.special.timestamp_begin
    # <|0.00|> text <|0.50|><|0.50|> text <|1.00|>
    tokens = [ts, 65, 66, ts + 25, ts + 25, 67, ts + 50]
    segs, advance = _split_segments(tokens, tok, time_offset=0.0, window_frames=120)
    # whisper semantics: only the segment closed by the consecutive-timestamp
    # pair is emitted; the remainder is re-decoded after the seek advance
    assert len(segs) == 1
    assert segs[0][1] == 0.0 and abs(segs[0][2] - 0.5) < 1e-9
    assert segs[0][0] == [65, 66]
    assert advance == 50  # frames to the last consecutive timestamp (0.5 s)


def test_split_segments_single_open_segment():
    from open_speech_tpu.models.whisper.tokenizer import FallbackTokenizer
    from open_speech_tpu.models.whisper.transcribe import _split_segments

    tok = FallbackTokenizer(n_vocab=384, n_langs=2)
    ts = tok.special.timestamp_begin
    tokens = [ts, 65, 66, 67]
    segs, advance = _split_segments(tokens, tok, time_offset=1.0, window_frames=120)
    assert len(segs) == 1
    assert segs[0][1] == 1.0
    assert advance == 120  # consume the whole window


# ── quantized batcher interop ─────────────────────────────────────────


def test_batcher_with_quantized_params():
    import asyncio

    from open_speech_tpu.models.whisper import PRESETS, FallbackTokenizer, init_params
    from open_speech_tpu.models.whisper.quantize import quantize_whisper_params
    from open_speech_tpu.ops.mel import log_mel_spectrogram
    from open_speech_tpu.runtime.batcher import ContinuousBatcher

    cfg = PRESETS["test-tiny"]
    params = quantize_whisper_params(
        init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    )
    tok = FallbackTokenizer(n_vocab=cfg.n_vocab, n_langs=cfg.n_langs)
    audio = np.random.default_rng(0).uniform(
        -0.3, 0.3, cfg.n_audio_ctx * 2 * 160
    ).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(audio), n_mels=cfg.n_mels))

    async def go():
        b = ContinuousBatcher(params, cfg, tok.special, slots=2, max_new_tokens=4)
        b.start()
        try:
            return await asyncio.wait_for(b.transcribe_window(mel), 120)
        finally:
            await b.stop()

    tokens = asyncio.get_event_loop_policy().new_event_loop().run_until_complete(go())
    assert all(0 <= t < cfg.n_vocab for t in tokens)
