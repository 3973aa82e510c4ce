"""Whisper model: shapes, incremental-vs-teacher-forced parity, decoding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_speech_tpu.models.whisper import (
    PRESETS,
    FallbackTokenizer,
    decode_step,
    decoder_forward,
    encode,
    init_params,
    init_self_kv,
    precompute_cross_kv,
)
from open_speech_tpu.models.whisper.decode import (
    DecodeOptions,
    beam_decode,
    compression_ratio,
    detect_language,
    greedy_decode,
)

CFG = PRESETS["test-tiny"]


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def tok():
    return FallbackTokenizer(n_vocab=CFG.n_vocab, n_langs=CFG.n_langs)


@pytest.fixture(scope="module")
def enc_out(params):
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, CFG.n_mels, CFG.n_audio_ctx * 2))
    out = encode(params, mel, CFG)
    assert out.shape == (2, CFG.n_audio_ctx, CFG.n_audio_state)
    return out


def test_encoder_shape_and_finite(enc_out):
    assert np.isfinite(np.asarray(enc_out)).all()


def test_decoder_forward_shape(params, enc_out):
    tokens = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    logits = decoder_forward(params, tokens, enc_out, CFG)
    assert logits.shape == (2, 4, CFG.n_vocab)
    assert np.isfinite(np.asarray(logits)).all()


def test_incremental_matches_teacher_forced(params, enc_out):
    """KV-cached decode_step must reproduce full-forward logits position by position."""
    tokens = jnp.array([[3, 1, 4, 1, 5], [9, 2, 6, 5, 3]], jnp.int32)
    full = np.asarray(decoder_forward(params, tokens, enc_out, CFG))

    cross_kv = precompute_cross_kv(params, enc_out, CFG)
    self_kv = init_self_kv(CFG, 2)
    inc = []
    for pos in range(tokens.shape[1]):
        logits, self_kv = decode_step(
            params, tokens[:, pos : pos + 1], pos, self_kv, cross_kv, CFG
        )
        inc.append(np.asarray(logits))
    inc = np.stack(inc, axis=1)  # [B, T, V]
    assert np.max(np.abs(inc - full)) < 2e-3


def test_greedy_decode_runs(params, enc_out, tok):
    sp = tok.special
    prompt = np.array([sp.sot_sequence("en")] * 2, np.int32)
    res = greedy_decode(
        params, CFG, sp, enc_out, prompt, DecodeOptions(max_new_tokens=8)
    )
    assert res.tokens.shape == (2, 8)
    assert res.no_speech_prob.shape == (2,)
    assert np.all(res.lengths <= 8)
    assert np.isfinite(res.avg_logprob).all()


def test_greedy_deterministic(params, enc_out, tok):
    sp = tok.special
    prompt = np.array([sp.sot_sequence("en")] * 2, np.int32)
    r1 = greedy_decode(params, CFG, sp, enc_out, prompt, DecodeOptions(max_new_tokens=6))
    r2 = greedy_decode(params, CFG, sp, enc_out, prompt, DecodeOptions(max_new_tokens=6))
    assert np.array_equal(r1.tokens, r2.tokens)


def test_sampled_decode_differs_by_seed(params, enc_out, tok):
    sp = tok.special
    prompt = np.array([sp.sot_sequence("en")] * 2, np.int32)
    opts = DecodeOptions(max_new_tokens=8, temperature=1.0)
    r1 = greedy_decode(params, CFG, sp, enc_out, prompt, opts, rng=jax.random.PRNGKey(1))
    r2 = greedy_decode(params, CFG, sp, enc_out, prompt, opts, rng=jax.random.PRNGKey(2))
    assert not np.array_equal(r1.tokens, r2.tokens)


def test_beam_decode_runs_and_not_worse(params, enc_out, tok):
    sp = tok.special
    prompt = np.array([sp.sot_sequence("en")] * 2, np.int32)
    g = greedy_decode(
        params, CFG, sp, enc_out, prompt,
        DecodeOptions(max_new_tokens=6, timestamps=False),
    )
    b = beam_decode(
        params, CFG, sp, enc_out, prompt,
        DecodeOptions(max_new_tokens=6, beam_size=3, timestamps=False),
    )
    assert b.tokens.shape == (2, 6)
    # beam's length-normalized score should be >= greedy's (same rules)
    assert np.all(b.avg_logprob >= g.avg_logprob - 1e-3)


def test_beam_batch_row_independence(params, enc_out, tok):
    """Beam rows must not leak across the batch axis.

    The beam step folds the K beams of every batch row into the
    cross-attention query axis over an UN-replicated cross-KV
    (model.cross_attend beam>1 path); a wrong fold order would mix
    row 0's beams with row 1's memory. Decoding each row alone must
    reproduce the batched result exactly."""
    sp = tok.special
    prompt = np.array([sp.sot_sequence("en")] * 2, np.int32)
    opts = DecodeOptions(max_new_tokens=6, beam_size=3, timestamps=False)
    batched = beam_decode(params, CFG, sp, enc_out, prompt, opts)
    for row in range(2):
        solo = beam_decode(
            params, CFG, sp, enc_out[row : row + 1], prompt[:1], opts
        )
        assert np.array_equal(solo.tokens[0], batched.tokens[row])
        np.testing.assert_allclose(
            solo.avg_logprob[0], batched.avg_logprob[row], atol=1e-4
        )


def test_beam_ancestry_matches_materialized_gather(params, enc_out, tok):
    """The ancestry row_map formulation (default; no per-step cache
    gather) must reproduce the classic materialized-gather beam search
    EXACTLY — tokens, lengths, and scores."""
    sp = tok.special
    prompt = np.array([sp.sot_sequence("en")] * 2, np.int32)
    for ts in (True, False):
        opts = DecodeOptions(max_new_tokens=8, beam_size=3, timestamps=ts)
        fast = beam_decode(params, CFG, sp, enc_out, prompt, opts)
        oracle = beam_decode(
            params, CFG, sp, enc_out, prompt, opts, ancestry=False
        )
        assert np.array_equal(fast.tokens, oracle.tokens), f"ts={ts}"
        assert np.array_equal(fast.lengths, oracle.lengths)
        np.testing.assert_allclose(
            fast.avg_logprob, oracle.avg_logprob, atol=1e-4
        )


def test_beam_int8_cross_kv_path(params, enc_out, tok):
    """Beam over an int8-quantized model (dict-form cross-KV pack) —
    exercises the beam>1 fold through the int8 decode_attention path."""
    from open_speech_tpu.models.whisper.quantize import quantize_whisper_params

    sp = tok.special
    qparams = quantize_whisper_params(params)
    prompt = np.array([sp.sot_sequence("en")] * 2, np.int32)
    opts = DecodeOptions(max_new_tokens=5, beam_size=2, timestamps=False)
    res = beam_decode(qparams, CFG, sp, enc_out.astype(jnp.bfloat16), prompt, opts)
    assert res.tokens.shape == (2, 5)
    assert np.isfinite(res.avg_logprob).all()


def test_timestamp_rules_first_token_is_timestamp(params, enc_out, tok):
    sp = tok.special
    prompt = np.array([sp.sot_sequence("en")] * 2, np.int32)
    res = greedy_decode(
        params, CFG, sp, enc_out, prompt, DecodeOptions(max_new_tokens=8)
    )
    # with timestamp rules on, the first sampled token must be a timestamp
    assert np.all(res.tokens[:, 0] >= sp.timestamp_begin)


def test_detect_language(params, enc_out, tok):
    codes, probs = detect_language(params, CFG, tok.special, enc_out)
    assert len(codes) == 2
    assert all(c in ("en", "zh") for c in codes)  # test config has 2 langs
    assert np.all(probs > 0) and np.all(probs <= 1)


def test_compression_ratio():
    assert compression_ratio("the the the the the the the the") > 1.5
    assert compression_ratio("") == 0.0


def test_tokenizer_layout_v3():
    from open_speech_tpu.models.whisper.tokenizer import SpecialTokens

    sp = SpecialTokens.from_vocab(51866, 100)
    assert sp.eot == 50257
    assert sp.sot == 50258
    assert sp.no_speech == 50363
    assert sp.no_timestamps == 50364
    assert sp.timestamp_begin == 50365
    assert sp.lang_token("en") == 50259
    assert sp.lang_token("yue") == 50358
    assert abs(sp.timestamp_seconds(sp.timestamp_begin + 100) - 2.0) < 1e-9


def test_tokenizer_layout_v2():
    from open_speech_tpu.models.whisper.tokenizer import SpecialTokens

    sp = SpecialTokens.from_vocab(51865, 99)
    assert sp.eot == 50257
    assert sp.timestamp_begin == 50364
    sp_en = SpecialTokens.from_vocab(51864, 99)
    assert sp_en.eot == 50256


def test_fallback_tokenizer_roundtrip(tok):
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    # specials stripped on decode
    assert tok.decode(ids + [tok.special.eot]) == "hello world"


def test_enc_len_mask_equals_truncated_encoder(params, enc_out, tok):
    """Masked cross-attention over zero-padded encoder states must produce
    EXACTLY the tokens of decoding over the truncated states (the streaming
    interim path relies on this: only audio-backed blocks are encoded, the
    rest masked via enc_len). Covers greedy AND beam."""
    sp = tok.special
    prompt = np.array([sp.sot_sequence("en")] * 2, np.int32)
    keep = CFG.n_audio_ctx // 2
    trunc = np.asarray(enc_out)[:, :keep]
    padded = np.concatenate(
        [trunc, np.zeros_like(np.asarray(enc_out)[:, keep:])], axis=1
    )
    enc_len = np.array([keep, keep], np.int32)
    opts = DecodeOptions(max_new_tokens=8)

    g_trunc = greedy_decode(params, CFG, sp, jnp.asarray(trunc), prompt, opts)
    g_mask = greedy_decode(
        params, CFG, sp, jnp.asarray(padded), prompt, opts, enc_len=enc_len
    )
    assert np.array_equal(g_trunc.tokens, g_mask.tokens)
    np.testing.assert_allclose(
        g_trunc.avg_logprob, g_mask.avg_logprob, atol=1e-4
    )

    b_opts = DecodeOptions(max_new_tokens=8, beam_size=2)
    b_trunc = beam_decode(params, CFG, sp, jnp.asarray(trunc), prompt, b_opts)
    b_mask = beam_decode(
        params, CFG, sp, jnp.asarray(padded), prompt, b_opts, enc_len=enc_len
    )
    assert np.array_equal(b_trunc.tokens, b_mask.tokens)


def test_enc_len_zero_is_safe(params, enc_out, tok):
    """enc_len=0 must not NaN (all-masked softmax); it clamps to 1 frame."""
    sp = tok.special
    prompt = np.array([sp.sot_sequence("en")], np.int32)
    res = greedy_decode(
        params, CFG, sp, jnp.asarray(np.asarray(enc_out)[:1]), prompt,
        DecodeOptions(max_new_tokens=4), enc_len=np.array([0], np.int32),
    )
    assert np.isfinite(res.avg_logprob).all()
