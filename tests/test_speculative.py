"""Speculative decode: exact-token equality with greedy, acceptance sanity.

The exactness property is checkable with random weights — the draft only
changes how many tokens each verify pass confirms, never which tokens the
target emits — so a random-init draft (maximally disagreeing with the
target) is the adversarial case for the accept/correct bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_speech_tpu.models.whisper.decode import (
    DecodeOptions,
    greedy_decode,
)
from open_speech_tpu.models.whisper import (
    PRESETS,
    FallbackTokenizer,
    init_params,
)
from open_speech_tpu.models.whisper.model import encode
from open_speech_tpu.models.whisper.speculative import (
    speculative_greedy_decode,
)


@pytest.fixture(scope="module")
def setup():
    cfg = PRESETS["test-tiny"]
    t_params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    d_params = init_params(jax.random.PRNGKey(7), cfg, dtype=jnp.float32)
    tok = FallbackTokenizer(n_vocab=cfg.n_vocab, n_langs=cfg.n_langs)
    mel = jax.random.normal(
        jax.random.PRNGKey(1), (1, cfg.n_mels, cfg.n_audio_ctx * 2)
    )
    enc_out = encode(t_params, mel, cfg)
    d_enc_out = encode(d_params, mel, cfg)
    prompt = np.asarray(
        [tok.special.sot_sequence("en")], np.int32
    )
    return cfg, t_params, d_params, tok, enc_out, d_enc_out, prompt


@pytest.mark.parametrize("timestamps", [True, False])
@pytest.mark.parametrize("gamma", [1, 4])
def test_exact_match_with_adversarial_draft(setup, timestamps, gamma):
    cfg, t_params, d_params, tok, enc, d_enc, prompt = setup
    opts = DecodeOptions(
        max_new_tokens=48, timestamps=timestamps,
        suppress_tokens=tuple(tok.non_speech_tokens),
    )
    ref = greedy_decode(t_params, cfg, tok.special, enc, prompt, opts)
    spec = speculative_greedy_decode(
        t_params, cfg, d_params, cfg, tok.special, enc, d_enc, prompt,
        opts, gamma=gamma,
    )
    np.testing.assert_array_equal(spec.tokens, ref.tokens)
    np.testing.assert_array_equal(spec.lengths, ref.lengths)
    # tokens are exact; logprobs see reassociation noise (verify scores a
    # [G+1, d] chunk matmul where greedy does per-step matvecs)
    np.testing.assert_allclose(spec.avg_logprob, ref.avg_logprob, atol=5e-3)
    np.testing.assert_allclose(
        spec.no_speech_prob, ref.no_speech_prob, atol=1e-5
    )


def test_self_draft_accepts_everything(setup):
    """Draft == target: every proposal verifies, so each round emits
    gamma+1 tokens — the mechanical upper bound of the speedup."""
    cfg, t_params, _d, tok, enc, _de, prompt = setup
    opts = DecodeOptions(
        max_new_tokens=48, timestamps=True,
        suppress_tokens=tuple(tok.non_speech_tokens),
    )
    gamma = 4
    ref = greedy_decode(t_params, cfg, tok.special, enc, prompt, opts)
    spec = speculative_greedy_decode(
        t_params, cfg, t_params, cfg, tok.special, enc, enc, prompt,
        opts, gamma=gamma,
    )
    np.testing.assert_array_equal(spec.tokens, ref.tokens)
    emitted = int(ref.lengths[0]) + (
        1 if (ref.tokens[0] == tok.special.eot).any() else 0
    )
    assert spec.spec_accepted == spec.spec_rounds * gamma or (
        spec.spec_rounds <= -(-emitted // (gamma + 1)) + 1
    )
    # perfect acceptance: rounds ~= emitted / (gamma+1), far below emitted
    assert spec.spec_rounds <= -(-48 // (gamma + 1)) + 1


def test_rejects_batched_and_sampled(setup):
    cfg, t_params, d_params, tok, enc, d_enc, prompt = setup
    two = np.repeat(prompt, 2, axis=0)
    with pytest.raises(ValueError, match="single-stream"):
        speculative_greedy_decode(
            t_params, cfg, d_params, cfg, tok.special,
            jnp.repeat(enc, 2, 0), jnp.repeat(d_enc, 2, 0), two,
        )
    with pytest.raises(ValueError, match="temperature"):
        speculative_greedy_decode(
            t_params, cfg, d_params, cfg, tok.special, enc, d_enc, prompt,
            DecodeOptions(temperature=0.4),
        )


def test_exact_match_at_context_edge(setup):
    """Decode driven to the n_text_ctx boundary: the final verify chunks
    extend past the position table, and their leading live slots must
    still be exact (regression: dynamic_slice clamped the chunk start,
    shifting live slots' position embeddings). EOT is suppressed so the
    decode always reaches the edge instead of finishing early by luck."""
    cfg, t_params, d_params, tok, enc, d_enc, prompt = setup
    # init_params leaves pos_emb at zeros (whisper learns it), which would
    # make a clamp-shifted position slice invisible — randomize it so the
    # test actually discriminates
    t_params = dict(t_params)
    t_params["decoder"] = dict(t_params["decoder"])
    t_params["decoder"]["pos_emb"] = jax.random.normal(
        jax.random.PRNGKey(3), t_params["decoder"]["pos_emb"].shape
    ).astype(t_params["decoder"]["pos_emb"].dtype)
    # long conditioning prefix (the realistic trigger: startofprev + prev
    # text pushes p_len so chunks cross ctx within a few rounds, while the
    # crossing tokens are still free text choices, not rule-forced tails)
    rng = np.random.default_rng(5)
    prev = rng.integers(1, 200, 17).astype(np.int32)
    long_prompt = np.concatenate(
        [[tok.special.startofprev], prev, prompt[0]]
    )[None].astype(np.int32)
    opts = DecodeOptions(
        max_new_tokens=cfg.n_text_ctx,  # clamped to ctx - p_len - 1
        timestamps=True,
        suppress_tokens=tuple(tok.non_speech_tokens) + (tok.special.eot,),
    )
    ref = greedy_decode(t_params, cfg, tok.special, enc, long_prompt, opts)
    assert int(ref.lengths[0]) == cfg.n_text_ctx - long_prompt.shape[1] - 1
    spec = speculative_greedy_decode(
        t_params, cfg, d_params, cfg, tok.special, enc, d_enc, long_prompt,
        opts, gamma=4,
    )
    np.testing.assert_array_equal(spec.tokens, ref.tokens)
    np.testing.assert_array_equal(spec.lengths, ref.lengths)


def test_verify_chunk_matches_sequential_at_crossing(setup):
    """Slot logits of a verify chunk whose tail crosses n_text_ctx must
    equal the sequential decode_step ground truth (regression: the
    unpadded pos_emb dynamic_slice clamped its start, shifting the live
    slots' position rows by the overhang)."""
    import jax.numpy as jnp

    from open_speech_tpu.models.whisper import speculative as S
    from open_speech_tpu.models.whisper.decode import _prefill
    from open_speech_tpu.models.whisper.model import (
        _decode_step_impl,
        init_self_kv,
        precompute_cross_kv,
    )

    cfg, t_params, _d, tok, enc, _de, _p = setup
    t_params = dict(t_params)
    t_params["decoder"] = dict(t_params["decoder"])
    t_params["decoder"]["pos_emb"] = jax.random.normal(
        jax.random.PRNGKey(3), (cfg.n_text_ctx, cfg.n_text_state)
    )
    ckv = precompute_cross_kv(t_params, enc, cfg)
    rng = np.random.default_rng(5)
    g1 = 5
    # chunk at pos0 = ctx - g1 + 2: two slots overhang the position table
    prompt_len = cfg.n_text_ctx - g1 + 2
    prompt = jnp.asarray(rng.integers(1, 200, (1, prompt_len)), jnp.int32)
    toks = jnp.asarray(rng.integers(1, 200, (g1,)), jnp.int32)
    cache = prompt_len + 2 * g1  # headroom so only pos_emb could clamp

    kv = init_self_kv(cfg, 1, cache, jnp.float32)
    _, kv = _prefill(t_params, prompt, ckv, kv, cfg)
    seq = []
    for j in range(g1):
        lg, kv = _decode_step_impl(
            t_params, toks[j][None, None], prompt_len + j, kv,
            ckv, cfg.n_text_head,
        )
        seq.append(lg)
    seq = jnp.stack(seq, 1)  # [1, G, V]

    kv2 = init_self_kv(cfg, 1, cache, jnp.float32)
    _, kv2 = _prefill(t_params, prompt, ckv, kv2, cfg)
    pe = t_params["decoder"]["pos_emb"]
    pe_pad = jnp.concatenate([pe, jnp.zeros((g1, pe.shape[1]), pe.dtype)])
    chunk, _ = S._verify_chunk(
        t_params, toks[None, :], prompt_len, kv2, ckv, cfg.n_text_head,
        None, pe_pad,
    )
    # live slots (positions < n_text_ctx) are bit-comparable; overhang
    # slots are dead by construction and excluded
    live = cfg.n_text_ctx - prompt_len
    np.testing.assert_allclose(
        np.asarray(chunk[:, :live]), np.asarray(seq[:, :live]), atol=2e-4
    )


def test_backend_spec_wiring_matches_plain(monkeypatch, tmp_path):
    """OS_SPEC_DRAFT_MODEL routes batch-1 greedy REST decodes through
    speculative decode and the response text is unchanged."""
    from pathlib import Path

    from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend
    from open_speech_tpu.config import settings
    from open_speech_tpu.ops import audio as codec

    fixtures = Path(__file__).parent / "fixtures"
    monkeypatch.setattr(settings, "stt_model_dir", str(fixtures))
    monkeypatch.setattr(settings, "os_precompile_on_load", False)
    backend = JaxWhisperBackend()

    rng = np.random.default_rng(0)
    wav = codec.write_wav(
        rng.uniform(-0.2, 0.2, 2 * 16000).astype(np.float32), 16000
    )
    kwargs = dict(
        language="en", response_format="verbose_json",
        fallback=False, beam_size=1,
    )
    monkeypatch.setattr(settings, "os_spec_draft_model", "")
    plain = backend.transcribe(wav, "test-tiny", **kwargs)
    monkeypatch.setattr(settings, "os_spec_draft_model", "test-tiny-draft")
    monkeypatch.setattr(settings, "os_spec_gamma", 3)
    spec = backend.transcribe(wav, "test-tiny", **kwargs)
    assert spec["text"] == plain["text"]
    assert [s["text"] for s in spec["segments"]] == [
        s["text"] for s in plain["segments"]
    ]
