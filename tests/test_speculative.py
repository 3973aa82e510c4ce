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
