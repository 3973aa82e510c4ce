"""Pocket-TTS converter parity vs torch oracles.

Codec parity runs against the REAL ``transformers.MimiModel`` (upstream
port of the Kyutai codec) through the HF→moshi naming translation; LM
parity runs against the independent torch oracle in pocket_oracle.py.
Reference behavior: /root/reference/src/tts/backends/pocket_tts_backend.py.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from open_speech_tpu.models.pocket.convert import (
    convert_mimi,
    convert_pocket_lm,
    lm_config_from_state_dict,
    load_checkpoint,
    mimi_config_from_state_dict,
)
from open_speech_tpu.models.pocket.lm import (
    PocketLMConfig,
    init_caches,
    lm_forward,
    temporal_prefill,
    temporal_step,
)
from open_speech_tpu.models.pocket.mimi import (
    TEST_TINY,
    MimiStreamingDecoder,
    mimi_decode,
    mimi_encode,
)
from tests.pocket_oracle import (
    OracleLM,
    hf_mimi_to_moshi_state,
    oracle_lm_state_dict,
    tiny_hf_mimi,
)

ORACLE_LM_CFG = PocketLMConfig(
    d_model=32,
    n_heads=2,
    n_layers=2,
    ff=48,
    dep_d_model=16,
    dep_heads=2,
    dep_layers=2,
    dep_ff=24,
    n_q=4,
    card=32,
    text_card=64,
    max_ctx=64,
)


@pytest.fixture(scope="module")
def hf_mimi():
    return tiny_hf_mimi()


@pytest.fixture(scope="module")
def mimi_jax(hf_mimi):
    state = hf_mimi_to_moshi_state(hf_mimi)
    return convert_mimi(state, TEST_TINY)


def test_mimi_config_inference(hf_mimi):
    """Shape-derivable geometry is inferred from the moshi state dict."""
    cfg = mimi_config_from_state_dict(hf_mimi_to_moshi_state(hf_mimi))
    assert cfg.n_filters == 4
    assert cfg.dimension == 16
    assert cfg.ratios == (4, 3, 2, 2)
    assert cfg.t_layers == 2
    assert cfg.t_ff == 32
    assert cfg.n_q == 4
    assert cfg.card == 32
    assert cfg.q_dim == 8
    assert cfg.down_stride == 2


def test_mimi_encode_code_parity(hf_mimi, mimi_jax):
    """Integer Mimi codes match transformers MimiModel exactly."""
    params, cfg = mimi_jax
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal((1, cfg.samples_per_frame * 17)) * 0.2).astype(
        np.float32
    )
    with torch.no_grad():
        hf_codes = hf_mimi.encode(torch.from_numpy(pcm)[:, None]).audio_codes
    jax_codes = np.asarray(mimi_encode(params, cfg, jnp.asarray(pcm)))
    assert hf_codes.shape == jax_codes.shape
    assert np.array_equal(hf_codes.numpy(), jax_codes)


def test_mimi_decode_waveform_parity(hf_mimi, mimi_jax):
    params, cfg = mimi_jax
    rng = np.random.default_rng(1)
    codes = rng.integers(0, cfg.card, (1, cfg.n_q, 23), dtype=np.int64)
    with torch.no_grad():
        hf_pcm = hf_mimi.decode(torch.from_numpy(codes)).audio_values
    jax_pcm = np.asarray(mimi_decode(params, cfg, jnp.asarray(codes)))
    hf_np = hf_pcm[:, 0].numpy()
    assert hf_np.shape == jax_pcm.shape
    np.testing.assert_allclose(jax_pcm, hf_np, atol=2e-4)


def test_mimi_roundtrip_decode_of_own_codes(hf_mimi, mimi_jax):
    """Full encode→decode path parity (codes equal ⇒ waveforms close)."""
    params, cfg = mimi_jax
    rng = np.random.default_rng(2)
    pcm = (rng.standard_normal((1, cfg.samples_per_frame * 9)) * 0.3).astype(
        np.float32
    )
    with torch.no_grad():
        out = hf_mimi(torch.from_numpy(pcm)[:, None])
    codes = np.asarray(mimi_encode(params, cfg, jnp.asarray(pcm)))
    jax_pcm = np.asarray(mimi_decode(params, cfg, jnp.asarray(codes)))
    hf_np = out.audio_values[:, 0].numpy()
    np.testing.assert_allclose(jax_pcm[:, : hf_np.shape[1]], hf_np, atol=2e-4)


def test_streaming_decoder_matches_full_decode(mimi_jax):
    params, cfg = mimi_jax
    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg.card, (1, cfg.n_q, 37), dtype=np.int32)
    full = np.asarray(mimi_decode(params, cfg, jnp.asarray(toks)))
    dec = MimiStreamingDecoder(params, cfg)
    parts = [dec.feed(toks[:, :, i : i + 5]) for i in range(0, 37, 5)]
    stream = np.concatenate(parts, axis=1)
    # 5e-5 on O(10) random-init samples: fp reassociation between the
    # block-split overlap-add and the one-shot matmul form
    np.testing.assert_allclose(stream, full, atol=5e-5)


# ── LM ────────────────────────────────────────────────────────────────


@pytest.fixture(scope="module")
def lm_pair():
    torch.manual_seed(7)
    oracle = OracleLM(ORACLE_LM_CFG).eval()
    state = oracle_lm_state_dict(oracle)
    params, cfg = convert_pocket_lm(state, n_heads=2, dep_heads=2)
    return oracle, params, cfg


def test_lm_config_inference(lm_pair):
    oracle, _, _ = lm_pair
    cfg = lm_config_from_state_dict(oracle_lm_state_dict(oracle))
    assert cfg.d_model == 32
    assert cfg.n_layers == 2
    assert cfg.ff == 48
    assert cfg.dep_d_model == 16
    assert cfg.dep_layers == 2
    assert cfg.dep_ff == 24
    assert cfg.n_q == 4
    assert cfg.card == 32
    assert cfg.text_card == 64


def test_lm_forward_parity(lm_pair):
    """Teacher-forced text + audio logits match the torch oracle."""
    oracle, params, cfg = lm_pair
    rng = np.random.default_rng(5)
    b, t = 2, 11
    text = rng.integers(0, cfg.text_card, (b, t))
    audio = rng.integers(0, cfg.card, (b, cfg.n_q, t))
    with torch.no_grad():
        o_text, o_dep = oracle(
            torch.from_numpy(text), torch.from_numpy(audio)
        )
    j_text, j_dep, _ = lm_forward(
        params, cfg, jnp.asarray(text, jnp.int32), jnp.asarray(audio, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(j_text), o_text.numpy(), atol=3e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(j_dep), o_dep.numpy(), atol=3e-4, rtol=1e-3
    )


def test_prefill_matches_stepwise_decode(lm_pair):
    """KV-cached one-step decode reproduces the batched prefill hidden."""
    _, params, cfg = lm_pair
    rng = np.random.default_rng(6)
    b, t = 1, 7
    x = jnp.asarray(rng.standard_normal((b, t, cfg.d_model)), jnp.float32)
    h_ref, _ = temporal_prefill(
        params, cfg, x, init_caches(cfg, b), jnp.int32(0)
    )
    caches = init_caches(cfg, b)
    hs = []
    for i in range(t):
        h, caches = temporal_step(
            params, cfg, x[:, i], caches, jnp.full((b,), i, jnp.int32)
        )
        hs.append(h)
    np.testing.assert_allclose(
        np.stack([np.asarray(h) for h in hs], axis=1),
        np.asarray(h_ref),
        atol=1e-5,
    )


def test_depformer_sample_incremental_matches_full_forward(lm_pair):
    """The KV-cached O(K) depth sampler picks exactly the tokens the
    full teacher-forced depformer_forward would (argmax mode), at every
    stage — guards the incremental rewrite of depformer_sample."""
    from open_speech_tpu.models.pocket.lm import (
        depformer_forward,
        depformer_sample,
    )

    _, params, cfg = lm_pair
    rng = np.random.default_rng(13)
    b = 2
    h = jnp.asarray(rng.standard_normal((b, cfg.d_model)), jnp.float32)
    text_tok = jnp.asarray(rng.integers(0, cfg.text_card, b), jnp.int32)
    key = jax.random.PRNGKey(0)

    got = np.asarray(
        depformer_sample(params, cfg, h, text_tok, key, jnp.float32(0.0))
    )

    # reference: re-run the full forward per stage (the pre-rewrite form)
    toks = np.full((b, cfg.n_q), cfg.audio_initial, np.int32)
    for s in range(cfg.n_q):
        logits = depformer_forward(
            params, cfg, h, text_tok, jnp.asarray(toks)
        )[:, s]
        toks[:, s] = np.argmax(np.asarray(logits), -1)

    np.testing.assert_array_equal(got, toks)


def test_temporal_step_batched_matches_per_example(lm_pair):
    """B>1 decode steps (per-example positions) equal running each
    example alone — guards the RoPE angle/batch broadcast in _rope,
    which previously mis-aligned (or raised) for pos shape [B, 1]."""
    _, params, cfg = lm_pair
    rng = np.random.default_rng(11)
    b, t = 3, 5
    xs = jnp.asarray(rng.standard_normal((b, t, cfg.d_model)), jnp.float32)
    # examples at staggered positions, like a continuous batcher's slots
    offsets = np.array([0, 3, 9], np.int32)

    caches = init_caches(cfg, b)
    batched = []
    for i in range(t):
        h, caches = temporal_step(
            params, cfg, xs[:, i], caches,
            jnp.asarray(offsets + i, jnp.int32),
        )
        batched.append(np.asarray(h))

    for ex in range(b):
        c1 = init_caches(cfg, 1)
        # reproduce the staggered start by pre-filling zeros up to offset
        for j in range(int(offsets[ex])):
            _, c1 = temporal_step(
                params, cfg,
                jnp.zeros((1, cfg.d_model), jnp.float32), c1,
                jnp.full((1,), j, jnp.int32),
            )
        for i in range(t):
            h1, c1 = temporal_step(
                params, cfg, xs[ex : ex + 1, i], c1,
                jnp.full((1,), int(offsets[ex]) + i, jnp.int32),
            )
            np.testing.assert_allclose(
                h1[0], batched[i][ex], atol=2e-5,
                err_msg=f"ex={ex} step={i}",
            )


def test_load_checkpoint_roundtrip(tmp_path, hf_mimi, lm_pair):
    """safetensors dir → load_checkpoint → PocketTTS generates audio."""
    from safetensors.numpy import save_file

    oracle, _, _ = lm_pair
    mimi_state = hf_mimi_to_moshi_state(hf_mimi)
    lm_state = oracle_lm_state_dict(oracle)
    save_file(
        {k: np.ascontiguousarray(v) for k, v in mimi_state.items()},
        str(tmp_path / "mimi-tiny.safetensors"),
    )
    save_file(
        {k: np.ascontiguousarray(v) for k, v in lm_state.items()},
        str(tmp_path / "model.safetensors"),
    )
    model = load_checkpoint(tmp_path)
    # inferred head counts differ from the oracle's tiny geometry, but the
    # loaded model must run the full clone+generate path mechanically
    pcm = np.zeros(model.mimi_cfg.samples_per_frame * 4, np.float32)
    state = model.state_for_audio_prompt(pcm)
    audio = model.generate("hi", state, max_frames=3)
    assert audio.ndim == 1 and audio.size > 0

def test_load_checkpoint_reads_release_config(tmp_path, hf_mimi, lm_pair):
    """config.json geometry (head counts, context, delays, text pad id)
    overrides shape-guessing — a wrong head guess is silent garbage."""
    import json

    from safetensors.numpy import save_file

    oracle, _, _ = lm_pair
    save_file(
        {
            k: np.ascontiguousarray(v)
            for k, v in hf_mimi_to_moshi_state(hf_mimi).items()
        },
        str(tmp_path / "mimi-tiny.safetensors"),
    )
    save_file(
        {
            k: np.ascontiguousarray(v)
            for k, v in oracle_lm_state_dict(oracle).items()
        },
        str(tmp_path / "model.safetensors"),
    )
    (tmp_path / "config.json").write_text(
        json.dumps(
            {
                "num_heads": ORACLE_LM_CFG.n_heads,
                "depformer_num_heads": ORACLE_LM_CFG.dep_heads,
                "context": 96,
                "delays": [0, 1, 1, 1],
                "existing_text_padding_id": 3,
            }
        )
    )
    model = load_checkpoint(tmp_path)
    cfg = model.lm_cfg
    assert cfg.n_heads == ORACLE_LM_CFG.n_heads
    assert cfg.dep_heads == ORACLE_LM_CFG.dep_heads
    assert cfg.max_ctx == 96
    assert cfg.acoustic_delay == 1
    assert cfg.text_pad_id == 3
    # and with the true head counts the loaded model matches the oracle
    audio = model.generate("hey", None, max_frames=3)
    assert audio.ndim == 1 and audio.size > 0


def test_read_state_handles_bf16(tmp_path):
    """kyutai releases ship bf16 — both loader paths must produce arrays
    whose values survive into jnp exactly (safetensors yields ml_dtypes
    bf16; torch .pt upcasts to f32 since torch bf16 has no .numpy())."""
    import torch
    from safetensors.torch import save_file as save_torch

    from open_speech_tpu.models.pocket.convert import _read_state

    w = torch.randn(4, 3, dtype=torch.bfloat16)
    save_torch({"x.weight": w}, str(tmp_path / "bf16.safetensors"))
    state = _read_state(tmp_path / "bf16.safetensors")
    got = jnp.asarray(state["x.weight"], jnp.float32)
    np.testing.assert_allclose(np.asarray(got), w.float().numpy(), atol=0)

    torch.save({"x.weight": w}, str(tmp_path / "bf16.pt"))
    state = _read_state(tmp_path / "bf16.pt")
    assert state["x.weight"].dtype == np.float32
    np.testing.assert_allclose(
        state["x.weight"], w.float().numpy(), rtol=0, atol=0
    )


def test_generate_empty_on_exhausted_context(lm_pair):
    """generate() returns empty audio (not a crash) when the prompt state
    fills the whole context."""
    _, params, cfg = lm_pair
    from open_speech_tpu.models.pocket.mimi import (
        TEST_TINY,
        init_mimi_params,
    )
    from open_speech_tpu.models.pocket.model import PocketTTS, PromptState

    mimi_params = init_mimi_params(jax.random.PRNGKey(0), TEST_TINY)
    model = PocketTTS(params, mimi_params, cfg, TEST_TINY)
    from open_speech_tpu.models.pocket.lm import init_caches

    full = PromptState(*init_caches(cfg, 1), length=cfg.max_ctx - 2)
    audio = model.generate("hello there", full)
    assert audio.shape == (0,)

def test_streaming_decoder_window_eviction():
    """Streamed decode matches full decode PAST the transformer context
    window (K/V eviction + conv/overlap carries all exercised), batch 2."""
    from dataclasses import replace

    from open_speech_tpu.models.pocket.mimi import init_mimi_params

    cfg = replace(TEST_TINY, t_context=6)
    params = init_mimi_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(11)
    toks = rng.integers(0, cfg.card, (2, cfg.n_q, 29), dtype=np.int32)
    full = np.asarray(mimi_decode(params, cfg, jnp.asarray(toks)))
    dec = MimiStreamingDecoder(params, cfg, block_frames=4)
    parts = [dec.feed(toks[:, :, i : i + 7]) for i in range(0, 29, 7)]
    stream = np.concatenate(parts, axis=1)
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=1e-5)
