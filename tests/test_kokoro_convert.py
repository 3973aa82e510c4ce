"""Kokoro weight conversion: torch-oracle parity, stage by stage.

The oracle (tests/kokoro_oracle.py) is the KModel graph the reference
serves (src/tts/backends/kokoro.py) at reduced geometry — PL-BERT is the
real transformers AlbertModel. Its nested state dict converts through
``convert_kokoro``; parity is required per stage and end-to-end.

The end-to-end test uses max_frames == the utterance's true frame count so
the JAX static-shape path and torch exact-length path see identical
signals (no padding boundary); a second test exercises the padded path and
checks the prefix with a receptive-field guard.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import kokoro_oracle as KO
from open_speech_tpu.models.kokoro.convert import (
    convert_kokoro,
    convert_voice_pack,
    select_voice_style,
)
from open_speech_tpu.models.kokoro.model import (
    albert_encode,
    decode_audio,
    duration_encode,
    encode_utterance,
    f0n_predict,
    generate_waveform,
    init_kokoro_params,
    text_encode,
)

P_MAX = 16
TOK_LEN = 11


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(11)
    return KO.KModelS().eval()


@pytest.fixture(scope="module")
def converted(oracle):
    # plbert_heads/plbert_layers are not shape-inferable (ALBERT shares one
    # layer, no per-head tensors); the defaults (12/12) match kokoro-82M,
    # the tiny oracle uses 4/2
    return convert_kokoro(
        oracle.nested_state_dict(),
        max_phonemes=P_MAX,
        max_frames=128,
        plbert_heads=KO.PL_HEADS,
        plbert_layers=KO.PL_LAYERS,
        gen_hop=KO.HOP,  # also not in weights; default 5 matches kokoro-82M
    )


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(5)
    tokens = np.zeros((1, P_MAX), np.int64)
    tokens[0, :TOK_LEN] = rng.integers(1, KO.N_SYMBOLS, TOK_LEN)
    ref_s = (rng.standard_normal((1, 2 * KO.STY)) * 0.3).astype(np.float32)
    return tokens, ref_s


def test_config_inferred_from_shapes(converted):
    _, cfg = converted
    assert cfg.n_symbols == KO.N_SYMBOLS
    assert cfg.plbert_emb == KO.PL_EMB
    assert cfg.plbert_hidden == KO.PL_HID
    assert cfg.plbert_interm == KO.PL_INTERM
    assert cfg.hidden == KO.HID
    assert cfg.style_dim == KO.STY
    assert cfg.max_dur == KO.MAX_DUR
    assert cfg.text_depth == KO.TEXT_DEPTH
    assert cfg.dur_layers == KO.DUR_LAYERS
    assert cfg.dec_mid == KO.DEC_MID
    assert cfg.asr_res_dim == KO.ASR_RES
    assert cfg.upsample_rates == KO.RATES
    assert cfg.upsample_kernels == KO.KERNELS
    assert cfg.resblock_kernels == KO.RES_K
    assert cfg.noise_res_kernels == KO.NOISE_RES_K
    assert cfg.gen_n_fft == KO.N_FFT
    assert cfg.harmonics == KO.HARMONICS


def _mask(cfg):
    m = np.zeros((1, P_MAX, 1), np.float32)
    m[0, :TOK_LEN] = 1.0
    return jnp.asarray(m)


def test_albert_parity(oracle, converted, inputs):
    params, cfg = converted
    tokens, _ = inputs
    with torch.no_grad():
        t_out = oracle.bert(
            torch.from_numpy(tokens[:, :TOK_LEN]),
            attention_mask=torch.ones(1, TOK_LEN, dtype=torch.long),
        ).last_hidden_state.numpy()
    j_out = np.asarray(
        albert_encode(params, cfg, jnp.asarray(tokens.astype(np.int32)), _mask(cfg))
    )
    np.testing.assert_allclose(j_out[:, :TOK_LEN], t_out, atol=2e-5)


def test_text_encoder_parity(oracle, converted, inputs):
    params, cfg = converted
    tokens, _ = inputs
    with torch.no_grad():
        t_out = oracle.text_encoder(
            torch.from_numpy(tokens[:, :TOK_LEN]),
            torch.zeros(1, TOK_LEN, dtype=torch.bool),
        ).numpy()  # [1, T, HID]
    j_out = np.asarray(
        text_encode(
            params, cfg, jnp.asarray(tokens.astype(np.int32)),
            jnp.asarray([TOK_LEN], jnp.int32), _mask(cfg),
        )
    )
    np.testing.assert_allclose(j_out[:, :TOK_LEN], t_out, atol=2e-5)


def test_full_pipeline_parity_exact_frames(oracle, converted, inputs):
    """End-to-end audio parity with max_frames == true frame count."""
    params, cfg = converted
    tokens, ref_s = inputs
    rng = np.random.default_rng(17)

    # first pass to learn the frame count
    g, n_frames = encode_utterance(
        params, cfg,
        jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray([TOK_LEN], jnp.int32),
        jnp.asarray(ref_s),
        jnp.asarray([1.0], jnp.float32),
    )
    total = int(np.asarray(n_frames)[0])
    assert 0 < total <= cfg.max_frames

    cfg2 = dataclasses.replace(cfg, max_frames=total)
    g, n_frames = encode_utterance(
        params, cfg2,
        jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray([TOK_LEN], jnp.int32),
        jnp.asarray(ref_s),
        jnp.asarray([1.0], jnp.float32),
    )
    asr, f0, n, s_dec = g

    s_exact = total * cfg2.samples_per_frame
    nh = KO.HARMONICS + 1
    rand_phase = np.concatenate(
        [np.zeros((1, 1)), rng.random((1, nh - 1))], axis=1
    ).astype(np.float32)
    sine_noise = rng.standard_normal((1, s_exact, nh)).astype(np.float32)

    t_audio, t_total, t_dur, t_f0, t_n = oracle.forward_exact(
        torch.from_numpy(tokens[:, :TOK_LEN]),
        torch.from_numpy(ref_s),
        torch.tensor([1.0]),
        torch.from_numpy(rand_phase),
        torch.from_numpy(sine_noise),
    )
    assert t_total == total  # durations agree exactly
    np.testing.assert_allclose(
        np.asarray(f0)[0, : 2 * total], t_f0.numpy()[0], atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(n)[0, : 2 * total], t_n.numpy()[0], atol=3e-4
    )

    # harmonic source parity (time domain)
    from open_speech_tpu.models.kokoro.model import _stft_mag_phase, harmonic_source

    har_j = harmonic_source(
        params, cfg2, f0, jnp.asarray(rand_phase), jnp.asarray(sine_noise)
    )
    with torch.no_grad():
        f0_up = torch.nn.functional.interpolate(
            t_f0[:, None], scale_factor=KO.UPSAMPLE_TOTAL // 2, mode="nearest"
        ).transpose(1, 2)
        har_t = oracle.decoder.generator.m_source(
            f0_up, torch.from_numpy(rand_phase), torch.from_numpy(sine_noise)
        )[:, :, 0]
    np.testing.assert_allclose(
        np.asarray(har_j)[0], har_t.numpy()[0], atol=1e-5
    )

    # STFT features: magnitudes exact; phase equal up to the ±π branch cut
    # (fp-noise decides the sign on symmetric bins; both branches are valid)
    with torch.no_grad():
        hs_t, hp_t = oracle.decoder.generator.stft.transform(har_t)
    hm_j, hp_j = _stft_mag_phase(har_j, cfg2.gen_n_fft, cfg2.gen_hop)
    np.testing.assert_allclose(
        np.asarray(hm_j)[0].T, hs_t.numpy()[0], atol=1e-5
    )
    d = np.abs(np.asarray(hp_j)[0].T - hp_t.numpy()[0])
    assert np.minimum(d, 2 * np.pi - d).max() < 1e-4

    # end-to-end through decoder+generator with torch's har features, so the
    # branch-cut ambiguity doesn't mask real defects
    har_feat_t = torch.cat([hs_t, hp_t], dim=1).numpy()  # [1, 22, Fr]
    x, _ = decode_audio(params, cfg2, asr, f0, n, s_dec, n_frames)
    audio = generate_waveform(
        params, cfg2, x, s_dec, f0, n_frames,
        jnp.asarray(rand_phase), jnp.asarray(sine_noise),
        har_feat=jnp.asarray(har_feat_t.transpose(0, 2, 1)),
    )
    j_audio = np.asarray(audio)[0]
    t_np = t_audio.numpy()[0]
    m = min(len(j_audio), len(t_np))
    np.testing.assert_allclose(j_audio[:m], t_np[:m], atol=2e-3)


def test_padded_frames_prefix_parity(oracle, converted, inputs):
    """Padded static-shape path agrees on the prefix (guarded boundary)."""
    params, cfg = converted
    tokens, ref_s = inputs
    rng = np.random.default_rng(23)

    g, n_frames = encode_utterance(
        params, cfg,
        jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray([TOK_LEN], jnp.int32),
        jnp.asarray(ref_s),
        jnp.asarray([1.0], jnp.float32),
    )
    asr, f0, n, s_dec = g
    total = int(np.asarray(n_frames)[0])
    s_exact = total * cfg.samples_per_frame
    s_total = cfg.max_frames * cfg.samples_per_frame
    nh = KO.HARMONICS + 1
    rand_phase = np.concatenate(
        [np.zeros((1, 1)), rng.random((1, nh - 1))], axis=1
    ).astype(np.float32)
    sine_noise_full = np.zeros((1, s_total, nh), np.float32)
    sine_noise_full[:, :s_exact] = rng.standard_normal((1, s_exact, nh))

    t_audio, *_ = oracle.forward_exact(
        torch.from_numpy(tokens[:, :TOK_LEN]),
        torch.from_numpy(ref_s),
        torch.tensor([1.0]),
        torch.from_numpy(rand_phase),
        torch.from_numpy(sine_noise_full[:, :s_exact]),
    )
    with torch.no_grad():
        f0_up = torch.nn.functional.interpolate(
            torch.from_numpy(np.asarray(f0)[:, : 2 * total])[:, None],
            scale_factor=KO.UPSAMPLE_TOTAL // 2, mode="nearest",
        ).transpose(1, 2)
        har_t = oracle.decoder.generator.m_source(
            f0_up, torch.from_numpy(rand_phase),
            torch.from_numpy(sine_noise_full[:, :s_exact]),
        )[:, :, 0]
        hs_t, hp_t = oracle.decoder.generator.stft.transform(har_t)
    har_feat = np.concatenate([hs_t.numpy(), hp_t.numpy()], axis=1).transpose(
        0, 2, 1
    )  # [1, Fr_exact, 22]
    fr_total = cfg.max_frames * cfg.samples_per_frame // cfg.gen_hop + 1
    har_pad = np.zeros((1, fr_total, har_feat.shape[2]), np.float32)
    har_pad[:, : har_feat.shape[1]] = har_feat

    x, _ = decode_audio(params, cfg, asr, f0, n, s_dec, n_frames)
    audio = generate_waveform(
        params, cfg, x, s_dec, f0, n_frames,
        jnp.asarray(rand_phase), jnp.asarray(sine_noise_full),
        har_feat=jnp.asarray(har_pad),
    )
    guard = 40 * cfg.gen_hop * 4  # noise_res/resblock receptive field
    keep = max(s_exact - guard, 0)
    np.testing.assert_allclose(
        np.asarray(audio)[0, :keep], t_audio.numpy()[0, :keep], atol=2e-3
    )


def test_speed_scales_frame_count(converted, inputs):
    params, cfg = converted
    tokens, ref_s = inputs
    totals = []
    for s in (0.7, 1.0, 1.5):
        _, n_frames = encode_utterance(
            params, cfg,
            jnp.asarray(tokens.astype(np.int32)),
            jnp.asarray([TOK_LEN], jnp.int32),
            jnp.asarray(ref_s),
            jnp.asarray([s], jnp.float32),
        )
        totals.append(int(np.asarray(n_frames)[0]))
    assert totals[0] > totals[1] > totals[2]


def test_voice_pack_conversion():
    pack = np.random.default_rng(0).standard_normal((510, 1, 2 * KO.STY)).astype(
        np.float32
    )
    arr = convert_voice_pack(pack)
    assert arr.shape == (510, 2 * KO.STY)
    row = select_voice_style(arr, TOK_LEN)
    np.testing.assert_array_equal(row, arr[TOK_LEN - 1])
    assert select_voice_style(arr, 10_000).shape == (2 * KO.STY,)


def test_random_init_matches_converted_tree(converted):
    params, cfg = converted
    rand = init_kokoro_params(jax.random.PRNGKey(0), cfg)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        rand
    )
    s1 = [x.shape for x in jax.tree_util.tree_leaves(params)]
    s2 = [x.shape for x in jax.tree_util.tree_leaves(rand)]
    assert s1 == s2


def test_flatten_strips_dataparallel_prefixes():
    """The shipped hexgrad checkpoint carries DataParallel 'module.' key
    prefixes inside each submodule state dict — conversion must see the
    same keys as the clean oracle layout."""
    from open_speech_tpu.models.kokoro.convert import _flatten

    nested = {"predictor": {"module.lstm.weight_ih_l0": np.zeros((4, 2))}}
    assert "predictor.lstm.weight_ih_l0" in _flatten(nested)
    flat = {"predictor.module.lstm.weight_ih_l0": np.zeros((4, 2))}
    assert "predictor.lstm.weight_ih_l0" in _flatten(flat)
