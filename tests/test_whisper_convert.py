"""Weight conversion: synthetic HF- and openai-style state dicts -> pytree."""

import numpy as np
import pytest

import jax

from open_speech_tpu.models.whisper import PRESETS, encode, decoder_forward
from open_speech_tpu.models.whisper.convert import params_from_state_dict

CFG = PRESETS["test-tiny"]


def _rand(*shape):
    return np.random.default_rng(abs(hash(shape)) % 2**31).standard_normal(
        shape
    ).astype(np.float32) * 0.02


def _hf_state(cfg):
    d, v = cfg.n_audio_state, cfg.n_vocab
    s = {
        "model.encoder.conv1.weight": _rand(d, cfg.n_mels, 3),
        "model.encoder.conv1.bias": _rand(d),
        "model.encoder.conv2.weight": _rand(d, d, 3),
        "model.encoder.conv2.bias": _rand(d),
        "model.encoder.embed_positions.weight": _rand(cfg.n_audio_ctx, d),
        "model.encoder.layer_norm.weight": np.ones(d, np.float32),
        "model.encoder.layer_norm.bias": np.zeros(d, np.float32),
        "model.decoder.embed_tokens.weight": _rand(v, d),
        "model.decoder.embed_positions.weight": _rand(cfg.n_text_ctx, d),
        "model.decoder.layer_norm.weight": np.ones(d, np.float32),
        "model.decoder.layer_norm.bias": np.zeros(d, np.float32),
    }
    for i in range(cfg.n_audio_layer):
        p = f"model.encoder.layers.{i}"
        s |= _hf_layer(p, d, cross=False)
    for i in range(cfg.n_text_layer):
        p = f"model.decoder.layers.{i}"
        s |= _hf_layer(p, d, cross=True)
    return s


def _hf_layer(p, d, cross):
    s = {
        f"{p}.self_attn.q_proj.weight": _rand(d, d),
        f"{p}.self_attn.q_proj.bias": _rand(d),
        f"{p}.self_attn.k_proj.weight": _rand(d, d),
        f"{p}.self_attn.v_proj.weight": _rand(d, d),
        f"{p}.self_attn.v_proj.bias": _rand(d),
        f"{p}.self_attn.out_proj.weight": _rand(d, d),
        f"{p}.self_attn.out_proj.bias": _rand(d),
        f"{p}.self_attn_layer_norm.weight": np.ones(d, np.float32),
        f"{p}.self_attn_layer_norm.bias": np.zeros(d, np.float32),
        f"{p}.fc1.weight": _rand(4 * d, d),
        f"{p}.fc1.bias": _rand(4 * d),
        f"{p}.fc2.weight": _rand(d, 4 * d),
        f"{p}.fc2.bias": _rand(d),
        f"{p}.final_layer_norm.weight": np.ones(d, np.float32),
        f"{p}.final_layer_norm.bias": np.zeros(d, np.float32),
    }
    if cross:
        s |= {
            f"{p}.encoder_attn.q_proj.weight": _rand(d, d),
            f"{p}.encoder_attn.q_proj.bias": _rand(d),
            f"{p}.encoder_attn.k_proj.weight": _rand(d, d),
            f"{p}.encoder_attn.v_proj.weight": _rand(d, d),
            f"{p}.encoder_attn.v_proj.bias": _rand(d),
            f"{p}.encoder_attn.out_proj.weight": _rand(d, d),
            f"{p}.encoder_attn.out_proj.bias": _rand(d),
            f"{p}.encoder_attn_layer_norm.weight": np.ones(d, np.float32),
            f"{p}.encoder_attn_layer_norm.bias": np.zeros(d, np.float32),
        }
    return s


def _openai_state(cfg):
    d, v = cfg.n_audio_state, cfg.n_vocab
    s = {
        "encoder.conv1.weight": _rand(d, cfg.n_mels, 3),
        "encoder.conv1.bias": _rand(d),
        "encoder.conv2.weight": _rand(d, d, 3),
        "encoder.conv2.bias": _rand(d),
        "encoder.ln_post.weight": np.ones(d, np.float32),
        "encoder.ln_post.bias": np.zeros(d, np.float32),
        "decoder.token_embedding.weight": _rand(v, d),
        "decoder.positional_embedding": _rand(cfg.n_text_ctx, d),
        "decoder.ln.weight": np.ones(d, np.float32),
        "decoder.ln.bias": np.zeros(d, np.float32),
    }
    for scope, n, cross in (
        ("encoder", cfg.n_audio_layer, False),
        ("decoder", cfg.n_text_layer, True),
    ):
        for i in range(n):
            p = f"{scope}.blocks.{i}"
            s |= {
                f"{p}.attn.query.weight": _rand(d, d),
                f"{p}.attn.query.bias": _rand(d),
                f"{p}.attn.key.weight": _rand(d, d),
                f"{p}.attn.value.weight": _rand(d, d),
                f"{p}.attn.value.bias": _rand(d),
                f"{p}.attn.out.weight": _rand(d, d),
                f"{p}.attn.out.bias": _rand(d),
                f"{p}.attn_ln.weight": np.ones(d, np.float32),
                f"{p}.attn_ln.bias": np.zeros(d, np.float32),
                f"{p}.mlp.0.weight": _rand(4 * d, d),
                f"{p}.mlp.0.bias": _rand(4 * d),
                f"{p}.mlp.2.weight": _rand(d, 4 * d),
                f"{p}.mlp.2.bias": _rand(d),
                f"{p}.mlp_ln.weight": np.ones(d, np.float32),
                f"{p}.mlp_ln.bias": np.zeros(d, np.float32),
            }
            if cross:
                s |= {
                    f"{p}.cross_attn.query.weight": _rand(d, d),
                    f"{p}.cross_attn.query.bias": _rand(d),
                    f"{p}.cross_attn.key.weight": _rand(d, d),
                    f"{p}.cross_attn.value.weight": _rand(d, d),
                    f"{p}.cross_attn.value.bias": _rand(d),
                    f"{p}.cross_attn.out.weight": _rand(d, d),
                    f"{p}.cross_attn.out.bias": _rand(d),
                    f"{p}.cross_attn_ln.weight": np.ones(d, np.float32),
                    f"{p}.cross_attn_ln.bias": np.zeros(d, np.float32),
                }
    return s


@pytest.mark.parametrize("builder", [_hf_state, _openai_state])
def test_convert_and_forward(builder):
    import jax.numpy as jnp

    state = builder(CFG)
    params = params_from_state_dict(state, CFG, dtype=jnp.float32)
    assert params["encoder"]["conv1"]["w"].shape == (3, CFG.n_mels, CFG.n_audio_state)
    assert params["encoder"]["blocks"]["attn"]["q"]["w"].shape == (
        CFG.n_audio_layer,
        CFG.n_audio_state,
        CFG.n_audio_state,
    )
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, CFG.n_mels, CFG.n_audio_ctx * 2))
    enc = encode(params, mel, CFG)
    assert enc.shape == (1, CFG.n_audio_ctx, CFG.n_audio_state)
    tokens = jnp.array([[1, 2, 3]], jnp.int32)
    logits = decoder_forward(params, tokens, enc, CFG)
    assert logits.shape == (1, 3, CFG.n_vocab)
    assert np.isfinite(np.asarray(logits)).all()


def test_hf_and_openai_equivalent_mapping():
    """Same underlying weights expressed in both schemes -> identical pytrees."""
    import jax.numpy as jnp

    hf = params_from_state_dict(_hf_state(CFG), CFG, dtype=jnp.float32)
    # shapes/structure match between schemes
    oa = params_from_state_dict(_openai_state(CFG), CFG, dtype=jnp.float32)
    assert jax.tree.structure(hf) == jax.tree.structure(oa)
