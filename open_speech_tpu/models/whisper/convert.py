"""Checkpoint conversion: HF / openai Whisper weights -> JAX pytree.

The reference downloads CT2-converted repos via huggingface_hub
(src/backends/faster_whisper.py:40 hands the model id to WhisperModel). Here
the equivalents are HF ``WhisperForConditionalGeneration`` safetensors or
openai ``.pt`` checkpoints; both naming schemes map onto the same pytree that
``model.init_params`` produces (layers stacked along a leading axis for
lax.scan).

No weights ship with this deployment (zero egress); these converters activate
whenever a checkpoint directory exists on disk.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax.numpy as jnp

from open_speech_tpu.models.whisper.model import WhisperConfig, sinusoids


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> ours [in, out]."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch Conv1d [out, in, k] -> ours [k, in, out]."""
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _stack(arrs: list[np.ndarray]) -> np.ndarray:
    return np.stack(arrs)


def config_from_hf(model_dir: str) -> WhisperConfig:
    """Derive WhisperConfig from a HF config.json."""
    with open(os.path.join(model_dir, "config.json"), encoding="utf-8") as f:
        hf = json.load(f)
    n_vocab = hf["vocab_size"]
    return WhisperConfig(
        n_mels=hf.get("num_mel_bins", 80),
        n_vocab=n_vocab,
        n_audio_ctx=hf.get("max_source_positions", 1500),
        n_audio_state=hf["d_model"],
        n_audio_head=hf["encoder_attention_heads"],
        n_audio_layer=hf["encoder_layers"],
        n_text_ctx=hf.get("max_target_positions", 448),
        n_text_state=hf["d_model"],
        n_text_head=hf["decoder_attention_heads"],
        n_text_layer=hf["decoder_layers"],
        n_langs=100 if n_vocab >= 51866 else 99,
    )


def _load_state_dict(model_dir: str) -> dict[str, np.ndarray]:
    """Read safetensors shards (preferred) or a torch .pt checkpoint."""
    single = os.path.join(model_dir, "model.safetensors")
    index = os.path.join(model_dir, "model.safetensors.index.json")
    files: list[str] = []
    if os.path.exists(single):
        files = [single]
    elif os.path.exists(index):
        with open(index, encoding="utf-8") as f:
            files = sorted(
                {
                    os.path.join(model_dir, v)
                    for v in json.load(f)["weight_map"].values()
                }
            )
    if files:
        from safetensors.numpy import load_file

        state: dict[str, np.ndarray] = {}
        for path in files:
            state.update(load_file(path))
        return state
    for name in os.listdir(model_dir):
        if name.endswith(".pt") or name.endswith(".bin"):
            import torch

            raw = torch.load(
                os.path.join(model_dir, name), map_location="cpu",
                weights_only=True,
            )
            if isinstance(raw, dict) and "model_state_dict" in raw:
                raw = raw["model_state_dict"]
            return {k: v.numpy() for k, v in raw.items()}
    raise FileNotFoundError(f"no checkpoint found in {model_dir}")


def _is_hf(state: dict[str, np.ndarray]) -> bool:
    return any(k.startswith("model.encoder.layers.") for k in state)


def _hf_block(state, prefix, cross: bool):
    def lin(name, bias=True):
        p = {"w": _t(state[f"{prefix}.{name}.weight"])}
        if bias:
            p["b"] = state[f"{prefix}.{name}.bias"]
        return p

    def ln(name):
        return {
            "g": state[f"{prefix}.{name}.weight"].astype(np.float32),
            "b": state[f"{prefix}.{name}.bias"].astype(np.float32),
        }

    block = {
        "ln1": ln("self_attn_layer_norm"),
        "attn": {
            "q": lin("self_attn.q_proj"),
            "k": lin("self_attn.k_proj", bias=False),
            "v": lin("self_attn.v_proj"),
            "o": lin("self_attn.out_proj"),
        },
        "ln_mlp": ln("final_layer_norm"),
        "mlp_in": lin("fc1"),
        "mlp_out": lin("fc2"),
    }
    if cross:
        block["ln_cross"] = ln("encoder_attn_layer_norm")
        block["cross"] = {
            "q": lin("encoder_attn.q_proj"),
            "k": lin("encoder_attn.k_proj", bias=False),
            "v": lin("encoder_attn.v_proj"),
            "o": lin("encoder_attn.out_proj"),
        }
    return block


def _openai_block(state, prefix, cross: bool):
    def lin(name, bias=True):
        p = {"w": _t(state[f"{prefix}.{name}.weight"])}
        if bias:
            p["b"] = state[f"{prefix}.{name}.bias"]
        return p

    def ln(name):
        return {
            "g": state[f"{prefix}.{name}.weight"].astype(np.float32),
            "b": state[f"{prefix}.{name}.bias"].astype(np.float32),
        }

    block = {
        "ln1": ln("attn_ln"),
        "attn": {
            "q": lin("attn.query"),
            "k": lin("attn.key", bias=False),
            "v": lin("attn.value"),
            "o": lin("attn.out"),
        },
        "ln_mlp": ln("mlp_ln"),
        "mlp_in": lin("mlp.0"),
        "mlp_out": lin("mlp.2"),
    }
    if cross:
        block["ln_cross"] = ln("cross_attn_ln")
        block["cross"] = {
            "q": lin("cross_attn.query"),
            "k": lin("cross_attn.key", bias=False),
            "v": lin("cross_attn.value"),
            "o": lin("cross_attn.out"),
        }
    return block


def params_from_state_dict(
    state: dict[str, np.ndarray], cfg: WhisperConfig, dtype=jnp.bfloat16
):
    """Build the stacked-layer pytree from either naming scheme."""
    if _is_hf(state):
        e_pre, d_pre = "model.encoder", "model.decoder"
        enc_blocks = [
            _hf_block(state, f"{e_pre}.layers.{i}", False)
            for i in range(cfg.n_audio_layer)
        ]
        dec_blocks = [
            _hf_block(state, f"{d_pre}.layers.{i}", True)
            for i in range(cfg.n_text_layer)
        ]
        conv1_w, conv1_b = state[f"{e_pre}.conv1.weight"], state[f"{e_pre}.conv1.bias"]
        conv2_w, conv2_b = state[f"{e_pre}.conv2.weight"], state[f"{e_pre}.conv2.bias"]
        enc_pos = state[f"{e_pre}.embed_positions.weight"]
        ln_post = {
            "g": state[f"{e_pre}.layer_norm.weight"].astype(np.float32),
            "b": state[f"{e_pre}.layer_norm.bias"].astype(np.float32),
        }
        tok_emb = state[f"{d_pre}.embed_tokens.weight"]
        pos_emb = state[f"{d_pre}.embed_positions.weight"]
        dec_ln = {
            "g": state[f"{d_pre}.layer_norm.weight"].astype(np.float32),
            "b": state[f"{d_pre}.layer_norm.bias"].astype(np.float32),
        }
    else:
        enc_blocks = [
            _openai_block(state, f"encoder.blocks.{i}", False)
            for i in range(cfg.n_audio_layer)
        ]
        dec_blocks = [
            _openai_block(state, f"decoder.blocks.{i}", True)
            for i in range(cfg.n_text_layer)
        ]
        conv1_w, conv1_b = state["encoder.conv1.weight"], state["encoder.conv1.bias"]
        conv2_w, conv2_b = state["encoder.conv2.weight"], state["encoder.conv2.bias"]
        enc_pos = state.get(
            "encoder.positional_embedding",
            sinusoids(cfg.n_audio_ctx, cfg.n_audio_state),
        )
        ln_post = {
            "g": state["encoder.ln_post.weight"].astype(np.float32),
            "b": state["encoder.ln_post.bias"].astype(np.float32),
        }
        tok_emb = state["decoder.token_embedding.weight"]
        pos_emb = state["decoder.positional_embedding"]
        dec_ln = {
            "g": state["decoder.ln.weight"].astype(np.float32),
            "b": state["decoder.ln.bias"].astype(np.float32),
        }

    import jax

    stack = lambda blocks: jax.tree.map(lambda *xs: np.stack(xs), *blocks)  # noqa: E731
    params = {
        "encoder": {
            "conv1": {"w": _conv(conv1_w), "b": conv1_b},
            "conv2": {"w": _conv(conv2_w), "b": conv2_b},
            "pos": enc_pos,
            "blocks": stack(enc_blocks),
            "ln_post": ln_post,
        },
        "decoder": {
            "tok_emb": tok_emb,
            "pos_emb": pos_emb,
            "blocks": stack(dec_blocks),
            "ln": dec_ln,
        },
    }

# keep layernorm params f32; everything else to `dtype`
    def cast_tree(tree, in_ln=False):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = cast_tree(v, in_ln=k.startswith("ln"))
            else:
                out[k] = jnp.asarray(v, jnp.float32 if in_ln else dtype)
        return out

    return cast_tree(params)


def load_params(model_dir: str, cfg: WhisperConfig | None = None, dtype=jnp.bfloat16):
    """Load converted params (and config) from a checkpoint directory."""
    if cfg is None:
        cfg = config_from_hf(model_dir)
    state = _load_state_dict(model_dir)
    return params_from_state_dict(state, cfg, dtype), cfg
