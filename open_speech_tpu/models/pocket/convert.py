"""Pocket-TTS checkpoint → JAX pytree conversion.

The reference loads pocket-tts through the torch ``pocket_tts`` package
(src/tts/backends/pocket_tts_backend.py:91), whose model is the Kyutai
moshi-family stack: a Mimi codec (``MimiModel``) plus a delayed-streams
``LMModel``. This converts their ``state_dict()`` tensors onto
models/pocket/{mimi,lm}.py's pytrees:

  - conv weights  [Cout, Cin, K]   → WIO [K, Cin, Cout]
  - convtr weights [Cin, Cout, K]  → WIO flipped (run as one correlation)
  - fused attention ``in_proj_weight`` → transposed qkv matmul weight
  - RVQ codebooks: ``_codebook.embed_sum / cluster_usage`` (or a plain
    ``embed``) → embedding tables
  - depformer per-step weights (``in_projs.{s}`` / ``gating.{s}``) stack on
    a leading stage axis so the depth pass is one einsum per layer.

Geometry is inferred from tensor shapes (``*_config_from_state_dict``), so
the same code converts the tiny oracle in tests/pocket_oracle.py and a real
checkpoint. Parity: tests/test_pocket_convert.py.
"""

from __future__ import annotations

import re

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.models.pocket.lm import PocketLMConfig
from open_speech_tpu.models.pocket.mimi import MimiConfig


def _np(state, key):
    v = state[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv(state, name):
    p = {"w": jnp.asarray(_np(state, f"{name}.weight").transpose(2, 1, 0))}
    if f"{name}.bias" in state:
        p["b"] = jnp.asarray(_np(state, f"{name}.bias"))
    return p


def _convtr(state, name):
    """torch ConvTranspose1d weight [Cin, Cout/g, K] → flipped WIO.

    Dense → [K, Cin, Cout]; depthwise (Cout/g == 1, mimi's upsample) →
    [K, 1, C] so ``conv_transpose1d`` runs it with feature groups.
    """
    w = _np(state, f"{name}.weight")
    if w.shape[1] == 1 and w.shape[0] > 1:  # depthwise
        w = w.transpose(2, 1, 0)[::-1]
    else:
        w = w.transpose(2, 0, 1)[::-1]
    p = {"w": jnp.asarray(np.ascontiguousarray(w))}
    if f"{name}.bias" in state:
        p["b"] = jnp.asarray(_np(state, f"{name}.bias"))
    return p


def _lin_t(state, key):
    return jnp.asarray(_np(state, key).T)


def _rms(state, key):
    return {"a": jnp.asarray(_np(state, key).reshape(-1))}


def _codebook(state, prefix):
    """RVQ codebook: embed_sum/cluster_usage (moshi) or embed (encodec)."""
    if f"{prefix}.embed_sum" in state:
        s = _np(state, f"{prefix}.embed_sum")
        u = np.maximum(_np(state, f"{prefix}.cluster_usage"), 1e-5)
        return s / u[:, None]
    if f"{prefix}.embed" in state:
        return _np(state, f"{prefix}.embed")
    raise KeyError(f"no codebook under {prefix}")


def _count(state, pattern):
    rx = re.compile(pattern)
    idx = {int(m.group(1)) for k in state if (m := rx.match(k))}
    return (max(idx) + 1) if idx else 0


# ──────────────────────────────────────────────────────────────────────
# Mimi
# ──────────────────────────────────────────────────────────────────────


def mimi_config_from_state_dict(state, sample_rate=24_000) -> MimiConfig:
    n_filters = state["encoder.model.0.conv.conv.weight"].shape[0]
    dimension = state["encoder.model.14.conv.conv.weight"].shape[0]
    kernel_size = state["encoder.model.0.conv.conv.weight"].shape[2]
    last_kernel = state["encoder.model.14.conv.conv.weight"].shape[2]
    res_kernel = state["encoder.model.1.block.1.conv.conv.weight"].shape[2]
    compress = n_filters // state["encoder.model.1.block.1.conv.conv.weight"].shape[0]
    # decoder up-convs carry the ratios: kernel = 2*ratio
    ratios = tuple(
        state[f"decoder.model.{2 + 3 * i}.convtr.convtr.weight"].shape[2] // 2
        for i in range(4)
    )
    t_layers = _count(state, r"encoder_transformer\.transformer\.layers\.(\d+)\.")
    ff = state[
        "encoder_transformer.transformer.layers.0.linear1.weight"
    ].shape[0]
    n_q = 1 + _count(state, r"quantizer\.rvq_rest\.vq\.layers\.(\d+)\.")
    cb = _codebook(state, "quantizer.rvq_first.vq.layers.0._codebook")
    down_k = state["downsample.conv.conv.weight"].shape[2]
    return MimiConfig(
        sample_rate=sample_rate,
        n_filters=n_filters,
        dimension=dimension,
        ratios=ratios,
        kernel_size=kernel_size,
        last_kernel_size=last_kernel,
        residual_kernel_size=res_kernel,
        compress=compress,
        t_layers=t_layers,
        t_ff=ff,
        n_q=n_q,
        card=cb.shape[0],
        q_dim=cb.shape[1],
        down_stride=down_k // 2,
    )


def _mimi_tlayers(state, prefix, n_layers):
    layers = []
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        layers.append(
            {
                "ln1": {
                    "g": jnp.asarray(_np(state, f"{p}.norm1.weight")),
                    "b": jnp.asarray(_np(state, f"{p}.norm1.bias")),
                },
                "qkv": {"w": _lin_t(state, f"{p}.self_attn.in_proj_weight")},
                "out": {"w": _lin_t(state, f"{p}.self_attn.out_proj.weight")},
                "ls1": jnp.asarray(_np(state, f"{p}.layer_scale_1.scale")),
                "ln2": {
                    "g": jnp.asarray(_np(state, f"{p}.norm2.weight")),
                    "b": jnp.asarray(_np(state, f"{p}.norm2.bias")),
                },
                "mlp_in": {"w": _lin_t(state, f"{p}.linear1.weight")},
                "mlp_out": {"w": _lin_t(state, f"{p}.linear2.weight")},
                "ls2": jnp.asarray(_np(state, f"{p}.layer_scale_2.scale")),
            }
        )
    return {
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        if len(layers) > 1
        else jax.tree.map(lambda x: x[None], layers[0])
    }


def _rvq(state, prefix, n_levels):
    return {
        "in_proj": {
            "w": jnp.asarray(_np(state, f"{prefix}.input_proj.weight")[:, :, 0].T)
        },
        "out_proj": {
            "w": jnp.asarray(_np(state, f"{prefix}.output_proj.weight")[:, :, 0].T)
        },
        "codebooks": jnp.asarray(
            np.stack(
                [
                    _codebook(state, f"{prefix}.vq.layers.{k}._codebook")
                    for k in range(n_levels)
                ]
            )
        ),
    }


def convert_mimi(state, cfg: MimiConfig | None = None):
    state = {k: v for k, v in state.items()}
    cfg = cfg or mimi_config_from_state_dict(state)

    enc = {"conv_in": _conv(state, "encoder.model.0.conv.conv")}
    stages = []
    for i in range(4):
        base = 1 + 3 * i
        stages.append(
            {
                "res": {
                    "c1": _conv(state, f"encoder.model.{base}.block.1.conv.conv"),
                    "c2": _conv(state, f"encoder.model.{base}.block.3.conv.conv"),
                },
                "down": _conv(state, f"encoder.model.{base + 2}.conv.conv"),
            }
        )
    enc["stages"] = stages
    enc["conv_out"] = _conv(state, "encoder.model.14.conv.conv")

    dec = {"conv_in": _conv(state, "decoder.model.0.conv.conv")}
    dstages = []
    for i in range(4):
        base = 1 + 3 * i
        dstages.append(
            {
                "up": _convtr(state, f"decoder.model.{base + 1}.convtr.convtr"),
                "res": {
                    "c1": _conv(state, f"decoder.model.{base + 2}.block.1.conv.conv"),
                    "c2": _conv(state, f"decoder.model.{base + 2}.block.3.conv.conv"),
                },
            }
        )
    dec["stages"] = dstages
    dec["conv_out"] = _conv(state, "decoder.model.14.conv.conv")

    return {
        "encoder": enc,
        "enc_t": _mimi_tlayers(state, "encoder_transformer.transformer", cfg.t_layers),
        "downsample": _conv(state, "downsample.conv.conv"),
        "quantizer": {
            "first": _rvq(state, "quantizer.rvq_first", 1),
            "rest": _rvq(state, "quantizer.rvq_rest", cfg.n_q - 1),
        },
        "upsample": _convtr(state, "upsample.convtr.convtr"),
        "dec_t": _mimi_tlayers(state, "decoder_transformer.transformer", cfg.t_layers),
        "decoder": dec,
    }, cfg


# ──────────────────────────────────────────────────────────────────────
# LM
# ──────────────────────────────────────────────────────────────────────


def _to_np(v):
    """torch tensor / array → np.ndarray; bf16 (the dtype kyutai releases
    ship) upcasts to f32 since numpy has no bfloat16."""
    if hasattr(v, "detach"):
        v = v.detach().cpu()
        if str(v.dtype) == "torch.bfloat16":
            v = v.float()
        return v.numpy()
    return np.asarray(v)


def _read_state(path):
    """Load a torch/safetensors state dict as {name: np.ndarray}."""
    if str(path).endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file

            state = load_file(str(path))
        except (TypeError, ValueError, ImportError):
            # safetensors.numpy rejects bf16 tensors — route through torch
            from safetensors.torch import load_file as load_torch

            state = {k: _to_np(v) for k, v in load_torch(str(path)).items()}
    else:
        import torch

        raw = torch.load(str(path), map_location="cpu", weights_only=True)
        if isinstance(raw, dict) and "model" in raw and isinstance(
            raw["model"], dict
        ):
            raw = raw["model"]
        state = {k: _to_np(v) for k, v in raw.items()}
    # moshi exports sometimes prefix everything with "model."
    if state and all(k.startswith("model.") for k in state):
        state = {k[len("model."):]: v for k, v in state.items()}
    return state


def load_checkpoint(path):
    """Directory (or LM weight file) → a ready ``PocketTTS``.

    Resolves the three artifacts the kyutai release layout ships:
    the LM weights, the Mimi codec weights (moshi names its codec file
    ``tokenizer-*.safetensors`` or ``mimi*``), and an optional
    sentencepiece text tokenizer (``*.model``).
    """
    from pathlib import Path

    from open_speech_tpu.models.pocket.model import (
        PocketTTS,
        SentencePieceTokenizer,
    )

    path = Path(path)
    folder = path if path.is_dir() else path.parent

    def _pick(patterns, exclude=()):
        for pat in patterns:
            hits = [
                p
                for p in sorted(folder.glob(pat))
                if not any(x in p.name for x in exclude)
            ]
            if hits:
                return hits[0]
        return None

    mimi_file = _pick(
        ("mimi*.safetensors", "tokenizer*-checkpoint*.safetensors",
         "tokenizer*.safetensors", "mimi*.pt")
    )
    if path.is_file():
        lm_file = path
    else:
        lm_file = _pick(
            ("model*.safetensors", "*.safetensors", "model*.pt", "*.pt"),
            exclude=("mimi", "tokenizer"),
        )
    if lm_file is None or mimi_file is None:
        raise FileNotFoundError(
            f"pocket-tts checkpoint incomplete under {folder}: "
            f"lm={lm_file} mimi={mimi_file}"
        )
    mimi_params, mimi_cfg = convert_mimi(_read_state(mimi_file))

    # release config.json is the ground truth for what tensor shapes can't
    # say: head counts (a wrong guess silently mis-splits attention), the
    # context window, stream delays, and the text special-token ids.
    rc = {}
    cfg_file = _pick(("config.json",))
    if cfg_file is not None:
        import json

        raw_cfg = json.loads(cfg_file.read_text())
        # kyutai TTS releases nest the LM geometry; moshi's is flat
        rc = raw_cfg.get("model", raw_cfg)

    lm_params, lm_cfg = convert_pocket_lm(
        _read_state(lm_file),
        n_heads=rc.get("num_heads"),
        dep_heads=rc.get("depformer_num_heads"),
    )
    from dataclasses import replace

    overrides = {}
    if rc.get("context"):
        overrides["max_ctx"] = int(rc["context"])
    delays = rc.get("delays")
    if delays and len(delays) > 1:
        overrides["acoustic_delay"] = int(max(delays[1:]))
    spm = _pick(("tokenizer*.model", "*.model"))
    if rc.get("existing_text_padding_id") is not None:
        overrides["text_pad_id"] = int(rc["existing_text_padding_id"])
    elif spm is not None:
        # sentencepiece convention when the release ships a tokenizer but
        # no explicit pad id: unk=0, bos=1, eos=2, pad=3
        overrides["text_pad_id"] = 3
    if rc.get("text_bos_token_id") is not None:
        overrides["text_bos_id"] = int(rc["text_bos_token_id"])
    if rc.get("text_eos_token_id") is not None:
        overrides["text_eos_id"] = int(rc["text_eos_token_id"])
    if overrides:
        lm_cfg = replace(lm_cfg, **overrides)

    tokenizer = SentencePieceTokenizer(str(spm)) if spm else None
    return PocketTTS(lm_params, mimi_params, lm_cfg, mimi_cfg, tokenizer)


def lm_config_from_state_dict(
    state, acoustic_delay=2, max_ctx=1536, warn_on_guess=True
) -> PocketLMConfig:
    d_model = state["text_emb.weight"].shape[1]
    text_card = state["text_linear.weight"].shape[0]
    n_q = _count(state, r"depformer_in\.(\d+)\.weight")
    card = state["emb.0.weight"].shape[0] - 1
    n_layers = _count(state, r"transformer\.layers\.(\d+)\.")
    ff = 3 * state["transformer.layers.0.gating.linear_out.weight"].shape[1] // 2
    dep_d = state["depformer_in.0.weight"].shape[0]
    dep_layers = _count(state, r"depformer\.layers\.(\d+)\.")
    dep_ff = 3 * state["depformer.layers.0.gating.0.linear_out.weight"].shape[1] // 2
    # head counts are NOT derivable from fused in_proj shapes — this is a
    # guess. A wrong guess silently mis-splits attention heads and mis-pairs
    # RoPE, so real checkpoints must carry the truth (release config.json,
    # read by load_checkpoint, or explicit convert_pocket_lm(n_heads=...)).
    n_heads = 16 if d_model % 16 == 0 and d_model >= 512 else max(
        h for h in (1, 2, 4, 8) if d_model % h == 0 and (d_model // h) % 2 == 0
    )
    dep_heads = max(
        h for h in (1, 2, 4, 8) if dep_d % h == 0 and (dep_d // h) % 2 == 0
    )
    if warn_on_guess:
        import logging

        logging.getLogger(__name__).warning(
            "pocket LM head counts guessed from shapes: n_heads=%d "
            "dep_heads=%d (d_model=%d, dep_d=%d) — if the checkpoint ships "
            "a config.json, load via load_checkpoint so the real values are "
            "used; a wrong head count produces garbage audio with no error",
            n_heads, dep_heads, d_model, dep_d,
        )
    return PocketLMConfig(
        d_model=d_model,
        n_heads=n_heads,
        n_layers=n_layers,
        ff=ff,
        dep_d_model=dep_d,
        dep_heads=dep_heads,
        dep_layers=dep_layers,
        dep_ff=dep_ff,
        n_q=n_q,
        card=card,
        text_card=text_card,
        acoustic_delay=acoustic_delay,
        max_ctx=max_ctx,
    )


def convert_pocket_lm(state, cfg: PocketLMConfig | None = None,
                      n_heads: int | None = None, dep_heads: int | None = None):
    state = {k: v for k, v in state.items()}
    cfg = cfg or lm_config_from_state_dict(
        state, warn_on_guess=not (n_heads and dep_heads)
    )
    if n_heads or dep_heads:
        from dataclasses import replace

        cfg = replace(
            cfg,
            n_heads=n_heads or cfg.n_heads,
            dep_heads=dep_heads or cfg.dep_heads,
        )

    layers = []
    for i in range(cfg.n_layers):
        p = f"transformer.layers.{i}"
        layers.append(
            {
                "ln1": _rms(state, f"{p}.norm1.alpha"),
                "qkv": {"w": _lin_t(state, f"{p}.self_attn.in_proj_weight")},
                "out": {"w": _lin_t(state, f"{p}.self_attn.out_proj.weight")},
                "ln2": _rms(state, f"{p}.norm2.alpha"),
                "gate_in": {"w": _lin_t(state, f"{p}.gating.linear_in.weight")},
                "gate_out": {"w": _lin_t(state, f"{p}.gating.linear_out.weight")},
            }
        )
    dep_layers = []
    for i in range(cfg.dep_layers):
        p = f"depformer.layers.{i}"
        dep_layers.append(
            {
                "ln1": _rms(state, f"{p}.norm1.alpha"),
                "qkv": {
                    "w": jnp.stack(
                        [
                            _lin_t(state, f"{p}.self_attn.in_projs.{s}.weight")
                            for s in range(cfg.n_q)
                        ]
                    )
                },
                "out": {
                    "w": jnp.stack(
                        [
                            _lin_t(state, f"{p}.self_attn.out_projs.{s}.weight")
                            for s in range(cfg.n_q)
                        ]
                    )
                },
                "ln2": _rms(state, f"{p}.norm2.alpha"),
                "gate_in": {
                    "w": jnp.stack(
                        [
                            _lin_t(state, f"{p}.gating.{s}.linear_in.weight")
                            for s in range(cfg.n_q)
                        ]
                    )
                },
                "gate_out": {
                    "w": jnp.stack(
                        [
                            _lin_t(state, f"{p}.gating.{s}.linear_out.weight")
                            for s in range(cfg.n_q)
                        ]
                    )
                },
            }
        )

    params = {
        "text_emb": jnp.asarray(_np(state, "text_emb.weight")),
        "emb": jnp.stack(
            [jnp.asarray(_np(state, f"emb.{k}.weight")) for k in range(cfg.n_q)]
        ),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        if len(layers) > 1
        else jax.tree.map(lambda x: x[None], layers[0]),
        "out_norm": _rms(state, "out_norm.alpha"),
        "text_linear": {"w": _lin_t(state, "text_linear.weight")},
        "dep_in": jnp.stack(
            [_lin_t(state, f"depformer_in.{k}.weight") for k in range(cfg.n_q)]
        ),
        "dep_text_emb": jnp.asarray(_np(state, "depformer_text_emb.weight")),
        "dep_emb": jnp.stack(
            [
                jnp.asarray(_np(state, f"depformer_emb.{k}.weight"))
                for k in range(cfg.n_q - 1)
            ]
        ),
        "dep_layers": jax.tree.map(lambda *xs: jnp.stack(xs), *dep_layers)
        if len(dep_layers) > 1
        else jax.tree.map(lambda x: x[None], dep_layers[0]),
        "linears": jnp.stack(
            [_lin_t(state, f"linears.{k}.weight") for k in range(cfg.n_q)]
        ),
    }
    return params, cfg
