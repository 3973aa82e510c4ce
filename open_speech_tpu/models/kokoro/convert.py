"""Kokoro-82M checkpoint → JAX pytree conversion.

The reference loads kokoro through the torch KPipeline
(src/tts/backends/kokoro.py:194-212); the checkpoint is a dict of module
state dicts ({bert, bert_encoder, predictor, text_encoder, decoder}).
This maps those tensors onto models/kokoro/model.py's pytree, folding
weight-norm pairs and inferring geometry from tensor shapes. Voice packs
(tensors [510, 1, 256], one style row per utterance length —
src/tts/backends/kokoro.py:289-308) convert via ``convert_voice_pack``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax.numpy as jnp

from open_speech_tpu.models.kokoro.model import KokoroConfig
from open_speech_tpu.models.piper.convert import fold_weight_norms


def _flatten(state: dict) -> dict:
    """{module: state_dict} → flat {module.name: array}; passthrough if flat.

    The shipped hexgrad checkpoint's submodule state dicts carry
    DataParallel ``module.`` key prefixes (the reference loader strips them
    the same way, src/tts/backends/kokoro.py KModel load fallback) — strip
    them so real and oracle layouts convert identically.
    """

    def _strip(k: str) -> str:
        k = k[len("module."):] if k.startswith("module.") else k
        return k.replace(".module.", ".")

    if any("." in k for k in state):
        return {_strip(k): np.asarray(v) for k, v in state.items()}
    flat = {}
    for mod, sd in state.items():
        for k, v in sd.items():
            flat[f"{mod}.{_strip(k)}"] = np.asarray(v)
    return flat


def _lin(sd, name):
    return {
        "w": jnp.asarray(sd[f"{name}.weight"].T),
        "b": jnp.asarray(sd[f"{name}.bias"]),
    }


def _conv(sd, name):
    p = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 1, 0)))}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _convT(sd, name):
    """Dense ConvTranspose1d: torch [Cin, Cout, K] → WIO [K, Cin, Cout], flipped.

    (Depthwise transposed convs — the AdainResBlk1d pool — map differently,
    [Cin, 1, K] → [K, 1, Cin]; handled inline in ``_adain_blk``.)
    """
    w = np.transpose(sd[f"{name}.weight"], (2, 0, 1))[::-1]
    p = {"w": jnp.asarray(np.ascontiguousarray(w))}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _ln(sd, name, g="weight", b="bias"):
    return {"g": jnp.asarray(sd[f"{name}.{g}"]), "b": jnp.asarray(sd[f"{name}.{b}"])}


def _lstm(sd, name):
    def direction(suffix):
        return {
            "wi": jnp.asarray(sd[f"{name}.weight_ih_l0{suffix}"].T),
            "wh": jnp.asarray(sd[f"{name}.weight_hh_l0{suffix}"].T),
            "b": jnp.asarray(
                sd[f"{name}.bias_ih_l0{suffix}"] + sd[f"{name}.bias_hh_l0{suffix}"]
            ),
        }

    return {"fw": direction(""), "bw": direction("_reverse")}


def _adain_blk(sd, name, upsample=False):
    p = {
        "c1": _conv(sd, f"{name}.conv1"),
        "c2": _conv(sd, f"{name}.conv2"),
        "n1": _lin(sd, f"{name}.norm1.fc"),
        "n2": _lin(sd, f"{name}.norm2.fc"),
    }
    if upsample or f"{name}.pool.weight" in sd:
        p["pool"] = {
            "w": jnp.asarray(
                np.ascontiguousarray(
                    np.transpose(sd[f"{name}.pool.weight"], (2, 1, 0))[::-1]
                )
            ),
            "b": jnp.asarray(sd[f"{name}.pool.bias"]),
        }
    if f"{name}.conv1x1.weight" in sd:
        p["sc"] = {
            "w": jnp.asarray(np.transpose(sd[f"{name}.conv1x1.weight"], (2, 1, 0)))
        }
    return p


def _gen_blk(sd, name, n=3):
    return {
        "c1": [_conv(sd, f"{name}.convs1.{i}") for i in range(n)],
        "c2": [_conv(sd, f"{name}.convs2.{i}") for i in range(n)],
        "ad1": [_lin(sd, f"{name}.adain1.{i}.fc") for i in range(n)],
        "ad2": [_lin(sd, f"{name}.adain2.{i}.fc") for i in range(n)],
        "a1": [jnp.asarray(sd[f"{name}.alpha1.{i}"][0, :, 0]) for i in range(n)],
        "a2": [jnp.asarray(sd[f"{name}.alpha2.{i}"][0, :, 0]) for i in range(n)],
    }


def config_from_checkpoint(sd: dict, **overrides) -> KokoroConfig:
    def shape(name):  # weight-normed tensors carry shape in weight_v
        if f"{name}.weight_v" in sd:
            return sd[f"{name}.weight_v"].shape
        return sd[f"{name}.weight"].shape

    word = sd["bert.embeddings.word_embeddings.weight"]
    g = "decoder.generator"
    ups = sorted(
        {
            int(k.split(".")[3])
            for k in sd
            if k.startswith(f"{g}.ups.") and "weight" in k
        }
    )
    up_kernels = tuple(shape(f"{g}.ups.{i}")[2] for i in ups)
    n_res = len(
        {k.split(".")[3] for k in sd if k.startswith(f"{g}.resblocks.")}
    )
    nk = n_res // len(ups)
    kwargs = dict(
        n_symbols=word.shape[0],
        plbert_emb=word.shape[1],
        plbert_hidden=shape("bert.encoder.embedding_hidden_mapping_in")[0],
        plbert_interm=shape(_albert_prefix(sd) + "ffn")[0],
        max_positions=sd["bert.embeddings.position_embeddings.weight"].shape[0],
        hidden=shape("bert_encoder")[0],
        style_dim=shape("predictor.F0.0.norm1.fc")[1],
        max_dur=shape("predictor.duration_proj.linear_layer")[0],
        text_kernel=shape("text_encoder.cnn.0.0")[2],
        text_depth=len(
            {
                k.split(".")[2]
                for k in sd
                if k.startswith("text_encoder.cnn.") and "weight" in k and ".0." in k
            }
        ),
        dur_layers=len(
            {
                k.split(".")[3]
                for k in sd
                if k.startswith("predictor.text_encoder.lstms.")
                and "weight_ih_l0" in k
            }
        ),
        dec_mid=shape("decoder.encode.conv1")[0],
        dec_blocks=len(
            {k.split(".")[2] for k in sd if k.startswith("decoder.decode.")}
        ),
        asr_res_dim=shape("decoder.asr_res.0")[0],
        upsample_kernels=up_kernels,
        upsample_rates=tuple(k // 2 for k in up_kernels),
        resblock_kernels=tuple(
            shape(f"{g}.resblocks.{j}.convs1.0")[2] for j in range(nk)
        ),
        noise_res_kernels=tuple(
            shape(f"{g}.noise_res.{i}.convs1.0")[2] for i in range(len(ups))
        ),
        gen_n_fft=shape(f"{g}.conv_post")[0] - 2,
        harmonics=shape(f"{g}.m_source.l_linear")[1] - 1,
    )
    kwargs.update(overrides)
    return KokoroConfig(**kwargs)


def _albert_prefix(sd: dict) -> str:
    return "bert.encoder.albert_layer_groups.0.albert_layers.0."


def convert_kokoro(state: dict, **cfg_overrides):
    """Kokoro checkpoint (nested or flat name→array) → (params, cfg)."""
    flat = _flatten(state)
    cfg = config_from_checkpoint(flat, **cfg_overrides)  # reads weight_v shapes
    sd = fold_weight_norms(flat)
    al = _albert_prefix(sd)

    params: dict = {
        "bert": {
            "word_emb": jnp.asarray(sd["bert.embeddings.word_embeddings.weight"]),
            "pos_emb": jnp.asarray(sd["bert.embeddings.position_embeddings.weight"]),
            "type_emb": jnp.asarray(sd["bert.embeddings.token_type_embeddings.weight"]),
            "emb_ln": _ln(sd, "bert.embeddings.LayerNorm"),
            "emb_map": _lin(sd, "bert.encoder.embedding_hidden_mapping_in"),
            "q": _lin(sd, al + "attention.query"),
            "k": _lin(sd, al + "attention.key"),
            "v": _lin(sd, al + "attention.value"),
            "att_o": _lin(sd, al + "attention.dense"),
            "att_ln": _ln(sd, al + "attention.LayerNorm"),
            "ffn": _lin(sd, al + "ffn"),
            "ffn_o": _lin(sd, al + "ffn_output"),
            "out_ln": _ln(sd, al + "full_layer_layer_norm"),
        },
        "bert_encoder": _lin(sd, "bert_encoder"),
        "pred": {
            "dur_enc": [
                {
                    "lstm": _lstm(sd, f"predictor.text_encoder.lstms.{2 * i}"),
                    "adaln": _lin(sd, f"predictor.text_encoder.lstms.{2 * i + 1}.fc"),
                }
                for i in range(cfg.dur_layers)
            ],
            "lstm": _lstm(sd, "predictor.lstm"),
            "dur_proj": _lin(sd, "predictor.duration_proj.linear_layer"),
            "shared": _lstm(sd, "predictor.shared"),
            "F0": [
                _adain_blk(sd, "predictor.F0.0"),
                _adain_blk(sd, "predictor.F0.1", upsample=True),
                _adain_blk(sd, "predictor.F0.2"),
            ],
            "F0_proj": _conv(sd, "predictor.F0_proj"),
            "N": [
                _adain_blk(sd, "predictor.N.0"),
                _adain_blk(sd, "predictor.N.1", upsample=True),
                _adain_blk(sd, "predictor.N.2"),
            ],
            "N_proj": _conv(sd, "predictor.N_proj"),
        },
        "text_enc": {
            "emb": jnp.asarray(sd["text_encoder.embedding.weight"]),
            "cnn": [
                {
                    "conv": _conv(sd, f"text_encoder.cnn.{i}.0"),
                    "ln": _ln(sd, f"text_encoder.cnn.{i}.1", g="gamma", b="beta"),
                }
                for i in range(cfg.text_depth)
            ],
            "lstm": _lstm(sd, "text_encoder.lstm"),
        },
    }

    dec: dict = {
        "encode": _adain_blk(sd, "decoder.encode"),
        "decode": [
            _adain_blk(sd, f"decoder.decode.{i}")
            for i in range(
                len({k.split(".")[2] for k in sd if k.startswith("decoder.decode.")})
            )
        ],
        "f0_conv": _conv(sd, "decoder.F0_conv"),
        "n_conv": _conv(sd, "decoder.N_conv"),
        "asr_res": _conv(sd, "decoder.asr_res.0"),
    }
    g = "decoder.generator"
    n_ups = len(cfg.upsample_rates)
    nk = len(cfg.resblock_kernels)
    dec["gen"] = {
        "src_linear": _lin(sd, f"{g}.m_source.l_linear"),
        "ups": [_convT(sd, f"{g}.ups.{i}") for i in range(n_ups)],
        "res": [_gen_blk(sd, f"{g}.resblocks.{j}") for j in range(n_ups * nk)],
        "noise_convs": [_conv(sd, f"{g}.noise_convs.{i}") for i in range(n_ups)],
        "noise_res": [_gen_blk(sd, f"{g}.noise_res.{i}") for i in range(n_ups)],
        "post": _conv(sd, f"{g}.conv_post"),
    }
    params["dec"] = dec
    return params, cfg


def convert_kokoro_file(path: str | Path, **cfg_overrides):
    """Load a kokoro .pth checkpoint (torch serialization) and convert."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "net" in state:
        state = state["net"]
    nested = {
        mod: {k: v.numpy() for k, v in sd.items()}
        for mod, sd in state.items()
        if isinstance(sd, dict)
    }
    return convert_kokoro(nested, **cfg_overrides)


def convert_voice_pack(src) -> np.ndarray:
    """Voice pack tensor/file [510, 1, 256] → [510, 256] float32.

    Row i is the reference style for an utterance of i+1 phonemes
    (reference indexes pack[len(ps)-1], src/tts/backends/kokoro.py:289-308).
    """
    if isinstance(src, (str, Path)):
        import torch

        src = torch.load(src, map_location="cpu", weights_only=True).numpy()
    arr = np.asarray(src, np.float32)
    if arr.ndim == 3:
        arr = arr[:, 0]
    return arr


def select_voice_style(pack: np.ndarray, n_tokens: int) -> np.ndarray:
    """Style row for an utterance length (clamped to the pack range)."""
    return pack[min(max(n_tokens, 1), pack.shape[0]) - 1]
