"""Piper checkpoint → JAX pytree conversion.

The reference loads piper voices as ONNX graphs through onnxruntime
(src/tts/backends/piper_backend.py:296). Here the weights are lifted out of
the checkpoint (ONNX initializers via models/onnx_io.py — no onnxruntime —
or a piper_train torch state dict) and mapped onto models/piper/model.py's
pytree. Every architecture hyperparameter is inferred from tensor shapes,
so all piper quality tiers (x_low/low/medium/high) convert without a
hard-coded table; voice JSON sidecars supply sample rate, inference noise
defaults, and the phoneme→id map.

Weight-norm handling: piper training wraps WN/HiFiGAN convs in
``torch.nn.utils.weight_norm``; checkpoints may carry ``weight_g``/
``weight_v`` pairs (or ``parametrizations.weight.original0/1``), which are
folded into plain weights here.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from open_speech_tpu.models.piper.model import PiperConfig


def fold_weight_norms(sd: dict) -> dict:
    """Fold weight_norm (g, v) pairs into plain ``.weight`` tensors."""
    out = dict(sd)
    for key in list(out):
        if key.endswith(".weight_v"):
            base, g_key = key[: -len(".weight_v")], key[: -2] + "_g"
        elif key.endswith(".parametrizations.weight.original1"):
            base = key[: -len(".parametrizations.weight.original1")]
            g_key = base + ".parametrizations.weight.original0"
        else:
            continue
        v = np.asarray(out.pop(key), np.float32)
        g = np.asarray(out.pop(g_key), np.float32)
        axes = tuple(range(1, v.ndim))
        norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
        out[base + ".weight"] = g * v / np.maximum(norm, 1e-12)
    return out


def _strip_prefixes(sd: dict) -> dict:
    """Remove training-harness prefixes (``model_g.``/``model.``/``_model.``)."""
    for prefix in ("model_g.", "model.", "_model.", "generator."):
        if any(k.startswith(prefix + "enc_p.") for k in sd):
            return {
                (k[len(prefix) :] if k.startswith(prefix) else k): v
                for k, v in sd.items()
            }
    return sd


def _layer_count(sd: dict, pattern: str) -> int:
    """Number of distinct layer indices matching ``pattern``.

    Counts (not max+1): VITS flow module lists interleave parameterless
    Flip modules, so e.g. dp ConvFlows sit at indices 1,3,5,7.
    """
    rx = re.compile(pattern)
    return len({int(m.group(1)) for k in sd if (m := rx.match(k))})


def config_from_state_dict(sd: dict, **overrides) -> PiperConfig:
    """Infer the VITS geometry from checkpoint tensor shapes."""
    emb = sd["enc_p.emb.weight"]
    hidden = emb.shape[1]
    rel = sd["enc_p.encoder.attn_layers.0.emb_rel_k"]  # [1, 2w+1, hd]
    head_dim = rel.shape[-1]
    ffn1 = sd["enc_p.encoder.ffn_layers.0.conv_1.weight"]  # [F, H, K]
    sep0 = sd["dp.convs.convs_sep.0.weight"]  # [C, 1, K]
    cf_proj = sd["dp.flows.1.proj.weight"]  # [3*bins-1, F, 1]
    wn_in0 = sd["flow.flows.0.enc.in_layers.0.weight"]  # [2H, H, K]
    n_ups = _layer_count(sd, r"dec\.ups\.(\d+)\.weight")
    up_kernels = tuple(
        sd[f"dec.ups.{i}.weight"].shape[2] for i in range(n_ups)
    )
    n_res = _layer_count(sd, r"dec\.resblocks\.(\d+)\.convs1\.0\.weight")
    n_kernels = n_res // max(n_ups, 1)
    res_kernels = tuple(
        sd[f"dec.resblocks.{j}.convs1.0.weight"].shape[2] for j in range(n_kernels)
    )
    n_res_convs = _layer_count(sd, r"dec\.resblocks\.0\.convs1\.(\d+)\.weight")
    dilations = ((1, 3, 5) if n_res_convs == 3 else tuple(3**i for i in range(n_res_convs)),) * n_kernels

    kwargs = dict(
        n_phonemes=emb.shape[0],
        hidden=hidden,
        ffn_filter=ffn1.shape[0],
        n_heads=hidden // head_dim,
        n_layers=_layer_count(sd, r"enc_p\.encoder\.attn_layers\.(\d+)\."),
        kernel_size=ffn1.shape[2],
        rel_window=(rel.shape[1] - 1) // 2,
        dp_filter=sd["dp.pre.weight"].shape[0],
        dp_kernel=sep0.shape[2],
        dp_dds_layers=_layer_count(sd, r"dp\.convs\.convs_sep\.(\d+)\."),
        dp_flows=_layer_count(sd, r"dp\.flows\.(\d+)\.pre\.weight"),
        dp_bins=(cf_proj.shape[0] + 1) // 3,
        flow_layers=_layer_count(sd, r"flow\.flows\.(\d+)\.pre\.weight"),
        wn_kernel=wn_in0.shape[2],
        wn_layers=_layer_count(sd, r"flow\.flows\.0\.enc\.in_layers\.(\d+)\."),
        upsample_kernels=up_kernels,
        upsample_rates=tuple(k // 2 for k in up_kernels),  # piper convention
        upsample_initial=sd["dec.conv_pre.weight"].shape[0],
        resblock_kernels=res_kernels,
        resblock_dilations=dilations,
    )
    # dp.flows indices are [EA, CF, Flip, CF, Flip, ...]: CFs sit at odd
    # indices, so the count of *.pre tensors IS the number of ConvFlows
    if "emb_g.weight" in sd:
        kwargs["n_speakers"] = sd["emb_g.weight"].shape[0]
        kwargs["gin"] = sd["emb_g.weight"].shape[1]
    kwargs.update(overrides)
    return PiperConfig(**kwargs)


# ── tensor layout helpers (torch → jax) ────────────────────────────────


def _conv(sd, name):
    p = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 1, 0)))}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _convT(sd, name):
    w = np.transpose(sd[f"{name}.weight"], (2, 0, 1))[::-1]  # flip kernel
    p = {"w": jnp.asarray(np.ascontiguousarray(w))}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _ln_p(sd, name):
    return {"g": jnp.asarray(sd[f"{name}.gamma"]), "b": jnp.asarray(sd[f"{name}.beta"])}


def _dds(sd, name, n_layers):
    return {
        "sep": [_conv(sd, f"{name}.convs_sep.{i}") for i in range(n_layers)],
        "c1x1": [_conv(sd, f"{name}.convs_1x1.{i}") for i in range(n_layers)],
        "n1": [_ln_p(sd, f"{name}.norms_1.{i}") for i in range(n_layers)],
        "n2": [_ln_p(sd, f"{name}.norms_2.{i}") for i in range(n_layers)],
    }


def convert_piper_state_dict(sd: dict, **cfg_overrides):
    """piper/VITS state dict (name → numpy) → (params, PiperConfig)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    sd = fold_weight_norms(_strip_prefixes(sd))
    cfg = config_from_state_dict(sd, **cfg_overrides)

    params: dict = {
        "emb": jnp.asarray(sd["enc_p.emb.weight"]),
        "enc": [],
        "proj": _conv(sd, "enc_p.proj"),
    }
    for i in range(cfg.n_layers):
        a = f"enc_p.encoder.attn_layers.{i}"
        params["enc"].append(
            {
                "rel_k": jnp.asarray(sd[f"{a}.emb_rel_k"][0]),
                "rel_v": jnp.asarray(sd[f"{a}.emb_rel_v"][0]),
                "q": _conv(sd, f"{a}.conv_q"),
                "k": _conv(sd, f"{a}.conv_k"),
                "v": _conv(sd, f"{a}.conv_v"),
                "o": _conv(sd, f"{a}.conv_o"),
                "ln1": _ln_p(sd, f"enc_p.encoder.norm_layers_1.{i}"),
                "ffn1": _conv(sd, f"enc_p.encoder.ffn_layers.{i}.conv_1"),
                "ffn2": _conv(sd, f"enc_p.encoder.ffn_layers.{i}.conv_2"),
                "ln2": _ln_p(sd, f"enc_p.encoder.norm_layers_2.{i}"),
            }
        )

    dp: dict = {
        "pre": _conv(sd, "dp.pre"),
        "convs": _dds(sd, "dp.convs", cfg.dp_dds_layers),
        "proj": _conv(sd, "dp.proj"),
        "ea": {
            "m": jnp.asarray(sd["dp.flows.0.m"][:, 0]),
            "logs": jnp.asarray(sd["dp.flows.0.logs"][:, 0]),
        },
        "cf": [],
    }
    for i in range(cfg.dp_flows):
        f = f"dp.flows.{2 * i + 1}"  # odd indices; even are Flips/EA
        dp["cf"].append(
            {
                "pre": _conv(sd, f"{f}.pre"),
                "convs": _dds(sd, f"{f}.convs", cfg.dp_dds_layers),
                "proj": _conv(sd, f"{f}.proj"),
            }
        )
    if "dp.cond.weight" in sd:
        dp["cond"] = _conv(sd, "dp.cond")
    params["dp"] = dp

    params["flow"] = []
    for i in range(cfg.flow_layers):
        f = f"flow.flows.{2 * i}"  # even indices; odd are Flips
        layer = {
            "pre": _conv(sd, f"{f}.pre"),
            "in": [
                _conv(sd, f"{f}.enc.in_layers.{j}") for j in range(cfg.wn_layers)
            ],
            "rs": [
                _conv(sd, f"{f}.enc.res_skip_layers.{j}")
                for j in range(cfg.wn_layers)
            ],
            "post": _conv(sd, f"{f}.post"),
        }
        if f"{f}.enc.cond_layer.weight" in sd:
            layer["cond"] = _conv(sd, f"{f}.enc.cond_layer")
        params["flow"].append(layer)

    dec: dict = {"pre": _conv(sd, "dec.conv_pre"), "ups": [], "res": []}
    nk = len(cfg.resblock_kernels)
    for i in range(len(cfg.upsample_rates)):
        dec["ups"].append(_convT(sd, f"dec.ups.{i}"))
        stage = []
        for j in range(nk):
            r = f"dec.resblocks.{i * nk + j}"
            blk = {}
            for d in range(len(cfg.resblock_dilations[j])):
                blk[f"c1_{d}"] = _conv(sd, f"{r}.convs1.{d}")
                blk[f"c2_{d}"] = _conv(sd, f"{r}.convs2.{d}")
            stage.append(blk)
        dec["res"].append(stage)
    dec["post"] = _conv(sd, "dec.conv_post")
    if "dec.cond.weight" in sd:
        dec["cond"] = _conv(sd, "dec.cond")
    params["dec"] = dec

    if "emb_g.weight" in sd:
        params["emb_g"] = jnp.asarray(sd["emb_g.weight"])
    return params, cfg


def load_voice_json(path: str | Path) -> dict:
    """Parse a piper voice config sidecar (``<voice>.onnx.json``)."""
    cfg = json.loads(Path(path).read_text())
    inference = cfg.get("inference", {})
    return {
        "sample_rate": cfg.get("audio", {}).get("sample_rate", 22050),
        "noise_scale": inference.get("noise_scale", 0.667),
        "length_scale": inference.get("length_scale", 1.0),
        "noise_scale_w": inference.get("noise_w", 0.8),
        "phoneme_id_map": cfg.get("phoneme_id_map", {}),
        "speaker_id_map": cfg.get("speaker_id_map", {}),
        "espeak_voice": cfg.get("espeak", {}).get("voice", "en-us"),
        "num_symbols": cfg.get("num_symbols"),
        "num_speakers": cfg.get("num_speakers", 1),
    }


def convert_piper_onnx(onnx_path: str | Path, json_path: str | Path | None = None):
    """Piper ONNX voice + JSON sidecar → (params, cfg, voice_meta).

    Works when the export kept module-path initializer names (weight-norm
    tensors are folded). Raises with a clear message when the graph was
    constant-folded into anonymous initializers — use the torch checkpoint
    and ``convert_piper_state_dict`` in that case.
    """
    from open_speech_tpu.models.onnx_io import read_onnx_initializers

    onnx_path = Path(onnx_path)
    raw = read_onnx_initializers(onnx_path)
    sd = _strip_prefixes(raw)
    if not any(k.startswith("enc_p.emb") for k in sd):
        raise ValueError(
            f"{onnx_path.name}: initializer names are anonymized "
            "(constant-folded export); convert from the piper_train "
            "checkpoint with convert_piper_state_dict instead"
        )
    meta: dict = {}
    if json_path is None:
        cand = onnx_path.with_suffix(onnx_path.suffix + ".json")
        json_path = cand if cand.is_file() else None
    if json_path is not None:
        meta = load_voice_json(json_path)
    overrides = {
        k: meta[k]
        for k in ("sample_rate", "noise_scale", "noise_scale_w")
        if k in meta
    }
    params, cfg = convert_piper_state_dict(sd, **overrides)
    return params, cfg, meta
