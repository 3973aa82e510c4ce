"""Torch oracles for the pocket-tts converter parity tests.

Two halves, mirroring the model split:

- **Mimi codec**: the oracle is the REAL ``transformers.MimiModel``
  (modeling_mimi.py — the maintained port of Kyutai's codec). A tiny
  random-init instance is translated to the original moshi state_dict
  naming (``hf_mimi_to_moshi_state``) — undoing the HF conversion's
  rotate-half RoPE permutation and q/k/v split — and fed through
  ``models/pocket/convert.convert_mimi``; parity of codes + waveforms
  then proves both the naming translation and the JAX model against
  upstream-maintained semantics.

- **LM**: an independent torch implementation (``OracleLM``) with the
  moshi ``LMModel`` parameter naming the converter targets
  (transformer.layers.N.{norm1.alpha,self_attn.in_proj_weight,gating.*},
  depformer per-stage in_projs/out_projs/gating, emb.K/linears.K).
  Its math follows the semantics verified against transformers'
  modeling_moshi.py (MoshiRMSNorm eps=1e-8, interleaved RoPE of the
  original checkpoints, MoshiGatingMLP's split-half gated SiLU,
  MoshiDepthDecoder's per-stage flexible linears, causal over stages).

Reference serving surface: /root/reference/src/tts/backends/pocket_tts_backend.py.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn


# ──────────────────────────────────────────────────────────────────────
# Mimi: tiny HF model + HF→moshi naming translation
# ──────────────────────────────────────────────────────────────────────


def tiny_hf_mimi(seed: int = 0):
    """Random-init transformers MimiModel matching models/pocket/mimi.TEST_TINY."""
    from transformers.models.mimi import MimiConfig as HFMimiConfig
    from transformers.models.mimi import MimiModel

    cfg = HFMimiConfig(
        sampling_rate=24_000,
        frame_rate=250.0,  # encodec rate 500 (ratios 4·3·2·2=48) → stride-2 downsample
        hidden_size=16,
        num_filters=4,
        upsampling_ratios=[4, 3, 2, 2],
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        head_dim=8,
        intermediate_size=32,
        num_quantizers=4,
        codebook_size=32,
        codebook_dim=8,
        vector_quantization_hidden_dimension=8,
        num_semantic_quantizers=1,
        upsample_groups=16,  # depthwise (== hidden_size), as in the real model
        sliding_window=250,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    model = MimiModel(cfg).eval()
    # HF random-init leaves codebooks at zero (they are EMA buffers);
    # fill them so quantization is non-degenerate
    g = torch.Generator().manual_seed(seed + 1)
    for rvq in (
        model.quantizer.semantic_residual_vector_quantizer,
        model.quantizer.acoustic_residual_vector_quantizer,
    ):
        for layer in rvq.layers:
            cb = layer.codebook
            cb.embed_sum.copy_(torch.randn(cb.embed_sum.shape, generator=g))
            cb.cluster_usage.copy_(
                torch.rand(cb.cluster_usage.shape, generator=g) + 0.5
            )
            cb._embed = None
    return model


def _unpermute_rope(w: np.ndarray, n_heads: int) -> np.ndarray:
    """HF rotate-half head layout → original interleaved layout.

    The HF conversion permutes each head's rows from interleaved pairs to
    [evens..., odds...]; this reverses it so the fused in_proj matches the
    moshi checkpoint convention (and the JAX model's interleaved RoPE).
    """
    out, din = w.shape
    hd = out // n_heads
    return (
        w.reshape(n_heads, 2, hd // 2, din)
        .transpose(0, 2, 1, 3)
        .reshape(out, din)
    )


def hf_mimi_to_moshi_state(model) -> dict[str, np.ndarray]:
    """transformers MimiModel → original moshi MimiModel state_dict naming."""
    from transformers.models.mimi.modeling_mimi import (
        MimiConv1d,
        MimiConvTranspose1d,
        MimiResnetBlock,
    )

    out: dict[str, np.ndarray] = {}

    def put(key, tensor):
        out[key] = tensor.detach().cpu().numpy()

    def put_conv(prefix, m):  # MimiConv1d
        put(f"{prefix}.conv.conv.weight", m.conv.weight)
        if m.conv.bias is not None:
            put(f"{prefix}.conv.conv.bias", m.conv.bias)

    def put_convtr(prefix, m):  # MimiConvTranspose1d
        put(f"{prefix}.convtr.convtr.weight", m.conv.weight)
        if m.conv.bias is not None:
            put(f"{prefix}.convtr.convtr.bias", m.conv.bias)

    def put_seanet(side, module):
        for i, layer in enumerate(module.layers):
            prefix = f"{side}.model.{i}"
            if isinstance(layer, MimiConvTranspose1d):
                put_convtr(prefix, layer)
            elif isinstance(layer, MimiConv1d):
                put_conv(prefix, layer)
            elif isinstance(layer, MimiResnetBlock):
                put_conv(f"{prefix}.block.1", layer.block[1])
                put_conv(f"{prefix}.block.3", layer.block[3])

    put_seanet("encoder", model.encoder)
    put_seanet("decoder", model.decoder)

    n_heads = model.config.num_attention_heads
    for side, module in (
        ("encoder_transformer", model.encoder_transformer),
        ("decoder_transformer", model.decoder_transformer),
    ):
        for i, layer in enumerate(module.layers):
            p = f"{side}.transformer.layers.{i}"
            q = _unpermute_rope(
                layer.self_attn.q_proj.weight.detach().numpy(), n_heads
            )
            k = _unpermute_rope(
                layer.self_attn.k_proj.weight.detach().numpy(), n_heads
            )
            v = layer.self_attn.v_proj.weight.detach().numpy()
            out[f"{p}.self_attn.in_proj_weight"] = np.concatenate([q, k, v], 0)
            put(f"{p}.self_attn.out_proj.weight", layer.self_attn.o_proj.weight)
            put(f"{p}.norm1.weight", layer.input_layernorm.weight)
            put(f"{p}.norm1.bias", layer.input_layernorm.bias)
            put(f"{p}.norm2.weight", layer.post_attention_layernorm.weight)
            put(f"{p}.norm2.bias", layer.post_attention_layernorm.bias)
            put(f"{p}.layer_scale_1.scale", layer.self_attn_layer_scale.scale)
            put(f"{p}.layer_scale_2.scale", layer.mlp_layer_scale.scale)
            put(f"{p}.linear1.weight", layer.mlp.fc1.weight)
            put(f"{p}.linear2.weight", layer.mlp.fc2.weight)

    put("downsample.conv.conv.weight", model.downsample.conv.weight)
    put("upsample.convtr.convtr.weight", model.upsample.conv.weight)

    for moshi_name, rvq in (
        ("rvq_first", model.quantizer.semantic_residual_vector_quantizer),
        ("rvq_rest", model.quantizer.acoustic_residual_vector_quantizer),
    ):
        put(f"quantizer.{moshi_name}.input_proj.weight", rvq.input_proj.weight)
        put(f"quantizer.{moshi_name}.output_proj.weight", rvq.output_proj.weight)
        for k_i, layer in enumerate(rvq.layers):
            cb = layer.codebook
            put(
                f"quantizer.{moshi_name}.vq.layers.{k_i}._codebook.embed_sum",
                cb.embed_sum,
            )
            put(
                f"quantizer.{moshi_name}.vq.layers.{k_i}._codebook.cluster_usage",
                cb.cluster_usage,
            )
    return out


# ──────────────────────────────────────────────────────────────────────
# LM oracle (moshi LMModel naming + semantics)
# ──────────────────────────────────────────────────────────────────────


class AlphaRMSNorm(nn.Module):
    """moshi RMSNorm: parameter named ``alpha``, shape [1, 1, D], eps 1e-8."""

    def __init__(self, d: int, eps: float = 1e-8):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, 1, d))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps) * self.alpha.float()).to(
            x.dtype
        )


def _interleaved_rope(q, k, positions, head_dim):
    """Original moshi RoPE: rotate interleaved pairs. q/k [B, H, T, hd]."""
    half = head_dim // 2
    freqs = 10000.0 ** (-torch.arange(half, dtype=torch.float32) / half)
    ang = positions[:, None].float() * freqs[None, :]  # [T, half]
    cos, sin = torch.cos(ang), torch.sin(ang)

    def rot(x):
        xr = x.reshape(*x.shape[:-1], half, 2)
        x0, x1 = xr[..., 0], xr[..., 1]
        c = cos[None, None]
        s = sin[None, None]
        return torch.stack([x0 * c - x1 * s, x0 * s + x1 * c], -1).reshape(
            x.shape
        )

    return rot(q), rot(k)


class Gating(nn.Module):
    """moshi ActivationGating: fc → split-half → silu(a)·b → fc."""

    def __init__(self, d: int, hidden: int):
        super().__init__()
        self.linear_in = nn.Linear(d, 2 * hidden, bias=False)
        self.linear_out = nn.Linear(hidden, d, bias=False)

    def forward(self, x):
        h = self.linear_in(x)
        a, b = h.chunk(2, dim=-1)
        return self.linear_out(torch.nn.functional.silu(a) * b)


class TemporalAttention(nn.Module):
    def __init__(self, d: int, n_heads: int):
        super().__init__()
        self.in_proj_weight = nn.Parameter(torch.randn(3 * d, d) / math.sqrt(d))
        self.out_proj = nn.Linear(d, d, bias=False)
        self.n_heads = n_heads
        self.d = d

    def forward(self, x):
        b, t, d = x.shape
        hd = d // self.n_heads
        qkv = x @ self.in_proj_weight.T
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(b, t, self.n_heads, hd).transpose(1, 2)
        k = k.view(b, t, self.n_heads, hd).transpose(1, 2)
        v = v.view(b, t, self.n_heads, hd).transpose(1, 2)
        q, k = _interleaved_rope(q, k, torch.arange(t), hd)
        logits = (q.float() @ k.float().transpose(-1, -2)) * hd**-0.5
        mask = torch.tril(torch.ones(t, t, dtype=torch.bool))
        logits = logits.masked_fill(~mask, -1e30)
        att = torch.softmax(logits, -1).to(v.dtype) @ v
        att = att.transpose(1, 2).reshape(b, t, d)
        return self.out_proj(att)


class TemporalLayer(nn.Module):
    def __init__(self, d, n_heads, hidden):
        super().__init__()
        self.norm1 = AlphaRMSNorm(d)
        self.self_attn = TemporalAttention(d, n_heads)
        self.norm2 = AlphaRMSNorm(d)
        self.gating = Gating(d, hidden)

    def forward(self, x):
        x = x + self.self_attn(self.norm1(x))
        return x + self.gating(self.norm2(x))


class DepAttention(nn.Module):
    """Per-stage fused qkv (in_projs.{s}) + per-stage out (out_projs.{s})."""

    def __init__(self, d, n_heads, n_q):
        super().__init__()
        self.in_projs = nn.ModuleList(
            [nn.Linear(d, 3 * d, bias=False) for _ in range(n_q)]
        )
        self.out_projs = nn.ModuleList(
            [nn.Linear(d, d, bias=False) for _ in range(n_q)]
        )
        self.n_heads = n_heads

    def forward(self, x):  # x [B, K, D] — one position per stage, no RoPE
        b, kq, d = x.shape
        hd = d // self.n_heads
        qkv = torch.stack(
            [self.in_projs[s](x[:, s]) for s in range(kq)], dim=1
        )  # [B, K, 3D]
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(b, kq, self.n_heads, hd).transpose(1, 2)
        k = k.view(b, kq, self.n_heads, hd).transpose(1, 2)
        v = v.view(b, kq, self.n_heads, hd).transpose(1, 2)
        logits = (q.float() @ k.float().transpose(-1, -2)) * hd**-0.5
        mask = torch.tril(torch.ones(kq, kq, dtype=torch.bool))
        logits = logits.masked_fill(~mask, -1e30)
        att = torch.softmax(logits, -1).to(v.dtype) @ v
        att = att.transpose(1, 2).reshape(b, kq, d)
        return torch.stack(
            [self.out_projs[s](att[:, s]) for s in range(kq)], dim=1
        )


class DepGating(nn.Module):
    """Per-stage gating, named ``gating.{s}.linear_in/linear_out``."""

    def __init__(self, d, hidden, n_q):
        super().__init__()
        self.stages = nn.ModuleList([Gating(d, hidden) for _ in range(n_q)])

    def forward(self, x):
        return torch.stack(
            [self.stages[s](x[:, s]) for s in range(x.shape[1])], dim=1
        )


class DepLayer(nn.Module):
    def __init__(self, d, n_heads, hidden, n_q):
        super().__init__()
        self.norm1 = AlphaRMSNorm(d)
        self.self_attn = DepAttention(d, n_heads, n_q)
        self.norm2 = AlphaRMSNorm(d)
        self.gating = DepGating(d, hidden, n_q)

    def forward(self, x):
        x = x + self.self_attn(self.norm1(x))
        return x + self.gating(self.norm2(x))


class _Layers(nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class OracleLM(nn.Module):
    """moshi-family TTS LM: temporal + depth transformer, moshi naming."""

    def __init__(self, cfg):
        super().__init__()
        d, dd = cfg.d_model, cfg.dep_d_model
        self.cfg = cfg
        self.text_emb = nn.Embedding(cfg.text_card + 1, d)
        self.emb = nn.ModuleList(
            [nn.Embedding(cfg.card + 1, d) for _ in range(cfg.n_q)]
        )
        self.transformer = _Layers(
            [
                TemporalLayer(d, cfg.n_heads, cfg.hidden)
                for _ in range(cfg.n_layers)
            ]
        )
        self.out_norm = AlphaRMSNorm(d)
        self.text_linear = nn.Linear(d, cfg.text_card, bias=False)
        self.depformer_in = nn.ModuleList(
            [nn.Linear(d, dd, bias=False) for _ in range(cfg.n_q)]
        )
        self.depformer_text_emb = nn.Embedding(cfg.text_card + 1, dd)
        self.depformer_emb = nn.ModuleList(
            [nn.Embedding(cfg.card + 1, dd) for _ in range(cfg.n_q - 1)]
        )
        self.depformer = _Layers(
            [
                DepLayer(dd, cfg.dep_heads, cfg.dep_hidden, cfg.n_q)
                for _ in range(cfg.dep_layers)
            ]
        )
        self.linears = nn.ModuleList(
            [nn.Linear(dd, cfg.card, bias=False) for _ in range(cfg.n_q)]
        )

    def temporal(self, text_tokens, audio_tokens):
        """text [B, T], audio (delayed grid) [B, K, T] → normed hidden [B, T, D]."""
        x = self.text_emb(text_tokens)
        for k_i in range(self.cfg.n_q):
            x = x + self.emb[k_i](audio_tokens[:, k_i])
        h = self.transformer(x)
        return self.out_norm(h)

    def depformer_logits(self, hn, text_tok, audio_toks):
        """hn [N, D], text [N], audio targets [N, K] → logits [N, K, card]."""
        n = hn.shape[0]
        stages = []
        for s in range(self.cfg.n_q):
            proj = self.depformer_in[s](hn)
            prev = (
                self.depformer_text_emb(text_tok)
                if s == 0
                else self.depformer_emb[s - 1](audio_toks[:, s - 1])
            )
            stages.append(proj + prev)
        x = torch.stack(stages, dim=1)  # [N, K, Dd]
        x = self.depformer(x)
        return torch.stack(
            [self.linears[s](x[:, s]) for s in range(self.cfg.n_q)], dim=1
        )

    def forward(self, text_tokens, audio_tokens):
        """Mirrors models/pocket/lm.lm_forward's teacher-forced contract."""
        b, t = text_tokens.shape
        hn = self.temporal(text_tokens, audio_tokens)
        text_logits = self.text_linear(hn)
        pad_t = torch.full((b, 1), self.cfg.text_card, dtype=torch.long)
        nxt_text = torch.cat([text_tokens[:, 1:], pad_t], dim=1)
        pad_a = torch.full(
            (b, self.cfg.n_q, 1), self.cfg.card, dtype=torch.long
        )
        nxt_audio = torch.cat([audio_tokens[:, :, 1:], pad_a], dim=2)
        dep = self.depformer_logits(
            hn.reshape(b * t, -1),
            nxt_text.reshape(-1),
            nxt_audio.permute(0, 2, 1).reshape(b * t, self.cfg.n_q),
        )
        return text_logits, dep.reshape(b, t, self.cfg.n_q, self.cfg.card)


def oracle_lm_state_dict(model: OracleLM) -> dict[str, np.ndarray]:
    """state_dict with moshi naming (rename oracle-internal containers)."""
    out = {}
    for k, v in model.state_dict().items():
        k = k.replace("gating.stages.", "gating.")
        out[k] = v.detach().cpu().numpy()
    return out
