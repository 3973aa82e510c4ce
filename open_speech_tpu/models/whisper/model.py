"""Whisper encoder/decoder in functional JAX.

Matches the openai/whisper architecture (which CTranslate2 executes natively
for the reference backend, src/backends/faster_whisper.py:245):

  encoder: conv1d(k3,s1) -> GELU -> conv1d(k3,s2) -> GELU -> +sinusoid pos
           -> N x [preLN self-attn, preLN MLP] -> LN
  decoder: tok emb + learned pos -> N x [preLN causal self-attn,
           preLN cross-attn, preLN MLP] -> LN -> logits = h @ emb.T

TPU-first choices:
  - per-layer params are stacked along a leading axis and the block stack is
    a single lax.scan -> one compiled block body regardless of depth (32
    encoder layers for large-v3 compile as fast as 4).
  - matmul compute dtype is configurable (bfloat16 by default) with float32
    layernorms, softmax, and logits.
  - self-attention KV caches are [L, B, H, T_max, Dh] device buffers updated
    with dynamic_update_slice; decode_step is one jitted program reused for
    every position (static shapes, no recompiles).
  - encoder conv1d is expressed as lax.conv_general_dilated over NCW so XLA
    lowers it onto the MXU.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.initutil import jit_init
import numpy as np

from open_speech_tpu.ops.attention import decode_attention, flash_attention

LN_EPS = 1e-5


@dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_vocab: int = 51865
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    n_langs: int = 99  # 100 for large-v3 family

    @property
    def head_dim(self) -> int:
        return self.n_audio_state // self.n_audio_head


# Model catalog: dims follow the openai/whisper release table; v3 family uses
# 128 mels and 100 languages. distil-* keep the full encoder with a shallow
# decoder (the same trade turbo makes).
PRESETS: dict[str, WhisperConfig] = {
    "tiny": WhisperConfig(80, 51865, 1500, 384, 6, 4, 448, 384, 6, 4, 99),
    "tiny.en": WhisperConfig(80, 51864, 1500, 384, 6, 4, 448, 384, 6, 4, 99),
    "base": WhisperConfig(80, 51865, 1500, 512, 8, 6, 448, 512, 8, 6, 99),
    "base.en": WhisperConfig(80, 51864, 1500, 512, 8, 6, 448, 512, 8, 6, 99),
    "small": WhisperConfig(80, 51865, 1500, 768, 12, 12, 448, 768, 12, 12, 99),
    "small.en": WhisperConfig(80, 51864, 1500, 768, 12, 12, 448, 768, 12, 12, 99),
    "medium": WhisperConfig(80, 51865, 1500, 1024, 16, 24, 448, 1024, 16, 24, 99),
    "medium.en": WhisperConfig(80, 51864, 1500, 1024, 16, 24, 448, 1024, 16, 24, 99),
    "large-v1": WhisperConfig(80, 51865, 1500, 1280, 20, 32, 448, 1280, 20, 32, 99),
    "large-v2": WhisperConfig(80, 51865, 1500, 1280, 20, 32, 448, 1280, 20, 32, 99),
    "large-v3": WhisperConfig(128, 51866, 1500, 1280, 20, 32, 448, 1280, 20, 32, 100),
    "large-v3-turbo": WhisperConfig(
        128, 51866, 1500, 1280, 20, 32, 448, 1280, 20, 4, 100
    ),
    "distil-large-v3": WhisperConfig(
        128, 51866, 1500, 1280, 20, 32, 448, 1280, 20, 2, 100
    ),
    # distil .en models (distil-whisper release table): full encoder depth,
    # shallow decoder — small.en keeps 4 decoder layers, medium.en keeps 2
    "distil-small.en": WhisperConfig(80, 51864, 1500, 768, 12, 12, 448, 768, 12, 4, 99),
    "distil-medium.en": WhisperConfig(80, 51864, 1500, 1024, 16, 24, 448, 1024, 16, 2, 99),
    # test-size config: everything minimal, byte-level-friendly vocab
    "test-tiny": WhisperConfig(80, 384, 60, 64, 2, 2, 32, 64, 2, 2, 2),
    # test-size draft (speculative decoding): same vocab, shallower
    "test-tiny-draft": WhisperConfig(80, 384, 60, 64, 2, 1, 32, 64, 2, 1, 2),
}


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Fixed sinusoidal position table (openai layout: [sin | cos])."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


# ──────────────────────────────────────────────────────────────────────
# Parameter init
# ──────────────────────────────────────────────────────────────────────


def _linear_init(key, d_in, d_out, dtype):
    scale = d_in**-0.5
    return {
        "w": jax.random.normal(key, (d_in, d_out), dtype) * scale,
        "b": jnp.zeros((d_out,), dtype),
    }


def _attn_init(key, d, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": _linear_init(ks[0], d, d, dtype),
        "k": {"w": jax.random.normal(ks[1], (d, d), dtype) * d**-0.5},
        "v": _linear_init(ks[2], d, d, dtype),
        "o": _linear_init(ks[3], d, d, dtype),
    }


def _ln_init(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _block_init(key, d, cross: bool, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "ln1": _ln_init(d),
        "attn": _attn_init(ks[0], d, dtype),
        "ln_mlp": _ln_init(d),
        "mlp_in": _linear_init(ks[1], d, 4 * d, dtype),
        "mlp_out": _linear_init(ks[2], 4 * d, d, dtype),
    }
    if cross:
        p["ln_cross"] = _ln_init(d)
        p["cross"] = _attn_init(ks[3], d, dtype)
    return p


def _stack(trees: list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


@jit_init()
def init_params(key, cfg: WhisperConfig, dtype=jnp.float32):
    """Random-init parameter pytree, layers stacked for lax.scan."""
    k_enc, k_dec, k_conv1, k_conv2, k_emb = jax.random.split(key, 5)
    d_a, d_t = cfg.n_audio_state, cfg.n_text_state
    enc_blocks = _stack(
        [
            _block_init(k, d_a, cross=False, dtype=dtype)
            for k in jax.random.split(k_enc, cfg.n_audio_layer)
        ]
    )
    dec_blocks = _stack(
        [
            _block_init(k, d_t, cross=True, dtype=dtype)
            for k in jax.random.split(k_dec, cfg.n_text_layer)
        ]
    )
    return {
        "encoder": {
            # conv weights: [width, in_ch, out_ch]
            "conv1": {
                "w": jax.random.normal(k_conv1, (3, cfg.n_mels, d_a), dtype)
                * (3 * cfg.n_mels) ** -0.5,
                "b": jnp.zeros((d_a,), dtype),
            },
            "conv2": {
                "w": jax.random.normal(k_conv2, (3, d_a, d_a), dtype)
                * (3 * d_a) ** -0.5,
                "b": jnp.zeros((d_a,), dtype),
            },
            "pos": jnp.asarray(sinusoids(cfg.n_audio_ctx, d_a), dtype),
            "blocks": enc_blocks,
            "ln_post": _ln_init(d_a),
        },
        "decoder": {
            "tok_emb": jax.random.normal(k_emb, (cfg.n_vocab, d_t), dtype)
            * d_t**-0.5,
            "pos_emb": jnp.zeros((cfg.n_text_ctx, d_t), dtype),
            "blocks": dec_blocks,
            "ln": _ln_init(d_t),
        },
    }


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


# ──────────────────────────────────────────────────────────────────────
# Primitive layers
# ──────────────────────────────────────────────────────────────────────


def layer_norm(x, p):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (out * p["g"] + p["b"]).astype(x.dtype)


def linear(x, p):
    w = p["w"]
    if isinstance(w, dict):  # int8 pack {"q", "s"} (quantize.py)
        # matmul reads int8 weights (convert fuses into the dot); the
        # per-output-channel scale applies to the small output tensor
        out = (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)
    else:
        out = x @ w
    if "b" in p:
        out = out + p["b"]
    return out


def embed_tokens(dec, tokens):
    emb = dec["tok_emb"]
    if isinstance(emb, dict):
        return emb["q"][tokens].astype(jnp.bfloat16) * emb["s"][tokens].astype(
            jnp.bfloat16
        )
    return emb[tokens]


def output_logits(x, dec):
    emb = dec["tok_emb"]
    if isinstance(emb, dict):
        logits = x @ emb["q"].T.astype(x.dtype)
        return (logits * emb["s"][:, 0].astype(x.dtype)).astype(jnp.float32)
    return (x @ emb.T.astype(x.dtype)).astype(jnp.float32)


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def self_attention(x, p, n_head, causal):
    q = _split_heads(linear(x, p["q"]), n_head)
    k = _split_heads(linear(x, p["k"]), n_head)
    v = _split_heads(linear(x, p["v"]), n_head)
    out = flash_attention(q, k, v, causal=causal)
    return linear(_merge_heads(out), p["o"])


def mlp(x, p):
    return linear(jax.nn.gelu(linear(x, p["mlp_in"]), approximate=False), p["mlp_out"])


# ──────────────────────────────────────────────────────────────────────
# Encoder
# ──────────────────────────────────────────────────────────────────────


def _conv1d(x, p, stride):
    # x: [B, T, C_in]; w: [K, C_in, C_out]
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"],
            window_strides=(stride,),
            padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        + p["b"]
    )


@partial(jax.jit, static_argnames=("n_head",))
def _encode_impl(params, mel, n_head):
    enc = params["encoder"]
    x = mel.transpose(0, 2, 1)  # [B, n_mels, T] -> [B, T, n_mels]
    x = x.astype(enc["conv1"]["w"].dtype)  # features f32 -> compute dtype
    x = jax.nn.gelu(_conv1d(x, enc["conv1"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2"], 2), approximate=False)
    x = x + enc["pos"][: x.shape[1]]

    def block(h, bp):
        h = h + self_attention(layer_norm(h, bp["ln1"]), bp["attn"], n_head, False)
        h = h + mlp(layer_norm(h, bp["ln_mlp"]), bp)
        return h, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"])


def encode(params, mel, cfg: WhisperConfig):
    """mel [B, n_mels, 3000] -> encoder states [B, 1500, d]."""
    return _encode_impl(params, mel, cfg.n_audio_head)


# ──────────────────────────────────────────────────────────────────────
# Decoder — full forward (training / scoring)
# ──────────────────────────────────────────────────────────────────────


@partial(jax.jit, static_argnames=("n_head",))
def _decoder_forward_impl(params, tokens, enc_out, n_head):
    dec = params["decoder"]
    t = tokens.shape[1]
    x = embed_tokens(dec, tokens) + dec["pos_emb"][:t]

    def block(h, bp):
        h = h + self_attention(layer_norm(h, bp["ln1"]), bp["attn"], n_head, True)
        hc = layer_norm(h, bp["ln_cross"])
        q = _split_heads(linear(hc, bp["cross"]["q"]), n_head)
        k = _split_heads(linear(enc_out, bp["cross"]["k"]), n_head)
        v = _split_heads(linear(enc_out, bp["cross"]["v"]), n_head)
        h = h + linear(_merge_heads(flash_attention(q, k, v)), bp["cross"]["o"])
        h = h + mlp(layer_norm(h, bp["ln_mlp"]), bp)
        return h, None

    x, _ = jax.lax.scan(block, x, dec["blocks"])
    x = layer_norm(x, dec["ln"])
    return output_logits(x, dec)


def decoder_forward(params, tokens, enc_out, cfg: WhisperConfig):
    """tokens [B, T] + encoder states -> logits [B, T, vocab] (teacher-forced)."""
    return _decoder_forward_impl(params, tokens, enc_out, cfg.n_text_head)


# ──────────────────────────────────────────────────────────────────────
# Decoder — incremental (KV cache)
# ──────────────────────────────────────────────────────────────────────


def init_self_kv(cfg: WhisperConfig, batch: int, max_len: int | None = None, dtype=jnp.float32):
    """Zeroed self-attn KV cache: [L, 2, B, H, T_max, Dh]."""
    max_len = max_len or cfg.n_text_ctx
    dh = cfg.n_text_state // cfg.n_text_head
    return jnp.zeros(
        (cfg.n_text_layer, 2, batch, cfg.n_text_head, max_len, dh), dtype
    )


@partial(jax.jit, static_argnames=("n_head",))
def _precompute_cross_kv_impl(params, enc_out, n_head):
    def per_layer(bp):
        k = _split_heads(linear(enc_out, bp["cross"]["k"]), n_head)
        v = _split_heads(linear(enc_out, bp["cross"]["v"]), n_head)
        return jnp.stack([k, v])  # [2, B, H, T_enc, Dh]

    return jax.vmap(per_layer)(params["decoder"]["blocks"])


@partial(jax.jit, static_argnames=("n_head",))
def _precompute_cross_kv_int8(params, enc_out, n_head):
    from open_speech_tpu.models.whisper.quantize import quantize_tensor

    def per_layer(bp):
        k = _split_heads(linear(enc_out, bp["cross"]["k"]), n_head)
        v = _split_heads(linear(enc_out, bp["cross"]["v"]), n_head)
        kq = quantize_tensor(k, axis=-1)
        vq = quantize_tensor(v, axis=-1)
        return {
            "k": kq["q"], "k_s": kq["s"],
            "v": vq["q"], "v_s": vq["s"],
        }

    return jax.vmap(per_layer)(params["decoder"]["blocks"])


def precompute_cross_kv(params, enc_out, cfg: WhisperConfig):
    """Cross-attention K/V for all layers.

    bf16 models: stacked [L, 2, B, H, T_enc, Dh]. int8 models: per-position
    int8 packs {"k","k_s","v","v_s"} — decode re-reads this entire buffer
    every step, so halving its bytes converts directly into decode speed.
    """
    if isinstance(params["decoder"]["tok_emb"], dict):  # int8-packed model
        return _precompute_cross_kv_int8(params, enc_out, cfg.n_text_head)
    return _precompute_cross_kv_impl(params, enc_out, cfg.n_text_head)


def cross_attend(qc, ckv, batch: int, enc_len=None, beam: int = 1):
    """Cross-attention against a per-layer cross-KV slice (either form).

    ``enc_len`` ([B] int32) masks encoder positions past the real audio —
    the streaming interim path encodes only audio-backed blocks and masks
    the rest instead of re-encoding silence to the bucket edge each chunk.
    Clamped to >=1: an all-masked row would softmax over -inf to NaN;
    attending one silent frame is the harmless degenerate case.

    ``beam > 1``: qc carries B*K rows but ckv stays [.., B, ..] — every
    beam of a batch row attends the SAME encoder memory, so replicating
    the cross-KV K× (the naive layout) multiplies the dominant per-step
    HBM stream (L×2×B×H×1500×Dh, re-read every decode step) by the beam
    width for zero information. Instead the K beams fold into the query
    position axis: [B*K, H, 1, D] → [B, H, K, D], one attention over the
    un-replicated memory, fold back. Bit-identical math, 1/K the traffic.
    """
    if beam > 1:
        bk, h, q_len, d = qc.shape  # decode path: q_len == 1
        b = bk // beam
        q_fold = qc.reshape(b, beam, h, q_len, d)[:, :, :, 0, :]
        q_fold = q_fold.transpose(0, 2, 1, 3)  # [B, H, K, D]
        out = cross_attend(q_fold, ckv, b, enc_len)
        return out.transpose(0, 2, 1, 3).reshape(bk, h, q_len, d)
    if enc_len is not None:
        enc_len = jnp.maximum(enc_len, 1)
    if isinstance(ckv, dict):
        if enc_len is None:
            enc_len = jnp.full((batch,), ckv["k"].shape[2], jnp.int32)
        return decode_attention(
            qc, ckv["k"], ckv["v"], enc_len,
            k_scale=ckv["k_s"], v_scale=ckv["v_s"],
        )
    if enc_len is None:
        enc_len = jnp.full((batch,), ckv.shape[3], jnp.int32)
    return decode_attention(qc, ckv[0], ckv[1], enc_len)


@partial(jax.jit, static_argnames=("n_head", "beam"), donate_argnums=(3,))
def _decode_step_impl(
    params, tokens, pos, self_kv, cross_kv, n_head, enc_len=None, beam=1,
    row_map=None,
):
    from open_speech_tpu.ops.attention import beam_select_attention

    dec = params["decoder"]
    b = tokens.shape[0]
    x = embed_tokens(dec, tokens) + jax.lax.dynamic_slice_in_dim(
        dec["pos_emb"], pos, 1, axis=0
    )  # [B, 1, d]

    def block(h, layer):
        bp, ckv, kv = layer
        # self-attn with cache append
        hn = layer_norm(h, bp["ln1"])
        q = _split_heads(linear(hn, bp["attn"]["q"]), n_head)
        k_new = _split_heads(linear(hn, bp["attn"]["k"]), n_head)
        v_new = _split_heads(linear(hn, bp["attn"]["v"]), n_head)
        k_cache = jax.lax.dynamic_update_slice(
            kv[0], k_new.astype(kv.dtype), (0, 0, pos, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            kv[1], v_new.astype(kv.dtype), (0, 0, pos, 0)
        )
        length = jnp.full((b,), pos + 1, jnp.int32)
        if row_map is not None:
            # beam ancestry: caches are physically un-permuted; the
            # row_map selects each beam's lineage at read time instead
            # of the per-step full-cache gather (see beam_select_attention)
            attn = beam_select_attention(
                q, k_cache, v_cache, row_map, length, beam
            )
        else:
            attn = decode_attention(q, k_cache, v_cache, length)
        h = h + linear(_merge_heads(attn), bp["attn"]["o"])
        # cross-attn against precomputed enc K/V (bf16 or int8 packed)
        hc = layer_norm(h, bp["ln_cross"])
        qc = _split_heads(linear(hc, bp["cross"]["q"]), n_head)
        attn_c = cross_attend(qc, ckv, b, enc_len, beam=beam)
        h = h + linear(_merge_heads(attn_c), bp["cross"]["o"])
        h = h + mlp(layer_norm(h, bp["ln_mlp"]), bp)
        return h, jnp.stack([k_cache, v_cache])

    x, new_kv = jax.lax.scan(
        block, x, (params["decoder"]["blocks"], cross_kv, self_kv)
    )
    x = layer_norm(x, dec["ln"])
    logits = output_logits(x, dec)
    return logits[:, 0], new_kv


def decode_step(
    params, tokens, pos, self_kv, cross_kv, cfg: WhisperConfig, enc_len=None,
    beam: int = 1, row_map=None,
):
    """One incremental decode position.

    tokens: [B, 1] int32 (current input token); pos: scalar int32 position;
    self_kv: [L, 2, B, H, T_max, Dh] (donated; returned updated);
    cross_kv: from precompute_cross_kv.
    ``beam > 1``: tokens/self_kv carry B*K rows while cross_kv (and
    enc_len) stay at B rows — see cross_attend. ``row_map`` [B*K, T]:
    beam-ancestry physical-row table; when given, self-attention reads
    lineage rows in place instead of the caller gathering the cache.
    Returns (logits [B, vocab] float32, new self_kv).
    """
    return _decode_step_impl(
        params, tokens, pos, self_kv, cross_kv, cfg.n_text_head, enc_len,
        beam, row_map,
    )
