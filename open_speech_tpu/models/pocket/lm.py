"""Pocket-TTS language model: delayed-streams transformer over Mimi tokens.

The generator half of Kyutai pocket-tts (reference backend:
src/tts/backends/pocket_tts_backend.py — ``TTSModel.generate_audio_stream``).
Architecture follows the moshi/kyutai-TTS LMModel family:

  - a **temporal transformer** (RMSNorm, RoPE, SiLU-gated MLP, causal)
    consumes, per 12.5 Hz step, the sum of one text-token embedding and one
    embedding per audio codebook;
  - a **depth transformer** ("depformer") with *per-stage* attention/MLP
    weights predicts the K codebooks of the next frame sequentially, each
    stage conditioned on the temporal hidden plus the previous codebook's
    token embedding;
  - streams are **delayed**: acoustic codebooks lag the semantic codebook by
    ``acoustic_delay`` steps, so frame t's token for stream k is decided at
    step t + delay[k];
  - voice cloning = an audio-token prompt prefix teacher-forced through the
    temporal stack to warm its KV caches (the reference's
    ``get_state_for_audio_prompt``, pocket_tts_backend.py:127-134).

TPU-first: per-layer weights stack on a leading axis (one scanned block
body), the decode step is a single jitted program over static-size KV
caches with a dynamic write index, and sampling happens on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.attention import decode_attention
from open_speech_tpu.ops.initutil import jit_init

# moshi-family RMSNorm epsilon (transformers MoshiConfig rms_norm_eps=1e-8)
RMS_EPS = 1e-8


@dataclass(frozen=True)
class PocketLMConfig:
    # temporal transformer
    d_model: int = 1024
    n_heads: int = 16
    n_layers: int = 16
    ff: int = 4096  # gated-SiLU hidden = 2*ff//3
    # depth transformer (per-stage weights)
    dep_d_model: int = 256
    dep_heads: int = 8
    dep_layers: int = 4
    dep_ff: int = 1024
    # token spaces
    n_q: int = 8
    card: int = 2048
    text_card: int = 4000
    acoustic_delay: int = 2
    max_ctx: int = 1536  # KV-cache capacity in steps
    # text special-token ids. Random-init / oracle models use 0/1/2; a real
    # kyutai checkpoint indexes text_emb by native sentencepiece ids, whose
    # pad id comes from the release's config.json (existing_text_padding_id,
    # sentencepiece convention pad=3, bos=1, eos=2) — convert.load_checkpoint
    # overrides these so conditioning rows line up with the trained table.
    text_pad_id: int = 0
    text_bos_id: int = 1
    text_eos_id: int = 2

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def hidden(self) -> int:
        return 2 * self.ff // 3

    @property
    def dep_hidden(self) -> int:
        return 2 * self.dep_ff // 3

    @property
    def audio_initial(self) -> int:
        """Embedding row for 'not generated yet' (moshi initial token)."""
        return self.card

    @property
    def text_initial(self) -> int:
        return self.text_card

    @property
    def delays(self) -> tuple[int, ...]:
        return (0,) + (self.acoustic_delay,) * (self.n_q - 1)

    @property
    def max_delay(self) -> int:
        return max(self.delays)


TEST_TINY_LM = PocketLMConfig(
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
    max_ctx=128,
)


# ──────────────────────────────────────────────────────────────────────
# init
# ──────────────────────────────────────────────────────────────────────


def _rms_init(d):
    return {"a": jnp.ones((d,), jnp.float32)}


def _tlayer_init(key, d, hidden, dtype):
    ks = jax.random.split(key, 4)
    return {
        "ln1": _rms_init(d),
        "qkv": {"w": jax.random.normal(ks[0], (d, 3 * d), dtype) * d**-0.5},
        "out": {"w": jax.random.normal(ks[1], (d, d), dtype) * d**-0.5},
        "ln2": _rms_init(d),
        "gate_in": {"w": jax.random.normal(ks[2], (d, 2 * hidden), dtype) * d**-0.5},
        "gate_out": {
            "w": jax.random.normal(ks[3], (hidden, d), dtype) * hidden**-0.5
        },
    }


def _dep_layer_init(key, cfg: PocketLMConfig, dtype):
    """Depth layer: attention/MLP weights carry a leading [n_q] stage axis."""
    d, hidden, k_q = cfg.dep_d_model, cfg.dep_hidden, cfg.n_q
    ks = jax.random.split(key, 4)
    return {
        "ln1": _rms_init(d),
        "qkv": {
            "w": jax.random.normal(ks[0], (k_q, d, 3 * d), dtype) * d**-0.5
        },
        "out": {"w": jax.random.normal(ks[1], (k_q, d, d), dtype) * d**-0.5},
        "ln2": _rms_init(d),
        "gate_in": {
            "w": jax.random.normal(ks[2], (k_q, d, 2 * hidden), dtype) * d**-0.5
        },
        "gate_out": {
            "w": jax.random.normal(ks[3], (k_q, hidden, d), dtype) * hidden**-0.5
        },
    }


@jit_init()
def init_pocket_lm_params(key, cfg: PocketLMConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    d, dd = cfg.d_model, cfg.dep_d_model

    lks = jax.random.split(ks[0], cfg.n_layers)
    layers = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_tlayer_init(k, d, cfg.hidden, dtype) for k in lks],
    )
    dks = jax.random.split(ks[1], cfg.dep_layers)
    dep_layers = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_dep_layer_init(k, cfg, dtype) for k in dks],
    )
    return {
        "text_emb": jax.random.normal(ks[2], (cfg.text_card + 1, d), dtype) * 0.02,
        "emb": jax.random.normal(ks[3], (cfg.n_q, cfg.card + 1, d), dtype) * 0.02,
        "layers": layers,
        "out_norm": _rms_init(d),
        "text_linear": {
            "w": jax.random.normal(ks[4], (d, cfg.text_card), dtype) * d**-0.5
        },
        "dep_in": jax.random.normal(ks[5], (cfg.n_q, d, dd), dtype) * d**-0.5,
        "dep_text_emb": jax.random.normal(ks[6], (cfg.text_card + 1, dd), dtype)
        * 0.02,
        "dep_emb": jax.random.normal(ks[7], (cfg.n_q - 1, cfg.card + 1, dd), dtype)
        * 0.02,
        "dep_layers": dep_layers,
        "linears": jax.random.normal(ks[8], (cfg.n_q, dd, cfg.card), dtype)
        * dd**-0.5,
    }


# ──────────────────────────────────────────────────────────────────────
# shared pieces
# ──────────────────────────────────────────────────────────────────────


def _rms(x, p):
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + RMS_EPS)
    return (x32 * scale * p["a"]).astype(x.dtype)


def _rope(q, k, positions, head_dim):
    """Interleaved-pair RoPE.

    positions is either [T] (shared across the batch — prefill) or
    [B, T] (per-example step positions — batched decode); the angle
    table is aligned to q/k's [B, H, T, D] layout in both cases.
    """
    half = head_dim // 2
    freqs = 10000.0 ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = positions[..., None].astype(jnp.float32) * freqs  # [..., T, half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    if ang.ndim == 2:  # [T, half] -> [1, 1, T, half]
        cos, sin = cos[None, None], sin[None, None]
    else:  # [B, T, half] -> [B, 1, T, half] (broadcast over heads)
        cos, sin = cos[:, None], sin[:, None]

    def rot(x):  # [B, H, T, D] — rotate in f32, return in x's dtype (a
        # bf16 model must not silently promote K against its bf16 cache)
        xr = x.reshape(*x.shape[:-1], half, 2)
        x0, x1 = xr[..., 0], xr[..., 1]
        return jnp.stack(
            [x0 * cos - x1 * sin, x0 * sin + x1 * cos], -1
        ).reshape(x.shape).astype(x.dtype)

    return rot(q), rot(k)


def _gated_mlp(x, p):
    h = x @ p["gate_in"]["w"]
    a, b = jnp.split(h, 2, axis=-1)
    return (jax.nn.silu(a) * b) @ p["gate_out"]["w"]


def embed_step(params, cfg: PocketLMConfig, text_tok, audio_toks):
    """Input embedding: text [B] + per-codebook audio [B, n_q] → [B, D]."""
    x = params["text_emb"][text_tok]
    per_cb = jnp.take_along_axis(
        params["emb"], audio_toks.T[:, :, None], axis=1
    )  # [n_q, B, D]
    return x + per_cb.sum(axis=0)


# ──────────────────────────────────────────────────────────────────────
# temporal transformer
# ──────────────────────────────────────────────────────────────────────


def init_caches(cfg: PocketLMConfig, batch: int, dtype=jnp.float32):
    shape = (cfg.n_layers, batch, cfg.n_heads, cfg.max_ctx, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def temporal_prefill(params, cfg: PocketLMConfig, x, caches, start, length=None):
    """Causal forward over a segment, appending to existing KV caches.

    x [B, T, D]; caches (k, v) each [L, B, H, max_ctx, Dh]; start: scalar
    or per-row [B] int32 — row b's segment occupies global positions
    [start_b, start_b+T). Queries attend to everything already in the
    cache plus the causal prefix of the segment. Returns
    (hidden [B, T, D], updated caches).

    ``length`` (scalar or [B] int32, default T) marks the segment's
    *valid* prefix so callers can pad T to a shape bucket: keys past
    start+length are masked out and the cache is restored there
    afterwards, making padded and exact prefills produce identical caches
    (recompile-free serving). A row with length 0 keeps its cache
    entirely untouched — the pool batcher prefills only joining rows of
    a live slot pool this way.
    """
    b, t, d = x.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    start_v = jnp.broadcast_to(jnp.asarray(start, jnp.int32), (b,))
    positions = start_v[:, None] + jnp.arange(t)  # [B, T]
    gi = positions[:, :, None]  # global query positions [B, T, 1]
    gj = jnp.arange(cfg.max_ctx)[None, None, :]  # global key positions
    mask = gj <= gi  # positions >= start+t are zero-filled but masked out
    if length is not None:
        length_v = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (b,))
        mask = mask & (gj < (start_v + length_v)[:, None, None])

    insert = jax.vmap(
        lambda cache, new, s: jax.lax.dynamic_update_slice(
            cache, new.astype(cache.dtype), (0, s, 0)
        )
    )

    def layer(h, inp):
        p, kc, vc = inp
        hn = _rms(h, p["ln1"])
        q, k, v = jnp.split(hn @ p["qkv"]["w"], 3, axis=-1)
        q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        q, k = _rope(q, k, positions, hd)
        kc = insert(kc, k, start_v)
        vc = insert(vc, v, start_v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, kc, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        logits = jnp.where(mask[:, None], logits, -1e30)
        probs = jax.nn.softmax(logits, -1).astype(v.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs, vc)
        att = att.transpose(0, 2, 1, 3).reshape(b, t, d)
        h = h + att @ p["out"]["w"]
        h = h + _gated_mlp(_rms(h, p["ln2"]), p)
        return h, (kc, vc)

    h, (k_new, v_new) = jax.lax.scan(
        layer, x, (params["layers"], *caches)
    )
    if length is not None:
        # restore cache beyond the valid prefix so padded-bucket prefills
        # leave exactly the same state as exact-shape ones (and length-0
        # rows keep their cache verbatim)
        keep = (
            jnp.arange(cfg.max_ctx)[None, :] < (start_v + length_v)[:, None]
        )[None, :, None, :, None]
        k_new = jnp.where(keep, k_new, caches[0])
        v_new = jnp.where(keep, v_new, caches[1])
    return h, (k_new, v_new)


def temporal_step(params, cfg: PocketLMConfig, x, caches, pos):
    """One decode step. x [B, D], pos [B] int32 → (hidden [B, D], caches)."""
    b, d = x.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    k_cache, v_cache = caches

    def layer(h, inp):
        p, kc, vc = inp
        hn = _rms(h, p["ln1"])
        q, k, v = jnp.split(hn @ p["qkv"]["w"], 3, axis=-1)
        q = q.reshape(b, 1, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, 1, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, 1, nh, hd).transpose(0, 2, 1, 3)
        q, k = _rope(q, k, pos[:, None], hd)
        kc = jax.vmap(
            lambda c, kk, i: jax.lax.dynamic_update_slice(c, kk, (0, i, 0))
        )(kc, k, pos)
        vc = jax.vmap(
            lambda c, vv, i: jax.lax.dynamic_update_slice(c, vv, (0, i, 0))
        )(vc, v, pos)
        att = decode_attention(q, kc, vc, pos + 1)
        att = att.transpose(0, 2, 1, 3).reshape(b, d)
        h = h + att @ p["out"]["w"]
        h = h + _gated_mlp(_rms(h, p["ln2"]), p)
        return h, (kc, vc)

    h, (k_new, v_new) = jax.lax.scan(
        layer, x, (params["layers"], k_cache, v_cache)
    )
    return h, (k_new, v_new)


# ──────────────────────────────────────────────────────────────────────
# depth transformer
# ──────────────────────────────────────────────────────────────────────


def _dep_stage_inputs(params, cfg: PocketLMConfig, h, text_tok, audio_toks):
    """Stage inputs [B, n_q, Dd]: dep_in_s(h) + prev-token embedding."""
    proj = jnp.einsum("bd,kde->kbe", h, params["dep_in"])  # [n_q, B, Dd]
    prev0 = params["dep_text_emb"][text_tok]  # [B, Dd]
    prev_rest = jnp.take_along_axis(
        params["dep_emb"], audio_toks[:, : cfg.n_q - 1].T[:, :, None], axis=1
    )  # [n_q-1, B, Dd]
    prev = jnp.concatenate([prev0[None], prev_rest], axis=0)
    return (proj + prev).transpose(1, 0, 2)  # [B, n_q, Dd]


def depformer_forward(params, cfg: PocketLMConfig, h, text_tok, audio_toks):
    """Teacher-forced depth pass → logits [B, n_q, card].

    h: temporal hidden [B, D]; text_tok [B]; audio_toks [B, n_q] are the
    *target-frame* tokens (stage s sees tokens < s).
    """
    b = h.shape[0]
    nh, hd = cfg.dep_heads, cfg.dep_d_model // cfg.dep_heads
    x = _dep_stage_inputs(params, cfg, h, text_tok, audio_toks)  # [B, K, Dd]
    s = jnp.arange(cfg.n_q)
    mask = s[None, :] <= s[:, None]

    def layer(xx, p):
        hn = _rms(xx, p["ln1"])
        qkv = jnp.einsum("bkd,kde->bke", hn, p["qkv"]["w"])  # per-stage weights
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, cfg.n_q, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, cfg.n_q, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, cfg.n_q, nh, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        logits = jnp.where(mask[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, -1).astype(v.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        att = att.transpose(0, 2, 1, 3).reshape(b, cfg.n_q, cfg.dep_d_model)
        xx = xx + jnp.einsum("bkd,kde->bke", att, p["out"]["w"])
        hn = _rms(xx, p["ln2"])
        gi = jnp.einsum("bkd,kde->bke", hn, p["gate_in"]["w"])
        a_g, b_g = jnp.split(gi, 2, axis=-1)
        xx = xx + jnp.einsum(
            "bkh,khd->bkd", jax.nn.silu(a_g) * b_g, p["gate_out"]["w"]
        )
        return xx, None

    x, _ = jax.lax.scan(layer, x, params["dep_layers"])
    return jnp.einsum("bkd,kdc->bkc", x, params["linears"])


def depformer_sample(params, cfg: PocketLMConfig, h, text_tok, key, temp):
    """Autoregressive depth sampling → tokens [B, n_q].

    Incremental over the K stages with per-layer stage K/V caches: each
    stage runs ONE single-position layer pass (O(K) total depth work per
    generated frame) rather than re-running the full K-stage
    depformer_forward per stage (O(K²)) — this sits inside the per-frame
    generation hot loop. temp <= 0 → argmax.
    """
    b = h.shape[0]
    nh, hd = cfg.dep_heads, cfg.dep_d_model // cfg.dep_heads
    wq = params["dep_layers"]["qkv"]["w"]  # [L, K, Dd, 3Dd]
    n_layers = wq.shape[0]
    dt = wq.dtype
    toks = jnp.full((b, cfg.n_q), cfg.audio_initial, jnp.int32)
    kc0 = jnp.zeros((n_layers, b, nh, cfg.n_q, hd), dt)
    vc0 = jnp.zeros((n_layers, b, nh, cfg.n_q, hd), dt)
    proj = jnp.einsum("bd,kde->kbe", h, params["dep_in"])  # [K, B, Dd]

    def stage(s, carry):
        toks, key, kc, vc = carry
        sp = jnp.maximum(s - 1, 0)
        prev = jnp.where(
            s == 0,
            params["dep_text_emb"][text_tok],
            params["dep_emb"][sp, toks[:, sp]],
        )
        x = proj[s] + prev  # [B, Dd]
        att_mask = jnp.arange(cfg.n_q) <= s  # stages 0..s are live

        def layer(xx, inp):
            p, kcl, vcl = inp
            hn = _rms(xx, p["ln1"])
            qkv = hn @ p["qkv"]["w"][s]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, nh, hd)
            kcl = kcl.at[:, :, s].set(k.reshape(b, nh, hd).astype(kcl.dtype))
            vcl = vcl.at[:, :, s].set(v.reshape(b, nh, hd).astype(vcl.dtype))
            logits = jnp.einsum(
                "bhd,bhkd->bhk", q, kcl, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            logits = jnp.where(att_mask[None, None], logits, -1e30)
            probs = jax.nn.softmax(logits, -1).astype(vcl.dtype)
            att = jnp.einsum("bhk,bhkd->bhd", probs, vcl)
            att = att.reshape(b, cfg.dep_d_model).astype(xx.dtype)
            xx = xx + att @ p["out"]["w"][s]
            hn = _rms(xx, p["ln2"])
            a_g, b_g = jnp.split(hn @ p["gate_in"]["w"][s], 2, axis=-1)
            xx = xx + (jax.nn.silu(a_g) * b_g) @ p["gate_out"]["w"][s]
            return xx, (kcl, vcl)

        x, (kc, vc) = jax.lax.scan(
            layer, x, (params["dep_layers"], kc, vc)
        )
        logits = x @ params["linears"][s]
        key, sub = jax.random.split(key)
        greedy = jnp.argmax(logits, -1).astype(jnp.int32)
        sampled = jax.random.categorical(sub, logits / jnp.maximum(temp, 1e-6))
        tok = jnp.where(temp > 0, sampled.astype(jnp.int32), greedy)
        toks = toks.at[:, s].set(tok)
        return toks, key, kc, vc

    toks, _, _, _ = jax.lax.fori_loop(
        0, cfg.n_q, stage, (toks, key, kc0, vc0)
    )
    return toks


# ──────────────────────────────────────────────────────────────────────
# full-sequence forward (teacher forcing / prompt ingestion / parity)
# ──────────────────────────────────────────────────────────────────────


@partial(jax.jit, static_argnames=("cfg",))
def lm_forward(params, cfg: PocketLMConfig, text_tokens, audio_tokens):
    """Teacher-forced forward over T steps.

    text_tokens [B, T] int32; audio_tokens [B, n_q, T] *delayed-timeline*
    input tokens (row k at step t = frame token t - delay[k], initial-padded).
    Returns (text_logits [B, T, text_card], audio_logits [B, T, n_q, card],
    caches) — audio_logits[:, t] are the depformer outputs conditioned on the
    *next* step's target prefix, matching the torch oracle.
    """
    b, t = text_tokens.shape
    per_cb = jnp.take_along_axis(
        params["emb"][:, None], audio_tokens.transpose(1, 0, 2)[..., None], axis=2
    )  # [n_q, B, T, D]
    x = params["text_emb"][text_tokens] + per_cb.sum(axis=0)
    caches0 = init_caches(cfg, b, params["text_emb"].dtype)
    h, caches = temporal_prefill(params, cfg, x, caches0, 0)
    hn = _rms(h, params["out_norm"])
    text_logits = hn @ params["text_linear"]["w"]

    # depformer teacher-forced at every step against the next input tokens
    nxt_text = jnp.concatenate(
        [text_tokens[:, 1:], jnp.full((b, 1), cfg.text_initial, jnp.int32)], 1
    )
    nxt_audio = jnp.concatenate(
        [
            audio_tokens[:, :, 1:],
            jnp.full((b, cfg.n_q, 1), cfg.audio_initial, jnp.int32),
        ],
        2,
    )
    flat_h = hn.reshape(b * t, -1)
    dep_logits = depformer_forward(
        params,
        cfg,
        flat_h,
        nxt_text.reshape(-1),
        nxt_audio.transpose(0, 2, 1).reshape(b * t, cfg.n_q),
    )
    return text_logits, dep_logits.reshape(b, t, cfg.n_q, cfg.card), caches
