"""Mimi neural audio codec (Kyutai) in functional JAX.

Pocket-tts — the model the reference serves via the ``pocket_tts`` package
(reference: src/tts/backends/pocket_tts_backend.py:79-103) — is a Kyutai
delayed-streams LM over **Mimi** codec tokens. This module is the codec half:

  encode:  pcm 24 kHz → SEANet conv encoder (causal, ratios 8·6·5·4 → 25 Hz)
           → 8-layer causal transformer → stride-2 conv downsample (12.5 Hz)
           → split residual VQ (1 semantic + n_q-1 acoustic codebooks)
  decode:  codebook lookups summed → transposed-conv upsample → transformer
           → SEANet conv decoder → pcm

TPU-first choices:
  - everything is expressed as lax convolutions / matmuls (MXU) with static
    shapes; the transformer stacks per-layer params on a leading axis and
    runs as one ``lax.scan`` body;
  - all convolutions are *causal* (matching Mimi's streaming design), which
    makes block-streaming decode exact: we re-decode a bounded token halo
    and emit only the new samples (`MimiStreamingDecoder`) — no conv state
    threading, no approximation, bounded work per block;
  - RVQ nearest-neighbour search is one [B·T, card] matmul per level.

Weight layout matches ``convert.py``'s mapping from the torch checkpoint
(moshi ``MimiModel`` state_dict naming, see tests/pocket_oracle.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.models.pocket.lm import _rope  # shared moshi RoPE
from open_speech_tpu.ops.initutil import jit_init
from open_speech_tpu.ops.vocoder import conv1d, conv_transpose1d

LN_EPS = 1e-5


@dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24_000
    n_filters: int = 64
    dimension: int = 512  # SEANet latent == transformer width
    ratios: tuple[int, ...] = (8, 6, 5, 4)  # decoder order; encoder reversed
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    compress: int = 2
    # bottleneck transformers (encoder + decoder side, same geometry)
    t_layers: int = 8
    t_heads: int = 8
    t_ff: int = 2048
    t_context: int = 250  # causal attention window, in 25 Hz frames
    layer_scale: float = 0.01
    # quantizer
    n_q: int = 8
    card: int = 2048
    q_dim: int = 256
    # conv resample between 25 Hz and the 12.5 Hz token rate
    down_stride: int = 2

    @property
    def seanet_hop(self) -> int:
        h = 1
        for r in self.ratios:
            h *= r
        return h  # 960 → 25 Hz at 24 kHz

    @property
    def samples_per_frame(self) -> int:
        return self.seanet_hop * self.down_stride  # 1920 → 12.5 Hz

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.samples_per_frame

    @property
    def head_dim(self) -> int:
        return self.dimension // self.t_heads


# geometry used by unit tests: tiny but structurally complete
TEST_TINY = MimiConfig(
    n_filters=4,
    dimension=16,
    ratios=(4, 3, 2, 2),
    t_layers=2,
    t_heads=2,
    t_ff=32,
    n_q=4,
    card=32,
    q_dim=8,
)


# ──────────────────────────────────────────────────────────────────────
# causal conv helpers (encodec/mimi padding semantics)
# ──────────────────────────────────────────────────────────────────────


def causal_conv(x, p, stride: int = 1, dilation: int = 1, mode: str = "constant"):
    """Causal Conv1d: left-pad (k-1)·d - (s-1), right-pad to complete frames.

    x: [B, T, C]. Mirrors encodec's StreamingConv1d with causal=True.
    ``mode`` is the pad mode ("constant" zeros; "edge" = torch "replicate",
    which mimi's 25→12.5 Hz downsample uses — transformers
    modeling_mimi.py MimiModel.downsample pad_mode="replicate").
    """
    k = p["w"].shape[0]
    k_eff = (k - 1) * dilation + 1
    pad_total = k_eff - stride
    t = x.shape[1]
    # encodec get_extra_padding_for_conv1d: right-pad so no sample is dropped
    n_frames = -(-(t - k_eff + pad_total) // stride) + 1
    ideal = max((n_frames - 1) * stride + k_eff - pad_total, 0)
    extra = max(ideal - t, 0)
    x = jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)), mode=mode)
    return conv1d(x, p, stride=stride, dilation=dilation, pad=0)


def causal_convtr(x, p, stride: int):
    """Causal ConvTranspose1d: full output, trim (k - s) from the right.

    Depthwise kernels (mimi's 12.5→25 Hz upsample has groups == channels,
    transformers modeling_mimi.py upsample_groups=512) are inferred from the
    weight's in-channel dim.
    """
    k = p["w"].shape[0]
    groups = x.shape[-1] // p["w"].shape[1]
    out = conv_transpose1d(x, p, stride=stride, pad=0, groups=groups)
    trim = k - stride
    return out[:, : out.shape[1] - trim] if trim > 0 else out


# ──────────────────────────────────────────────────────────────────────
# init
# ──────────────────────────────────────────────────────────────────────


def _conv_init(key, k, c_in, c_out, dtype, bias=True):
    p = {"w": jax.random.normal(key, (k, c_in, c_out), dtype) * (k * c_in) ** -0.5}
    if bias:
        p["b"] = jnp.zeros((c_out,), dtype)
    return p


def _res_init(key, ch, k, compress, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "c1": _conv_init(k1, k, ch, ch // compress, dtype),
        "c2": _conv_init(k2, 1, ch // compress, ch, dtype),
    }


def _tlayer_init(key, d, ff, scale, dtype):
    ks = jax.random.split(key, 4)
    return {
        "ln1": {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
        "qkv": {"w": jax.random.normal(ks[0], (d, 3 * d), dtype) * d**-0.5},
        "out": {"w": jax.random.normal(ks[1], (d, d), dtype) * d**-0.5},
        "ls1": jnp.full((d,), scale, jnp.float32),
        "ln2": {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
        "mlp_in": {"w": jax.random.normal(ks[2], (d, ff), dtype) * d**-0.5},
        "mlp_out": {"w": jax.random.normal(ks[3], (ff, d), dtype) * ff**-0.5},
        "ls2": jnp.full((d,), scale, jnp.float32),
    }


@jit_init()
def init_mimi_params(key, cfg: MimiConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 32)
    ki = iter(keys)
    f, d = cfg.n_filters, cfg.dimension
    enc_ratios = tuple(reversed(cfg.ratios))

    enc = {"conv_in": _conv_init(next(ki), cfg.kernel_size, 1, f, dtype)}
    stages = []
    ch = f
    for r in enc_ratios:
        stages.append(
            {
                "res": _res_init(
                    next(ki), ch, cfg.residual_kernel_size, cfg.compress, dtype
                ),
                "down": _conv_init(next(ki), 2 * r, ch, 2 * ch, dtype),
            }
        )
        ch *= 2
    enc["stages"] = stages
    enc["conv_out"] = _conv_init(next(ki), cfg.last_kernel_size, ch, d, dtype)

    dec = {"conv_in": _conv_init(next(ki), cfg.kernel_size, d, ch, dtype)}
    dstages = []
    for r in cfg.ratios:
        dstages.append(
            {
                "up": _conv_init(next(ki), 2 * r, ch, ch // 2, dtype),
                "res": _res_init(
                    next(ki), ch // 2, cfg.residual_kernel_size, cfg.compress, dtype
                ),
            }
        )
        ch //= 2
    dec["stages"] = dstages
    dec["conv_out"] = _conv_init(next(ki), cfg.last_kernel_size, ch, 1, dtype)

    def _stack_layers(key):
        lks = jax.random.split(key, cfg.t_layers)
        return jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_tlayer_init(k, d, cfg.t_ff, cfg.layer_scale, dtype) for k in lks],
        )

    def _rvq_init(key, n_levels):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "in_proj": {"w": jax.random.normal(k1, (d, cfg.q_dim), dtype) * d**-0.5},
            "out_proj": {
                "w": jax.random.normal(k2, (cfg.q_dim, d), dtype) * cfg.q_dim**-0.5
            },
            "codebooks": jax.random.normal(
                k3, (n_levels, cfg.card, cfg.q_dim), dtype
            ),
        }

    return {
        "encoder": enc,
        "enc_t": {"layers": _stack_layers(next(ki))},
        "downsample": _conv_init(
            next(ki), 2 * cfg.down_stride, d, d, dtype, bias=False
        ),
        # upsample is depthwise (groups == channels): [K, 1, D]
        "quantizer": {
            "first": _rvq_init(next(ki), 1),
            "rest": _rvq_init(next(ki), cfg.n_q - 1),
        },
        "upsample": _conv_init(
            next(ki), 2 * cfg.down_stride, 1, d, dtype, bias=False
        ),
        "dec_t": {"layers": _stack_layers(next(ki))},
        "decoder": dec,
    }


# ──────────────────────────────────────────────────────────────────────
# SEANet
# ──────────────────────────────────────────────────────────────────────


def _res_block(x, p):
    h = jax.nn.elu(x)
    h = causal_conv(h, p["c1"], dilation=1)
    h = jax.nn.elu(h)
    h = causal_conv(h, p["c2"])
    return x + h


def seanet_encode(params, cfg: MimiConfig, pcm):
    """pcm [B, T] → latent [B, T/960, D] (25 Hz)."""
    x = pcm[..., None]  # [B, T, 1]
    x = causal_conv(x, params["conv_in"])
    enc_ratios = tuple(reversed(cfg.ratios))
    for stage, r in zip(params["stages"], enc_ratios):
        x = _res_block(x, stage["res"])
        x = jax.nn.elu(x)
        x = causal_conv(x, stage["down"], stride=r)
    x = jax.nn.elu(x)
    return causal_conv(x, params["conv_out"])


def seanet_decode(params, cfg: MimiConfig, latent):
    """latent [B, F25, D] → pcm [B, F25*960]."""
    x = causal_conv(latent, params["conv_in"])
    for stage, r in zip(params["stages"], cfg.ratios):
        x = jax.nn.elu(x)
        x = causal_convtr(x, stage["up"], stride=r)
        x = _res_block(x, stage["res"])
    x = jax.nn.elu(x)
    x = causal_conv(x, params["conv_out"])
    return x[..., 0]


# ──────────────────────────────────────────────────────────────────────
# bottleneck transformer (causal, RoPE, layer-scale)
# ──────────────────────────────────────────────────────────────────────


def _ln(x, p):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    xn = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (xn * p["g"] + p["b"]).astype(x.dtype)


def mimi_transformer(params, cfg: MimiConfig, x):
    """Causal windowed transformer over [B, T, D]."""
    b, t, d = x.shape
    h_heads, hd = cfg.t_heads, cfg.head_dim
    pos = jnp.arange(t)
    i = pos[:, None]
    j = pos[None, :]
    mask = (j <= i) & (i - j < cfg.t_context)  # [T, T]

    def layer(h, p):
        hn = _ln(h, p["ln1"])
        qkv = hn @ p["qkv"]["w"]  # [B, T, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h_heads, hd).transpose(0, 2, 1, 3)
        q, k = _rope(q, k, pos, hd)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        logits = jnp.where(mask[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        att = att.transpose(0, 2, 1, 3).reshape(b, t, d)
        dt = h.dtype  # f32 layer-scales must not promote the carry
        h = h + (p["ls1"] * (att @ p["out"]["w"])).astype(dt)
        hn = _ln(h, p["ln2"])
        mlp = jax.nn.gelu(hn @ p["mlp_in"]["w"], approximate=False) @ p["mlp_out"]["w"]
        h = h + (p["ls2"] * mlp).astype(dt)
        return h, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x


# ──────────────────────────────────────────────────────────────────────
# split residual VQ
# ──────────────────────────────────────────────────────────────────────


def _rvq_encode(p, x, n_levels):
    """x [B, T, D] → codes [B, n_levels, T]."""
    resid = x @ p["in_proj"]["w"]  # [B, T, qdim]

    def level(resid, cb):
        d2 = (
            jnp.sum(resid**2, -1, keepdims=True)
            - 2.0 * resid @ cb.T
            + jnp.sum(cb**2, -1)[None, None, :]
        )
        idx = jnp.argmin(d2, axis=-1)  # [B, T]
        resid = resid - cb[idx]
        return resid, idx

    _, codes = jax.lax.scan(level, resid, p["codebooks"][:n_levels])
    return codes.transpose(1, 0, 2)  # [B, K, T]


def _rvq_decode(p, codes):
    """codes [B, K, T] → latent [B, T, D]."""
    cb = p["codebooks"][: codes.shape[1], None]  # [K, 1, card, q]
    idx = codes.transpose(1, 0, 2)[..., None]  # [K, B, T, 1]
    quant = jnp.take_along_axis(cb, idx, axis=2).sum(axis=0)  # [B, T, q]
    return quant @ p["out_proj"]["w"]


@partial(jax.jit, static_argnames=("cfg",))
def mimi_encode(params, cfg: MimiConfig, pcm):
    """pcm [B, T] (T multiple of samples_per_frame) → tokens [B, n_q, F]."""
    latent = seanet_encode(params["encoder"], cfg, pcm)
    latent = mimi_transformer(params["enc_t"], cfg, latent)
    latent = causal_conv(
        latent, params["downsample"], stride=cfg.down_stride, mode="edge"
    )
    sem = _rvq_encode(params["quantizer"]["first"], latent, 1)
    aco = _rvq_encode(params["quantizer"]["rest"], latent, cfg.n_q - 1)
    return jnp.concatenate([sem, aco], axis=1)


@partial(jax.jit, static_argnames=("cfg",))
def mimi_decode(params, cfg: MimiConfig, tokens):
    """tokens [B, n_q, F] → pcm [B, F*samples_per_frame]."""
    latent = _rvq_decode(params["quantizer"]["first"], tokens[:, :1])
    latent = latent + _rvq_decode(params["quantizer"]["rest"], tokens[:, 1:])
    latent = causal_convtr(latent, params["upsample"], stride=cfg.down_stride)
    latent = mimi_transformer(params["dec_t"], cfg, latent)
    return seanet_decode(params["decoder"], cfg, latent)


# ──────────────────────────────────────────────────────────────────────
# streaming decode — O(block) stateful step
# ──────────────────────────────────────────────────────────────────────
#
# Every op in the decode path is causal, so the stream threads *state*
# instead of re-decoding a history halo (the previous design re-ran a
# ~150-frame window per 2-frame emit — ~75× redundant codec FLOPs at the
# real geometry):
#   - each causal conv keeps its last (k-1)·d inputs;
#   - each transposed conv keeps a (k - stride) overlap-add tail;
#   - the bottleneck transformer keeps a (t_context - 1)-position rotated
#     K/V window per layer plus the absolute position counter.
# A zero-initialised state is exactly the zero left-padding of the full
# decode, so streamed samples equal mimi_decode up to fp reassociation.


def _sconv(x, p, state, dilation: int = 1):
    """Streaming causal conv (stride 1): state = last (k-1)·d inputs."""
    w = state.shape[1]
    xc = jnp.concatenate([state.astype(x.dtype), x], axis=1)
    y = conv1d(xc, p, dilation=dilation, pad=0)
    return y, xc[:, xc.shape[1] - w :] if w else state


def _sconvtr(x, p, stride: int, carry):
    """Streaming causal ConvTranspose1d: emit T·stride, carry k-stride tail.

    The carry is the bias-free tail of the previous block's full (untrimmed)
    output; overlap-adding it reproduces the single full-sequence transposed
    conv, and the causal right-trim (k - stride) is exactly "never emit the
    final carry".
    """
    k = p["w"].shape[0]
    groups = x.shape[-1] // p["w"].shape[1]
    full = conv_transpose1d(x, {"w": p["w"]}, stride=stride, pad=0, groups=groups)
    t_out = x.shape[1] * stride
    y = full[:, :t_out]
    if k > stride:
        y = y.at[:, : k - stride].add(carry.astype(y.dtype))
    new_carry = full[:, t_out:]
    if "b" in p:
        y = y + p["b"]
    return y, new_carry


def _stream_transformer(params, cfg: MimiConfig, x, tstate):
    """Windowed-causal transformer over new positions with a K/V window.

    x [B, t, D]; tstate {"k"/"v": [L, B, H, W_h, hd], "pos": scalar or
    [B]}. Keys are stored rotated (RoPE is absolute-position on both
    sides, exactly as the full pass computes it), and the mask re-derives
    absolute positions from the counter so pre-start zero slots never
    attend. Per-row ``pos`` lets a slot pool stream rows at different
    phases (fresh rows join mid-batch with pos 0) through one program.
    """
    b, t, d = x.shape
    nh, hd = cfg.t_heads, cfg.head_dim
    w_h = cfg.t_context - 1
    pos0 = jnp.broadcast_to(jnp.asarray(tstate["pos"], jnp.int32), (b,))
    q_pos = pos0[:, None] + jnp.arange(t)  # [B, t]
    k_pos = pos0[:, None] - w_h + jnp.arange(w_h + t)  # [B, W_h+t]
    rel = q_pos[:, :, None] - k_pos[:, None, :]
    mask = (rel >= 0) & (rel < cfg.t_context) & (k_pos[:, None, :] >= 0)

    def layer(h, inp):
        p, kh, vh = inp
        hn = _ln(h, p["ln1"])
        q, k, v = jnp.split(hn @ p["qkv"]["w"], 3, axis=-1)
        q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        q, k = _rope(q, k, q_pos, hd)
        kc = jnp.concatenate([kh.astype(k.dtype), k], axis=2)
        vc = jnp.concatenate([vh.astype(v.dtype), v], axis=2)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, kc, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        logits = jnp.where(mask[:, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(vc.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs, vc)
        att = att.transpose(0, 2, 1, 3).reshape(b, t, d)
        dt = h.dtype  # f32 layer-scales must not promote the carry
        h = h + (p["ls1"] * (att @ p["out"]["w"])).astype(dt)
        hn = _ln(h, p["ln2"])
        mlp = jax.nn.gelu(hn @ p["mlp_in"]["w"], approximate=False) @ p["mlp_out"]["w"]
        h = h + (p["ls2"] * mlp).astype(dt)
        return h, (kc[:, :, -w_h:] if w_h else kh, vc[:, :, -w_h:] if w_h else vh)

    x, (k_new, v_new) = jax.lax.scan(
        layer, x, (params["layers"], tstate["k"], tstate["v"])
    )
    return x, {"k": k_new, "v": v_new, "pos": pos0 + t}

def select_mimi_stream_rows(mask, on_true, on_false):
    """Per-row where() over two decode-stream states. mask: [B] bool.

    The state pytree carries its batch dimension at axis 0 everywhere
    except the stacked transformer K/V windows (axis 1), so a plain
    tree_map(where) can't do this — this walks the known structure.
    """
    def w0(a, b):  # batch at axis 0
        m = mask.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)

    def w1(a, b):  # batch at axis 1 (stacked transformer K/V windows)
        m = mask.reshape((1, -1) + (1,) * (a.ndim - 2))
        return jnp.where(m, a, b)

    ta, tb = on_true["t"], on_false["t"]
    batch = on_true["conv_in"].shape[0]

    def pos_vec(t):
        return jnp.broadcast_to(jnp.asarray(t["pos"], jnp.int32), (batch,))

    return {
        "up_carry": w0(on_true["up_carry"], on_false["up_carry"]),
        "t": {
            "k": w1(ta["k"], tb["k"]),
            "v": w1(ta["v"], tb["v"]),
            "pos": jnp.where(mask, pos_vec(ta), pos_vec(tb)),
        },
        "conv_in": w0(on_true["conv_in"], on_false["conv_in"]),
        "stages": [
            {"up": w0(sa["up"], sb["up"]), "c1": w0(sa["c1"], sb["c1"])}
            for sa, sb in zip(on_true["stages"], on_false["stages"])
        ],
        "conv_out": w0(on_true["conv_out"], on_false["conv_out"]),
    }


def zero_mimi_stream_rows(state, mask):
    """Reset the rows where ``mask`` is True to a fresh stream.

    A zeroed row is exactly a fresh stream (zero state ≡ the full
    decode's zero left-padding), so a slot pool can recycle one row of a
    batched stream without touching its neighbours. mask: [B] bool.
    """
    zeros = jax.tree.map(jnp.zeros_like, state)
    zeros["t"]["pos"] = jnp.zeros(
        (state["conv_in"].shape[0],), jnp.int32
    )
    return select_mimi_stream_rows(mask, zeros, state)


def init_mimi_stream_state(params, cfg: MimiConfig, batch: int = 1):
    """Zero decode-stream state (≡ the full decode's zero left-padding)."""
    dt = params["decoder"]["conv_in"]["w"].dtype

    def conv_state(p, dilation=1):
        k = p["w"].shape[0]
        c_in = p["w"].shape[1]
        return jnp.zeros((batch, (k - 1) * dilation, c_in), dt)

    def tr_carry(p, stride):
        # dense [K, Cin, Cout] and depthwise [K, 1, C] both put the output
        # channel count last
        k = p["w"].shape[0]
        return jnp.zeros((batch, max(k - stride, 0), p["w"].shape[2]), dt)

    dp = params["decoder"]
    stages = [
        {
            "up": tr_carry(stage["up"], r),
            "c1": conv_state(stage["res"]["c1"]),
        }
        for stage, r in zip(dp["stages"], cfg.ratios)
    ]
    w_h = cfg.t_context - 1
    kv_shape = (cfg.t_layers, batch, cfg.t_heads, w_h, cfg.head_dim)
    return {
        "up_carry": tr_carry(params["upsample"], cfg.down_stride),
        # distinct buffers: callers may donate the whole state to a step
        "t": {
            "k": jnp.zeros(kv_shape, dt),
            "v": jnp.zeros(kv_shape, dt),
            "pos": jnp.zeros((batch,), jnp.int32),
        },
        "conv_in": conv_state(dp["conv_in"]),
        "stages": stages,
        "conv_out": conv_state(dp["conv_out"]),
    }


@partial(jax.jit, static_argnames=("cfg",))
def mimi_decode_step(params, cfg: MimiConfig, tokens, state):
    """tokens [B, n_q, m] → (pcm [B, m·samples_per_frame], new state).

    One compiled program per block size m; work is O(m), independent of
    how much audio the stream has already produced.
    """
    latent = _rvq_decode(params["quantizer"]["first"], tokens[:, :1])
    latent = latent + _rvq_decode(params["quantizer"]["rest"], tokens[:, 1:])
    x, up_carry = _sconvtr(
        latent, params["upsample"], cfg.down_stride, state["up_carry"]
    )
    x, tstate = _stream_transformer(params["dec_t"], cfg, x, state["t"])

    dp = params["decoder"]
    x, s_in = _sconv(x, dp["conv_in"], state["conv_in"])
    new_stages = []
    for stage, st, r in zip(dp["stages"], state["stages"], cfg.ratios):
        x = jax.nn.elu(x)
        x, up_c = _sconvtr(x, stage["up"], r, st["up"])
        h = jax.nn.elu(x)
        h, c1_s = _sconv(h, stage["res"]["c1"], st["c1"])
        h = jax.nn.elu(h)
        h = conv1d(h, stage["res"]["c2"], pad=0)  # k=1: stateless
        x = x + h
        new_stages.append({"up": up_c, "c1": c1_s})
    x = jax.nn.elu(x)
    x, s_out = _sconv(x, dp["conv_out"], state["conv_out"])
    new_state = {
        "up_carry": up_carry,
        "t": tstate,
        "conv_in": s_in,
        "stages": new_stages,
        "conv_out": s_out,
    }
    return x[..., 0], new_state


class MimiStreamingDecoder:
    """Block-streaming Mimi decode via the stateful O(block) step.

    ``feed`` splits incoming frames into ``block_frames`` chunks so steady
    streaming runs ONE compiled XLA program (a trailing partial chunk
    compiles its own size once); per-block work no longer depends on the
    stream's history, unlike the previous halo re-decode design.
    """

    def __init__(
        self,
        params,
        cfg: MimiConfig,
        block_frames: int = 8,
        batch: int = 1,
    ):
        self.params = params
        self.cfg = cfg
        self.block = block_frames
        self._batch = batch
        self._state = None

    def reset(self) -> None:
        self._state = None

    def feed(self, tokens: np.ndarray) -> np.ndarray:
        """tokens [B, n_q, F_new] → pcm [B, F_new*samples_per_frame]."""
        tokens = np.asarray(tokens, np.int32)
        if self._state is None:
            self._state = init_mimi_stream_state(
                self.params, self.cfg, batch=tokens.shape[0]
            )
        outs = []
        for i in range(0, tokens.shape[2], self.block):
            chunk = jnp.asarray(tokens[:, :, i : i + self.block])
            pcm, self._state = mimi_decode_step(
                self.params, self.cfg, chunk, self._state
            )
            # wire contract is f32 PCM regardless of the model's compute
            # dtype (a bf16 model must not leak bf16 samples downstream)
            outs.append(np.asarray(pcm, np.float32))
        return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=1)
