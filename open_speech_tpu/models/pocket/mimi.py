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
        h = h + p["ls1"] * (att @ p["out"]["w"])
        hn = _ln(h, p["ln2"])
        mlp = jax.nn.gelu(hn @ p["mlp_in"]["w"], approximate=False) @ p["mlp_out"]["w"]
        h = h + p["ls2"] * mlp
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
# streaming decode
# ──────────────────────────────────────────────────────────────────────


class MimiStreamingDecoder:
    """Block-streaming Mimi decode with an exact causal halo.

    Every op in the decode path is causal with a bounded receptive field
    (convs) or an explicit context window (transformer), so decoding the
    last ``halo + new`` tokens and keeping only the new samples reproduces
    the full-sequence decode bit-exactly once the history exceeds the halo.

    The decode window has a FIXED shape ``[B, n_q, halo + block]``: the
    valid prefix is the halo of history plus the new frames, and the tail
    is right-padded with token 0 — causality guarantees padded future
    tokens cannot affect the emitted samples, so the whole stream runs as
    ONE compiled XLA program (no shape-churn recompiles), constant work
    per block regardless of utterance length.
    """

    def __init__(
        self,
        params,
        cfg: MimiConfig,
        halo_frames: int | None = None,
        block_frames: int = 8,
    ):
        self.params = params
        self.cfg = cfg
        # the transformer attends t_context positions at the 25 Hz rate =
        # t_context // down_stride TOKEN frames; conv receptive fields add
        # a small margin. The halo must cover the full attention window or
        # streamed samples diverge from mimi_decode past the halo (review
        # finding: an old 64-frame cap broke bit-exactness after ~5 s).
        conv_halo = 4 + cfg.kernel_size + 4 * cfg.residual_kernel_size
        self.halo = (
            halo_frames
            if halo_frames is not None
            else cfg.t_context // cfg.down_stride + conv_halo
        )
        self.block = block_frames
        self._hist: np.ndarray | None = None  # [B, K, <=halo] history

    def reset(self) -> None:
        self._hist = None

    def _decode_block(self, new: np.ndarray) -> np.ndarray:
        """new [B, K, m<=block] → pcm [B, m*spf]; fixed-shape program."""
        b, k, m = new.shape
        hist = (
            self._hist
            if self._hist is not None
            else np.zeros((b, k, 0), np.int32)
        )
        h = hist.shape[2]
        width = self.halo + self.block
        window = np.zeros((b, k, width), np.int32)
        window[:, :, :h] = hist
        window[:, :, h : h + m] = new
        pcm = np.asarray(mimi_decode(self.params, self.cfg, jnp.asarray(window)))
        spf = self.cfg.samples_per_frame
        out = pcm[:, h * spf : (h + m) * spf]
        merged = np.concatenate([hist, new], axis=2)
        self._hist = merged[:, :, max(0, merged.shape[2] - self.halo):]
        return out

    def feed(self, tokens: np.ndarray) -> np.ndarray:
        """tokens [B, n_q, F_new] → pcm [B, F_new*samples_per_frame]."""
        tokens = np.asarray(tokens, np.int32)
        outs = [
            self._decode_block(tokens[:, :, i : i + self.block])
            for i in range(0, tokens.shape[2], self.block)
        ]
        return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=1)
