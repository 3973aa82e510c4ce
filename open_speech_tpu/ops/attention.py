"""Attention kernels: Pallas flash attention + KV-cache decode attention.

Replaces the attention inside CTranslate2's C++/CUDA Whisper engine
(reference: src/backends/faster_whisper.py:245 delegates to WhisperModel,
whose encoder/decoder attention runs in CT2). Here:

  - ``flash_attention``: tiled online-softmax attention as a Pallas TPU
    kernel. Grid is (batch, heads, q_blocks, kv_blocks) with the kv axis
    innermost and "arbitrary" (sequential), so the running max/denominator/
    accumulator live in VMEM scratch across kv steps and the output block is
    written once on the final step. Q/K/V blocks stream HBM->VMEM via
    BlockSpecs; matmuls hit the MXU in the requested dtype with f32
    accumulation.
  - ``decode_attention``: single-position attention against a device-resident
    KV cache with explicit length masking — the hot op of incremental
    decoding. Shapes are static (cache padded to a bucket); the valid length
    arrives as data, never as a Python value, so batched decode steps reuse
    one compiled program.

On non-TPU backends both fall back to a jnp reference implementation (same
math, XLA-fused) so the full test suite runs on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

NEG_INF = -1e30


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ──────────────────────────────────────────────────────────────────────
# Reference implementation (CPU path + golden tests)
# ──────────────────────────────────────────────────────────────────────


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_length: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Plain attention. q,k,v: [B, H, T, D]; kv_length: [B] valid kv lengths."""
    d = q.shape[-1]
    scale = (d**-0.5) if scale is None else scale
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    t_q, t_k = q.shape[-2], k.shape[-2]
    if causal:
        # align the end of q to the end of k (standard decode alignment)
        offs = t_k - t_q
        qi = jnp.arange(t_q)[:, None]
        ki = jnp.arange(t_k)[None, :]
        logits = jnp.where(ki <= qi + offs, logits, NEG_INF)
    if kv_length is not None:
        ki = jnp.arange(t_k)[None, None, None, :]
        logits = jnp.where(ki < kv_length[:, None, None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    # rows with NO attendable key (kv_length 0, or causal rows left of the
    # first key when t_q > t_k) return zeros — the same semantics the
    # Pallas kernel implements — instead of softmax's uniform-over-garbage
    any_valid = jnp.max(logits, axis=-1, keepdims=True) > NEG_INF / 2
    probs = jnp.where(any_valid, probs, 0.0)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


# ──────────────────────────────────────────────────────────────────────
# Pallas flash attention
# ──────────────────────────────────────────────────────────────────────


def _flash_kernel(
    *refs,
    scale, causal, block_q, block_k, kv_len, dyn, causal_offs=0,
):
    if dyn:
        # scalar-prefetched per-example valid kv lengths [B]
        len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
    kv_idx = pl.program_id(3)
    q_idx = pl.program_id(2)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    limit = len_ref[pl.program_id(0)] if dyn else None

    def _body():
        q = q_ref[0, 0]  # [block_q, d]
        k = k_ref[0, 0]  # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [block_q, block_k]
        cols = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        if dyn:  # per-example valid length
            s = jnp.where(cols < limit, s, NEG_INF)
        elif kv_len is not None:  # static padding mask (seq padded to blocks)
            s = jnp.where(cols < kv_len, s, NEG_INF)
        if causal:
            # end-aligned (standard decode alignment, matching
            # mha_reference): query row i attends keys <= i + (t_k - t_q)
            rows = q_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            s = jnp.where(cols <= rows + causal_offs, s, NEG_INF)
        m_prev = m_ref[:]  # [block_q, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # rows with no attendable key yet have m_new == NEG_INF; exp(s-m)
        # would be exp(0)=1 for EVERY (masked) column there — suppress them
        # so such rows finalize to zeros (documented zero-key semantics)
        p = jnp.where(
            m_new > NEG_INF / 2, jnp.exp(s - m_new), 0.0
        )  # [block_q, block_k]
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    live = True
    if causal:  # skip kv blocks fully above the (end-aligned) diagonal
        live = kv_idx * block_k <= q_idx * block_q + (block_q - 1) + causal_offs
    if dyn:  # skip kv blocks fully beyond the valid length
        live = live & (kv_idx * block_k < limit)

    if live is True:
        _body()
    else:
        pl.when(live)(_body)

    @pl.when(kv_idx == n_kv - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _flash_call(q, k, v, kv_length, causal, scale, block_q, block_k,
                interpret=False):
    """Shared pad/grid/spec plumbing for both flash variants.

    ``kv_length=None`` runs the static kernel (whole-sequence attention,
    padding masked with a compile-time length); a [B] int32 array runs the
    scalar-prefetch kernel with per-example lengths and dead-block skip.
    """
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    scale = (d**-0.5) if scale is None else scale
    block_q = min(block_q, max(_round_up(t_q, 8), 8))
    block_k = min(block_k, max(_round_up(t_k, 8), 8))
    # pad sequences up to block multiples; padded kv is masked in-kernel,
    # padded q rows are sliced off after
    pad_q = _round_up(t_q, block_q) - t_q
    pad_k = _round_up(t_k, block_k) - t_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    t_q_p, t_k_p = t_q + pad_q, t_k + pad_k
    grid = (b, h, t_q_p // block_q, t_k_p // block_k)
    dyn = kv_length is not None
    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k,
        kv_len=None if dyn else (t_k if pad_k else None), dyn=dyn,
        causal_offs=t_k - t_q,  # end alignment for rectangular q/k
    )
    causal_offs = t_k - t_q

    def _kv_map(b_, h_, i, j, *pref):
        # DEAD-BLOCK DMA SKIP: pl.when in the kernel gates only compute —
        # the block copy issued from this index map would still stream
        # every kv block HBM→VMEM. Re-pointing dead blocks (causally above
        # the diagonal, or past the row's valid length) at the LAST LIVE
        # block makes consecutive grid steps request the same index, which
        # Pallas elides — the body never reads the stale block (pl.when).
        jj = j
        if causal:
            cap_c = (i * block_q + block_q - 1 + causal_offs) // block_k
            jj = jnp.minimum(jj, jnp.maximum(cap_c, 0))
        if dyn:
            cap_l = jnp.maximum(pl.cdiv(pref[0][b_], block_k) - 1, 0)
            jj = jnp.minimum(jj, cap_l)
        return (b_, h_, jj, 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j, *_: (b_, h_, i, 0)),
        pl.BlockSpec((1, 1, block_k, d), _kv_map),
        pl.BlockSpec((1, 1, block_k, d), _kv_map),
    ]
    out_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda b_, h_, i, j, *_: (b_, h_, i, 0)
    )
    scratch = [
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )
    if dyn:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_spec, scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=params, interpret=interpret,
        )(kv_length.astype(jnp.int32), q, k, v)
    else:
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            scratch_shapes=scratch, compiler_params=params,
            interpret=interpret,
        )(q, k, v)
    return out[:, :, :t_q] if pad_q else out


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k")
)
def _flash_attention_tpu(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1536,
) -> jax.Array:
    return _flash_call(q, k, v, None, causal, scale, block_q, block_k)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k", "interpret")
)
def _flash_attention_tpu_dyn(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_length: jax.Array,  # [B] int32 valid kv prefix per example
    causal: bool = False,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
):
    """Flash attention with per-example kv-length masking.

    The valid length arrives via scalar prefetch, so kv blocks entirely
    beyond a row's length are skipped — attention over a 1500-padded cache
    with 200 valid positions does ~1/7 the work. This is the masked path
    round-1 silently routed to the O(T²)-memory reference; used by the
    incremental streaming encoder's block attention and any
    variable-length batched encode.
    """
    return _flash_call(
        q, k, v, kv_length, causal, scale, block_q, block_k, interpret
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_length: jax.Array | None = None,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1536,
) -> jax.Array:
    """Multi-head attention, [B, H, T, D] layout.

    Default blocks (512, 1536) are tuned for whisper's encoder (T=1500 pads
    to one kv block, so the online-softmax loop collapses to a single step;
    measured 2.9 ms vs 4.5 ms with (256, 512) at [8,20,1500,64] on v5e).
    VMEM per grid step stays ~3.5 MB.

    TPU: Pallas flash kernel (no materialized [T,T] matrix); per-example
    ``kv_length`` masking routes to the scalar-prefetch variant whose dead
    kv blocks skip both compute and the HBM→VMEM block copy. Off-TPU (and
    for sub-8-row q): the jnp reference. Rows with zero attendable keys
    return zeros on every path.
    """
    if _on_tpu() and q.shape[-2] >= 8:
        if kv_length is None:
            return _flash_attention_tpu(
                q, k, v, causal=causal, scale=scale,
                block_q=block_q, block_k=block_k,
            )
        # smaller kv blocks than the static default: the dead-block skip's
        # benefit scales with block granularity over masked caches
        return _flash_attention_tpu_dyn(
            q, k, v, kv_length, causal=causal, scale=scale,
            block_q=min(block_q, 256), block_k=min(block_k, 512),
        )
    return mha_reference(q, k, v, causal=causal, kv_length=kv_length, scale=scale)


# ──────────────────────────────────────────────────────────────────────
# KV-cache decode attention
# ──────────────────────────────────────────────────────────────────────


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    length: jax.Array,
    *,
    scale: float | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """One-position attention over a padded KV cache.

    q: [B, H, 1, D]; caches: [B, H, T_max, D]; length: [B] int32 (valid
    prefix per batch row). Bandwidth-bound: XLA emits a fused
    masked-softmax-matvec reading each cache entry once.

    int8 caches: pass per-position ``k_scale``/``v_scale`` [B, H, T_max, 1];
    the scales fold into the attention math (logits *= k_scale on the kv
    axis; v_scale folds into the probabilities), so the matmuls read int8
    straight from HBM — half the bandwidth of bf16 caches.
    """
    d = q.shape[-1]
    scale = (d**-0.5) if scale is None else scale
    # int8 caches flow straight into the dots (mixed-dtype dot_general with
    # preferred_element_type=f32) rather than through an explicit astype:
    # an astype forces a bf16 copy of the whole [B, H, T_max, D] cache
    # every step; the direct form lets the backend keep HBM reads at the
    # int8 byte count (TPU dots take s8 operands natively)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_cache, preferred_element_type=jnp.float32
    ) * scale
    if k_scale is not None:
        logits = logits * k_scale[..., 0][:, :, None, :].astype(jnp.float32)
    t_k = k_cache.shape[2]
    mask = jnp.arange(t_k)[None, None, None, :] < length[:, None, None, None]
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[..., 0][:, :, None, :].astype(jnp.float32)
    if v_cache.dtype == jnp.int8:
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v_cache,
            preferred_element_type=jnp.float32,
        )
    else:
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v_cache.dtype), v_cache,
            preferred_element_type=jnp.float32,
        )
    return out.astype(q.dtype)


def beam_select_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    row_map: jax.Array,
    length: jax.Array,
    beam: int,
    *,
    scale: float | None = None,
) -> jax.Array:
    """Beam-search decode attention over UN-permuted caches.

    The classic beam step physically gathers the whole self-KV cache to
    the surviving beams every step (``jnp.take`` on the batch axis) —
    measured at 39% of beam-decode wall time on a v5e (1.7 ms/step for a
    105 MB cache: gathers run far below streaming HBM bandwidth).
    Instead the cache rows stay where they were written and ``row_map``
    [B*K, T] names, per (beam, position), the physical row holding that
    beam's K/V — the beam ancestry. Attention reads every row of the
    batch row's K-beam group ONCE in a dense batched dot (an MXU tile,
    not K matvecs), then selects the lineage entry per position:

      logits[b,k,h,t] = q[b,k,h,:] · K[b, row_map%K, h, t, :]

    computed as a [K(query) × K(source)] score table + a tiny gather of
    the f32 scores (≤ a few MB), never of the caches. The value side
    folds the same one-hot selection into the probabilities, so V is
    also read once. Extra dot FLOPs are K× on the attention dots only —
    hundreds of MFLOPs per step against the matmul-bound step, nothing —
    while the 2× cache-sized gather traffic disappears.

    q: [B*K, H, 1, D]; caches: [B*K, H, T, D]; row_map: [B*K, T] int32
    flat physical rows (always within the same batch row's K-slot
    group); length: scalar or [B*K] valid prefix. Returns [B*K, H, 1, D].
    """
    bk, h, _, d = q.shape
    b = bk // beam
    t = k_cache.shape[2]
    scale = (d**-0.5) if scale is None else scale
    qf = q[:, :, 0, :].reshape(b, beam, h, d)
    kf = k_cache.reshape(b, beam, h, t, d)
    vf = v_cache.reshape(b, beam, h, t, d)
    # scores of every query beam against every source beam's cache
    logits_all = jnp.einsum(
        "bkhd,bmhtd->bkhmt", qf, kf, preferred_element_type=jnp.float32
    ) * scale
    sel = (row_map % beam).reshape(b, beam, t)  # local slot per position
    logits = jnp.take_along_axis(
        logits_all, sel[:, :, None, None, :], axis=3
    )[:, :, :, 0, :]  # [B, K, H, T]
    if length.ndim == 0:
        mask = (jnp.arange(t) < length)[None, None, None, :]
    else:
        mask = (
            jnp.arange(t)[None, :] < length.reshape(b, beam)[..., None]
        )[:, :, None, :]
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)  # [B, K, H, T]
    onehot = (
        sel[:, :, None, :] == jnp.arange(beam)[None, None, :, None]
    )  # [B, K(q), K(m), T]
    probs_m = probs[:, :, :, None, :] * onehot[:, :, None, :, :].astype(
        probs.dtype
    )  # [B, K, H, M, T]
    out = jnp.einsum(
        "bkhmt,bmhtd->bkhd", probs_m.astype(vf.dtype), vf,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(bk, h, 1, d).astype(q.dtype)
