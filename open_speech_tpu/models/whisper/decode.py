"""On-device Whisper decoding: greedy + beam, timestamp rules, LID.

Re-implements the decoding semantics the reference gets from CTranslate2
(beam_size=5 default at src/backends/faster_whisper.py:235-245, plus
openai-whisper's logit rules that CT2 mirrors): token suppression, blank
suppression at sample begin, paired-timestamp constraints, monotonic
timestamps, the timestamp-vs-text probability rule, <|nospeech|> probability
capture, and average-logprob / compression-ratio statistics for temperature
fallback.

Everything is a jitted ``lax.while_loop`` over ``decode_step`` — one compiled
program per (batch, prompt-length-bucket, beam) shape; the KV cache is donated
through the loop so decode is pure HBM-bandwidth on the cache.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from open_speech_tpu.models.whisper.model import (
    WhisperConfig,
    decode_step,
    init_self_kv,
    precompute_cross_kv,
)
from open_speech_tpu.models.whisper.tokenizer import SpecialTokens

NEG_INF = -1e30


@dataclass(frozen=True)
class DecodeOptions:
    task: str = "transcribe"
    language: str | None = None
    temperature: float = 0.0
    beam_size: int = 5
    max_new_tokens: int = 224
    timestamps: bool = True
    max_initial_timestamp: float = 1.0
    suppress_blank: bool = True
    suppress_tokens: tuple[int, ...] = ()
    length_penalty: float = 1.0


@dataclass
class DecodeResult:
    tokens: np.ndarray  # [B, T] int32, right-padded with eot
    lengths: np.ndarray  # [B] sampled token count (pre-eot)
    avg_logprob: np.ndarray  # [B]
    no_speech_prob: np.ndarray  # [B]
    temperature: float = 0.0


def compression_ratio(text: str) -> float:
    """zlib ratio used by whisper's fallback heuristic (higher = loopier)."""
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def _suppress_mask(
    n_vocab: int, special: SpecialTokens, opts: DecodeOptions
) -> np.ndarray:
    """Static additive mask [V]: -inf on always-suppressed tokens."""
    mask = np.zeros((n_vocab,), np.float32)
    always = [
        special.sot,
        special.startofprev,
        special.startoflm,
        special.no_speech,
        special.translate,
        special.transcribe,
    ]
    always += [special.lang_begin + i for i in range(special.n_langs)]
    if opts.timestamps:
        always.append(special.no_timestamps)
    else:
        mask[special.timestamp_begin :] = NEG_INF
    for t in list(opts.suppress_tokens) + always:
        if 0 <= t < n_vocab:
            mask[t] = NEG_INF
    return mask


def _apply_rules(
    logits,  # [B, V] f32
    *,
    step_idx,  # scalar int32 (0 = first sampled token)
    last,  # [B] previous sampled token (or sot-seq tail at step 0)
    penult,  # [B]
    max_ts,  # [B] highest timestamp token sampled so far (or ts_begin-1)
    suppress,  # [V] additive mask
    special: SpecialTokens,
    timestamps: bool,
    max_initial_ts_tok: int,
    blank_tokens: tuple[int, ...],
):
    v = logits.shape[-1]
    b = logits.shape[0]
    cols = jnp.arange(v)[None, :]
    logits = logits + suppress[None, :]
    # step_idx = sampled-token count so far; scalar (greedy/beam lockstep)
    # or [B] (per-slot batcher)
    begin = jnp.broadcast_to(jnp.asarray(step_idx) == 0, (b,))[:, None]

    # sample begin: suppress blank/eot regardless of timestamp mode
    # (openai SuppressBlank is unconditional)
    if blank_tokens:
        blank = jnp.zeros((v,), bool).at[jnp.array(blank_tokens)].set(True)
        logits = jnp.where(begin & blank[None, :], NEG_INF, logits)
    if not timestamps:
        return logits

    ts_begin = special.timestamp_begin
    is_ts_col = cols >= ts_begin
    is_text_col = cols < special.eot

    # openai semantics over *sampled* tokens only: with fewer than one/two
    # sampled tokens, last/penultimate default to False/True respectively
    sampled = jnp.broadcast_to(jnp.asarray(step_idx), (b,))
    last_ts = (sampled >= 1) & (last >= ts_begin)
    penult_ts = (sampled < 2) | (penult >= ts_begin)
    # paired timestamps: after a closing ts, no ts; after an opening ts, no text
    mask_ts = (last_ts & penult_ts)[:, None] & is_ts_col
    mask_text = (last_ts & ~penult_ts)[:, None] & is_text_col
    # monotonicity: forbid timestamps below the running max
    ts_floor = jnp.where(last_ts & ~penult_ts, max_ts, max_ts + 1)
    mask_mono = is_ts_col & (cols < ts_floor[:, None])
    logits = jnp.where(mask_ts | mask_text | mask_mono, NEG_INF, logits)

    # sample begin: only timestamps may open a sequence (openai:
    # "suppress generating non-timestamp tokens at the beginning",
    # timing.py ApplyTimestampRules — unconditional, not only when the
    # timestamp mass wins), capped at the max initial timestamp
    logits = jnp.where(begin & ~is_ts_col, NEG_INF, logits)
    logits = jnp.where(
        begin & is_ts_col & (cols > max_initial_ts_tok), NEG_INF, logits
    )

    # prob rule: if total timestamp mass exceeds the best non-timestamp
    # token (eot included, per openai), force a timestamp
    logp = jax.nn.log_softmax(logits, axis=-1)
    ts_mass = jax.nn.logsumexp(
        jnp.where(is_ts_col, logp, NEG_INF), axis=-1
    )  # [B]
    max_text = jnp.max(jnp.where(~is_ts_col, logp, NEG_INF), axis=-1)
    force_ts = (ts_mass > max_text)[:, None]
    logits = jnp.where(force_ts & ~is_ts_col, NEG_INF, logits)
    return logits


# ──────────────────────────────────────────────────────────────────────
# Prefill: run the prompt through the cache
# ──────────────────────────────────────────────────────────────────────


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def _prefill(params, prompt, cross_kv, self_kv, cfg: WhisperConfig, enc_len=None):
    """Prefill prompt tokens [B, P] in ONE teacher-forced pass.

    A sequential per-token scan wastes the MXU: each step is a [B,1,d]
    matvec, so a 224-token conditioned prompt costs 224 latency-bound
    steps. Teacher-forcing the whole prompt with causal flash attention
    computes every position in batched matmuls (~P× fewer dispatch-depth
    steps) and writes the per-layer K/V into the cache in one slice —
    the same math, so logits/caches match the sequential form.
    Returns (all_logits [P, B, V], self_kv with positions [0, P) filled).
    """
    from open_speech_tpu.models.whisper.model import (
        _merge_heads,
        _split_heads,
        cross_attend,
        embed_tokens,
        layer_norm,
        linear,
        mlp,
        output_logits,
    )
    from open_speech_tpu.ops.attention import flash_attention

    dec = params["decoder"]
    n_head = cfg.n_text_head
    b, p = prompt.shape
    x = embed_tokens(dec, prompt) + dec["pos_emb"][:p]

    def block(h, layer):
        bp, ckv = layer
        hn = layer_norm(h, bp["ln1"])
        q = _split_heads(linear(hn, bp["attn"]["q"]), n_head)
        k = _split_heads(linear(hn, bp["attn"]["k"]), n_head)
        v = _split_heads(linear(hn, bp["attn"]["v"]), n_head)
        attn = flash_attention(q, k, v, causal=True)
        h = h + linear(_merge_heads(attn), bp["attn"]["o"])
        hc = layer_norm(h, bp["ln_cross"])
        qc = _split_heads(linear(hc, bp["cross"]["q"]), n_head)
        h = h + linear(_merge_heads(cross_attend(qc, ckv, b, enc_len)), bp["cross"]["o"])
        h = h + mlp(layer_norm(h, bp["ln_mlp"]), bp)
        return h, jnp.stack([k, v])  # [2, B, H, P, dh]

    x, kv_new = jax.lax.scan(block, x, (dec["blocks"], cross_kv))
    x = layer_norm(x, dec["ln"])
    all_logits = output_logits(x, dec).transpose(1, 0, 2)  # [P, B, V]
    self_kv = jax.lax.dynamic_update_slice(
        self_kv, kv_new.astype(self_kv.dtype), (0, 0, 0, 0, 0, 0)
    )
    return all_logits, self_kv


# ──────────────────────────────────────────────────────────────────────
# Greedy / sampling decode
# ──────────────────────────────────────────────────────────────────────


def greedy_decode(
    params,
    cfg: WhisperConfig,
    special: SpecialTokens,
    enc_out,
    prompt: np.ndarray,  # [B, P] int32 (sot sequence, maybe with prefix)
    opts: DecodeOptions = DecodeOptions(),
    rng: jax.Array | None = None,
    enc_len: np.ndarray | None = None,  # [B] real encoder positions (mask)
) -> DecodeResult:
    """Greedy (temperature=0) or sampled decode with whisper logit rules."""
    b, p_len = prompt.shape
    max_new = min(opts.max_new_tokens, cfg.n_text_ctx - p_len - 1)
    suppress = jnp.asarray(_suppress_mask(cfg.n_vocab, special, opts))
    blank = _blank_tokens(special, opts)
    max_init_tok = special.timestamp_begin + int(
        round(opts.max_initial_timestamp / 0.02)
    )
    if rng is None:
        rng = jax.random.PRNGKey(0)

    tokens, lengths, sum_lp, nsp = _greedy_impl(
        params,
        jnp.asarray(prompt, jnp.int32),
        enc_out,
        suppress,
        rng,
        jnp.float32(opts.temperature),
        None if enc_len is None else jnp.asarray(enc_len, jnp.int32),
        cfg=cfg,
        special=special,
        max_new=max_new,
        sampled=opts.temperature > 0,
        timestamps=opts.timestamps,
        max_init_tok=max_init_tok,
        blank=blank,
    )
    # ONE device->host transfer for all four outputs: separate np.asarray
    # calls each pay a full device round trip (~27 ms through a relay —
    # measured as the dominant cost of a whole interim decode)
    tokens, lengths, sum_lp, nsp = jax.device_get((tokens, lengths, sum_lp, nsp))
    avg_lp = sum_lp / np.maximum(lengths + 1, 1)  # +1 counts eot
    return DecodeResult(
        tokens=tokens,
        lengths=lengths,
        avg_logprob=avg_lp,
        no_speech_prob=nsp,
        temperature=opts.temperature,
    )


def _blank_tokens(special: SpecialTokens, opts: DecodeOptions) -> tuple[int, ...]:
    if not opts.suppress_blank:
        return ()
    # " " encodes as a single token in both real BPE (220) and byte fallback
    return (32 if special.eot <= 50000 else 220, special.eot)


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "special",
        "max_new",
        "sampled",
        "timestamps",
        "max_init_tok",
        "blank",
    ),
)
def _greedy_impl(
    params,
    prompt,
    enc_out,
    suppress,
    rng,
    temperature,
    enc_len=None,
    *,
    cfg: WhisperConfig,
    special: SpecialTokens,
    max_new: int,
    sampled: bool,
    timestamps: bool,
    max_init_tok: int,
    blank: tuple[int, ...],
):
    b, p_len = prompt.shape
    cross_kv = precompute_cross_kv(params, enc_out, cfg)
    self_kv = init_self_kv(cfg, b, _cache_len(cfg, p_len, max_new), enc_out.dtype)
    prefill_logits, self_kv = _prefill(
        params, prompt, cross_kv, self_kv, cfg, enc_len
    )
    # no_speech prob: measured at the logits following the <|sot|> input
    sot_pos = jnp.argmax((prompt == special.sot).astype(jnp.int32), axis=1)  # [B]
    sot_logits = jnp.take_along_axis(
        prefill_logits.transpose(1, 0, 2), sot_pos[:, None, None], axis=1
    )[:, 0]
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, special.no_speech]

    out_buf = jnp.full((b, max_new), special.eot, jnp.int32)

    def cond(state):
        return (state[0] < max_new) & ~jnp.all(state[-1])

    def body(state):
        (step_idx, cur_logits, kv, buf, last, penult, max_ts, sum_lp, lengths,
         key, finished) = state
        logits = _apply_rules(
            cur_logits,
            step_idx=step_idx,
            last=last,
            penult=penult,
            max_ts=max_ts,
            suppress=suppress,
            special=special,
            timestamps=timestamps,
            max_initial_ts_tok=max_init_tok,
            blank_tokens=blank,
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        if not sampled:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            key_next = key
        else:
            # temperature is a traced value: one compiled program serves every
            # fallback temperature (0.2..1.0) instead of one compile each
            key_next, sub = jax.random.split(key)
            tok = jax.random.categorical(
                sub, logits / jnp.maximum(temperature, 1e-3), axis=-1
            )
            tok = tok.astype(jnp.int32)
        tok = jnp.where(finished, special.eot, tok)
        tok_lp = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]
        sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
        now_eot = tok == special.eot
        lengths = lengths + jnp.where(finished | now_eot, 0, 1)
        buf = jax.lax.dynamic_update_slice(buf, tok[:, None], (0, step_idx))
        is_ts = tok >= special.timestamp_begin
        max_ts = jnp.where(is_ts & ~finished, jnp.maximum(max_ts, tok), max_ts)
        new_finished = finished | now_eot
        next_logits, kv = decode_step(
            params, tok[:, None], p_len + step_idx, kv, cross_kv, cfg, enc_len
        )
        return (
            step_idx + 1,
            next_logits,
            kv,
            buf,
            tok,
            last,
            max_ts,
            sum_lp,
            lengths,
            key_next,
            new_finished,
        )

    init = (
        jnp.int32(0),
        prefill_logits[-1],
        self_kv,
        out_buf,
        prompt[:, -1],
        prompt[:, -2] if p_len > 1 else prompt[:, -1],
        jnp.full((b,), special.timestamp_begin - 1, jnp.int32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.int32),
        rng,
        jnp.zeros((b,), bool),
    )
    state = jax.lax.while_loop(cond, body, init)
    (_, _, _, buf, _, _, _, sum_lp, lengths, _, _finished) = state
    return buf, lengths, sum_lp, no_speech_prob


# ──────────────────────────────────────────────────────────────────────
# Beam search
# ──────────────────────────────────────────────────────────────────────


def beam_decode(
    params,
    cfg: WhisperConfig,
    special: SpecialTokens,
    enc_out,
    prompt: np.ndarray,  # [B, P]
    opts: DecodeOptions = DecodeOptions(),
    enc_len: np.ndarray | None = None,  # [B] real encoder positions (mask)
    ancestry: bool = True,
) -> DecodeResult:
    """Beam search (default beam 5, matching the reference backend's CT2 call).

    Beams ride the batch axis: decode_step sees [B*K] rows; per-step the
    [B, K*V] score table is top-k'd. The self-KV cache is NEVER gathered:
    beam lineage lives in a row_map that attention resolves at read time
    (``ancestry=True``; see _beam_impl), and the cross-KV is never
    replicated (beams fold into the cross-attention query axis).
    """
    b, p_len = prompt.shape
    k = opts.beam_size
    max_new = min(opts.max_new_tokens, cfg.n_text_ctx - p_len - 1)
    suppress = jnp.asarray(_suppress_mask(cfg.n_vocab, special, opts))
    blank = _blank_tokens(special, opts)
    max_init_tok = special.timestamp_begin + int(
        round(opts.max_initial_timestamp / 0.02)
    )
    tokens, lengths, scores, nsp = _beam_impl(
        params,
        jnp.asarray(prompt, jnp.int32),
        enc_out,
        suppress,
        None if enc_len is None else jnp.asarray(enc_len, jnp.int32),
        cfg=cfg,
        special=special,
        beam=k,
        max_new=max_new,
        timestamps=opts.timestamps,
        max_init_tok=max_init_tok,
        blank=blank,
        length_penalty=float(opts.length_penalty),
        ancestry=ancestry,
    )
    # one transfer for all outputs (see greedy_decode)
    tokens, lengths, scores, nsp = jax.device_get((tokens, lengths, scores, nsp))
    return DecodeResult(
        tokens=tokens,
        lengths=lengths,
        avg_logprob=scores / np.maximum(lengths + 1, 1),
        no_speech_prob=nsp,
        temperature=0.0,
    )


def _repeat_kv(kv, k: int):
    """Fan a per-row KV structure out across k beams.

    Dense caches are [L, 2, B, H, T, Dh] (batch axis 2); int8 cross packs
    are dicts of [L, B, H, T, *] (batch axis 1).
    """
    if isinstance(kv, dict):
        return {key: jnp.repeat(val, k, axis=1) for key, val in kv.items()}
    return jnp.repeat(kv, k, axis=2)


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "special",
        "beam",
        "max_new",
        "timestamps",
        "max_init_tok",
        "blank",
        "length_penalty",
        "ancestry",
    ),
)
def _beam_impl(
    params,
    prompt,
    enc_out,
    suppress,
    enc_len=None,
    *,
    cfg: WhisperConfig,
    special: SpecialTokens,
    beam: int,
    max_new: int,
    timestamps: bool,
    max_init_tok: int,
    blank: tuple[int, ...],
    length_penalty: float,
    ancestry: bool = True,
):
    """Beam step. ``ancestry=True`` (default, TPU-fast) keeps the self-KV
    cache physically un-permuted and tracks beam lineage in a [B*K, T]
    row_map that attention resolves at read time
    (ops.attention.beam_select_attention) — the per-step full-cache
    gather (measured 39% of beam-decode wall on v5e) disappears.
    ``ancestry=False`` is the classic materialized-gather formulation,
    kept as the oracle for the equivalence test."""
    b, p_len = prompt.shape
    k = beam
    v = cfg.n_vocab
    # prefill once per batch row (all k beams share the prompt), then fan
    # the caches out across beams — k× cheaper than prefill at [B*K]
    cross_kv_b = precompute_cross_kv(params, enc_out, cfg)
    t_cache = _cache_len(cfg, prompt.shape[1], max_new)
    self_kv_b = init_self_kv(cfg, b, t_cache, enc_out.dtype)
    prefill_logits, self_kv_b = _prefill(
        params, prompt, cross_kv_b, self_kv_b, cfg, enc_len
    )
    # cross-KV and enc_len stay at B rows: beams fold into the cross-attn
    # query axis inside decode_step (see model.cross_attend) — replicating
    # the L×2×B×H×1500×Dh memory K× was the dominant per-step HBM stream
    cross_kv = cross_kv_b
    self_kv = _repeat_kv(self_kv_b, k)
    # ancestry init: every beam's history (the shared prompt) lives in its
    # own physical row
    row_map = jnp.tile(
        jnp.arange(b * k, dtype=jnp.int32)[:, None], (1, t_cache)
    )
    sot_pos = jnp.argmax((prompt == special.sot).astype(jnp.int32), axis=1)
    sot_logits = jnp.take_along_axis(
        prefill_logits.transpose(1, 0, 2), sot_pos[:, None, None], axis=1
    )[:, 0]
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, special.no_speech]

    out_buf = jnp.full((b * k, max_new), special.eot, jnp.int32)
    # first beam active, others start at -inf so step 0 fans out from beam 0
    beam_lp = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)]), (b,)
    ).astype(jnp.float32)

    def cond(state):
        return (state[0] < max_new) & ~jnp.all(state[-1])

    def body(state):
        (step_idx, cur_logits, kv, row_map, buf, last, penult, max_ts,
         beam_lp, lengths, finished) = state
        logits = _apply_rules(
            cur_logits,
            step_idx=step_idx,
            last=last,
            penult=penult,
            max_ts=max_ts,
            suppress=suppress,
            special=special,
            timestamps=timestamps,
            max_initial_ts_tok=max_init_tok,
            blank_tokens=blank,
        )  # [B*K, V]
        logp = jax.nn.log_softmax(logits, axis=-1)
        # finished beams may only emit eot at no cost
        eot_only = jnp.full((v,), NEG_INF).at[special.eot].set(0.0)
        logp = jnp.where(finished[:, None], eot_only[None, :], logp)
        total = beam_lp[:, None] + logp  # [B*K, V]
        total = total.reshape(b, k * v)
        top_lp, top_idx = jax.lax.top_k(total, k)  # [B, K]
        src_beam = top_idx // v  # [B, K] index into beams
        tok = (top_idx % v).astype(jnp.int32)
        flat_src = (jnp.arange(b)[:, None] * k + src_beam).reshape(-1)  # [B*K]
        tok = tok.reshape(-1)
        # gather per-beam state
        gather = lambda x: jnp.take(x, flat_src, axis=0)
        buf = gather(buf)
        last_g = gather(last)
        max_ts = gather(max_ts)
        lengths = gather(lengths)
        finished = gather(finished)
        if ancestry:
            # inherit the chosen ancestor's lineage, then claim this
            # step's position: decode_step writes beam j's new K/V into
            # physical row j
            row_map = gather(row_map)
            row_map = jax.lax.dynamic_update_slice(
                row_map,
                jnp.arange(b * k, dtype=jnp.int32)[:, None],
                (0, p_len + step_idx),
            )
        else:
            kv = jnp.take(kv, flat_src, axis=2)  # [L, 2, B*K, H, T, Dh]
        buf = jax.lax.dynamic_update_slice(buf, tok[:, None], (0, step_idx))
        now_eot = (tok == special.eot) & ~finished
        lengths = lengths + jnp.where(finished | (tok == special.eot), 0, 1)
        is_ts = tok >= special.timestamp_begin
        max_ts = jnp.where(is_ts & ~finished, jnp.maximum(max_ts, tok), max_ts)
        new_finished = finished | (tok == special.eot)
        next_logits, kv = decode_step(
            params, tok[:, None], p_len + step_idx, kv, cross_kv, cfg,
            enc_len, beam=k, row_map=row_map if ancestry else None,
        )
        return (
            step_idx + 1,
            next_logits,
            kv,
            row_map,
            buf,
            tok,
            last_g,
            max_ts,
            top_lp.reshape(-1),
            lengths,
            new_finished,
        )

    init = (
        jnp.int32(0),
        jnp.repeat(prefill_logits[-1], k, axis=0),
        self_kv,
        row_map,
        out_buf,
        jnp.repeat(prompt[:, -1], k, axis=0),
        jnp.repeat(prompt[:, -2] if p_len > 1 else prompt[:, -1], k, axis=0),
        jnp.full((b * k,), special.timestamp_begin - 1, jnp.int32),
        beam_lp,
        jnp.zeros((b * k,), jnp.int32),
        jnp.zeros((b * k,), bool),
    )
    state = jax.lax.while_loop(cond, body, init)
    (_, _, _, _, buf, _, _, _, beam_lp, lengths, _finished) = state
    # pick best beam per batch row by length-normalized score
    norm = beam_lp.reshape(b, k) / jnp.maximum(
        lengths.reshape(b, k).astype(jnp.float32) + 1, 1.0
    ) ** length_penalty
    best = jnp.argmax(norm, axis=1)  # [B]
    sel = jnp.arange(b) * k + best
    return (
        jnp.take(buf, sel, axis=0),
        jnp.take(lengths, sel, axis=0),
        jnp.take(beam_lp, sel, axis=0),
        no_speech_prob,
    )


# ──────────────────────────────────────────────────────────────────────
# Language identification
# ──────────────────────────────────────────────────────────────────────


def detect_language(
    params, cfg: WhisperConfig, special: SpecialTokens, enc_out
) -> tuple[list[str], np.ndarray]:
    """One decode step from <|sot|>; softmax over the language tokens.

    Returns (codes [B], probs [B]) — the reference surfaces these as
    ``language``/``language_probability`` in verbose_json
    (src/backends/faster_whisper.py:251-272).
    """
    probs = _detect_impl(params, enc_out, cfg=cfg, special=special)
    probs = np.asarray(probs)
    idx = probs.argmax(axis=-1)
    codes = [special.lang_code(special.lang_begin + int(i)) for i in idx]
    return codes, probs.max(axis=-1)


def _cache_len(cfg: WhisperConfig, p_len: int, max_new: int) -> int:
    """Self-KV length bucketed to 64: decode re-reads this cache every step,
    so sizing it to the token budget (not n_text_ctx=448) trims HBM traffic
    ~4x for typical 96-token windows."""
    need = p_len + max_new + 1
    return min(cfg.n_text_ctx, -(-need // 64) * 64)


@partial(jax.jit, static_argnames=("cfg", "special"))
def _detect_impl(params, enc_out, *, cfg: WhisperConfig, special: SpecialTokens):
    b = enc_out.shape[0]
    cross_kv = precompute_cross_kv(params, enc_out, cfg)
    self_kv = init_self_kv(cfg, b, dtype=enc_out.dtype)
    prompt = jnp.full((b, 1), special.sot, jnp.int32)
    logits, _ = _prefill(params, prompt, cross_kv, self_kv, cfg)
    logits = logits[-1]  # [B, V]
    lang_slice = jax.lax.dynamic_slice_in_dim(
        logits, special.lang_begin, special.n_langs, axis=1
    )
    return jax.nn.softmax(lang_slice, axis=-1)
