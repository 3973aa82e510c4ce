"""Speculative greedy decoding: a draft model proposes, the target verifies.

No reference counterpart — CT2 only offers sequential greedy/beam
(src/backends/faster_whisper.py:235-245). This is a TPU-native latency
feature: the target's per-token decode is a latency-bound [B,1,d] matvec
chain, so a small draft model (e.g. whisper-tiny against large-v3-turbo)
proposes ``gamma`` tokens autoregressively and the target verifies all of
them in ONE teacher-forced pass — an MXU-friendly [B,gamma+1,d] matmul —
accepting the longest matching prefix plus one corrected/bonus token.

Exactness guarantee: emitted tokens are IDENTICAL to the target model's
``greedy_decode`` under the same ``DecodeOptions`` (every emitted token is
the argmax of the target's rule-constrained logits given the true emitted
history; the draft only affects *how many* tokens each verify pass
confirms, never *which* tokens are emitted). ``tests/test_speculative.py``
asserts exact-token equality with a random-init draft — the worst case.

Positions and caches follow the standard scheme (Leviathan et al. 2023):
token e_i (i-th emitted) is the model *input* at position P+i when
predicting e_{i+1}. Each verify chunk feeds
``[last_emitted, d_1 .. d_gamma]`` at positions ``P-1+n .. P-1+n+gamma``,
so every accepted/corrected token is eventually an input of a later chunk
and stale cache rows from rejected proposals are overwritten before any
query can attend to them (queries mask ``col <= pos + row``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from open_speech_tpu.models.whisper.decode import (
    NEG_INF,
    DecodeOptions,
    DecodeResult,
    _apply_rules,
    _blank_tokens,
    _cache_len,
    _prefill,
    _suppress_mask,
)
from open_speech_tpu.models.whisper.model import (
    WhisperConfig,
    _decode_step_impl,
    _merge_heads,
    _split_heads,
    cross_attend,
    embed_tokens,
    init_self_kv,
    layer_norm,
    linear,
    mlp,
    output_logits,
    precompute_cross_kv,
)
from open_speech_tpu.models.whisper.tokenizer import SpecialTokens


def _chunk_attention(q, k_cache, v_cache, pos):
    """Self-attention for a G-token chunk over a padded cache.

    q: [B, H, G, D]; caches: [B, H, T_max, D]; pos: scalar int32 (cache
    position of the chunk's first token). Query row i attends cache
    columns <= pos + i: causal within the chunk, full history before it.
    G is small (gamma+1 <= ~9) so the dense [G, T_max] score block is
    cheap and XLA fuses the masked softmax-matvec like decode_attention.
    """
    d = q.shape[-1]
    t_k = k_cache.shape[2]
    g = q.shape[2]
    logits = jnp.einsum(
        "bhgd,bhkd->bhgk", q, k_cache, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    cols = jnp.arange(t_k)[None, :]
    rows = jnp.arange(g)[:, None]
    mask = cols <= (pos + rows)  # [G, T_max]
    logits = jnp.where(mask[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhgk,bhkd->bhgd",
        probs,
        v_cache.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _verify_chunk(params, tokens, pos, self_kv, cross_kv, n_head, enc_len,
                  pos_emb):
    """Teacher-forced target pass over ``tokens`` [B, G] at cache position
    ``pos``. Writes the chunk's K/V into the cache (overwriting any stale
    rows from rejected prior proposals) and returns logits for every slot.

    ``pos_emb`` is the decoder position table padded by G rows: a final
    chunk whose tail crosses n_text_ctx must NOT let dynamic_slice clamp
    its start (that would shift the embeddings of the chunk's still-live
    leading slots); with padding the slice always fits and only dead
    slots read the zero rows.

    Returns (logits [B, G, V] f32, new self_kv).
    """
    dec = params["decoder"]
    b, g = tokens.shape
    x = embed_tokens(dec, tokens) + jax.lax.dynamic_slice_in_dim(
        pos_emb, pos, g, axis=0
    )

    def block(h, layer):
        bp, ckv, kv = layer
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
        attn = _chunk_attention(q, k_cache, v_cache, pos)
        h = h + linear(_merge_heads(attn), bp["attn"]["o"])
        hc = layer_norm(h, bp["ln_cross"])
        qc = _split_heads(linear(hc, bp["cross"]["q"]), n_head)
        h = h + linear(_merge_heads(cross_attend(qc, ckv, b, enc_len)), bp["cross"]["o"])
        h = h + mlp(layer_norm(h, bp["ln_mlp"]), bp)
        return h, jnp.stack([k_cache, v_cache])

    x, new_kv = jax.lax.scan(block, x, (dec["blocks"], cross_kv, self_kv))
    x = layer_norm(x, dec["ln"])
    return output_logits(x, dec).astype(jnp.float32), new_kv


@partial(
    jax.jit,
    static_argnames=(
        "t_cfg", "d_cfg", "special", "max_new", "gamma", "timestamps",
        "max_init_tok", "blank",
    ),
    donate_argnums=(),
)
def _spec_impl(
    t_params,
    d_params,
    prompt,  # [1, P] int32
    t_enc_out,
    d_enc_out,
    suppress,  # [V] additive mask (shared vocab)
    *,
    t_cfg: WhisperConfig,
    d_cfg: WhisperConfig,
    special: SpecialTokens,
    max_new: int,
    gamma: int,
    timestamps: bool,
    max_init_tok: int,
    blank: tuple[int, ...],
):
    b, p_len = prompt.shape
    g1 = gamma + 1

    t_cross = precompute_cross_kv(t_params, t_enc_out, t_cfg)
    d_cross = precompute_cross_kv(d_params, d_enc_out, d_cfg)
    # cache sized WITHOUT the n_text_ctx clamp _cache_len applies: the
    # last chunk's tail may extend gamma slots past the budget (those
    # slots are dead, but their K/V writes must not clamp-shift onto
    # live rows). A few extra rows of KV is noise next to correctness.
    cache = -(-(p_len + max_new + g1 + 1) // 64) * 64
    t_kv = init_self_kv(t_cfg, b, cache, t_enc_out.dtype)
    d_kv = init_self_kv(d_cfg, b, cache, d_enc_out.dtype)
    pe = t_params["decoder"]["pos_emb"]
    pe_pad = jnp.concatenate(
        [pe, jnp.zeros((max(0, p_len + max_new + g1 - pe.shape[0]), pe.shape[1]),
                       pe.dtype)]
    )
    # (the draft's own 1-row pos_emb slices clamp only for dead proposals
    # past the budget — a clamped single-row slice shifts nothing else, so
    # it can only change WHICH dead tokens get proposed, never emitted
    # output)
    t_prefill_logits, t_kv = _prefill(t_params, prompt, t_cross, t_kv, t_cfg)
    _d_logits, d_kv = _prefill(d_params, prompt, d_cross, d_kv, d_cfg)

    sot_pos = jnp.argmax((prompt == special.sot).astype(jnp.int32), axis=1)
    sot_logits = jnp.take_along_axis(
        t_prefill_logits.transpose(1, 0, 2), sot_pos[:, None, None], axis=1
    )[:, 0]
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, special.no_speech]

    rules = dict(
        suppress=suppress, special=special, timestamps=timestamps,
        max_initial_ts_tok=max_init_tok, blank_tokens=blank,
    )
    out_buf = jnp.full((b, max_new + g1), special.eot, jnp.int32)
    eot = jnp.int32(special.eot)

    def body(state):
        (n, last, penult, max_ts, t_kv, d_kv, buf, sum_lp, lengths,
         finished, rounds, accepted) = state
        pos0 = p_len - 1 + n  # cache position of this chunk's first input

        # ── draft proposes gamma tokens sequentially ──────────────────
        def draft_step(carry, j):
            d_kv, tok_in, dl, dp, dmt = carry
            logits, d_kv = _decode_step_impl(
                d_params, tok_in[:, None], pos0 + j, d_kv, d_cross,
                d_cfg.n_text_head,
            )
            l = _apply_rules(
                logits, step_idx=n + j, last=dl, penult=dp, max_ts=dmt,
                **rules,
            )
            tok = jnp.argmax(l, axis=-1).astype(jnp.int32)
            is_ts = tok >= special.timestamp_begin
            dmt = jnp.where(is_ts, jnp.maximum(dmt, tok), dmt)
            return (d_kv, tok, tok, dl, dmt), tok

        (d_kv, _t, _l, _p, _m), d_toks = jax.lax.scan(
            draft_step,
            (d_kv, last, last, penult, max_ts),
            jnp.arange(gamma),
        )  # d_toks: [gamma, B]

        # ── target verifies all gamma+1 slots in one pass ─────────────
        chunk = jnp.concatenate([last[:, None], d_toks.T], axis=1)  # [B,G+1]
        t_logits, t_kv = _verify_chunk(
            t_params, chunk, pos0, t_kv, t_cross, t_cfg.n_text_head, None,
            pe_pad,
        )  # [B, G+1, V]

        def rule_step(carry, j):
            tl, tp, tmt = carry
            l = _apply_rules(
                t_logits[:, j], step_idx=n + j, last=tl, penult=tp,
                max_ts=tmt, **rules,
            )
            logp = jax.nn.log_softmax(l, axis=-1)
            tok = jnp.argmax(l, axis=-1).astype(jnp.int32)
            tok_lp = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]
            is_ts = tok >= special.timestamp_begin
            tmt_n = jnp.where(is_ts, jnp.maximum(tmt, tok), tmt)
            return (tok, tl, tmt_n), (tok, tok_lp, tok, tl, tmt_n)

        _fin, (t_toks, t_lps, s_last, s_penult, s_max_ts) = jax.lax.scan(
            rule_step, (last, penult, max_ts), jnp.arange(g1)
        )  # all [G+1, B]

        # longest matching prefix: slot j verifies draft proposal j
        match = t_toks[:gamma] == d_toks  # [gamma, B]
        a = jnp.argmin(
            jnp.concatenate(
                [match.astype(jnp.int32), jnp.zeros((1, b), jnp.int32)]
            ),
            axis=0,
        )[0]  # scalar (B == 1): index of first mismatch, gamma if none

        # emitted this round: t_toks[0..a] — a matched drafts + 1 target
        # token (corrected at the mismatch, or the bonus slot). An eot
        # inside cuts emission at the eot (inclusive), matching greedy.
        slot = jnp.arange(g1)
        emit_tok = t_toks[:, 0]  # [G+1] (B == 1)
        is_eot = emit_tok == eot
        first_eot = jnp.argmax(
            jnp.concatenate([is_eot, jnp.ones((1,), bool)]).astype(jnp.int32)
        )
        eff = jnp.minimum(a + 1, first_eot + 1).astype(jnp.int32)

        live = (slot < eff) & (n + slot < max_new)  # [G+1]
        written = jnp.where(live, emit_tok, eot)
        buf = jax.lax.dynamic_update_slice(buf, written[None, :], (0, n))
        sum_lp = sum_lp + jnp.sum(jnp.where(live, t_lps[:, 0], 0.0))[None]
        lengths = lengths + jnp.sum(
            (live & ~is_eot).astype(jnp.int32)
        )[None]

        # post-acceptance rule state = state after consuming slot a
        sel = jnp.minimum(a, g1 - 1)
        new_last = s_last[sel]
        new_penult = s_penult[sel]
        new_max_ts = s_max_ts[sel]
        new_finished = finished | jnp.any(is_eot & (slot < eff))[None]

        return (
            n + eff, new_last, new_penult, new_max_ts, t_kv, d_kv, buf,
            sum_lp, lengths, new_finished, rounds + 1,
            accepted + a.astype(jnp.int32),
        )

    def cond(state):
        n, *_rest = state
        finished = state[9]
        return (n < max_new) & ~jnp.all(finished)

    init = (
        jnp.int32(0),
        prompt[:, -1],
        prompt[:, -2] if p_len > 1 else prompt[:, -1],
        jnp.full((b,), special.timestamp_begin - 1, jnp.int32),
        t_kv,
        d_kv,
        out_buf,
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), bool),
        jnp.int32(0),
        jnp.int32(0),
    )
    state = jax.lax.while_loop(cond, body, init)
    (_n, _l, _p, _m, _tkv, _dkv, buf, sum_lp, lengths, _fin, rounds,
     accepted) = state
    return buf[:, :max_new], lengths, sum_lp, no_speech_prob, rounds, accepted


def speculative_greedy_decode(
    t_params,
    t_cfg: WhisperConfig,
    d_params,
    d_cfg: WhisperConfig,
    special: SpecialTokens,
    t_enc_out,
    d_enc_out,
    prompt: np.ndarray,  # [1, P] int32
    opts: DecodeOptions = DecodeOptions(),
    gamma: int = 4,
) -> DecodeResult:
    """Greedy decode via draft-and-verify; exact-match with greedy_decode.

    Single-stream only (B == 1): rows in a batch accept different prefix
    lengths, so their cache positions diverge — the batched serving path
    stays on the plain greedy/beam programs. Requires temperature == 0
    (sampled fallback steps run the normal sampled decode) and a shared
    tokenizer vocab between draft and target (all whisper ckpts).
    """
    b, p_len = prompt.shape
    if b != 1:
        raise ValueError("speculative decode is single-stream (B == 1)")
    if opts.temperature > 0:
        raise ValueError("speculative decode requires temperature == 0")
    if t_cfg.n_vocab != d_cfg.n_vocab:
        raise ValueError("draft/target vocab mismatch")
    max_new = min(opts.max_new_tokens, t_cfg.n_text_ctx - p_len - 1)
    suppress = jnp.asarray(_suppress_mask(t_cfg.n_vocab, special, opts))
    max_init_tok = special.timestamp_begin + int(
        round(opts.max_initial_timestamp / 0.02)
    )
    buf, lengths, sum_lp, nsp, rounds, accepted = _spec_impl(
        t_params,
        d_params,
        jnp.asarray(prompt, jnp.int32),
        t_enc_out,
        d_enc_out,
        suppress,
        t_cfg=t_cfg,
        d_cfg=d_cfg,
        special=special,
        max_new=max_new,
        gamma=gamma,
        timestamps=opts.timestamps,
        max_init_tok=max_init_tok,
        blank=_blank_tokens(special, opts),
    )
    # one device->host transfer for every output (separate np.asarray
    # calls each pay a relay round trip; see decode.greedy_decode)
    buf, lengths, sum_lp, nsp, rounds, accepted = jax.device_get(
        (buf, lengths, sum_lp, nsp, rounds, accepted)
    )
    avg_lp = sum_lp / np.maximum(lengths + 1, 1)
    result = DecodeResult(
        tokens=buf,
        lengths=lengths,
        avg_logprob=avg_lp,
        no_speech_prob=nsp,
        temperature=0.0,
    )
    result.spec_rounds = int(rounds)  # type: ignore[attr-defined]
    result.spec_accepted = int(accepted)  # type: ignore[attr-defined]
    return result
