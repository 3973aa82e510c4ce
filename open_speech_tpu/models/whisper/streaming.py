"""Incremental O(n) streaming encoder for whisper.

The reference's streaming path re-transcribes the whole growing utterance
every 100 ms chunk — re-running the 30 s padded encoder hundreds of times
per utterance (SURVEY §3.2 names this "the key inefficiency to fix on
TPU"; reference src/streaming.py:357). Here each mel frame is encoded
exactly once:

  - the encoder runs **block-causally**: audio arrives in fixed blocks of
    ``block_pos`` encoder positions; a new block's queries attend to the
    cached keys/values of every position so far (one
    ``jax.lax.dynamic_update_slice`` into per-layer KV caches), and
    previously-emitted states are never recomputed. This approximates the
    bidirectional full-window encoder for *interim* results; endpointing
    still runs the exact full-window pass for the final transcript.
  - interim decodes run over a **bucketed** encoder-state prefix
    (256/512/1024/1500 positions) so a handful of compiled decode
    programs serve every utterance length. The gap between real audio and
    the bucket edge is silence-encoded (zero mel) — matching how whisper
    always sees padded silence after speech in its training windows.

Per-chunk device work is therefore flat in utterance length: at most the
uncommitted tail blocks (bounded by the bucket gap) plus one KV-cached
greedy decode — instead of a full 30 s encode per chunk.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.models.whisper.model import (
    WhisperConfig,
    _split_heads,
    layer_norm,
    linear,
    mlp,
)
from open_speech_tpu.ops.attention import flash_attention

BLOCK_POS = 128  # encoder positions per block (2.56 s of audio)
DECODE_BUCKETS = (256, 512, 1024, 1500)
# confirmed-prefix ladder for interim decodes: forced token counts snap to
# these so prompt shapes stay bounded (see server/streaming.py work())
FORCED_BUCKETS = (16, 32, 64, 96, 128, 160)


def forced_bucket(n_confirmed_tokens: int, room: int = 1 << 30) -> int:
    """Largest ladder step <= the confirmed token count (0 below the
    ladder). ``room`` caps the step so sot + prefix + a generation tail
    still fit the model's text context (tiny test configs, long prefixes).
    """
    fb = 0
    for b in FORCED_BUCKETS:
        if b <= n_confirmed_tokens and b <= room:
            fb = b
    return fb


def forced_room(cfg, sot_len: int) -> int:
    """Max forced-prefix length leaving >=32 generated tokens + EOT."""
    return max(0, cfg.n_text_ctx - sot_len - 33)


# Hard cap on tokens GENERATED per interim decode. Real speech exits at
# EOT long before any cap (the decode is a while_loop); the cap only binds
# in the no-EOT pathology (noise/hallucination, where the tail is garbage
# anyway) and bounds the interim's device time so one decode can never
# blow the 100 ms chunk cadence by itself: 48 tokens ≈ 75 ms on a v5e vs
# 96-token worst cases measured at 147.6 ms (BENCH_r03). The confirmed
# prefix is FORCED (prefill, one pass), so steady-state hypotheses lose
# nothing; a long unconfirmed tail is simply confirmed over the next few
# interims instead of being re-generated whole in one.
INTERIM_TAIL_CAP = 48


def interim_budget(bucket: int, n_forced: int) -> int:
    """max_new_tokens for an interim decode at this (enc bucket, forced
    prefix) pair — the SINGLE source of the shape math, shared by the
    serving path and the load-time warmup so they cannot drift."""
    budget = min(224, max(32, (bucket * 12 * 2) // 100 + 16))
    budget = -(-budget // 16) * 16
    return max(32, min(INTERIM_TAIL_CAP, budget - n_forced))


def final_budget(bucket: int) -> int:
    """max_new_tokens for a FINAL decode over incremental encoder states.

    Finals decode the whole utterance fresh (no forced prefix, no
    interim tail cap — a 30 s window can carry 100+ real tokens), so the
    budget scales with the audio bucket up to whisper's 224-token window
    convention. Shared by the serving final path and warmup."""
    budget = min(224, max(32, (bucket * 12 * 2) // 100 + 16))
    return -(-budget // 16) * 16


def _encode_block_body(params, mel_seg, pos_start, kcache, vcache, enc_buf,
                       *, n_head: int, npos: int):
    """Encode ``npos`` new positions given the cached prefix.

    mel_seg: [B, n_mels, 2*npos + 4] — mel frames [2*P0-2, 2*(P0+npos)+2)
    zero-padded at the utterance edges, so the conv stem's receptive field
    matches the full encoder exactly (local position j=1 ↔ global P0+j-1
    after the stride-2 conv).
    kcache/vcache: [L, B, H, n_audio_ctx, Dh]; enc_buf: [B, n_audio_ctx, D].
    """
    enc = params["encoder"]
    x = mel_seg.transpose(0, 2, 1).astype(enc["conv1"]["w"].dtype)
    from open_speech_tpu.models.whisper.model import _conv1d

    x = jax.nn.gelu(_conv1d(x, enc["conv1"], 1), approximate=False)
    # zero conv1 outputs at global mel positions < 0: the full encoder's
    # stride-2 conv sees zero *padding* there, not computed activations
    g_idx = (2 * pos_start - 2) + jnp.arange(x.shape[1])
    x = x * (g_idx >= 0)[None, :, None]
    x = jax.nn.gelu(_conv1d(x, enc["conv2"], 2), approximate=False)
    x = jax.lax.dynamic_slice_in_dim(x, 1, npos, axis=1)  # valid interior
    pos = jax.lax.dynamic_slice_in_dim(
        enc["pos"], pos_start, npos, axis=0
    )
    x = x + pos
    kv_len = pos_start + npos

    def block(h, layer):
        bp, kc, vc = layer
        hn = layer_norm(h, bp["ln1"])
        q = _split_heads(linear(hn, bp["attn"]["q"]), n_head)
        k = _split_heads(linear(hn, bp["attn"]["k"]), n_head)
        v = _split_heads(linear(hn, bp["attn"]["v"]), n_head)
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k, pos_start, axis=2)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v, pos_start, axis=2)
        lens = jnp.full((h.shape[0],), kv_len, jnp.int32)
        att = flash_attention(q, kc, vc, causal=False, kv_length=lens)
        from open_speech_tpu.models.whisper.model import _merge_heads

        h = h + linear(_merge_heads(att), bp["attn"]["o"])
        h = h + mlp(layer_norm(h, bp["ln_mlp"]), bp)
        return h, (kc, vc)

    x, (kcache, vcache) = jax.lax.scan(
        block, x, (enc["blocks"], kcache, vcache)
    )
    x = layer_norm(x, enc["ln_post"])
    enc_buf = jax.lax.dynamic_update_slice_in_dim(enc_buf, x, pos_start, axis=1)
    return kcache, vcache, enc_buf


# Two jit entries over one body: committed blocks discard the old caches,
# so donating them lets XLA update the (large-v3: ~250 MB/session) KV +
# encoder buffers in place; interim tail blocks keep the committed state
# live and must copy.
_encode_block_impl = partial(
    jax.jit, static_argnames=("n_head", "npos")
)(_encode_block_body)
_encode_block_donating = partial(
    jax.jit, static_argnames=("n_head", "npos"), donate_argnums=(3, 4, 5)
)(_encode_block_body)


class StreamingWhisperEncoder:
    """Per-utterance incremental encoder state (one stream).

    ``append_audio`` buffers 16 kHz float PCM; committed blocks encode
    once and are never revisited. ``interim_states`` returns
    (enc_states [1, bucket, D], bucket) with the tail silence-encoded to
    the bucket edge — ready for ``greedy_decode``.
    """

    def __init__(self, params, cfg: WhisperConfig, block_pos: int = BLOCK_POS):
        self.params = params
        self.cfg = cfg
        self.block_pos = min(block_pos, cfg.n_audio_ctx)
        dh = cfg.n_audio_state // cfg.n_audio_head
        dtype = params["encoder"]["conv1"]["w"].dtype
        shape = (cfg.n_audio_layer, 1, cfg.n_audio_head, cfg.n_audio_ctx, dh)
        self._kc = jnp.zeros(shape, dtype)
        self._vc = jnp.zeros(shape, dtype)
        self._enc = jnp.zeros((1, cfg.n_audio_ctx, cfg.n_audio_state), dtype)
        self._pcm = np.zeros((0,), np.float32)
        self._committed = 0  # encoder positions encoded-and-cached
        self.block_encodes = 0  # committed-block call count (for tests)

    # ── audio plumbing ────────────────────────────────────────────────

    def append_audio(self, pcm: np.ndarray) -> None:
        self._pcm = np.concatenate([self._pcm, np.asarray(pcm, np.float32)])
        self._commit_full_blocks()

    @property
    def total_positions(self) -> int:
        """Encoder positions covered by buffered audio (2 mel frames each)."""
        return min(len(self._pcm) // 320, self.cfg.n_audio_ctx)

    def _mel_segment(self, p0: int, npos: int) -> jnp.ndarray:
        """Mel frames [2*p0-2, 2*(p0+npos)+2) with zero padding at edges.

        Two context frames each side guard the STFT's center/reflect
        padding so interior frames match the whole-utterance mel exactly.
        (One approximation remains: whisper's dynamic-range floor
        ``max - 8`` uses the segment max, not the final utterance max —
        it only binds on bins 8 decades under the peak.)
        """
        from open_speech_tpu.ops.mel import log_mel_spectrogram

        lo_f, hi_f = 2 * p0 - 2, 2 * (p0 + npos) + 2
        ctx = 2  # reflect padding reaches 200 samples = 1.25 frames
        lo_c = max(lo_f - ctx, 0)
        hi_c = hi_f + ctx
        seg = self._pcm[lo_c * 160 : hi_c * 160]
        want = (hi_c - lo_c) * 160
        if len(seg) < want:
            seg = np.pad(seg, (0, want - len(seg)))
        mel = log_mel_spectrogram(jnp.asarray(seg), n_mels=self.cfg.n_mels)
        start = max(lo_f, 0) - lo_c
        mel = mel[:, start : start + (hi_f - max(lo_f, 0))]
        if lo_f < 0:
            mel = jnp.pad(mel, ((0, 0), (-lo_f, 0)))
        return mel[None]  # [1, n_mels, 2*npos+4]

    def _commit_full_blocks(self) -> None:
        # +2 positions of margin: the last kept conv output reads one mel
        # frame past the block edge; commit only audio-backed states
        while (
            self.total_positions - self._committed >= self.block_pos + 2
            and self._committed < self.cfg.n_audio_ctx
        ):
            self._encode_block(self._committed, commit=True)

    def _encode_block(self, p0: int, commit: bool):
        mel_seg = self._mel_segment(p0, self.block_pos)
        impl = _encode_block_donating if commit else _encode_block_impl
        kc, vc, enc = impl(
            self.params, mel_seg, p0, self._kc, self._vc, self._enc,
            n_head=self.cfg.n_audio_head, npos=self.block_pos,
        )
        if commit:
            self._kc, self._vc, self._enc = kc, vc, enc
            self._committed = p0 + self.block_pos
            self.block_encodes += 1
        return kc, vc, enc

    # ── interim state for decoding ────────────────────────────────────

    def decode_bucket(self) -> int:
        need = min(self.total_positions, self.cfg.n_audio_ctx)
        for b in DECODE_BUCKETS:
            if b >= need and b <= self.cfg.n_audio_ctx:
                return b
        return min(DECODE_BUCKETS[-1], self.cfg.n_audio_ctx)

    @property
    def real_positions(self) -> int:
        """Audio-backed encoder positions (for masked cross-attention)."""
        return min(self.total_positions, self.cfg.n_audio_ctx)

    def interim_states(self):
        """(enc_states [1, bucket, D], bucket): committed prefix + a
        freshly-encoded tail covering the real-audio remainder. Tail
        blocks are recomputed per interim and not committed — per-chunk
        work stays bounded by ONE block, because only audio-backed blocks
        are encoded: positions between ``real_positions`` and the bucket
        edge stay zero and the decoder masks them out via ``enc_len``
        (re-encoding silence to the bucket edge cost ~4 blocks per interim
        at long utterances; measured 100 ms/chunk of the 239 ms interim
        budget on large-v3-turbo)."""
        bucket = self.decode_bucket()
        kc, vc, enc = self._kc, self._vc, self._enc
        p0 = self._committed
        last_start = self.cfg.n_audio_ctx - self.block_pos
        encode_to = min(
            bucket, -(-self.real_positions // self.block_pos) * self.block_pos
        )
        while p0 < encode_to:
            # a block starting past ctx-block_pos would clamp inside
            # dynamic_update_slice and desync positions from the mel
            # segment; start the final block earlier instead (the overlap
            # re-derives identical K/V — they depend only on that
            # position's conv features — and fresher outputs)
            start = min(p0, last_start)
            mel_seg = self._mel_segment(start, self.block_pos)
            kc, vc, enc = _encode_block_impl(
                self.params, mel_seg, start, kc, vc, enc,
                n_head=self.cfg.n_audio_head, npos=self.block_pos,
            )
            p0 = start + self.block_pos
        return enc[:, :bucket], bucket

    def reset(self) -> None:
        self._kc = jnp.zeros_like(self._kc)
        self._vc = jnp.zeros_like(self._vc)
        self._enc = jnp.zeros_like(self._enc)
        self._pcm = np.zeros((0,), np.float32)
        self._committed = 0
