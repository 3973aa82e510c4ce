"""Pocket-TTS (Kyutai): Mimi-token LM TTS with audio-prompt voice cloning.

Top-level model tying together the two halves:

  - ``mimi.py``: the Mimi neural codec (SEANet + transformer + split-RVQ);
  - ``lm.py``: the delayed-streams temporal+depth transformer LM.

Serving surface mirrors the ``pocket_tts.TTSModel`` API the reference wraps
(src/tts/backends/pocket_tts_backend.py:91,132,157):

  - ``state_for_audio_prompt(pcm)``  — encode a reference clip to Mimi
    tokens and teacher-force them through the temporal stack, returning the
    warmed KV caches (the voice);
  - ``generate_stream(text, state)`` — prefill the text, then sample audio
    frames autoregressively, streaming PCM blocks as frames complete
    through the exact block-streaming Mimi decoder.

Weights load via ``convert.py`` from a torch ``state_dict`` (moshi naming);
``random_init`` exists so the full path runs without a checkpoint.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.models.pocket.lm import (
    PocketLMConfig,
    TEST_TINY_LM,
    _rms,
    depformer_sample,
    embed_step,
    init_caches,
    init_pocket_lm_params,
    temporal_prefill,
    temporal_step,
)
from open_speech_tpu.models.pocket.mimi import (
    MimiConfig,
    TEST_TINY,
    MimiStreamingDecoder,
    init_mimi_params,
    mimi_encode,
)

logger = logging.getLogger(__name__)

SAMPLE_RATE = 24_000

# random-init / oracle defaults; real checkpoints override via
# PocketLMConfig.text_{pad,bos,eos}_id (see convert.load_checkpoint)
TEXT_PAD, TEXT_BOS, TEXT_EOS = 0, 1, 2


class ByteTokenizer:
    """Byte-level fallback text tokenizer.

    The real pocket-tts checkpoint ships a sentencepiece model; when one is
    provided the converter wires it in instead (``load_checkpoint``). Bytes
    map into [3, text_card) so any vocab size works.
    """

    def __init__(self, text_card: int):
        self.span = text_card - 3

    def encode(self, text: str) -> list[int]:
        return [3 + (b % self.span) for b in text.encode("utf-8")]


class SentencePieceTokenizer:
    """Real checkpoint tokenizer: NATIVE sentencepiece ids, no offset.

    moshi-family checkpoints index ``text_emb`` rows by the raw sp ids the
    model was trained with; the special pad/bos/eos ids live in the release
    config (``PocketLMConfig.text_pad_id`` etc.), not at a fixed 0/1/2.
    """

    def __init__(self, model_path: str):
        import sentencepiece  # gated: not baked into this image

        self.sp = sentencepiece.SentencePieceProcessor(model_file=model_path)

    def encode(self, text: str) -> list[int]:
        return list(self.sp.encode(text))


@dataclass
class PromptState:
    """Warmed temporal KV caches after ingesting an audio (voice) prompt."""

    k_cache: jax.Array
    v_cache: jax.Array
    length: int  # steps already in the cache

    @property
    def caches(self):
        return (self.k_cache, self.v_cache)


def _delayed_grid(cfg: PocketLMConfig, tokens: np.ndarray) -> np.ndarray:
    """Frame tokens [B, K, F] → delayed step-input grid [B, K, F]."""
    b, k, f = tokens.shape
    grid = np.full((b, k, f), cfg.audio_initial, np.int32)
    for i, d in enumerate(cfg.delays):
        if d < f:
            grid[:, i, d:] = tokens[:, i, : f - d]
    return grid


_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)


def _bucket(n: int, cap: int) -> int:
    """Smallest serving bucket ≥ n (≤ cap): prefill shapes stay constant
    across requests so each geometry compiles once."""
    for b in _BUCKETS:
        if b >= n:
            return min(b, cap)
    return cap


@partial(jax.jit, static_argnames=("cfg",))
def _prefill(params, cfg: PocketLMConfig, text_toks, audio_grid, caches, start, n):
    """Teacher-force a (bucket-padded) segment; returns updated caches only.

    ``n`` is the valid step count — padded steps beyond it neither attend
    nor persist in the cache (temporal_prefill length masking).
    """
    per_cb = jnp.take_along_axis(
        params["emb"][:, None], audio_grid.transpose(1, 0, 2)[..., None], axis=2
    )
    x = params["text_emb"][text_toks] + per_cb.sum(axis=0)
    _, caches = temporal_prefill(params, cfg, x, caches, start, length=n)
    return caches


@partial(jax.jit, static_argnames=("cfg",))
def _gen_step(params, cfg: PocketLMConfig, text_tok, dep_text_tok, audio_in,
              caches, pos, key, temp):
    """One generation step → (audio tokens [B, n_q], text logits, caches)."""
    x = embed_step(params, cfg, text_tok, audio_in)
    h, caches = temporal_step(params, cfg, x, caches, pos)
    hn = _rms(h, params["out_norm"])
    text_logits = hn @ params["text_linear"]["w"]
    toks = depformer_sample(params, cfg, hn, dep_text_tok, key, temp)
    return toks, text_logits, caches


class PocketTTS:
    """The pocket-tts model: codec + LM + generation loop."""

    sample_rate = SAMPLE_RATE

    def __init__(self, lm_params, mimi_params, lm_cfg: PocketLMConfig,
                 mimi_cfg: MimiConfig, tokenizer=None):
        assert lm_cfg.n_q == mimi_cfg.n_q and lm_cfg.card == mimi_cfg.card, (
            "LM and codec token spaces must agree"
        )
        self.lm_params = lm_params
        self.mimi_params = mimi_params
        self.lm_cfg = lm_cfg
        self.mimi_cfg = mimi_cfg
        self.tokenizer = tokenizer or ByteTokenizer(lm_cfg.text_card)
        self.sample_rate = mimi_cfg.sample_rate

    @classmethod
    def from_checkpoint(cls, path) -> "PocketTTS":
        """Load converted weights from a kyutai release dir / weight file."""
        from open_speech_tpu.models.pocket.convert import load_checkpoint

        return load_checkpoint(path)

    @classmethod
    def random_init(cls, key, lm_cfg: PocketLMConfig | None = None,
                    mimi_cfg: MimiConfig | None = None, dtype=jnp.float32):
        lm_cfg = lm_cfg or TEST_TINY_LM
        mimi_cfg = mimi_cfg or TEST_TINY
        k1, k2 = jax.random.split(key)
        return cls(
            init_pocket_lm_params(k1, lm_cfg, dtype),
            init_mimi_params(k2, mimi_cfg, dtype),
            lm_cfg,
            mimi_cfg,
        )

    # ── voice prompt (clone path) ────────────────────────────────────

    def encode_audio(self, pcm: np.ndarray, cap: int | None = None) -> np.ndarray:
        """PCM (24 kHz float mono, [T] or [B, T]) → Mimi tokens [B, K, F].

        The waveform is zero-padded up to a whole-frame *bucket* so encode
        compiles once per bucket, and the causal encoder's tokens for the
        real frames are unaffected; only those frames are returned.
        ``cap`` bounds the frame count (callers that will truncate anyway —
        the prompt path keeps max_ctx//2 — pass it so the over-long tail is
        never encoded or compiled for).
        """
        pcm = np.atleast_2d(np.asarray(pcm, np.float32))
        spf = self.mimi_cfg.samples_per_frame
        frames = max(1, -(-pcm.shape[1] // spf))
        fbucket = _bucket(frames, cap=cap or self.lm_cfg.max_ctx)
        frames = min(frames, fbucket)
        padded = np.zeros((pcm.shape[0], fbucket * spf), np.float32)
        n_copy = min(pcm.shape[1], fbucket * spf)
        padded[:, :n_copy] = pcm[:, :n_copy]
        toks = np.asarray(
            mimi_encode(self.mimi_params, self.mimi_cfg, jnp.asarray(padded))
        )
        return toks[:, :, :frames]

    def state_for_audio_prompt(self, pcm: np.ndarray) -> PromptState:
        """Reference clip → warmed LM state (the cloned voice).

        Mirrors pocket_tts ``get_state_for_audio_prompt``
        (reference pocket_tts_backend.py:132).
        """
        cfg = self.lm_cfg
        # bound the prompt so text + generation still fit in max_ctx
        max_prompt = cfg.max_ctx // 2
        tokens = self.encode_audio(pcm, cap=max_prompt)
        tokens = tokens[:, :, :max_prompt]
        grid = _delayed_grid(cfg, tokens)
        b, _, steps = grid.shape
        pad_to = _bucket(steps, cap=max_prompt)
        padded = np.full((b, cfg.n_q, pad_to), cfg.audio_initial, np.int32)
        padded[:, :, :steps] = grid
        text = np.full((b, pad_to), cfg.text_pad_id, np.int32)
        caches = init_caches(cfg, b, self.lm_params["text_emb"].dtype)
        caches = _prefill(
            self.lm_params, cfg, jnp.asarray(text), jnp.asarray(padded),
            caches, jnp.int32(0), jnp.int32(steps),
        )
        return PromptState(*caches, length=steps)

    # ── generation ────────────────────────────────────────────────────

    def generate_stream(
        self,
        text: str,
        state: PromptState | None = None,
        *,
        max_frames: int | None = None,
        temperature: float = 0.0,
        seed: int = 0,
        block_frames: int = 2,
        frames_per_char: float = 1.0,
    ) -> Iterator[np.ndarray]:
        """Yield PCM float32 blocks (24 kHz) as frames complete.

        With no ``state`` the model speaks in its unconditioned voice.
        Deterministic for (text, state, seed, temperature).
        """
        cfg = self.lm_cfg
        ids = [cfg.text_bos_id] + self.tokenizer.encode(text) + [cfg.text_eos_id]
        if state is None:
            caches = init_caches(cfg, 1, self.lm_params["text_emb"].dtype)
            start = 0
        else:
            if state.k_cache.shape[1] != 1:
                raise ValueError(
                    "generate_stream is single-stream: PromptState carries "
                    f"batch={state.k_cache.shape[1]} (build it from one mono "
                    "clip, or run one generate_stream per voice)"
                )
            caches = state.caches
            start = state.length

        n_ids = min(len(ids), max(cfg.max_ctx - start - 2, 1))
        if max_frames is None:
            max_frames = max(4, int(len(text) * frames_per_char))
        max_delay = cfg.max_delay
        budget = cfg.max_ctx - start - n_ids - 1
        if budget - max_delay < 1:
            # KV budget exhausted (prompt state + text fill max_ctx): there
            # is no room to emit even one frame — forcing one would push
            # pos past max_ctx and the clamped cache write would silently
            # corrupt the last slot (review finding)
            logger.warning(
                "pocket generate_stream: context exhausted "
                "(start=%d, n_ids=%d, max_ctx=%d); emitting nothing",
                start, n_ids, cfg.max_ctx,
            )
            return
        max_frames = min(max_frames, budget - max_delay)

        # text prefill: audio streams silent (initial); ids padded to a
        # shape bucket so any text length reuses one compiled program
        pad_to = _bucket(n_ids, cap=max(cfg.max_ctx - start - 1, 1))
        text_np = np.full((1, pad_to), cfg.text_pad_id, np.int32)
        text_np[0, :n_ids] = ids[:n_ids]
        audio_grid = jnp.full((1, cfg.n_q, pad_to), cfg.audio_initial, jnp.int32)
        caches = _prefill(
            self.lm_params, cfg, jnp.asarray(text_np), audio_grid, caches,
            jnp.int32(start), jnp.int32(n_ids),
        )
        pos = start + n_ids

        key = jax.random.PRNGKey(seed)
        temp = jnp.float32(temperature)
        delays = np.asarray(cfg.delays)
        n_steps = max_frames + max_delay
        outs = np.full((cfg.n_q, n_steps), cfg.audio_initial, np.int32)
        audio_in = jnp.full((1, cfg.n_q), cfg.audio_initial, jnp.int32)
        text_pad = jnp.full((1,), cfg.text_pad_id, jnp.int32)
        decoder = MimiStreamingDecoder(
            self.mimi_params, self.mimi_cfg, block_frames=block_frames
        )
        emitted = 0

        for s in range(n_steps):
            key, sub = jax.random.split(key)
            toks, _text_logits, caches = _gen_step(
                self.lm_params, cfg, text_pad, text_pad, audio_in, caches,
                jnp.full((1,), pos, jnp.int32), sub, temp,
            )
            # streams whose frame index (s - delay) is out of range stay initial
            frame_idx = s - delays
            live = (frame_idx >= 0) & (frame_idx < max_frames)
            forced = np.where(live, np.asarray(toks[0]), cfg.audio_initial)
            outs[:, s] = forced
            audio_in = jnp.asarray(forced[None].astype(np.int32))
            pos += 1

            done = s + 1 - max_delay  # frames fully decided so far
            ready = min(done, max_frames)
            if ready - emitted >= block_frames or (
                ready == max_frames and ready > emitted
            ):
                frames = np.stack(
                    [
                        outs[k, emitted + delays[k] : ready + delays[k]]
                        for k in range(cfg.n_q)
                    ]
                )[None]
                emitted = ready
                yield decoder.feed(frames)[0]

    def generate(self, text: str, state: PromptState | None = None, **kw):
        """Non-streaming convenience: full waveform [T]."""
        blocks = list(self.generate_stream(text, state, **kw))
        if not blocks:  # context exhausted / max_frames<=0 yields nothing
            return np.zeros((0,), np.float32)
        return np.concatenate(blocks)
