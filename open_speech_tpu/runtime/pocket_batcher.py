"""Pocket-TTS continuous session batcher: a slot-pool for the Mimi-LM.

The reference synthesizes one pocket-tts request per thread
(src/main.py:781-828 thread-bridge over the backend's native generator,
src/tts/backends/pocket_tts_backend.py:157-166); under 64 concurrent
streams each request runs its own autoregressive LM loop and serializes
the chip. Here concurrent sessions share fused device programs, the same
slot-pool design as the STT continuous batcher (runtime/batcher.py):

  - a fixed-shape temporal KV pool ([L, S, H, max_ctx, Dh], S = slots)
    lives on device for the batcher's lifetime;
  - a joining session installs its voice-prompt caches into a free slot
    row, then ONE batched text prefill (per-row start/length masking in
    temporal_prefill) warms every joining row in a single program;
  - one jitted **pool group** advances ALL live slots ``block`` frames
    per host sync (a lax.scan of fused temporal+depformer steps with
    per-slot positions and per-slot delayed-stream live masks);
  - completed frame blocks decode through ONE batched stateful Mimi
    step; rows not emitting this group keep their stream state via a
    per-row select, so a row's PCM is bit-identical to running alone;
  - slots retire when their frame budget completes and are immediately
    reusable.

Every program has static shapes (slot count, group size, cache length),
so the scheduler never recompiles as sessions come and go. Generation is
temperature-0 (the serving default; PocketTTS.generate_stream remains
the path for sampled generation).

Row independence is pinned by tests/test_pocket_batcher.py: a row
batched with 63 neighbours produces the same audio as the same request
through PocketTTS.generate_stream alone.
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass, field
from functools import partial
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.models.pocket.lm import (
    PocketLMConfig,
    _rms,
    depformer_sample,
    embed_step,
    temporal_prefill,
    temporal_step,
)
from open_speech_tpu.models.pocket.mimi import (
    init_mimi_stream_state,
    mimi_decode_step,
    select_mimi_stream_rows,
    zero_mimi_stream_rows,
)
from open_speech_tpu.models.pocket.model import PromptState, _bucket

logger = logging.getLogger(__name__)

_STOP = object()


# ──────────────────────────────────────────────────────────────────────
# Device programs (all static-shaped: compile once per pool geometry)
# ──────────────────────────────────────────────────────────────────────


@partial(
    jax.jit,
    static_argnames=("cfg", "n_sub"),
    donate_argnums=(2, 3),
)
def _pool_group(
    params,
    cfg: PocketLMConfig,
    kc,
    vc,
    pos,
    audio_in,
    s0,
    n_steps_lim,
    max_frames,
    n_sub: int,
):
    """Advance every slot ``n_sub`` generation steps in one program.

    kc/vc: [L, S, H, max_ctx, Dh] temporal KV pool; pos [S] next cache
    write index; audio_in [S, n_q] this step's delayed-stream inputs;
    s0 [S] each slot's local step counter at group start; n_steps_lim
    [S] the slot's total step budget (frames + max_delay); max_frames
    [S] its frame budget. Dead/idle rows (s0 >= n_steps_lim) hold their
    position and keep feeding ``initial`` tokens — pure masked compute,
    no recompilation as sessions come and go.

    Returns (kc, vc, toks_seq [n_sub, S, n_q]) — the delayed-stream
    forced tokens per sub-step (the host's outs buffer append, and
    toks_seq[-1] is the next group's audio_in).
    """
    s_slots = audio_in.shape[0]
    delays = jnp.asarray(cfg.delays, jnp.int32)
    text_pad = jnp.full((s_slots,), cfg.text_pad_id, jnp.int32)
    key = jax.random.PRNGKey(0)  # temperature-0: key is never consulted
    temp = jnp.float32(0.0)

    def sub(carry, t):
        kc, vc, pos, audio_in = carry
        x = embed_step(params, cfg, text_pad, audio_in)
        h, (kc, vc) = temporal_step(params, cfg, x, (kc, vc), pos)
        hn = _rms(h, params["out_norm"])
        toks = depformer_sample(params, cfg, hn, text_pad, key, temp)
        s = s0 + t
        frame_idx = s[:, None] - delays[None, :]
        live = (frame_idx >= 0) & (frame_idx < max_frames[:, None])
        step_live = s < n_steps_lim
        forced = jnp.where(
            live & step_live[:, None], toks, cfg.audio_initial
        ).astype(jnp.int32)
        pos = pos + step_live.astype(pos.dtype)
        return (kc, vc, pos, forced), forced

    (kc, vc, _pos, _ain), toks_seq = jax.lax.scan(
        sub, (kc, vc, pos, audio_in), jnp.arange(n_sub)
    )
    return kc, vc, toks_seq


@partial(jax.jit, donate_argnums=(0, 1))
def _install_row(kc_pool, vc_pool, k1, v1, row):
    """Copy a batch-1 prompt cache ([L, 1, H, ctx, Dh]) into pool row."""
    def put(pool, src):
        return jax.lax.dynamic_update_slice(
            pool, src.astype(pool.dtype), (0, row, 0, 0, 0)
        )

    return put(kc_pool, k1), put(vc_pool, v1)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3, 4))
def _pool_prefill(params, cfg: PocketLMConfig, text_grid, kc, vc, start, length):
    """Batched text prefill over the POOL for joining rows only.

    text_grid [S, T_bucket]; start/length [S] — non-joining rows pass
    length 0 and keep their caches verbatim (temporal_prefill restores
    beyond start+length), so live sessions are untouched while any
    number of joiners warm up in one program.
    """
    s_slots, t = text_grid.shape
    # audio side of the prefill input is all-initial (text-only prefill):
    # a constant per-codebook embedding sum broadcast over [S, T]
    initial_vec = params["emb"][:, cfg.audio_initial].sum(axis=0)  # [D]
    x = params["text_emb"][text_grid] + initial_vec[None, None]
    _, (kc, vc) = temporal_prefill(
        params, cfg, x, (kc, vc), start, length=length
    )
    return kc, vc


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def _mimi_group(mimi_params, cfg, tokens, state, reset_mask, decode_mask):
    """One batched Mimi block decode with per-row state discipline.

    Rows in ``reset_mask`` start from a fresh stream (slot recycled);
    rows in ``decode_mask`` advance their stream state; all other rows
    keep their state untouched (their token block this group is
    placeholder data — lag phase or idle slot).
    """
    state_in = zero_mimi_stream_rows(state, reset_mask)
    pcm, stepped = mimi_decode_step(mimi_params, cfg, tokens, state_in)
    new_state = select_mimi_stream_rows(decode_mask, stepped, state_in)
    return pcm, new_state


# ──────────────────────────────────────────────────────────────────────
# Host-side scheduler
# ──────────────────────────────────────────────────────────────────────


@dataclass
class _Slot:
    active: bool = False
    out: "queue.Queue | None" = None
    max_frames: int = 0
    n_steps: int = 0  # max_frames + max_delay
    s_done: int = 0
    emitted: int = 0
    outs: np.ndarray | None = None  # [n_q, n_steps] decided tokens
    needs_reset: bool = False  # fresh slot: zero mimi rows at first decode
    samples_sent: int = 0
    total_samples: int = 0


@dataclass
class _Job:
    text: str
    state: PromptState | None
    out: queue.Queue
    seed_frames: int | None = None  # explicit max_frames override


class PocketBatcher:
    """Schedules concurrent pocket-tts sessions onto the slot pool."""

    def __init__(self, model, slots: int | None = None,
                 block_frames: int | None = None) -> None:
        from open_speech_tpu.config import settings

        self.model = model
        self.cfg: PocketLMConfig = model.lm_cfg
        self.slots = int(slots or settings.os_pocket_batch_slots)
        self.block = int(block_frames or settings.os_pocket_block_frames)
        self._queue: queue.Queue = queue.Queue()
        self._waiting: list[_Job] = []
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._stopping = False
        self._device_ready = False
        self.stats = {"groups": 0, "jobs": 0, "peak_live": 0}
        self._host_reset()

    # ── pool state ────────────────────────────────────────────────────

    def _host_reset(self) -> None:
        s, cfg = self.slots, self.cfg
        self._slots = [_Slot() for _ in range(s)]
        self._pos = np.zeros((s,), np.int32)
        self._audio_in = np.full((s, cfg.n_q), cfg.audio_initial, np.int32)
        self._s0 = np.zeros((s,), np.int32)
        self._n_steps = np.zeros((s,), np.int32)
        self._max_frames = np.zeros((s,), np.int32)
        self._reset_rows: set[int] = set()

    def _device_init(self) -> None:
        cfg = self.cfg
        dtype = self.model.lm_params["text_emb"].dtype
        shape = (cfg.n_layers, self.slots, cfg.n_heads, cfg.max_ctx,
                 cfg.head_dim)
        self._kc = jnp.zeros(shape, dtype)
        self._vc = jnp.zeros(shape, dtype)
        self._zero_prompt = (
            jnp.zeros(shape[:1] + (1,) + shape[2:], dtype),
            jnp.zeros(shape[:1] + (1,) + shape[2:], dtype),
        )
        self._mimi_state = init_mimi_stream_state(
            self.model.mimi_params, self.model.mimi_cfg, batch=self.slots
        )
        self._device_ready = True

    # ── public API ────────────────────────────────────────────────────

    def synthesize(
        self,
        text: str,
        state: PromptState | None,
        max_frames: int | None = None,
    ) -> Iterator[np.ndarray]:
        """Submit one utterance; yields float32 PCM blocks as they land."""
        if self._stopping:
            raise RuntimeError("pocket batcher stopped (model was reloaded)")
        self._ensure_thread()
        out: queue.Queue = queue.Queue()
        self._queue.put(_Job(text, state, out, max_frames))
        while True:
            item = out.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def stop(self) -> None:
        """End the scheduler thread and release device buffers.

        Same contract as TTSBatcher.stop: without it a replaced batcher
        pins its KV pool in HBM forever.
        """
        self._stopping = True
        self._queue.put(_STOP)

    def precompile(self) -> None:
        """Compile the pool programs ahead of traffic (install + prefill
        + group + mimi group — the first concurrent burst otherwise
        stalls behind every compile)."""
        list(self.synthesize("hi", None, max_frames=self.block * 2))

    # ── scheduler thread ──────────────────────────────────────────────

    def _ensure_thread(self) -> None:
        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(
                    target=self._loop, daemon=True, name="pocket-batcher"
                )
                self._thread.start()

    def _any_live(self) -> bool:
        return any(sl.active for sl in self._slots)

    def _loop(self) -> None:
        while True:
            try:
                self._drain_joins(
                    block=not self._any_live() and not self._waiting
                )
            except Exception:  # noqa: BLE001 — keep the scheduler alive
                logger.exception("pocket batcher join failed")
            if self._stopping:
                err = RuntimeError("pocket batcher stopped")
                while True:  # jobs still queued behind the STOP sentinel
                    try:
                        item = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    if item is not _STOP:
                        self._waiting.append(item)
                for sl in self._slots:
                    if sl.active and sl.out is not None:
                        sl.out.put(err)
                        sl.out.put(None)
                for job in self._waiting:
                    job.out.put(err)
                    job.out.put(None)
                # release the device buffers promptly
                self.model = None
                self._kc = self._vc = self._mimi_state = None
                return
            if not self._any_live():
                continue
            try:
                self._run_group()
            except Exception as e:  # noqa: BLE001
                logger.exception("pocket pool group failed")
                for sl in self._slots:
                    if sl.active and sl.out is not None:
                        sl.out.put(e)
                        sl.out.put(None)
                self._host_reset()

    # ── joins ─────────────────────────────────────────────────────────

    def _drain_joins(self, block: bool) -> None:
        import time

        jobs: list[_Job] = []
        try:
            item = self._queue.get(block=block)
            if item is _STOP:
                return
            jobs.append(item)
            if block and not self._stopping:
                # idle-pool burst gather: a concurrent wave lands within a
                # few ms; admitting it as ONE wave runs one pool prefill
                # instead of one per straggler (mid-serving arrivals are
                # already batched naturally by the group cadence)
                deadline = time.monotonic() + 0.005
                while len(jobs) < self.slots:
                    timeout = deadline - time.monotonic()
                    if timeout <= 0:
                        break
                    try:
                        item = self._queue.get(timeout=timeout)
                    except queue.Empty:
                        break
                    if item is _STOP:
                        # park collected jobs; the stop branch fails them
                        self._waiting.extend(jobs)
                        return
                    jobs.append(item)
            while True:
                item = self._queue.get_nowait()
                if item is _STOP:
                    self._waiting.extend(jobs)
                    return
                jobs.append(item)
        except queue.Empty:
            pass
        jobs = self._waiting + jobs
        self._waiting = []
        if not jobs:
            return
        free = [i for i, sl in enumerate(self._slots) if not sl.active]
        admit, defer = jobs[: len(free)], jobs[len(free):]
        self._waiting = defer
        if admit:
            self._install(admit, free[: len(admit)])

    def _install(self, jobs: list[_Job], rows: list[int]) -> None:
        """Install jobs into slot rows: prompt-cache copies + ONE
        batched text prefill over the pool."""
        if not self._device_ready:
            self._device_init()
        cfg = self.cfg
        max_delay = cfg.max_delay
        texts: list[tuple[int, list[int], int]] = []  # (row, ids, start)
        for job, row in zip(jobs, rows):
            state = job.state
            start = 0 if state is None else int(state.length)
            ids = (
                [cfg.text_bos_id]
                + self.model.tokenizer.encode(job.text)
                + [cfg.text_eos_id]
            )
            n_ids = min(len(ids), max(cfg.max_ctx - start - 2, 1))
            budget = cfg.max_ctx - start - n_ids - 1
            if budget - max_delay < 1:
                logger.warning(
                    "pocket batcher: context exhausted (start=%d, n_ids=%d, "
                    "max_ctx=%d); emitting nothing", start, n_ids, cfg.max_ctx,
                )
                job.out.put(None)
                continue
            if job.seed_frames is not None:
                max_frames = max(int(job.seed_frames), 1)
            else:
                max_frames = max(4, int(len(job.text) * 1.0))
            max_frames = min(max_frames, budget - max_delay)

            src = self._zero_prompt if state is None else (
                state.k_cache, state.v_cache
            )
            if src[0].shape[1] != 1:
                job.out.put(ValueError(
                    "pocket batcher serves single-stream prompt states "
                    f"(got batch={src[0].shape[1]})"
                ))
                job.out.put(None)
                continue
            self._kc, self._vc = _install_row(
                self._kc, self._vc, src[0], src[1], jnp.int32(row)
            )
            sl = self._slots[row]
            sl.active = True
            sl.out = job.out
            sl.max_frames = max_frames
            sl.n_steps = max_frames + max_delay
            sl.s_done = 0
            sl.emitted = 0
            sl.outs = np.full(
                (cfg.n_q, sl.n_steps + self.block), cfg.audio_initial,
                np.int32,
            )
            sl.needs_reset = True
            sl.samples_sent = 0
            sl.total_samples = (
                max_frames * self.model.mimi_cfg.samples_per_frame
            )
            self._pos[row] = start + n_ids
            self._audio_in[row] = cfg.audio_initial
            self._s0[row] = 0
            self._n_steps[row] = sl.n_steps
            self._max_frames[row] = max_frames
            texts.append((row, ids[:n_ids], start))
            self.stats["jobs"] += 1

        if not texts:
            return
        bucket = _bucket(
            max(len(ids) for _r, ids, _s in texts),
            cap=max(cfg.max_ctx - 1, 1),
        )
        grid = np.full((self.slots, bucket), cfg.text_pad_id, np.int32)
        start_v = np.zeros((self.slots,), np.int32)
        length_v = np.zeros((self.slots,), np.int32)
        for row, ids, start in texts:
            grid[row, : len(ids)] = ids
            start_v[row] = start
            length_v[row] = len(ids)
        self._kc, self._vc = _pool_prefill(
            self.model.lm_params, cfg, jnp.asarray(grid),
            self._kc, self._vc, jnp.asarray(start_v), jnp.asarray(length_v),
        )

    # ── groups ────────────────────────────────────────────────────────

    def _run_group(self) -> None:
        cfg = self.cfg
        block = self.block
        spf = self.model.mimi_cfg.samples_per_frame
        self._kc, self._vc, toks_seq = _pool_group(
            self.model.lm_params, cfg, self._kc, self._vc,
            jnp.asarray(self._pos), jnp.asarray(self._audio_in),
            jnp.asarray(self._s0), jnp.asarray(self._n_steps),
            jnp.asarray(self._max_frames), n_sub=block,
        )
        toks_seq = np.asarray(toks_seq)  # [block, S, n_q] — one readback
        self._audio_in = toks_seq[-1].copy()

        delays = np.asarray(cfg.delays)
        tokens = np.zeros((self.slots, cfg.n_q, block), np.int32)
        reset = np.zeros((self.slots,), bool)
        decode = np.zeros((self.slots,), bool)
        emits: list[tuple[_Slot, int, int]] = []  # (slot, row, n_samples)
        live_now = 0
        for row, sl in enumerate(self._slots):
            if not sl.active:
                continue
            live_now += 1
            live_steps = min(block, sl.n_steps - sl.s_done)
            if live_steps > 0:
                sl.outs[:, sl.s_done : sl.s_done + live_steps] = (
                    toks_seq[:live_steps, row].T
                )
            sl.s_done += max(live_steps, 0)
            self._s0[row] = sl.s_done
            self._pos[row] += max(live_steps, 0)
            ready = min(max(sl.s_done - cfg.max_delay, 0), sl.max_frames)
            finished = sl.s_done >= sl.n_steps
            n_new = 0
            if ready - sl.emitted >= block:
                n_new = block
            elif finished and ready > sl.emitted:
                n_new = ready - sl.emitted  # final partial block (padded)
            if n_new > 0:
                lo = sl.emitted
                for k in range(cfg.n_q):
                    seg = sl.outs[k, lo + delays[k] : lo + n_new + delays[k]]
                    tokens[row, k, :n_new] = seg
                    if n_new < block:  # pad by repeating the last frame
                        tokens[row, k, n_new:] = seg[-1]
                if sl.needs_reset:
                    reset[row] = True
                    sl.needs_reset = False
                decode[row] = True
                sl.emitted += n_new
                emits.append((sl, row, n_new * spf))

        self.stats["groups"] += 1
        self.stats["peak_live"] = max(self.stats["peak_live"], live_now)

        if decode.any():
            pcm, self._mimi_state = _mimi_group(
                self.model.mimi_params, self.model.mimi_cfg,
                jnp.asarray(np.clip(tokens, 0, self.model.mimi_cfg.card - 1)),
                self._mimi_state, jnp.asarray(reset), jnp.asarray(decode),
            )
            pcm = np.asarray(pcm, np.float32)  # [S, block*spf]
            for sl, row, n_samples in emits:
                sl.out.put(pcm[row, :n_samples].copy())
                sl.samples_sent += n_samples

        # retire finished rows
        for row, sl in enumerate(self._slots):
            if sl.active and sl.s_done >= sl.n_steps and (
                sl.emitted >= sl.max_frames
            ):
                sl.out.put(None)
                sl.active = False
                sl.out = None
                sl.outs = None
                self._n_steps[row] = 0
                self._max_frames[row] = 0
                self._s0[row] = 0


# ──────────────────────────────────────────────────────────────────────
# Registry (one batcher per loaded model, mirroring tts_batcher)
# ──────────────────────────────────────────────────────────────────────

_batchers: dict[int, PocketBatcher] = {}
_registry_lock = threading.Lock()


def get_pocket_batcher(backend) -> PocketBatcher:
    """One batcher per loaded pocket model (live-object identity check:
    a reload must not keep serving the previous weights)."""
    key = id(backend)
    with _registry_lock:
        b = _batchers.get(key)
        if b is None or b.model is not backend._model:
            if b is not None:
                b.stop()
            b = PocketBatcher(backend._model)
            _batchers[key] = b
        return b


def release_pocket_batcher(backend) -> None:
    """Stop and drop the batcher for an unloading backend (frees HBM)."""
    key = id(backend)
    with _registry_lock:
        b = _batchers.pop(key, None)
    if b is not None:
        b.stop()


def pocket_batcher_stats() -> dict:
    with _registry_lock:
        return {str(k): dict(b.stats) for k, b in _batchers.items()}


def reset_pocket_batchers() -> None:
    with _registry_lock:
        for b in _batchers.values():
            b.stop()
        _batchers.clear()
