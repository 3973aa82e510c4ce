"""Concurrent TTS request batching (no reference counterpart).

The reference synthesizes one request per thread on the torch backend
(src/main.py:781-828 thread-bridge); on TPU that serializes the chip.
Here concurrent synthesis jobs gather into one batched device program: a
request arriving while others are in flight shares their device step, so
p50 TTFA under concurrency stays near the single-stream number (bench:
147 ms p50 at 64 kokoro streams vs 55 ms at 1).

Two schedulers share the gather/queue/thread shell (``_BatchScheduler``):

  - ``TTSBatcher`` — kokoro-family: batched text encode + blockwise
    streaming vocoder (audio leaves the chip block by block);
  - ``PiperBatcher`` — VITS: one batched ``synthesize_vits`` program per
    bucket (VITS renders the full utterance in one masked pass — there
    is no autoregressive loop to stream).

(The autoregressive pocket-tts LM needs slot-pool continuous batching
instead — ``runtime/pocket_batcher.py``.)

Thread-facing by design: every serving path (REST thread-bridge,
Wyoming, realtime executor) calls the backend's sync generator, so jobs
arrive from worker threads and results flow back over thread-safe
queues; one daemon scheduler thread owns the device.

Row independence: every kokoro/piper op is per-row (masked norms,
per-row LSTM lengths, per-row frame masks), so a batched row equals the
same request synthesized alone — pinned by tests/test_tts_batcher.py.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

BATCH_BUCKETS = (1, 4, 16, 64)  # few buckets = few compiled programs
GATHER_WINDOW_S = 0.010  # wait this long for peers before launching
_STOP = object()  # queue sentinel ending a stopped batcher's thread


def _bucket(n: int) -> int:
    for b in BATCH_BUCKETS:
        if n <= b:
            return b
    return BATCH_BUCKETS[-1]


class _BatchScheduler:
    """Queue/gather/thread shell shared by the batched-TTS schedulers.

    Subclasses implement ``_run_batch(jobs)`` — jobs are
    ``(*payload, out_queue)`` tuples; the implementation must put PCM
    chunks then ``None`` on every job's queue.
    """

    def __init__(self, params, cfg, max_batch: int = 64) -> None:
        self.params = params
        self.cfg = cfg
        # the bucket arrays in _run_batch are sized by BATCH_BUCKETS;
        # a larger max_batch would index past them and fail every
        # co-batched request
        self.max_batch = min(max_batch, BATCH_BUCKETS[-1])
        self._queue: queue.Queue = queue.Queue()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._stopping = False
        self._last_batch_end = 0.0
        self.stats = {"batches": 0, "jobs": 0, "peak_batch": 0}

    def _ensure_thread(self) -> None:
        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(
                    target=self._loop, daemon=True,
                    name=type(self).__name__.lower(),
                )
                self._thread.start()

    def stop(self) -> None:
        """End the scheduler thread and release the params reference.

        Without this, a replaced batcher (model reload) leaves a daemon
        thread blocked on its private queue forever, pinning the old
        device parameter set — repeated reloads leak HBM until OOM.
        """
        self._stopping = True
        self._queue.put(_STOP)

    def submit(self, payload: tuple) -> Iterator[np.ndarray]:
        """Submit one job; yields float32 audio chunks as they land."""
        if self._stopping:
            raise RuntimeError(
                f"{type(self).__name__} stopped (model was reloaded)"
            )
        self._ensure_thread()
        out: queue.Queue = queue.Queue()
        self._queue.put((*payload, out))
        while True:
            item = out.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    # ── scheduler thread ──────────────────────────────────────────────

    def _gather(self) -> list:
        import time

        jobs = [self._queue.get()]
        # idle arrival with no queued peers: launch immediately — the
        # gather window would add its full length to every solo
        # request's TTFA for nothing. Requests landing during the
        # in-flight batch queue up and coalesce on the next pass, and a
        # recent batch (<50 ms ago) implies a burst, so then we do wait.
        if (
            self._queue.empty()
            and time.monotonic() - self._last_batch_end > 0.05
        ):
            return jobs
        deadline = time.monotonic() + GATHER_WINDOW_S
        while len(jobs) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                jobs.append(self._queue.get(timeout=timeout))
            except queue.Empty:
                break
        return jobs

    def _loop(self) -> None:
        import time

        while True:
            jobs = self._gather()
            if self._stopping:
                err = RuntimeError(f"{type(self).__name__} stopped")
                for job in jobs:
                    if job is not _STOP:
                        job[-1].put(err)
                        job[-1].put(None)
                self.params = None  # release the device buffers promptly
                return
            jobs = [j for j in jobs if j is not _STOP]
            if not jobs:
                continue
            try:
                self._run_batch(jobs)
            except Exception as e:  # noqa: BLE001
                logger.exception("TTS batch failed")
                for *_rest, out in jobs:
                    out.put(e)
                    out.put(None)
            self._last_batch_end = time.monotonic()

    def _count(self, jobs: list) -> None:
        self.stats["batches"] += 1
        self.stats["jobs"] += len(jobs)
        self.stats["peak_batch"] = max(self.stats["peak_batch"], len(jobs))

    def _run_batch(self, jobs: list) -> None:  # pragma: no cover
        raise NotImplementedError


class TTSBatcher(_BatchScheduler):
    """Batches kokoro-family synthesis jobs onto shared device programs."""

    def precompile(self, buckets=(4,)) -> None:
        """Compile the batched programs ahead of traffic: the first
        concurrent burst otherwise stalls behind bucket compiles (measured
        minutes through a remote-device relay; cached afterwards).

        The warmup utterance is long enough that vocode_streaming emits the
        first block AND at least one steady-state block — both programs must
        compile here, or the first real request still pays one."""
        ids = list(range(1, 33))  # ~32 phonemes => several vocoder blocks
        for b in buckets:
            sink: queue.Queue = queue.Queue()
            jobs = [(ids, np.zeros(2 * self.cfg.style_dim, np.float32),
                     1.0, sink)] * b
            self._run_batch(jobs)
            while sink.get() is not None:  # drain
                pass

    def synthesize(
        self,
        phoneme_ids: list[int],
        style: np.ndarray,
        speed: float,
    ) -> Iterator[np.ndarray]:
        """Submit one utterance; yields float32 audio chunks as they land."""
        return self.submit((phoneme_ids, style, speed))

    def _run_batch(self, jobs: list) -> None:
        from open_speech_tpu.models.kokoro.model import (
            encode_utterance,
            vocode_streaming,
        )

        cfg = self.cfg
        n = len(jobs)
        b = _bucket(min(n, self.max_batch))
        phonemes = np.zeros((b, cfg.max_phonemes), np.int32)
        lengths = np.ones((b,), np.int32)
        styles = np.zeros((b, 2 * cfg.style_dim), np.float32)
        speeds = np.ones((b,), np.float32)
        for i, (ids, style, speed, _out) in enumerate(jobs):
            ids = list(ids)[: cfg.max_phonemes]
            phonemes[i, : len(ids)] = ids
            lengths[i] = max(len(ids), 1)
            styles[i] = style
            speeds[i] = speed if speed and speed > 0 else 1.0

        g, n_frames = encode_utterance(
            self.params, cfg,
            jnp.asarray(phonemes), jnp.asarray(lengths),
            jnp.asarray(styles), jnp.asarray(speeds),
        )
        totals = None  # n_frames readback deferred past the first dispatch
        emitted = np.zeros((b,), np.int64)
        queues = [out for *_r, out in jobs]
        # per-row keys: a row's noise draws don't depend on who it is
        # batched with, so batched output == solo output
        row_rngs = jnp.tile(jax.random.PRNGKey(0)[None, :], (b, 1))
        for block in vocode_streaming(
            self.params, cfg, g, n_frames, rng=row_rngs,
            block_frames=32, first_block_frames=16, wire="i16",
        ):
            if totals is None:
                # n_frames is already host-resident here (vocode_streaming
                # read it while the first block computed); syncing it before
                # the generator started would serialize a relay round-trip
                # in front of the TTFA-critical first-block dispatch
                totals = np.asarray(n_frames) * cfg.samples_per_frame
            width = block.shape[1]
            for i, out in enumerate(queues):
                take = int(min(width, totals[i] - emitted[i]))
                if take > 0:
                    out.put(np.asarray(block[i, :take], np.float32))
                    emitted[i] += take
        for out in queues:
            out.put(None)
        self._count(jobs)


class PiperBatcher(_BatchScheduler):
    """Batches piper/VITS jobs: one ``synthesize_vits`` call per bucket.

    VITS renders the whole (masked) utterance in one feed-forward
    program, so the batch IS the streaming unit: every job's full PCM
    lands after one device step shared by up to ``max_batch`` peers —
    replacing the reference's one-onnxruntime-session-per-thread model
    (src/tts/backends/piper_backend.py:296).
    """

    def precompile(self, buckets=(4,)) -> None:
        ids = list(range(1, 17))
        for b in buckets:
            sink: queue.Queue = queue.Queue()
            jobs = [(ids, 0, 1.0, 0, sink)] * b
            self._run_batch(jobs)
            while sink.get() is not None:
                pass

    def synthesize(
        self,
        phoneme_ids: list[int],
        speaker_id: int,
        speed: float,
        seed: int,
    ) -> Iterator[np.ndarray]:
        """Submit one piece; yields its float32 PCM (a single chunk)."""
        return self.submit((phoneme_ids, speaker_id, speed, seed))

    def _run_batch(self, jobs: list) -> None:
        from open_speech_tpu.models.piper.model import synthesize_vits

        cfg = self.cfg
        b = _bucket(min(len(jobs), self.max_batch))
        phonemes = np.zeros((b, cfg.max_phonemes), np.int32)
        lengths = np.ones((b,), np.int32)
        speakers = np.zeros((b,), np.int32)
        speeds = np.ones((b,), np.float32)
        seeds = np.zeros((b,), np.uint32)
        for i, (ids, speaker, speed, seed, _out) in enumerate(jobs):
            ids = list(ids)[: cfg.max_phonemes]
            phonemes[i, : len(ids)] = ids
            lengths[i] = max(len(ids), 1)
            speakers[i] = speaker
            speeds[i] = speed if speed and speed > 0 else 1.0
            seeds[i] = np.uint32(seed)
        # per-row fold: a row's dp/z noise depends only on its own seed,
        # making batched output equal solo output (pinned by tests)
        audio, n_frames = _piper_rows(
            self.params, cfg,
            jnp.asarray(phonemes), jnp.asarray(lengths),
            jnp.asarray(speakers), jnp.asarray(speeds),
            jnp.asarray(seeds),
        )
        totals = np.asarray(n_frames) * cfg.samples_per_frame
        audio = np.asarray(audio, np.float32)
        for i, (*_r, out) in enumerate(jobs):
            out.put(audio[i, : int(totals[i])])
            out.put(None)
        self._count(jobs)


def _piper_rows(params, cfg, phonemes, lengths, speakers, speeds, seeds):
    """synthesize_vits with per-row noise drawn from per-row seeds.

    synthesize_vits draws batch-shaped noise from ONE key — fine for a
    fixed batch, but a batcher mixes arbitrary requests, so each row's
    noise must be a function of the row alone. Noise tensors are drawn
    per-row (vmapped fold) and injected via the explicit dp/z overrides.
    """
    from open_speech_tpu.models.piper.model import synthesize_vits

    def row_noise(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        k1, k2 = jax.random.split(key)
        dp = jax.random.normal(k1, (cfg.max_phonemes, 2)) * cfg.noise_scale_w
        z = jax.random.normal(k2, (cfg.max_frames, cfg.hidden))
        return dp, z

    dp_noise, z_noise = jax.vmap(row_noise)(seeds)
    return synthesize_vits(
        params, cfg, phonemes, lengths, speakers, speeds,
        jax.random.PRNGKey(0), dp_noise=dp_noise, z_noise=z_noise,
    )


# ──────────────────────────────────────────────────────────────────────
# Registries: one batcher per loaded parameter set
# ──────────────────────────────────────────────────────────────────────

_batchers: dict[tuple, _BatchScheduler] = {}
_registry_lock = threading.Lock()


def get_tts_batcher(backend) -> TTSBatcher:
    """One batcher per loaded parameter set.

    Keyed by backend identity with a live-object check on the params —
    id(params) alone can collide when a reload reuses a freed address,
    which would silently serve the previous weights."""
    key = ("kokoro", id(backend))
    with _registry_lock:
        b = _batchers.get(key)
        if b is None or b.params is not backend._params:
            if b is not None:
                b.stop()  # end the old thread; drop the old params
            b = TTSBatcher(backend._params, backend._cfg)
            _batchers[key] = b
        return b


def get_piper_batcher(backend, mid: str) -> PiperBatcher:
    """One batcher per loaded piper voice (params set)."""
    params, cfg, _meta = backend._models[mid]
    key = ("piper", id(backend), mid)
    with _registry_lock:
        b = _batchers.get(key)
        if b is None or b.params is not params:
            if b is not None:
                b.stop()
            b = PiperBatcher(params, cfg)
            _batchers[key] = b
        return b


def release_piper_batcher(backend, mid: str) -> None:
    """Stop the batcher of an unloading piper voice (frees its params)."""
    key = ("piper", id(backend), mid)
    with _registry_lock:
        b = _batchers.pop(key, None)
    if b is not None:
        b.stop()


def tts_batcher_stats() -> dict:
    with _registry_lock:  # snapshot: get_tts_batcher may insert concurrently
        return {
            "/".join(str(p) for p in k): dict(b.stats)
            for k, b in _batchers.items()
        }


def reset_tts_batchers() -> None:
    with _registry_lock:
        for b in _batchers.values():
            b.stop()
        _batchers.clear()
