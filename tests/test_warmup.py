"""Serving-shape warmup: no compiles after "model loaded".

Round-2 evidence: encoder-only warmup left the decode loop, prefill,
beam-5 and streaming programs compiling on the first request
(BENCH_r02 "asr compile=245s", "ttfa@64 compile=90s"). These tests
assert the warmup really covers the serving shapes by counting XLA
compilations (jax_log_compiles emits one pxla "Compiling jit(...)"
line per program build) during a post-load request: the count must
be zero.
"""

from __future__ import annotations

import logging

import numpy as np
import pytest

import jax

from open_speech_tpu.config import settings
from open_speech_tpu.ops import audio as codec


class _CompileCounter(logging.Handler):
    def __init__(self) -> None:
        super().__init__(level=logging.DEBUG)
        self.compiles: list[str] = []

    def emit(self, record: logging.LogRecord) -> None:
        msg = record.getMessage()
        if msg.startswith("Compiling "):
            self.compiles.append(msg)


class _count_compiles:
    """Context manager: collects XLA program builds while active."""

    def __enter__(self):
        self._logger = logging.getLogger("jax._src.interpreters.pxla")
        self._handler = _CompileCounter()
        self._old_level = self._logger.level
        self._logger.addHandler(self._handler)
        self._logger.setLevel(logging.DEBUG)
        jax.config.update("jax_log_compiles", True)
        return self._handler

    def __exit__(self, *exc):
        jax.config.update("jax_log_compiles", False)
        self._logger.removeHandler(self._handler)
        self._logger.setLevel(self._old_level)
        return False


@pytest.fixture()
def warm_backend(monkeypatch):
    from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend

    monkeypatch.setattr(settings, "os_precompile_on_load", True)
    # 48-token budget = the bucket a ~3 s clip lands in (keeps the test
    # fast; production default warms the 224 full-window bucket)
    monkeypatch.setattr(settings, "os_stt_precompile_budgets", "48")
    backend = JaxWhisperBackend()
    backend.load_model("test-tiny")
    return backend


def test_stt_no_compiles_after_warmup(warm_backend):
    # 4 s spans >3 test-tiny windows (1.2 s each), so the seek loop also
    # exercises the prev-text-conditioning prompt buckets — the shapes the
    # round-3 warmup gained after an encoder+first-window-only warmup left
    # them compiling mid-request on long files
    wav = codec.write_wav(
        np.random.default_rng(0)
        .uniform(-0.2, 0.2, 4 * 16000)
        .astype(np.float32),
        16000,
    )
    with _count_compiles() as counter:
        for beam in (1, 5):
            warm_backend.transcribe(
                wav, "test-tiny", language="en", beam_size=beam,
                fallback=False,
            )
    assert counter.compiles == [], (
        f"{len(counter.compiles)} programs compiled on first request: "
        f"{counter.compiles[:5]}"
    )


def test_streaming_encoder_warm(warm_backend):
    from open_speech_tpu.models.whisper.streaming import (
        StreamingWhisperEncoder,
    )

    entry = warm_backend._models["test-tiny"]
    with _count_compiles() as counter:
        enc = StreamingWhisperEncoder(entry["params"], entry["cfg"])
        enc.append_audio(np.zeros(16000, np.float32))
        enc.interim_states()
    assert counter.compiles == [], counter.compiles[:5]


def test_batched_longform_shapes_warm():
    """With OS_STT_BATCHED_LONGFORM on, the load-time warmup must cover the
    batched encode/decode rungs (bare AND prompted prompt shapes) so the
    first long upload never compiles.

    Runs in a fresh subprocess (tests/warmup_batched_worker.py): XLA:CPU's
    LLVM codegen segfaults intermittently when these — the suite's largest
    CPU compiles — run after hundreds of prior in-process compiles; a
    clean interpreter removes that state. STRICT zero-compile assertion on
    the worker's output: even sub-second helper programs (gathers, slices)
    violate the "first long upload never compiles" invariant and would
    mask a real warmup gap appearing next to them.
    """
    import subprocess
    import sys
    from pathlib import Path

    worker = Path(__file__).parent / "warmup_batched_worker.py"
    proc = subprocess.run(
        [sys.executable, str(worker)],
        capture_output=True, text=True, timeout=900,
        cwd=str(Path(__file__).parent.parent),
    )
    assert proc.returncode == 0, (
        f"worker failed rc={proc.returncode}\nstdout: {proc.stdout[-2000:]}"
        f"\nstderr: {proc.stderr[-2000:]}"
    )
    assert "WARMUP_OK compiles=0" in proc.stdout, (
        f"programs compiled on first batched request:\n{proc.stdout[-2000:]}"
    )


def test_tts_batcher_all_buckets_precompiled(monkeypatch):
    """Every configured bucket (incl. 64) compiles at load, and a 64-wide
    burst afterwards builds no new programs (round-2 weak #1)."""
    from open_speech_tpu.runtime.tts_batcher import TTSBatcher
    from open_speech_tpu.tts.backends.kokoro_backend import KokoroBackend

    b = KokoroBackend()
    b.load_model("kokoro")
    batcher = TTSBatcher(b._params, b._cfg)
    batcher.precompile(buckets=(1, 4))
    ids = b._encode_text("warm bucket check", "en-us")
    style = np.zeros(2 * b._cfg.style_dim, np.float32)
    with _count_compiles() as counter:
        for _ in batcher.synthesize(ids, style, 1.0):
            pass
    assert counter.compiles == [], counter.compiles[:5]


def test_interim_forced_prefix_decode_warm(warm_backend):
    """The streaming interim decode — forced confirmed-prefix prompt,
    enc_len-masked cross-attention, ladder budgets — must be covered by
    the load-time warmup at every (bucket, forced) pair the session can
    produce, else ladder crossings compile mid-stream."""
    from open_speech_tpu.models.whisper.decode import (
        DecodeOptions,
        greedy_decode,
    )
    from open_speech_tpu.models.whisper.streaming import (
        DECODE_BUCKETS,
        FORCED_BUCKETS,
        StreamingWhisperEncoder,
        forced_room,
        interim_budget,
    )

    entry = warm_backend._models["test-tiny"]
    cfg = entry["cfg"]
    sp = entry["tok"].special
    sot = list(sp.sot_sequence("en", "transcribe", timestamps=False))
    enc = StreamingWhisperEncoder(entry["params"], cfg)
    enc.append_audio(np.zeros(16000, np.float32))
    enc_states, bucket = enc.interim_states()
    top = max([b for b in DECODE_BUCKETS if b <= cfg.n_audio_ctx],
              default=cfg.n_audio_ctx)
    fbs = (0, 16, 32) if bucket < top else (0,) + FORCED_BUCKETS
    fbs = tuple(f for f in fbs if f <= forced_room(cfg, len(sot)))
    assert fbs, "test config leaves no forced-prefix room at all"
    with _count_compiles() as counter:
        for fb in fbs:
            prompt = np.array([sot + [sp.eot - 1] * fb], np.int32)
            greedy_decode(
                entry["params"], cfg, sp, enc_states, prompt,
                DecodeOptions(
                    language="en", timestamps=False, beam_size=1,
                    max_new_tokens=interim_budget(bucket, fb),
                    suppress_blank=True,
                ),
                enc_len=np.array([enc.real_positions], np.int32),
            )
    assert counter.compiles == [], counter.compiles[:5]
