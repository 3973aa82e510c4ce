"""JAX Whisper STT backend — the TPU replacement for faster-whisper/CT2.

Drop-in for the reference backend (src/backends/faster_whisper.py): same
protocol methods, same response formats, same TTL bookkeeping attribute names
(``_models`` / ``_last_used``, which the lifecycle daemon reaches into,
src/lifecycle.py:45-73), same HF-cache scan/delete surface (:93-208).

Model ids: native ids (``whisper-large-v3-turbo``) plus the reference's CT2
repo ids as aliases (``deepdml/faster-whisper-large-v3-turbo-ct2``,
``Systran/faster-whisper-*``) so existing configs keep working. Weights load
from disk when a checkpoint directory exists (HF cache layout or
STT_MODEL_DIR); otherwise the model initializes randomly with a warning —
architecture, shapes, and serving behavior are identical either way (this
deployment has no network egress).
"""

from __future__ import annotations

import logging
import os
import re
import shutil
import threading
import time
from pathlib import Path
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.config import settings
from open_speech_tpu.models.whisper import PRESETS, get_tokenizer, init_params
from open_speech_tpu.models.whisper.convert import load_params
from open_speech_tpu.models.whisper.model import WhisperConfig, encode
from open_speech_tpu.models.whisper.transcribe import (
    TranscribeOptions,
    build_response,
    transcribe,
)
from open_speech_tpu.ops import audio as codec
from open_speech_tpu.ops.mel import log_mel_spectrogram, pad_or_trim
from open_speech_tpu.schemas import LoadedModelInfo

logger = logging.getLogger(__name__)

# reference CT2 repo id -> native preset name
ALIASES: dict[str, str] = {
    "Systran/faster-whisper-tiny": "tiny",
    "Systran/faster-whisper-tiny.en": "tiny.en",
    "Systran/faster-whisper-base": "base",
    "Systran/faster-whisper-base.en": "base.en",
    "Systran/faster-whisper-small": "small",
    "Systran/faster-whisper-small.en": "small.en",
    "Systran/faster-whisper-medium": "medium",
    "Systran/faster-whisper-medium.en": "medium.en",
    "Systran/faster-whisper-large-v2": "large-v2",
    "Systran/faster-whisper-large-v3": "large-v3",
    "deepdml/faster-whisper-large-v3-turbo-ct2": "large-v3-turbo",
    "Systran/faster-distil-whisper-large-v3": "distil-large-v3",
    # distil .en family: MUST stay explicit — the fuzzy tail-strip would
    # map them onto the non-distil presets (wrong decoder depth)
    "Systran/faster-distil-whisper-small.en": "distil-small.en",
    "Systran/faster-distil-whisper-medium.en": "distil-medium.en",
    "distil-whisper/distil-small.en": "distil-small.en",
    "distil-whisper/distil-medium.en": "distil-medium.en",
    "distil-whisper/distil-large-v3": "distil-large-v3",
    "openai/whisper-large-v3-turbo": "large-v3-turbo",
    "openai/whisper-large-v3": "large-v3",
    # committed EOT-trained fixture (tools/finetune_tiny_eot.py): same
    # test-tiny geometry, weights that actually emit <|endoftext|> /
    # <|nospeech|> so bench/tests can exercise the stop and gate paths
    "test-tiny-eot": "test-tiny",
}


def resolve_preset(model_id: str) -> str | None:
    """Map any accepted model id onto a preset name."""
    if model_id in ALIASES:
        return ALIASES[model_id]
    name = model_id.removeprefix("whisper-")
    if name in PRESETS:
        return name
    # fuzzy: strip org prefix / ct2 suffixes from arbitrary repo ids
    tail = model_id.split("/")[-1].lower()
    is_distil = "distil" in tail
    tail = re.sub(r"^(faster-|distil-)?whisper-", "", tail)
    tail = re.sub(r"(-ct2.*|-turbo-ct2.*)$", "", tail)
    for candidate in (tail, tail.replace("_", "-")):
        if is_distil and not candidate.startswith("distil-"):
            # a distil repo id must NEVER land on the full-depth preset
            # (wrong decoder depth: checkpoint load crashes, random init
            # silently serves the wrong architecture)
            candidate = f"distil-{candidate}"
        if candidate in PRESETS:
            return candidate
    return None


class JaxWhisperBackend:
    """STTBackend implementation on JAX/XLA/Pallas."""

    name = "jax-whisper"

    def __init__(self) -> None:
        self._models: dict[str, dict[str, Any]] = {}  # id -> {params, cfg, tok}
        self._last_used: dict[str, float] = {}
        self._loaded_at: dict[str, float] = {}
        self._compute_type = settings.stt_compute_type
        self._load_lock = threading.Lock()

    @property
    def _device(self) -> str:
        # lazy: jax.default_backend() at import time would freeze backend
        # selection before the server can pin JAX_PLATFORMS
        return jax.default_backend()

    # ── weights ───────────────────────────────────────────────────────

    def _dtype(self):
        return {
            "bfloat16": jnp.bfloat16,
            "float16": jnp.bfloat16,  # TPU has no fp16; bf16 is the analog
            "float32": jnp.float32,
            "int8": jnp.bfloat16,  # base dtype; weights packed to int8 below
        }.get(self._compute_type, jnp.bfloat16)

    def _weight_dirs(self, model_id: str) -> list[Path]:
        roots: list[Path] = []
        if settings.stt_model_dir:
            roots.append(Path(settings.stt_model_dir).expanduser())
        for env in ("HF_HUB_CACHE", "HUGGINGFACE_HUB_CACHE"):
            if os.environ.get(env):
                roots.append(Path(os.environ[env]).expanduser())
        roots.append(Path.home() / ".cache" / "huggingface" / "hub")
        dirs = []
        for root in roots:
            dirs.append(root / model_id)
            safe = f"models--{model_id.replace('/', '--')}"
            snap_root = root / safe / "snapshots"
            if snap_root.is_dir():
                dirs.extend(sorted(snap_root.iterdir(), reverse=True))
        return dirs

    def _find_checkpoint(self, model_id: str) -> Path | None:
        for d in self._weight_dirs(model_id):
            if d.is_dir() and any(
                (d / f).exists()
                for f in ("model.safetensors", "model.safetensors.index.json")
            ):
                return d
            if d.is_dir() and any(p.suffix in (".pt", ".bin") for p in d.iterdir()):
                return d
        return None

    # ── protocol: lifecycle ───────────────────────────────────────────

    def load_model(self, model_id: str) -> None:
        if model_id in self._models:
            self._last_used[model_id] = time.time()
            return
        with self._load_lock:
            # double-checked: concurrent loads (session startup + batcher
            # _ensure_model race) must not overwrite the entry with a second
            # params object — downstream holders compare by identity
            if model_id in self._models:
                self._last_used[model_id] = time.time()
                return
            self._load_model_locked(model_id)

    def _load_model_locked(self, model_id: str) -> None:
        preset = resolve_preset(model_id)
        if preset is None:
            raise ValueError(f"Unknown whisper model id: {model_id}")
        cfg: WhisperConfig = PRESETS[preset]
        ckpt = self._find_checkpoint(model_id)
        t0 = time.time()
        if ckpt is not None:
            logger.info("Loading %s weights from %s", model_id, ckpt)
            params, cfg = load_params(str(ckpt), cfg, dtype=self._dtype())
            tok = get_tokenizer(str(ckpt), n_vocab=cfg.n_vocab, n_langs=cfg.n_langs)
        else:
            logger.warning(
                "No checkpoint on disk for %s — initializing random weights "
                "(architecture/serving identical; WER meaningless)",
                model_id,
            )
            params = init_params(jax.random.PRNGKey(0), cfg, dtype=self._dtype())
            tok = get_tokenizer(n_vocab=cfg.n_vocab, n_langs=cfg.n_langs)
        if self._compute_type == "int8":
            from open_speech_tpu.models.whisper.quantize import (
                quantize_whisper_params,
            )

            params = quantize_whisper_params(params)
            logger.info("Quantized %s weights to int8 (per-channel)", model_id)
        params = self._maybe_shard(params)
        self._models[model_id] = {"params": params, "cfg": cfg, "tok": tok}
        now = time.time()
        self._loaded_at[model_id] = now
        self._last_used[model_id] = now
        logger.info("Loaded %s (%s) in %.1fs", model_id, preset, now - t0)
        if settings.os_precompile_on_load:
            self._warmup(model_id)
            # the sweep can run many minutes on a cold compile cache; the
            # TTL clock must start at READINESS, not at weight load —
            # otherwise the reaper counts warmup time as idle time and can
            # evict the model the moment it becomes servable
            self._last_used[model_id] = time.time()

    def _maybe_shard(self, params):
        """Tensor-parallel placement when OS_TPU_MESH asks for a model axis.

        GSPMD propagates the param shardings through every jitted entry
        point (encode/decode/transcribe), inserting ICI collectives — the
        serving-side counterpart of the reference's single-GPU CT2 engine
        (reference: src/backends/faster_whisper.py:40 device selection).
        """
        spec = (settings.os_tpu_mesh or "").strip()
        if not spec:
            return params
        try:
            from open_speech_tpu.parallel.mesh import mesh_from_settings, shard_params

            mesh = mesh_from_settings()
            if mesh.shape.get("model", 1) <= 1 and mesh.shape.get("data", 1) <= 1:
                return params
            params = shard_params(params, mesh)
            logger.info(
                "Sharded whisper params over mesh %s (tensor parallel)",
                dict(mesh.shape),
            )
            return params
        except Exception:  # noqa: BLE001 — never let TP placement break serving
            logger.exception("OS_TPU_MESH sharding failed; serving unsharded")
            return params

    def _warmup(self, model_id: str) -> None:
        """Precompile every serving-shape program, not just the encoder.

        Round-2 evidence for why: with encoder-only warmup the decode loop,
        prefill, beam-5 and streaming-block programs all compiled on first
        request — minutes of first-request latency on a cold cache
        (BENCH_r02: "asr compile=245s"). The warmup drives the real
        transcribe() entry twice (greedy + beam-5, the REST default quality
        path) at the full-window decode budget, plus the incremental
        streaming encoder's block program when streaming is enabled.

        The individual compile drives are independent (distinct program
        shapes; XLA compilation is thread-safe), so they run on a small
        thread pool (OS_WARMUP_PARALLEL, default 4): the sweep is ~50
        sequential programs at 10-40 s each through a relayed chip —
        parallelism converts a 10-20 min cold start into a few minutes.
        """
        entry = self._models[model_id]
        cfg = entry["cfg"]
        window_samples = cfg.n_audio_ctx * 2 * 160  # hop=160
        t0 = time.time()
        tasks: list = []  # independent compile drives, run pooled at the end

        def _run_tasks() -> None:
            try:
                workers = max(
                    1, int(os.environ.get("OS_WARMUP_PARALLEL", "4"))
                )
            except ValueError:
                workers = 4

            def safe(fn):
                try:
                    fn()
                except Exception:  # noqa: BLE001 — warmup never blocks load
                    logger.exception("STT warmup task failed (%s)", model_id)

            if workers <= 1:
                for fn in tasks:
                    safe(fn)
                return
            import concurrent.futures as _fut

            with _fut.ThreadPoolExecutor(
                max_workers=workers, thread_name_prefix="stt-warmup"
            ) as pool:
                futs = [pool.submit(safe, fn) for fn in tasks]
                for f in futs:
                    f.result()
        try:
            mel = log_mel_spectrogram(
                pad_or_trim(jnp.zeros(window_samples), window_samples),
                n_mels=cfg.n_mels,
            )
            encode(entry["params"], mel[None], cfg).block_until_ready()
        except Exception:  # noqa: BLE001 — warmup must never block load
            logger.exception("Warmup mel/encode stage failed (%s)", model_id)
            return
        # mel front-end ladder: transcribe() pads audio to bucketed window
        # counts (+1 silent window) and slices via a traced-start program —
        # warm the first rungs (short/typical files); deeper rungs compile
        # once each (sub-second mel-only programs)
        try:
            from open_speech_tpu.models.whisper.transcribe import _mel_window

            for nw in (1, 2, 3, 4):
                padded = jnp.zeros((nw + 1) * window_samples, jnp.float32)
                m = log_mel_spectrogram(padded, n_mels=cfg.n_mels)
                _mel_window(
                    m, jnp.int32(0), fpw=cfg.n_audio_ctx * 2
                ).block_until_ready()
        except Exception:  # noqa: BLE001
            logger.exception("STT warmup (mel ladder) failed")
        # 30 s of silence drives mel+encode+detect+prefill+decode through
        # the public path at budget 224 (every full window of a long file).
        # fallback=False: silence must not trigger the temperature-retry
        # programs. language pinned (detect_language warms separately below).
        wav = codec.write_wav(np.zeros(window_samples, np.float32), 16000)
        budgets = {
            int(b)
            for b in str(settings.os_stt_precompile_budgets).split(",")
            if b.strip()
        }
        # (beam, temperature): greedy, beam-5 (REST default), and one
        # sampled decode — `sampled` is a static jit arg, so a single t>0
        # program covers every temperature-fallback retry.
        for beam, temp in ((1, 0.0), (5, 0.0), (1, 0.2)):
            for budget in sorted(budgets):
                tasks.append(
                    lambda beam=beam, temp=temp, budget=budget: (
                        self._run_inference(
                            wav, model_id, language="en", beam_size=beam,
                            temperature=temp, fallback=False,
                            _budget_override=budget,
                        )
                    )
                )
        # prev-text conditioning buckets: from the second window of a long
        # file on, the seek loop prepends [startofprev] + prev (bucketed to
        # 4/8/16/... — transcribe._bucket_prev), each a distinct prompt
        # shape => a distinct XLA program. Warm them here so a long file
        # never stalls on a mid-request compile.
        try:
            from open_speech_tpu.models.whisper.transcribe import (
                TranscribeOptions,
                _decode_with_fallback,
            )

            sp = entry["tok"].special
            enc_out = encode(entry["params"], mel[None], cfg)
            room = cfg.n_text_ctx // 2 - 1
            prev_buckets = [
                int(b)
                for b in str(settings.os_stt_precompile_prev_buckets).split(",")
                if b.strip() and int(b) < room
            ]
            # `room` itself is always in _bucket_prev's ladder and is the
            # steady-state shape of long transcriptions — always warm it
            prev_buckets.append(room)
            for beam, temp in ((1, 0.0), (5, 0.0), (1, 0.2)):
                for bucket in prev_buckets:
                    prompt = (
                        [sp.startofprev]
                        + [sp.eot - 1] * bucket
                        + list(sp.sot_sequence("en", "transcribe"))
                    )
                    for budget in sorted(budgets):
                        tasks.append(
                            lambda beam=beam, temp=temp, budget=budget,
                            prompt=list(prompt): _decode_with_fallback(
                                entry["params"], cfg, entry["tok"], enc_out,
                                np.array([prompt], np.int32),
                                TranscribeOptions(
                                    language="en", beam_size=beam,
                                    temperature=(temp,),
                                    max_new_tokens=budget,
                                    compression_ratio_threshold=None,
                                    logprob_threshold=None,
                                ),
                            )
                        )
        except Exception:  # noqa: BLE001
            logger.exception("STT warmup (prev buckets) failed")
        try:  # language-detect program (used when language is omitted)
            from open_speech_tpu.models.whisper.decode import detect_language

            tasks.append(
                lambda: detect_language(
                    entry["params"], cfg, entry["tok"].special,
                    encode(entry["params"], mel[None], cfg),
                )
            )
        except Exception:  # noqa: BLE001
            logger.exception("STT warmup (detect) failed")
        if settings.os_stt_batched_longform:
            try:  # batched long-form rungs: one (encode, decode) per bucket
                from open_speech_tpu.models.whisper.batched import (
                    BATCH_BUCKETS,
                    _decode_rows_with_fallback,
                )
                from open_speech_tpu.models.whisper.transcribe import (
                    TranscribeOptions,
                )

                sp = entry["tok"].special
                maxw = max(1, min(
                    int(settings.os_stt_batch_windows), BATCH_BUCKETS[-1]
                ))
                from open_speech_tpu.models.whisper.batched import (
                    BATCHED_PREV_LEN,
                )

                sot = sp.sot_sequence("en", "transcribe", timestamps=True)
                fb = min(BATCHED_PREV_LEN, cfg.n_text_ctx // 2 - 1)
                prompts = [np.asarray([sot], np.int32)]
                if fb > 0:
                    # prompted uploads prefix a canonical-length
                    # [startofprev]+prev block (batched.BATCHED_PREV_LEN):
                    # exactly one extra shape per rung to warm
                    prompts.append(np.asarray(
                        [[sp.startofprev] + [sp.eot - 1] * fb + list(sot)],
                        np.int32,
                    ))
                def _warm_rung(rung: int) -> None:
                    m = log_mel_spectrogram(
                        jnp.zeros((rung, window_samples), jnp.float32),
                        n_mels=cfg.n_mels,
                    )
                    enc_b = encode(entry["params"], m, cfg)
                    # beam-5 t=0 (REST default), greedy t=0, one sampled
                    # program (covers every fallback retry — `sampled` is
                    # the static arg, not the temperature value)
                    for beam, temp in ((5, 0.0), (1, 0.0), (1, 0.2)):
                        for budget in sorted(budgets):
                            for prompt in prompts:
                                _decode_rows_with_fallback(
                                    entry["params"], cfg, entry["tok"],
                                    enc_b, prompt,
                                    TranscribeOptions(
                                        language="en", beam_size=beam,
                                        temperature=(temp,),
                                        max_new_tokens=budget,
                                        compression_ratio_threshold=None,
                                        logprob_threshold=None,
                                        no_speech_threshold=None,
                                    ),
                                )

                for rung in (b for b in BATCH_BUCKETS if b <= maxw):
                    tasks.append(lambda rung=rung: _warm_rung(rung))
            except Exception:  # noqa: BLE001
                logger.exception("STT warmup (batched long-form) failed")
        if settings.os_stream_incremental:
            try:  # block-causal incremental encoder program (streaming WS)
                from open_speech_tpu.models.whisper.decode import (
                    DecodeOptions,
                    greedy_decode,
                )
                from open_speech_tpu.models.whisper.streaming import (
                    DECODE_BUCKETS,
                    FORCED_BUCKETS,
                    StreamingWhisperEncoder,
                    final_budget,
                    forced_room,
                    interim_budget,
                )

                senc = StreamingWhisperEncoder(entry["params"], cfg)
                senc.append_audio(np.zeros(16000, np.float32))
                senc.interim_states()
                # interim decode programs: keyed by (enc bucket, prompt len,
                # budget) with enc_len-masked cross-attention. Warm fb 0/16/32
                # at every bucket and the full forced ladder at the top
                # bucket (long utterances are where big prefixes occur) —
                # otherwise each ladder crossing compiles mid-stream.
                sp = entry["tok"].special
                sot = list(sp.sot_sequence("en", "transcribe", timestamps=False))
                buckets = [b for b in DECODE_BUCKETS if b <= cfg.n_audio_ctx]
                if cfg.n_audio_ctx not in buckets:
                    buckets.append(cfg.n_audio_ctx)
                room = forced_room(cfg, len(sot))
                def _warm_interim(bucket: int, fb: int) -> None:
                    enc_states = jnp.zeros(
                        (1, bucket, cfg.n_audio_state), self._dtype()
                    )
                    prompt = np.array([sot + [sp.eot - 1] * fb], np.int32)
                    greedy_decode(
                        entry["params"], cfg, sp, enc_states, prompt,
                        DecodeOptions(
                            language="en", timestamps=False, beam_size=1,
                            max_new_tokens=interim_budget(bucket, fb),
                            suppress_blank=True,
                        ),
                        enc_len=np.array([bucket], np.int32),
                    )

                def _warm_final(bucket: int) -> None:
                    enc_states = jnp.zeros(
                        (1, bucket, cfg.n_audio_state), self._dtype()
                    )
                    greedy_decode(
                        entry["params"], cfg, sp, enc_states,
                        np.array([sot], np.int32),
                        DecodeOptions(
                            language="en", timestamps=False, beam_size=1,
                            max_new_tokens=final_budget(bucket),
                            suppress_blank=True,
                        ),
                        enc_len=np.array([bucket], np.int32),
                    )

                for bucket in buckets:
                    fbs = (0, 16, 32) if bucket < buckets[-1] else (
                        (0,) + FORCED_BUCKETS
                    )
                    for fb in (f for f in fbs if f <= room):
                        tasks.append(
                            lambda bucket=bucket, fb=fb: _warm_interim(
                                bucket, fb
                            )
                        )
                    # incremental FINAL program: fresh decode, full budget
                    if final_budget(bucket) != interim_budget(bucket, 0):
                        tasks.append(
                            lambda bucket=bucket: _warm_final(bucket)
                        )
            except Exception:  # noqa: BLE001
                logger.exception("STT warmup (streaming) failed")
        _run_tasks()
        logger.info(
            "STT serving-shape warmup for %s done in %.1fs (%d programs)",
            model_id, time.time() - t0, len(tasks),
        )

    def unload_model(self, model_id: str) -> None:
        # popping the registry entry releases the last reference to the
        # params pytree; XLA frees the HBM when the arrays are collected
        if self._models.pop(model_id, None) is not None:
            logger.info("Unloaded %s", model_id)
        self._last_used.pop(model_id, None)
        self._loaded_at.pop(model_id, None)

    def loaded_models(self) -> list[LoadedModelInfo]:
        ttl = settings.os_model_ttl
        now = time.time()
        out = []
        for mid in list(self._models):  # snapshot: loads insert concurrently
            last = self._last_used.get(mid)
            out.append(
                LoadedModelInfo(
                    model=mid,
                    backend=self.name,
                    device=self._device,
                    compute_type=self._compute_type,
                    loaded_at=self._loaded_at.get(mid, 0.0),
                    last_used_at=last,
                    is_default=(mid == settings.stt_model),
                    ttl_remaining=(
                        max(0.0, ttl - (now - (last or now))) if ttl > 0 else None
                    ),
                )
            )
        return out

    def is_model_loaded(self, model_id: str) -> bool:
        return model_id in self._models

    # ── cache management (reference :93-208) ─────────────────────────

    def _cache_roots(self) -> list[Path]:
        roots = []
        if settings.stt_model_dir:
            roots.append(Path(settings.stt_model_dir).expanduser())
        for env in ("HF_HUB_CACHE", "HUGGINGFACE_HUB_CACHE"):
            if os.environ.get(env):
                roots.append(Path(os.environ[env]).expanduser())
        roots.append(Path.home() / ".cache" / "huggingface" / "hub")
        return roots

    def list_cached_models(self) -> list[dict[str, Any]]:
        result = []
        seen = set()
        for root in self._cache_roots():
            if not root.is_dir():
                continue
            for entry in root.iterdir():
                name = entry.name
                if not name.startswith("models--"):
                    continue
                mid = name.removeprefix("models--").replace("--", "/")
                if mid in seen or resolve_preset(mid) is None:
                    continue
                seen.add(mid)
                size = sum(
                    f.stat().st_size for f in entry.rglob("*") if f.is_file()
                )
                result.append(
                    {
                        "model": mid,
                        "backend": self.name,
                        "size_mb": round(size / 1e6),
                        "path": str(entry),
                    }
                )
        return result

    def is_model_cached(self, model_id: str) -> bool:
        return self._find_checkpoint(model_id) is not None

    def delete_cached_model(self, model_id: str) -> bool:
        deleted = False
        safe = f"models--{model_id.replace('/', '--')}"
        for root in self._cache_roots():
            for cand in (root / safe, root / model_id):
                if cand.is_dir() and root.resolve() in cand.resolve().parents:
                    shutil.rmtree(cand)
                    deleted = True
        return deleted

    # ── protocol: inference ───────────────────────────────────────────

    def _ensure_model(self, model_id: str) -> dict[str, Any]:
        # get-then-load loop, not check-then-index: the lifecycle sweep
        # (event-loop thread) can evict between a membership test and the
        # lookup, which would turn a valid request into a KeyError 500
        for _ in range(3):
            entry = self._models.get(model_id)
            if entry is not None:
                self._last_used[model_id] = time.time()
                return entry
            self.load_model(model_id)
        raise RuntimeError(
            f"model {model_id!r} kept being evicted during load"
        )

    def detect_language_pcm(self, model_id: str, pcm: np.ndarray) -> str:
        """Detect the spoken language of (up to) the first 30 s window.

        Used by the streaming session to pin auto-detect sessions after
        ~1 s of speech so they can ride the shared continuous batcher
        (the batcher keys prompts by (model, language) and must never
        coerce an unknown language to English). Runs the same warmed
        detect program as REST auto-detection (see _warm_model)."""
        from open_speech_tpu.models.whisper.decode import detect_language
        from open_speech_tpu.models.whisper.model import encode

        entry = self._ensure_model(model_id)
        cfg = entry["cfg"]
        window_samples = cfg.n_audio_ctx * 2 * 160
        mel = log_mel_spectrogram(
            pad_or_trim(jnp.asarray(pcm, jnp.float32), window_samples),
            n_mels=cfg.n_mels,
        )
        enc_out = encode(entry["params"], mel[None], cfg)
        codes, _probs = detect_language(
            entry["params"], cfg, entry["tok"].special, enc_out
        )
        return str(codes[0])

    def _run_inference(
        self,
        audio: bytes,
        model_id: str,
        task: str = "transcribe",
        language: str | None = None,
        response_format: str = "json",
        temperature: float = 0.0,
        prompt: str | None = None,
        beam_size: int = 5,
        fallback: bool = True,
        _budget_override: int | None = None,
    ) -> dict[str, Any]:
        entry = self._ensure_model(model_id)
        pcm, rate = codec.read_wav(audio) if codec.is_wav(audio) else (
            codec.pcm16_to_float(audio),
            16000,
        )
        if rate != 16000:
            from open_speech_tpu.ops.resample import resample_poly

            pcm = np.asarray(resample_poly(jnp.asarray(pcm), 16000, rate))
        temps: tuple[float, ...] = (
            (temperature,)
            if temperature > 0 or not fallback
            else (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
        )
        # Decode budget scales with audio duration (whisper emits well under
        # 12 tokens/s incl. timestamps); bucketed to multiples of 16 so the
        # jitted decode loop sees a bounded set of static bounds.
        duration_s = len(pcm) / 16000
        budget = min(224, int(duration_s * 12) + 12)
        budget = -(-budget // 16) * 16
        # ride an already-warmed decode program when one covers this
        # budget: the while_loop exits at EOT, so a larger static bound
        # costs ~nothing at runtime, while an unwarmed bound compiles
        # greedy+beam programs mid-request (minutes through a relay)
        warmed = sorted(
            int(b)
            for b in str(settings.os_stt_precompile_budgets).split(",")
            if b.strip().isdigit()
        )
        covering = [w for w in warmed if w >= budget]
        if covering:
            budget = covering[0]
        if _budget_override is not None:  # warmup pins the serving bucket
            budget = _budget_override
        opts = TranscribeOptions(
            task=task,
            language=language if task == "transcribe" else None,
            beam_size=beam_size,
            temperature=temps,
            initial_prompt=prompt,
            max_new_tokens=budget,
            compression_ratio_threshold=2.4 if fallback else None,
            logprob_threshold=-1.0 if fallback else None,
        )
        draft = None
        draft_id = str(settings.os_spec_draft_model or "").strip()
        if (
            draft_id
            and draft_id != model_id
            and beam_size == 1
            and temps[0] == 0.0  # sampled-only requests never verify
        ):
            try:
                d_entry = self._ensure_model(draft_id)
                if d_entry["cfg"].n_vocab == entry["cfg"].n_vocab:
                    draft = {
                        "params": d_entry["params"],
                        "cfg": d_entry["cfg"],
                        "gamma": int(settings.os_spec_gamma),
                    }
                else:
                    logger.warning(
                        "spec draft %s vocab mismatch; disabled", draft_id
                    )
            except Exception:  # noqa: BLE001 — draft is an accelerator only
                logger.exception(
                    "spec draft %s failed to load; decoding without it",
                    draft_id,
                )
        window_s = entry["cfg"].n_audio_ctx * 2 * 0.01
        if (
            bool(settings.os_stt_batched_longform)
            and duration_s > 2 * window_s
            and temps[0] == 0.0
            # prompted uploads ride the batched path too: the prefix is
            # padded/trimmed to batched.BATCHED_PREV_LEN, whose one shape
            # per rung the load-time warmup covers
        ):
            from open_speech_tpu.models.whisper.batched import transcribe_batched

            segments, info = transcribe_batched(
                entry["params"], entry["cfg"], entry["tok"], pcm, opts,
                max_batch=int(settings.os_stt_batch_windows),
            )
        else:
            segments, info = transcribe(
                entry["params"], entry["cfg"], entry["tok"], pcm, opts,
                draft=draft,
            )
        return build_response(segments, info, task, response_format)

    def transcribe(
        self,
        audio: bytes,
        model: str,
        language: str | None = None,
        response_format: str = "json",
        temperature: float = 0.0,
        prompt: str | None = None,
        beam_size: int = 5,
        fallback: bool = True,
    ) -> dict[str, Any]:
        return self._run_inference(
            audio, model, task="transcribe", language=language,
            response_format=response_format, temperature=temperature,
            prompt=prompt, beam_size=beam_size, fallback=fallback,
        )

    def translate(
        self,
        audio: bytes,
        model: str,
        response_format: str = "json",
        temperature: float = 0.0,
        prompt: str | None = None,
    ) -> dict[str, Any]:
        return self._run_inference(
            audio, model, task="translate", response_format=response_format,
            temperature=temperature, prompt=prompt,
        )
