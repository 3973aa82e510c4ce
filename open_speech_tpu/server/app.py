"""Open Speech TPU — application and route table (reference: src/main.py).

Full route-table parity (~56 routes): OpenAI STT/TTS endpoints, streaming and
realtime WebSockets, unified + legacy model management, voices/voice-library/
presets, studio (profiles/history/conversations/composer), health, web UI.
Built on aiohttp (FastAPI is not available in this deployment); the error
envelope, status codes, and response shapes match the reference.
"""

from __future__ import annotations

import asyncio
import logging
import os
from pathlib import Path

import numpy as np
import yaml
from aiohttp import web
from pydantic import ValidationError

from open_speech_tpu import __version__
from open_speech_tpu.audio.effects import apply_chain
from open_speech_tpu.audio.encode import (
    CONTENT_TYPES,
    encode_audio,
    encode_audio_streaming,
)
from open_speech_tpu.audio.ingest import convert_to_wav
from open_speech_tpu.audio.postprocessing import process_tts_chunks
from open_speech_tpu.audio.preprocessing import preprocess_stt_audio
from open_speech_tpu.cache.tts_cache import TTSCache
from open_speech_tpu.config import settings
from open_speech_tpu.runtime.lifecycle import ModelLifecycleManager
from open_speech_tpu.runtime.model_manager import (
    ModelLifecycleError,
    ModelManager,
    ModelState,
)
from open_speech_tpu.runtime.router import router as backend_router
from open_speech_tpu.schemas import (
    HealthResponse,
    ModelListResponse,
    ModelLoadRequest,
    ModelObject,
    ModelUnloadRequest,
    PullResponse,
    TTSSpeechRequest,
)
from open_speech_tpu.server.errors import ApiError, error_middleware
from open_speech_tpu.server.metrics import metrics
from open_speech_tpu.server.middleware import (
    security_middleware,
    verify_ws_api_key,
    verify_ws_origin,
)
from open_speech_tpu.server.realtime.server import realtime_endpoint
from open_speech_tpu.server.streaming import streaming_endpoint
from open_speech_tpu.studio.composer import MultiTrackComposer
from open_speech_tpu.studio.conversation import ConversationManager
from open_speech_tpu.studio.history import HistoryManager
from open_speech_tpu.studio.profiles import ProfileManager
from open_speech_tpu.studio.storage import init_db
from open_speech_tpu.studio.voice_library import (
    VoiceLibraryManager,
    VoiceNotFoundError,
)
from open_speech_tpu.text.pronunciation import PronunciationDictionary, parse_ssml
from open_speech_tpu.tts.router import TTSRouter

logger = logging.getLogger(__name__)

STATIC_DIR = Path(__file__).parent.parent / "static"


def get_runtime_version() -> str:
    return __version__


def get_content_type(fmt: str) -> str:
    return CONTENT_TYPES.get(fmt, "application/octet-stream")


# ── singletons (reference: src/main.py:86-108) ─────────────────────────

tts_router = TTSRouter(device=settings.tts_effective_device)
model_manager = ModelManager(stt_router=backend_router, tts_router=tts_router)
tts_cache = TTSCache(
    settings.tts_cache_dir, settings.tts_cache_max_mb, settings.tts_cache_enabled
)
pronunciation_dict = PronunciationDictionary(settings.tts_pronunciation_dict or "")
voice_library = VoiceLibraryManager(
    settings.voice_library_path, max_count=settings.voice_library_max_count
)
profile_manager = ProfileManager()
history_manager = HistoryManager()


def _synthesize_array(
    *, text, model, voice, speed, sample_rate=24000, language=None
) -> np.ndarray:
    """Synthesize to a float array AT ``sample_rate`` — callers (conversation
    render) encode the result assuming that rate, so the backend's native
    rate (kokoro 24k, piper 22.05k) must be resampled, not relabeled."""
    chunks = process_tts_chunks(
        tts_router.synthesize(
            text=text, model=model, voice=voice, speed=speed, lang_code=language
        ),
        trim=settings.tts_trim_silence,
        normalize=settings.tts_normalize_output,
    )
    all_chunks = list(chunks)
    if not all_chunks:
        return np.zeros(0, dtype=np.float32)
    audio = np.concatenate(all_chunks).astype(np.float32, copy=False)
    from open_speech_tpu.tts.backends.base import backend_sample_rate

    native = backend_sample_rate(tts_router.get_backend(model), model)
    if native != sample_rate and audio.size:
        import jax.numpy as jnp

        from open_speech_tpu.ops.resample import resample_poly

        audio = np.asarray(
            resample_poly(jnp.asarray(audio), sample_rate, native),
            np.float32,
        )
    return audio


conversation_manager = ConversationManager(
    profile_manager=profile_manager, synthesize_fn=_synthesize_array
)
composer_manager = MultiTrackComposer()

_download_progress: dict[str, dict] = {}
_download_progress_lock = asyncio.Lock()
_model_operation_lock = asyncio.Lock()


def _tts_backend_name(model_id: str) -> str:
    return getattr(tts_router.get_backend(model_id), "name", model_id)


def _tts_capabilities(model_id: str) -> dict:
    return dict(getattr(tts_router.get_backend(model_id), "capabilities", {}))


def _validate_tts_feature_support(
    *, model_id, voice_design=None, reference_audio=None
) -> str | None:
    backend_name = _tts_backend_name(model_id)
    caps = _tts_capabilities(model_id)
    if voice_design and not caps.get("voice_design", False):
        return f"voice_design is not supported by the {backend_name} backend."
    if reference_audio is not None and not caps.get("voice_clone", False):
        if backend_name == "piper":
            return "Voice cloning is not supported by the piper backend."
        return f"Voice cloning is not supported by the {backend_name} backend."
    return None


# ── request helpers ────────────────────────────────────────────────────


def _q(request: web.Request, name: str, default=None, cast=str):
    raw = request.query.get(name)
    if raw is None:
        return default
    if cast is bool:
        return raw.strip().lower() in ("1", "true", "yes", "on")
    try:
        return cast(raw)
    except (TypeError, ValueError):
        raise ApiError(422, f"Invalid value for query param '{name}': {raw!r}",
                       "validation_error")


def _form_float(form: dict, name: str, default: float) -> float:
    """Form-field float with 422 on garbage (a client mistake, not a 500)."""
    raw = form.get(name)
    if raw in (None, ""):
        return default
    try:
        return float(raw)
    except (TypeError, ValueError):
        raise ApiError(422, f"Invalid value for form field '{name}': {raw!r}",
                       "validation_error")


async def _read_multipart(request: web.Request) -> dict:
    """Multipart/form fields -> {name: str | (bytes, filename, content_type)}."""
    data = await request.post()
    out: dict = {}
    for key, value in data.items():
        if hasattr(value, "file"):  # FileField
            out[key] = (value.file.read(), value.filename, value.content_type)
        else:
            out[key] = value
    return out


async def _json_body(request: web.Request) -> dict:
    try:
        body = await request.json()
    except Exception:  # noqa: BLE001
        raise ApiError(422, "Invalid JSON body", "validation_error")
    if not isinstance(body, dict):
        raise ApiError(422, "Body must be a JSON object", "validation_error")
    return body


def _validate(model_cls, body: dict):
    try:
        return model_cls(**body)
    except ValidationError as e:
        raise ApiError(422, str(e), "validation_error")


# ── OpenAI STT endpoints (reference :270-389) ─────────────────────────


async def transcribe(request: web.Request) -> web.Response:
    form = await _read_multipart(request)
    if "file" not in form or not isinstance(form["file"], tuple):
        raise ApiError(422, "Missing 'file' upload field", "validation_error")
    audio_bytes, filename, content_type = form["file"]
    model = str(form.get("model") or settings.stt_model)
    language = form.get("language") or None
    prompt = form.get("prompt") or None
    response_format = str(form.get("response_format") or "json")
    temperature = _form_float(form, "temperature", 0.0)
    diarize = _q(request, "diarize", False, bool) or str(
        form.get("diarize", "")
    ).lower() in ("1", "true")

    max_bytes = settings.os_max_upload_mb * 1024 * 1024
    if len(audio_bytes) > max_bytes:
        raise ApiError(413, f"Upload too large. Max: {settings.os_max_upload_mb}MB")
    if len(audio_bytes) == 0:
        raise ApiError(400, "Empty audio file")
    if diarize and not settings.stt_diarize_enabled:
        raise ApiError(400, "Diarization is disabled. Set STT_DIARIZE_ENABLED=true")

    audio_wav = convert_to_wav(audio_bytes, content_type)
    audio_wav = preprocess_stt_audio(
        audio_wav,
        noise_reduce=settings.stt_noise_reduce,
        normalize=settings.stt_normalize,
    )

    backend_format = (
        "verbose_json"
        if response_format in ("srt", "vtt", "json", "verbose_json")
        else response_format
    )
    loop = asyncio.get_running_loop()
    import time as _time

    t_start = _time.monotonic()
    try:
        result = await loop.run_in_executor(
            None,
            lambda: backend_router.transcribe(
                audio=audio_wav,
                model=model,
                language=language,
                response_format=backend_format,
                temperature=temperature,
                prompt=prompt,
                # quality path: REST requests decode with the reference's
                # beam-5 default; streaming sessions stay greedy (batcher)
                beam_size=settings.stt_rest_beam_size,
            ),
        )
    except ValueError as e:
        # unknown model id: 404 with a stable code (the reference 500s here
        # — src/main.py:316-318 — but the failure is client-addressable)
        metrics.inc("stt_errors_total")
        raise ApiError(404, str(e), "model_not_found")
    except Exception as e:  # noqa: BLE001
        metrics.inc("stt_errors_total")
        logger.exception("Transcription failed")
        raise ApiError(500, str(e))
    metrics.record_stt(
        audio_seconds=float(result.get("duration", 0.0) or 0.0),
        wall_seconds=_time.monotonic() - t_start,
    )
    if response_format == "json" and "text" in result:
        # OpenAI json shape is {"text"}; the verbose payload only backs
        # the srt/vtt/verbose_json renderings
        result = {"text": result["text"]}

    if settings.os_history_enabled:
        try:
            history_manager.log_stt(
                model=model,
                input_filename=filename or "",
                result_text=result.get("text", ""),
            )
        except Exception:  # noqa: BLE001
            logger.exception("Failed to log STT history entry")

    if diarize:
        from open_speech_tpu.diarization import Diarizer, attach_text_to_speakers

        try:
            diarizer = Diarizer()
            dsegs = await loop.run_in_executor(
                None, lambda: diarizer.diarize(audio_wav)
            )
        except RuntimeError as e:
            raise ApiError(400, str(e))
        except Exception as e:  # noqa: BLE001
            raise ApiError(500, f"Diarization failed: {e}")
        text = result.get("text", "")
        return web.json_response(
            {"text": text, "segments": attach_text_to_speakers(text, dsegs)}
        )

    if response_format in ("text", "srt", "vtt"):
        from open_speech_tpu.text.formatters import format_transcription

        content, content_type_out = format_transcription(result, response_format)
        return web.Response(text=content, content_type=content_type_out.split(";")[0])

    if result.get("raw_text"):
        return web.Response(text=result["text"], content_type="text/plain")
    return web.json_response(result)


async def translate(request: web.Request) -> web.Response:
    form = await _read_multipart(request)
    if "file" not in form or not isinstance(form["file"], tuple):
        raise ApiError(422, "Missing 'file' upload field", "validation_error")
    audio_bytes, _filename, content_type = form["file"]
    model = str(form.get("model") or settings.stt_model)
    prompt = form.get("prompt") or None
    response_format = str(form.get("response_format") or "json")
    temperature = _form_float(form, "temperature", 0.0)

    max_bytes = settings.os_max_upload_mb * 1024 * 1024
    if len(audio_bytes) > max_bytes:
        raise ApiError(413, f"Upload too large. Max: {settings.os_max_upload_mb}MB")
    if len(audio_bytes) == 0:
        raise ApiError(400, "Empty audio file")

    audio_wav = convert_to_wav(audio_bytes, content_type)
    audio_wav = preprocess_stt_audio(
        audio_wav,
        noise_reduce=settings.stt_noise_reduce,
        normalize=settings.stt_normalize,
    )
    loop = asyncio.get_running_loop()
    try:
        result = await loop.run_in_executor(
            None,
            lambda: backend_router.translate(
                audio=audio_wav,
                model=model,
                response_format=response_format,
                temperature=temperature,
                prompt=prompt,
            ),
        )
    except ValueError as e:
        raise ApiError(404, str(e), "model_not_found")
    except Exception as e:  # noqa: BLE001
        logger.exception("Translation failed")
        raise ApiError(500, str(e))
    if result.get("raw_text"):
        return web.Response(text=result["text"], content_type="text/plain")
    return web.json_response(result)


# ── OpenAI models endpoints (reference :392-418) ──────────────────────


async def list_models(request: web.Request) -> web.Response:
    loaded = backend_router.loaded_models()
    models = [
        ModelObject(id=m.model, owned_by=f"open-speech/{m.backend}")
        for m in loaded
    ]
    loaded_ids = {m.model for m in loaded}
    if settings.stt_model not in loaded_ids:
        models.append(ModelObject(id=settings.stt_model))
    if settings.tts_enabled:
        tts_loaded = tts_router.loaded_models()
        tts_loaded_ids = {m.model for m in tts_loaded}
        for m in tts_loaded:
            models.append(
                ModelObject(id=m.model, owned_by=f"open-speech/{m.backend}")
            )
        if settings.tts_model not in tts_loaded_ids:
            models.append(
                ModelObject(id=settings.tts_model, owned_by="open-speech/tts")
            )
    return web.json_response(ModelListResponse(data=models).model_dump())


async def get_model(request: web.Request) -> web.Response:
    return web.json_response(
        ModelObject(id=request.match_info["model"]).model_dump()
    )


# ── legacy management (reference :422-455) ────────────────────────────


async def list_loaded_models(request: web.Request) -> web.Response:
    models = backend_router.loaded_models()
    return web.json_response({"models": [m.model_dump() for m in models]})


async def load_model_legacy(request: web.Request) -> web.Response:
    model = request.match_info["model"]
    for m in backend_router.loaded_models():
        if m.model != model:
            try:
                backend_router.unload_model(m.model)
            except Exception as e:  # noqa: BLE001
                logger.warning("Failed to auto-unload %s: %s", m.model, e)
    try:
        await asyncio.get_running_loop().run_in_executor(
            None, lambda: backend_router.load_model(model)
        )
    except Exception as e:  # noqa: BLE001
        logger.exception("Failed to load model %s", model)
        raise ApiError(500, str(e))
    return web.json_response({"status": "loaded", "model": model})


async def unload_model_legacy(request: web.Request) -> web.Response:
    model = request.match_info["model"]
    if not backend_router.is_model_loaded(model):
        raise ApiError(404, f"Model {model} is not loaded")
    backend_router.unload_model(model)
    return web.json_response({"status": "unloaded", "model": model})


# ── unified management (reference :461-610) ───────────────────────────


async def list_all_models(request: web.Request) -> web.Response:
    models = [m.to_dict() for m in model_manager.list_all()]
    for model in models:
        if model.get("type") == "tts":
            try:
                model["capabilities"] = _tts_capabilities(model["id"])
            except Exception:  # noqa: BLE001
                model["capabilities"] = {}
    return web.json_response({"models": models})


async def get_tts_capabilities_route(request: web.Request) -> web.Response:
    if not settings.tts_enabled:
        raise ApiError(404, "TTS is disabled")
    model_id = request.query.get("model") or settings.tts_model
    return web.json_response(
        {
            "backend": _tts_backend_name(model_id),
            "capabilities": _tts_capabilities(model_id),
        }
    )


async def get_model_status(request: web.Request) -> web.Response:
    model_id = request.match_info["model_id"]
    result = model_manager.status(model_id).to_dict()
    async with _download_progress_lock:
        prog = _download_progress.get(model_id)
        if prog and prog.get("status") in ("downloaded", "ready"):
            # terminal entries are one-shot: dropping them here keeps the
            # overlay from overriding the real state forever (e.g. after
            # artifact deletion) and from growing unboundedly
            _download_progress.pop(model_id, None)
    if prog:
        prog_status = prog.get("status", "")
        if prog_status in ("queued", "downloading", "loading"):
            result["state"] = prog_status
        elif prog_status in ("downloaded", "ready"):
            if result.get("state") != "loaded":
                result["state"] = "downloaded"
        result["progress"] = prog.get("progress", 0)
    return web.json_response(result)


async def get_model_progress(request: web.Request) -> web.Response:
    model_id = request.match_info["model_id"]
    async with _download_progress_lock:
        if model_id in _download_progress:
            return web.json_response(_download_progress[model_id])
    if model_manager.status(model_id).state == ModelState.LOADED:
        return web.json_response({"status": "ready", "progress": 1.0})
    return web.json_response({"status": "idle", "progress": 0.0})


async def load_model_unified(request: web.Request) -> web.Response:
    model_id = request.match_info["model_id"]
    async with _download_progress_lock:
        _download_progress[model_id] = {"status": "queued", "progress": 0.0}
    async with _model_operation_lock:
        async with _download_progress_lock:
            _download_progress[model_id] = {"status": "loading", "progress": 0.5}
        loop = asyncio.get_running_loop()
        try:
            info = await loop.run_in_executor(
                None, lambda: model_manager.load(model_id)
            )
            async with _download_progress_lock:
                _download_progress[model_id] = {"status": "ready", "progress": 1.0}
        except ModelLifecycleError as e:
            async with _download_progress_lock:
                _download_progress.pop(model_id, None)
            # load_failed wraps backend faults (OOM, disk, bad checkpoint)
            # — a server-side failure, not a client mistake
            status = 500 if e.code == "load_failed" else 400
            raise ApiError(status, {"message": e.message, "code": e.code})
        except Exception as e:  # noqa: BLE001
            async with _download_progress_lock:
                _download_progress.pop(model_id, None)
            logger.exception("Failed to load model %s", model_id)
            raise ApiError(
                500, {"message": str(e), "code": "load_failed", "model": model_id}
            )
    return web.json_response(info.to_dict())


async def download_model_unified(request: web.Request) -> web.Response:
    model_id = request.match_info["model_id"]
    async with _download_progress_lock:
        _download_progress[model_id] = {"status": "queued", "progress": 0.0}
    async with _model_operation_lock:
        async with _download_progress_lock:
            _download_progress[model_id] = {
                "status": "downloading",
                "progress": 0.1,
            }
        loop = asyncio.get_running_loop()
        try:
            info = await loop.run_in_executor(
                None, lambda: model_manager.download(model_id)
            )
            async with _download_progress_lock:
                _download_progress[model_id] = {
                    "status": "downloaded",
                    "progress": 1.0,
                }
            return web.json_response(info.to_dict())
        except ModelLifecycleError as e:
            async with _download_progress_lock:
                _download_progress.pop(model_id, None)
            raise ApiError(400, {"message": e.message, "code": e.code})
        except Exception as e:  # noqa: BLE001
            async with _download_progress_lock:
                _download_progress.pop(model_id, None)
            logger.exception("Failed to download model %s", model_id)
            raise ApiError(
                500,
                {"message": str(e), "code": "download_failed", "model": model_id},
            )


async def unload_model_unified(request: web.Request) -> web.Response:
    model_id = request.match_info["model_id"]
    if model_manager.status(model_id).state != ModelState.LOADED:
        raise ApiError(
            404,
            {
                "message": f"Model {model_id} is not loaded",
                "code": "not_loaded",
                "model": model_id,
            },
        )
    async with _model_operation_lock:
        model_manager.unload(model_id)
    return web.json_response({"status": "unloaded", "model": model_id})


async def delete_model_artifacts(request: web.Request) -> web.Response:
    async with _model_operation_lock:
        result = model_manager.delete_artifacts(request.match_info["model_id"])
    return web.json_response(result)


async def pull_model(request: web.Request) -> web.Response:
    model = request.match_info["model"]
    try:
        loop = asyncio.get_running_loop()
        await loop.run_in_executor(None, lambda: backend_router.load_model(model))
        backend_router.unload_model(model)
    except Exception as e:  # noqa: BLE001
        logger.exception("Failed to pull model %s", model)
        raise ApiError(500, str(e))
    return web.json_response(
        PullResponse(status="downloaded", model=model).model_dump()
    )


async def health(request: web.Request) -> web.Response:
    loaded = backend_router.loaded_models()
    return web.json_response(
        HealthResponse(
            version=get_runtime_version(), models_loaded=len(loaded)
        ).model_dump()
    )


async def metrics_route(request: web.Request) -> web.Response:
    from open_speech_tpu.runtime.batcher_pool import pool_stats
    from open_speech_tpu.server.streaming import _active_sessions

    metrics.set_gauge("streaming_sessions_active", len(_active_sessions))
    for key, stats in pool_stats().items():
        metrics.set_gauge(f'batch_occupancy{{batcher="{key}"}}', stats["occupancy"])
    return web.Response(
        text=metrics.prometheus(), content_type="text/plain"
    )


async def stats_route(request: web.Request) -> web.Response:
    from open_speech_tpu.runtime.batcher_pool import pool_stats
    from open_speech_tpu.runtime.tts_batcher import tts_batcher_stats
    from open_speech_tpu.server.streaming import _active_sessions

    snap = metrics.snapshot()
    snap["gauges"]["streaming_sessions_active"] = len(_active_sessions)
    snap["streaming_sessions"] = [
        {
            "id": s.session_id[:8],
            "model": s.model,
            "language": s.language,
            "detected_language": s._detected_language,
            "transcriptions": s._transcription_count,
            "interims_coalesced": s._interims_coalesced,
            "errors": s._error_count,
        }
        for s in list(_active_sessions.values())
    ]
    snap["batchers"] = pool_stats()
    snap["tts_batchers"] = tts_batcher_stats()
    from open_speech_tpu.runtime.pocket_batcher import pocket_batcher_stats

    snap["pocket_batchers"] = pocket_batcher_stats()
    from open_speech_tpu.parallel.distributed import replica_info

    snap["replica"] = replica_info()
    return web.json_response(snap)


# device trace capture (SURVEY §5: the reference has no profiling surface;
# on TPU a jax.profiler trace is the observability primitive — XLA op
# timelines, HBM usage, ICI collectives — viewable in TensorBoard/xprof)
_profiler_active: dict[str, str] = {}


async def profiler_start(request: web.Request) -> web.Response:
    body = await request.json() if request.can_read_body else {}
    trace_dir = body.get("dir") or settings.os_profile_dir
    # reserve the slot BEFORE the executor await: the guard and the flag
    # set must not straddle a suspension point or two concurrent starts
    # both reach jax.profiler.start_trace (one then 500s inside JAX)
    if _profiler_active:
        raise ApiError(409, "A profiler trace is already running")
    _profiler_active["dir"] = trace_dir
    try:
        import jax

        # Executor: start_trace touches the backend, and a first device
        # touch on the loop thread blocks every route for the whole
        # plugin bring-up.
        await asyncio.get_running_loop().run_in_executor(
            None, lambda: jax.profiler.start_trace(trace_dir)
        )
    except Exception as e:  # noqa: BLE001
        _profiler_active.clear()
        raise ApiError(500, f"Failed to start trace: {e}")
    return web.json_response({"status": "tracing", "dir": trace_dir})


async def profiler_stop(request: web.Request) -> web.Response:
    if not _profiler_active:
        raise ApiError(409, "No profiler trace is running")
    trace_dir = _profiler_active["dir"]
    try:
        import jax

        await asyncio.get_running_loop().run_in_executor(
            None, jax.profiler.stop_trace
        )
    except Exception as e:  # noqa: BLE001
        # keep the state: JAX is still tracing, so a retry must be able
        # to reach stop_trace again (popping first would strand it)
        raise ApiError(500, f"Failed to stop trace: {e}")
    _profiler_active.clear()
    return web.json_response({"status": "stopped", "dir": trace_dir})


# ── WebSockets (reference :623-691) ───────────────────────────────────


async def ws_stream(request: web.Request) -> web.StreamResponse:
    if request.headers.get("upgrade", "").lower() != "websocket":
        return web.json_response(
            {
                "error": {
                    "message": (
                        "/v1/audio/stream is a WebSocket endpoint. Connect "
                        "with ws:// or wss:// using a WebSocket client."
                    ),
                    "code": "websocket_upgrade_required",
                }
            },
            status=426,
            headers={"Upgrade": "websocket"},
        )
    ws = web.WebSocketResponse()
    await ws.prepare(request)
    if not verify_ws_origin(request):
        await ws.close(code=1008, message=b"Origin not allowed")
        return ws
    if not verify_ws_api_key(request):
        await ws.close(code=4001, message=b"Invalid or missing API key")
        return ws
    await streaming_endpoint(
        ws,
        model=request.query.get("model"),
        language=request.query.get("language"),
        sample_rate=_q(request, "sample_rate", 16000, int),
        encoding=request.query.get("encoding", "pcm_s16le"),
        interim_results=_q(request, "interim_results", True, bool),
        endpointing=_q(request, "endpointing", 300, int),
        vad=(
            _q(request, "vad", None, bool)
            if request.query.get("vad") is not None
            else None
        ),
    )
    return ws


async def ws_realtime(request: web.Request) -> web.StreamResponse:
    if request.headers.get("upgrade", "").lower() != "websocket":
        raise ApiError(426, "/v1/realtime is a WebSocket endpoint")
    if not settings.os_realtime_enabled:
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        await ws.close(code=4004, message=b"Realtime API is disabled")
        return ws
    ws = web.WebSocketResponse(protocols=("realtime",))
    await ws.prepare(request)
    if not verify_ws_origin(request):
        await ws.close(code=1008, message=b"Origin not allowed")
        return ws
    if not verify_ws_api_key(request):
        await ws.close(code=4001, message=b"Invalid or missing API key")
        return ws
    await realtime_endpoint(
        ws, tts_router=tts_router, model=request.query.get("model") or ""
    )
    return ws


# ── TTS endpoints (reference :697-985) ────────────────────────────────


async def synthesize_speech(request: web.Request) -> web.StreamResponse:
    if not settings.tts_enabled:
        raise ApiError(404, "TTS is disabled")
    req = _validate(TTSSpeechRequest, await _json_body(request))
    stream = _q(request, "stream", False, bool)
    cache = _q(request, "cache", True, bool)

    if len(req.input) > settings.tts_max_input_length:
        raise ApiError(
            400,
            f"Input too long. Max: {settings.tts_max_input_length} characters",
        )
    if not req.input.strip():
        raise ApiError(400, "Input text is empty")

    feature_error = _validate_tts_feature_support(
        model_id=req.model,
        voice_design=req.voice_design,
        reference_audio=req.reference_audio,
    )
    if feature_error:
        raise ApiError(400, feature_error)

    valid_formats = {"mp3", "opus", "aac", "flac", "wav", "pcm", "m4a"}
    if req.response_format not in valid_formats:
        raise ApiError(
            400,
            "Invalid response_format. Must be one of: "
            + ", ".join(sorted(valid_formats)),
        )
    content_type = get_content_type(req.response_format)

    synth_input = req.input
    if req.input_type == "ssml":
        synth_input = parse_ssml(synth_input)
    synth_input = pronunciation_dict.apply(synth_input)

    backend = tts_router.get_backend(req.model)
    from open_speech_tpu.tts.backends.base import backend_sample_rate

    native_rate = backend_sample_rate(backend, req.model)
    has_extended = bool(req.voice_design or req.reference_audio)

    def _do_synthesize():
        if has_extended:
            # capability-gated extended kwargs (reference :738-758)
            import base64 as _b64

            caps = _tts_capabilities(req.model)
            kwargs: dict = dict(
                text=synth_input, voice=req.voice, speed=req.speed,
                lang_code=req.language,
            )
            if req.voice_design and (
                caps.get("voice_design") or caps.get("voice_clone")
            ):
                kwargs["voice_design"] = req.voice_design
            if req.reference_audio and caps.get("voice_clone"):
                try:
                    kwargs["reference_audio"] = _b64.b64decode(
                        req.reference_audio
                    )
                except Exception:  # noqa: BLE001
                    kwargs["reference_audio"] = req.reference_audio.encode()
            if req.clone_transcript and caps.get("voice_clone"):
                kwargs["clone_transcript"] = req.clone_transcript
            return backend.synthesize(**kwargs)
        return tts_router.synthesize(
            text=synth_input,
            model=req.model,
            voice=req.voice,
            speed=req.speed,
            lang_code=req.language,
        )

    loop = asyncio.get_running_loop()

    if stream:
        if settings.os_history_enabled:
            try:
                history_manager.log_tts(
                    model=req.model, voice=req.voice, speed=req.speed,
                    format=req.response_format, text=synth_input,
                    output_path=None, output_bytes=None, streamed=True,
                )
            except Exception:  # noqa: BLE001
                logger.exception("Failed to log streamed TTS history entry")

        resp = web.StreamResponse(
            status=200, headers={"Content-Type": content_type}
        )
        resp.enable_chunked_encoding()
        # prepare() is deferred until the first audio chunk: errors that
        # strike before any byte is sent (G2P vocab mismatch, bad voice,
        # synth failure at t=0) must surface as a real error response,
        # not a clean 200 with empty audio

        import queue as _queue
        import threading

        # bounded queue = producer backpressure: a slow client must slow
        # synthesis down, not buffer the whole encoded stream in memory
        chunk_queue: _queue.Queue = _queue.Queue(maxsize=8)
        consumer_gone = threading.Event()

        def _put(item) -> bool:
            """Queue put that notices a departed consumer (disconnect)."""
            while not consumer_gone.is_set():
                try:
                    chunk_queue.put(item, timeout=0.25)
                    return True
                except _queue.Full:
                    continue
            return False

        def _producer():
            try:
                from open_speech_tpu.audio.postprocessing import (
                    StreamingPostProcessor,
                )

                pp = StreamingPostProcessor(
                    trim=settings.tts_trim_silence,
                    normalize=settings.tts_normalize_output,
                )

                def gen():
                    if req.effects:
                        # effects are whole-signal DSP (global normalize,
                        # phase-vocoder pitch, reverb tails): honor them by
                        # synthesizing fully, then streaming the processed
                        # audio — correct output at a first-byte latency
                        # cost, same trade the non-stream branch makes
                        parts = []
                        for chunk in _do_synthesize():
                            parts.extend(pp.feed(chunk))
                        parts.extend(pp.finish())
                        if parts:
                            merged = np.concatenate(
                                [np.asarray(c, np.float32) for c in parts]
                            )
                            yield apply_chain(
                                merged, native_rate, req.effects
                            )
                        return
                    for chunk in _do_synthesize():
                        yield from pp.feed(chunk)
                    yield from pp.finish()

                for encoded in encode_audio_streaming(
                    gen(), native_rate, req.response_format
                ):
                    if not _put(encoded):
                        return  # client gone: stop synthesizing
            except Exception as e:  # noqa: BLE001
                _put(e)
            finally:
                _put(None)  # no-op if the consumer already left

        threading.Thread(target=_producer, daemon=True).start()
        import time as _time

        t_start = _time.monotonic()
        ttfa_s: float | None = None
        sent_bytes = 0
        prepared = False
        try:
            while True:
                item = await loop.run_in_executor(None, chunk_queue.get)
                if item is None:
                    break
                if isinstance(item, Exception):
                    if not prepared:
                        # nothing sent yet — return a real error envelope
                        # (ValueError = request-shaped problem, e.g. text the
                        # checkpoint vocab cannot express; else server fault)
                        status = 400 if isinstance(item, ValueError) else 500
                        raise ApiError(status, f"TTS failed: {item}")
                    # bytes already on the wire: abort the transfer so the
                    # client sees truncation, not a clean end-of-stream
                    # (returning would let aiohttp write a clean EOF chunk)
                    logger.error("Streaming TTS failed mid-stream: %s", item)
                    if request.transport is not None:
                        request.transport.abort()
                    raise ApiError(
                        500, f"TTS failed mid-stream: {item}"
                    )
                if not prepared:
                    await resp.prepare(request)
                    prepared = True
                    ttfa_s = _time.monotonic() - t_start
                sent_bytes += len(item)
                await resp.write(item)
        finally:
            # unblocks a producer stuck on the bounded queue if we leave
            # early (client disconnect, mid-stream error): synthesis stops
            # instead of running the whole utterance for nobody
            consumer_gone.set()
        if not prepared:
            await resp.prepare(request)
        await resp.write_eof()
        if ttfa_s is not None:
            # audio seconds only meaningful for raw pcm16; compressed
            # formats report 0 (rtfx histogram then skips the sample)
            audio_s = (
                sent_bytes / (native_rate * 2)
                if req.response_format == "pcm"
                else 0.0
            )
            metrics.record_tts(
                ttfa_seconds=ttfa_s,
                audio_seconds=audio_s,
                wall_seconds=_time.monotonic() - t_start,
            )
        return resp

    # effects/design/clone change the audio but are not part of the cache
    # key — those requests bypass the cache entirely (both directions:
    # never serve plain audio for them, never poison the plain key)
    cacheable = not (req.effects or req.voice_design or req.reference_audio)
    if cache and settings.tts_cache_enabled and cacheable:
        cached = tts_cache.get_for(
            text=synth_input, voice=req.voice, speed=req.speed,
            fmt=req.response_format, model=req.model,
        )
        if cached is not None:
            return web.Response(
                body=cached,
                content_type=content_type,
                headers={"X-Cache": "HIT"},
            )

    import time as _time

    t_start = _time.monotonic()
    try:
        def _full_synth() -> tuple[bytes, float, float]:
            gen = _do_synthesize()
            chunks_list = []
            ttfa = None
            for chunk in gen:
                if ttfa is None:
                    ttfa = _time.monotonic() - t_start
                chunks_list.append(chunk)
            chunks_list = list(
                process_tts_chunks(
                    iter(chunks_list),
                    trim=settings.tts_trim_silence,
                    normalize=settings.tts_normalize_output,
                )
            )
            samples = (
                np.concatenate(chunks_list).astype(np.float32, copy=False)
                if chunks_list
                else np.zeros(0, dtype=np.float32)
            )
            if settings.os_effects_enabled and req.effects:
                samples = apply_chain(samples, native_rate, req.effects)
            return (
                encode_audio(samples, native_rate, req.response_format),
                ttfa if ttfa is not None else _time.monotonic() - t_start,
                len(samples) / native_rate,
            )

        audio_bytes, ttfa_s, audio_s = await loop.run_in_executor(
            None, _full_synth
        )
        metrics.record_tts(
            ttfa_seconds=ttfa_s,
            audio_seconds=audio_s,
            wall_seconds=_time.monotonic() - t_start,
        )
        if cache and settings.tts_cache_enabled and cacheable:
            await loop.run_in_executor(
                None,
                lambda: tts_cache.set_for(
                    text=synth_input, voice=req.voice, speed=req.speed,
                    fmt=req.response_format, model=req.model, audio=audio_bytes,
                ),
            )
    except Exception as e:  # noqa: BLE001
        logger.exception("TTS synthesis failed")
        raise ApiError(500, str(e))

    if settings.os_history_enabled:
        try:
            history_manager.log_tts(
                model=req.model, voice=req.voice, speed=req.speed,
                format=req.response_format, text=synth_input,
                output_path=None, output_bytes=len(audio_bytes), streamed=False,
            )
        except Exception:  # noqa: BLE001
            logger.exception("Failed to log TTS history entry")

    return web.Response(body=audio_bytes, content_type=content_type)


async def clone_speech(request: web.Request) -> web.Response:
    if not settings.tts_enabled:
        raise ApiError(404, "TTS is disabled")
    form = await _read_multipart(request)
    input_text = str(form.get("input") or "")
    if not input_text.strip():
        raise ApiError(400, "Input text is empty")
    model = str(form.get("model") or "kokoro")
    voice = str(form.get("voice") or "Ryan")
    speed = _form_float(form, "speed", 1.0)
    response_format = str(form.get("response_format") or "mp3")
    transcript = form.get("transcript") or None
    language = form.get("language") or None
    voice_library_ref = form.get("voice_library_ref") or None

    ref_bytes = None
    if voice_library_ref and "reference_audio" not in form:
        try:
            ref_bytes, _meta = voice_library.get(str(voice_library_ref))
        except VoiceNotFoundError:
            raise ApiError(
                404, f"Voice library entry '{voice_library_ref}' not found"
            )
    if isinstance(form.get("reference_audio"), tuple):
        ref_bytes = form["reference_audio"][0]

    if ref_bytes is not None:
        feature_error = _validate_tts_feature_support(
            model_id=model, reference_audio=b"provided"
        )
        if feature_error:
            raise ApiError(400, feature_error)
        max_bytes = settings.os_max_upload_mb * 1024 * 1024
        if len(ref_bytes) > max_bytes:
            raise ApiError(
                413, f"Upload too large. Max: {settings.os_max_upload_mb}MB"
            )
        if len(ref_bytes) == 0:
            raise ApiError(400, "Reference audio is empty")

    content_type = get_content_type(response_format)
    loop = asyncio.get_running_loop()
    try:
        def _synth() -> bytes:
            import inspect

            backend = tts_router.get_backend(model)
            synth_kwargs: dict = dict(
                text=input_text, voice=voice, speed=speed, lang_code=language
            )
            sig = inspect.signature(backend.synthesize)
            if "reference_audio" in sig.parameters:
                synth_kwargs["reference_audio"] = ref_bytes
            if transcript and "clone_transcript" in sig.parameters:
                synth_kwargs["clone_transcript"] = transcript
            from open_speech_tpu.tts.backends.base import (
                backend_sample_rate,
            )

            native = backend_sample_rate(backend, model)
            chunks = process_tts_chunks(
                backend.synthesize(**synth_kwargs),
                trim=settings.tts_trim_silence,
                normalize=settings.tts_normalize_output,
            )
            merged = list(chunks)
            samples = (
                np.concatenate(merged) if merged else np.zeros(0, np.float32)
            )
            return encode_audio(samples, native, response_format)

        audio_bytes = await loop.run_in_executor(None, _synth)
    except Exception as e:  # noqa: BLE001
        logger.exception("Voice cloning synthesis failed")
        raise ApiError(500, str(e))
    return web.Response(body=audio_bytes, content_type=content_type)


async def load_tts_model(request: web.Request) -> web.Response:
    if not settings.tts_enabled:
        raise ApiError(404, "TTS is disabled")
    body = {}
    if request.can_read_body:
        try:
            body = await request.json()
        except Exception:  # noqa: BLE001
            body = {}
    req = _validate(ModelLoadRequest, body or {})
    # fall back to the CONFIGURED default whenever the body omits "model" —
    # a truthy body without it must not silently pick the schema default
    model_id = req.model if "model" in body else settings.tts_model
    for m in tts_router.loaded_models():
        if m.model != model_id:
            try:
                tts_router.unload_model(m.model)
            except Exception as e:  # noqa: BLE001
                logger.warning("Failed to auto-unload TTS model %s: %s", m.model, e)
    try:
        await asyncio.get_running_loop().run_in_executor(
            None, lambda: tts_router.load_model(model_id)
        )
    except Exception as e:  # noqa: BLE001
        logger.exception("Failed to load TTS model %s", model_id)
        raise ApiError(500, str(e))
    return web.json_response({"status": "loaded", "model": model_id})


async def unload_tts_model(request: web.Request) -> web.Response:
    if not settings.tts_enabled:
        raise ApiError(404, "TTS is disabled")
    body = {}
    if request.can_read_body:
        try:
            body = await request.json()
        except Exception:  # noqa: BLE001
            body = {}
    req = _validate(ModelUnloadRequest, body or {})
    model_id = req.model if "model" in body else settings.tts_model
    if not tts_router.is_model_loaded(model_id):
        raise ApiError(404, f"TTS model {model_id} is not loaded")
    tts_router.unload_model(model_id)
    return web.json_response({"status": "unloaded", "model": model_id})


async def list_tts_models(request: web.Request) -> web.Response:
    if not settings.tts_enabled:
        raise ApiError(404, "TTS is disabled")
    loaded = tts_router.loaded_models()
    loaded_ids = {m.model for m in loaded}
    models = [
        {
            "model": m.model,
            "backend": m.backend,
            "device": m.device,
            "status": "loaded",
            "loaded_at": m.loaded_at,
            "last_used_at": m.last_used_at,
        }
        for m in loaded
    ]
    if settings.tts_model not in loaded_ids:
        models.append(
            {"model": settings.tts_model, "backend": "kokoro", "status": "not_loaded"}
        )
    return web.json_response({"models": models})


async def list_voices(request: web.Request) -> web.Response:
    if not settings.tts_enabled:
        raise ApiError(404, "TTS is disabled")
    model = request.query.get("model")
    if model:
        provider = model.split("/")[0] if "/" in model else model
        voices = tts_router.list_voices(provider)
    else:
        voices = tts_router.list_voices()
    return web.json_response(
        {
            "voices": [
                {
                    "id": v.id,
                    "name": v.name,
                    "language": v.language,
                    "gender": v.gender,
                }
                for v in voices
            ]
        }
    )


# ── voice library (reference :988-1029) ───────────────────────────────


async def upload_voice(request: web.Request) -> web.Response:
    form = await _read_multipart(request)
    if "name" not in form or "audio" not in form or not isinstance(
        form["audio"], tuple
    ):
        raise ApiError(422, "Fields 'name' and 'audio' are required",
                       "validation_error")
    audio_bytes, _fn, content_type = form["audio"]
    max_bytes = settings.os_max_upload_mb * 1024 * 1024
    if len(audio_bytes) > max_bytes:
        raise ApiError(
            413, f"Voice file too large. Max: {settings.os_max_upload_mb}MB"
        )
    try:
        meta = voice_library.save(
            str(form["name"]), audio_bytes, content_type or "audio/wav"
        )
    except ValueError as e:
        raise ApiError(422, str(e))
    return web.json_response(meta, status=201)


async def list_library_voices(request: web.Request) -> web.Response:
    return web.json_response(voice_library.list_voices())


async def get_library_voice_meta(request: web.Request) -> web.Response:
    name = request.match_info["name"]
    try:
        _, meta = voice_library.get(name)
    except VoiceNotFoundError:
        raise ApiError(404, f"Voice '{name}' not found")
    return web.json_response(meta)


async def delete_library_voice(request: web.Request) -> web.Response:
    name = request.match_info["name"]
    try:
        voice_library.delete(name)
    except VoiceNotFoundError:
        raise ApiError(404, f"Voice '{name}' not found")
    return web.Response(status=204)


# ── voice presets (reference :1034-1060) ──────────────────────────────

DEFAULT_VOICE_PRESETS = [
    {
        "name": "Will",
        "voice": "am_puck(1)+am_liam(1)+am_onyx(0.5)",
        "speed": 1.2,
        "description": "Dry wit genius blend — Puck + Liam + Onyx",
    },
    {
        "name": "Female",
        "voice": "af_jessica(1)+af_heart(1)",
        "speed": 1.2,
        "description": "Warm female blend — Jessica + Heart",
    },
    {
        "name": "British Butler",
        "voice": "bm_george",
        "speed": 0.9,
        "description": "Refined British male",
    },
]


def _load_voice_presets() -> list[dict]:
    config_path = os.environ.get("TTS_VOICES_CONFIG")
    if config_path and Path(config_path).exists():
        try:
            with open(config_path) as f:
                data = yaml.safe_load(f)
            if isinstance(data, dict) and "presets" in data:
                return data["presets"]
            if isinstance(data, list):
                return data
        except Exception as e:  # noqa: BLE001
            logger.warning("Failed to load voice presets from %s: %s", config_path, e)
    return DEFAULT_VOICE_PRESETS


async def get_voice_presets(request: web.Request) -> web.Response:
    return web.json_response({"presets": _load_voice_presets()})


# ── studio: profiles (reference :1121-1168) ───────────────────────────

_PROFILE_FIELDS = {
    "name", "backend", "model", "voice", "speed", "format", "blend",
    "reference_audio_id", "effects",
}


def _profile_payload(body: dict) -> dict:
    if "name" not in body or "backend" not in body or "voice" not in body:
        raise ApiError(422, "Fields 'name', 'backend', 'voice' are required",
                       "validation_error")
    return {
        "name": body["name"],
        "backend": body["backend"],
        "model": body.get("model"),
        "voice": body["voice"],
        "speed": float(body.get("speed", 1.0)),
        "format": body.get("format", "mp3"),
        "blend": body.get("blend"),
        "reference_audio_id": body.get("reference_audio_id"),
        "effects": body.get("effects") or [],
    }


async def create_profile(request: web.Request) -> web.Response:
    payload = _profile_payload(await _json_body(request))
    try:
        return web.json_response(profile_manager.create(**payload), status=201)
    except ValueError as e:
        raise ApiError(409, str(e))


async def list_profiles(request: web.Request) -> web.Response:
    profiles = profile_manager.list_all()
    default_profile = profile_manager.get_default()
    return web.json_response(
        {
            "profiles": profiles,
            "default_profile_id": default_profile["id"] if default_profile else None,
        }
    )


async def get_profile(request: web.Request) -> web.Response:
    profile = profile_manager.get(request.match_info["profile_id"])
    if not profile:
        raise ApiError(404, "Profile not found")
    return web.json_response(profile)


async def update_profile(request: web.Request) -> web.Response:
    payload = _profile_payload(await _json_body(request))
    try:
        return web.json_response(
            profile_manager.update(request.match_info["profile_id"], **payload)
        )
    except KeyError:
        raise ApiError(404, "Profile not found")
    except ValueError as e:
        raise ApiError(409, str(e))


async def delete_profile(request: web.Request) -> web.Response:
    if not profile_manager.delete(request.match_info["profile_id"]):
        raise ApiError(404, "Profile not found")
    return web.Response(status=204)


async def set_profile_default(request: web.Request) -> web.Response:
    profile_id = request.match_info["profile_id"]
    try:
        profile_manager.set_default(profile_id)
    except KeyError:
        raise ApiError(404, "Profile not found")
    return web.json_response(
        {"profiles": profile_manager.list_all(), "default_profile_id": profile_id}
    )


# ── studio: history (reference :1171-1185) ────────────────────────────


async def list_history(request: web.Request) -> web.Response:
    return web.json_response(
        history_manager.list_entries(
            type_filter=request.query.get("type"),
            limit=_q(request, "limit", 50, int),
            offset=_q(request, "offset", 0, int),
        )
    )


async def delete_history_entry(request: web.Request) -> web.Response:
    if not history_manager.delete_entry(request.match_info["entry_id"]):
        raise ApiError(404, "History entry not found")
    return web.Response(status=204)


async def clear_history(request: web.Request) -> web.Response:
    return web.json_response({"deleted": history_manager.clear_all()})


# ── studio: conversations (reference :1188-1261) ──────────────────────


async def create_conversation(request: web.Request) -> web.Response:
    body = await _json_body(request)
    if "name" not in body:
        raise ApiError(422, "Field 'name' is required", "validation_error")
    return web.json_response(
        conversation_manager.create(body["name"], body.get("turns") or []),
        status=201,
    )


async def list_conversations(request: web.Request) -> web.Response:
    return web.json_response(
        conversation_manager.list_all(
            limit=_q(request, "limit", 50, int),
            offset=_q(request, "offset", 0, int),
        )
    )


async def get_conversation(request: web.Request) -> web.Response:
    item = conversation_manager.get(request.match_info["conversation_id"])
    if not item:
        raise ApiError(404, "Conversation not found")
    return web.json_response(item)


async def add_conversation_turn(request: web.Request) -> web.Response:
    body = await _json_body(request)
    if "speaker" not in body or "text" not in body:
        raise ApiError(422, "Fields 'speaker' and 'text' are required",
                       "validation_error")
    try:
        return web.json_response(
            conversation_manager.add_turn(
                conversation_id=request.match_info["conversation_id"],
                speaker=body["speaker"],
                text=body["text"],
                profile_id=body.get("profile_id"),
                effects=body.get("effects"),
            ),
            status=201,
        )
    except KeyError:
        raise ApiError(404, "Conversation not found")


async def delete_conversation_turn(request: web.Request) -> web.Response:
    ok = conversation_manager.delete_turn(
        request.match_info["conversation_id"], request.match_info["turn_id"]
    )
    if not ok:
        raise ApiError(404, "Turn not found")
    return web.Response(status=204)


async def render_conversation(request: web.Request) -> web.Response:
    body = await _json_body(request)
    try:
        result = await asyncio.get_running_loop().run_in_executor(
            None,
            lambda: conversation_manager.render(
                conversation_id=request.match_info["conversation_id"],
                format=body.get("format", "wav"),
                sample_rate=int(body.get("sample_rate", 24000)),
                save_turn_audio=bool(body.get("save_turn_audio", True)),
            ),
        )
        return web.json_response(result)
    except KeyError:
        raise ApiError(404, "Conversation not found")
    except ValueError as e:
        raise ApiError(400, str(e))


async def get_conversation_audio(request: web.Request) -> web.Response:
    item = conversation_manager.get(request.match_info["conversation_id"])
    if not item:
        raise ApiError(404, "Conversation not found")
    output_path = item.get("render_output_path")
    if not output_path:
        raise ApiError(404, "Conversation has no rendered output")
    p = Path(output_path)
    if not p.exists():
        raise ApiError(404, "Rendered audio file not found")
    suffix = p.suffix.lower().lstrip(".")
    return web.Response(
        body=p.read_bytes(), content_type=get_content_type(suffix or "wav")
    )


async def delete_conversation(request: web.Request) -> web.Response:
    if not conversation_manager.delete(request.match_info["conversation_id"]):
        raise ApiError(404, "Conversation not found")
    return web.Response(status=204)


# ── studio: composer (reference :1264-1305) ───────────────────────────


async def render_composer(request: web.Request) -> web.Response:
    body = await _json_body(request)
    if "tracks" not in body:
        raise ApiError(422, "Field 'tracks' is required", "validation_error")
    try:
        result = await asyncio.get_running_loop().run_in_executor(
            None,
            lambda: composer_manager.render(
                tracks=body["tracks"],
                format=body.get("format", "wav"),
                sample_rate=int(body.get("sample_rate", 24000)),
                name=body.get("name"),
            ),
        )
        return web.json_response(result)
    except PermissionError as e:
        raise ApiError(403, str(e))
    except ValueError as e:
        raise ApiError(400, str(e))


async def list_composer_renders(request: web.Request) -> web.Response:
    return web.json_response(
        composer_manager.list_renders(
            limit=_q(request, "limit", 100, int),
            offset=_q(request, "offset", 0, int),
        )
    )


async def get_composer_audio(request: web.Request) -> web.Response:
    item = composer_manager.get_render(request.match_info["composition_id"])
    if not item:
        raise ApiError(404, "Composition not found")
    output_path = item.get("render_output_path")
    if not output_path:
        raise ApiError(404, "Composition has no rendered output")
    p = Path(output_path)
    if not p.is_absolute():
        p = (Path.cwd() / p).resolve()
    if not p.exists():
        raise ApiError(404, "Rendered audio file not found")
    suffix = p.suffix.lower().lstrip(".")
    return web.Response(
        body=p.read_bytes(), content_type=get_content_type(suffix or "wav")
    )


async def delete_composer_render(request: web.Request) -> web.Response:
    if not composer_manager.delete_render(request.match_info["composition_id"]):
        raise ApiError(404, "Composition not found")
    return web.Response(status=204)


# ── web UI ────────────────────────────────────────────────────────────


async def web_ui(request: web.Request) -> web.Response:
    index = STATIC_DIR / "index.html"
    if index.exists():
        return web.Response(text=index.read_text(), content_type="text/html")
    return web.Response(
        text="<h1>Web UI not found</h1>", content_type="text/html", status=404
    )


# ── lifespan (reference :137-219) ─────────────────────────────────────


async def _on_startup(app: web.Application) -> None:
    init_db()
    if settings.os_api_key == "" and settings.os_auth_required:
        raise RuntimeError("OS_AUTH_REQUIRED=true but OS_API_KEY is not set")

    lifecycle = ModelLifecycleManager(backend_router, manager=model_manager)
    lifecycle.start()
    app["lifecycle"] = lifecycle

    if settings.tts_cache_enabled:
        async def _cleanup_loop():
            while True:
                await asyncio.sleep(30)
                try:
                    await asyncio.get_running_loop().run_in_executor(
                        None, tts_cache.cleanup
                    )
                except Exception:  # noqa: BLE001
                    logger.exception("TTS cache cleanup failed")

        app["tts_cache_task"] = asyncio.create_task(_cleanup_loop())

    if settings.os_wyoming_enabled:
        from open_speech_tpu.server.wyoming.server import start_wyoming_server

        app["wyoming"] = await start_wyoming_server(
            backend_router, tts_router,
            host=settings.os_wyoming_host, port=settings.os_wyoming_port,
        )

    loop = asyncio.get_running_loop()
    for model_id in [
        m.strip() for m in settings.stt_preload_models.split(",") if m.strip()
    ]:
        try:
            await loop.run_in_executor(
                None, lambda m=model_id: backend_router.load_model(m)
            )
        except Exception:  # noqa: BLE001
            logger.exception("Failed to preload STT model %s", model_id)
    if settings.tts_enabled:
        for model_id in [
            m.strip() for m in settings.tts_preload_models.split(",") if m.strip()
        ]:
            try:
                await loop.run_in_executor(
                    None, lambda m=model_id: tts_router.load_model(m)
                )
            except Exception:  # noqa: BLE001
                logger.exception("Failed to preload TTS model %s", model_id)


async def _on_cleanup(app: web.Application) -> None:
    if "tts_cache_task" in app:
        app["tts_cache_task"].cancel()
    if "wyoming" in app:
        app["wyoming"].close()
    if "lifecycle" in app:
        await app["lifecycle"].stop()
    # stop continuous batchers last: fails in-flight futures cleanly
    # instead of abandoning their tasks at loop teardown
    from open_speech_tpu.runtime.batcher_pool import shutdown_batchers

    await shutdown_batchers()


def create_app() -> web.Application:
    app = web.Application(
        middlewares=[error_middleware, security_middleware],
        client_max_size=settings.os_max_upload_mb * 1024 * 1024 * 2,
    )
    r = app.router
    # OpenAI STT
    r.add_post("/v1/audio/transcriptions", transcribe)
    r.add_post("/v1/audio/translations", translate)
    # OpenAI models
    r.add_get("/v1/models", list_models)
    r.add_get("/v1/models/{model:.+}", get_model)
    # legacy management
    r.add_get("/api/ps", list_loaded_models)
    r.add_post("/api/ps/{model:.+}", load_model_legacy)
    r.add_delete("/api/ps/{model:.+}", unload_model_legacy)
    # unified management
    r.add_get("/api/models", list_all_models)
    r.add_get("/api/tts/capabilities", get_tts_capabilities_route)
    r.add_get("/api/models/{model_id:.+}/status", get_model_status)
    r.add_get("/api/models/{model_id:.+}/progress", get_model_progress)
    r.add_post("/api/models/{model_id:.+}/load", load_model_unified)
    r.add_post("/api/models/{model_id:.+}/download", download_model_unified)
    r.add_post("/api/models/{model_id:.+}/prefetch", download_model_unified)
    r.add_delete("/api/models/{model_id:.+}/artifacts", delete_model_artifacts)
    r.add_delete("/api/models/{model_id:.+}", unload_model_unified)
    r.add_post("/api/pull/{model:.+}", pull_model)
    r.add_get("/health", health)
    r.add_get("/metrics", metrics_route)
    r.add_get("/api/stats", stats_route)
    r.add_post("/api/profiler/start", profiler_start)
    r.add_post("/api/profiler/stop", profiler_stop)
    # WebSockets
    r.add_get("/v1/audio/stream", ws_stream)
    r.add_get("/v1/realtime", ws_realtime)
    # TTS
    r.add_post("/v1/audio/speech", synthesize_speech)
    r.add_post("/v1/audio/speech/clone", clone_speech)
    r.add_post("/v1/audio/models/load", load_tts_model)
    r.add_post("/v1/audio/models/unload", unload_tts_model)
    r.add_get("/v1/audio/models", list_tts_models)
    r.add_get("/v1/audio/voices", list_voices)
    # voice library + presets
    r.add_post("/api/voices/library", upload_voice)
    r.add_get("/api/voices/library", list_library_voices)
    r.add_get("/api/voices/library/{name}", get_library_voice_meta)
    r.add_delete("/api/voices/library/{name}", delete_library_voice)
    r.add_get("/api/voice-presets", get_voice_presets)
    # studio
    r.add_post("/api/profiles", create_profile)
    r.add_get("/api/profiles", list_profiles)
    r.add_get("/api/profiles/{profile_id}", get_profile)
    r.add_put("/api/profiles/{profile_id}", update_profile)
    r.add_delete("/api/profiles/{profile_id}", delete_profile)
    r.add_post("/api/profiles/{profile_id}/default", set_profile_default)
    r.add_get("/api/history", list_history)
    r.add_delete("/api/history/{entry_id}", delete_history_entry)
    r.add_delete("/api/history", clear_history)
    r.add_post("/api/conversations", create_conversation)
    r.add_get("/api/conversations", list_conversations)
    r.add_get("/api/conversations/{conversation_id}/audio", get_conversation_audio)
    r.add_get("/api/conversations/{conversation_id}", get_conversation)
    r.add_post(
        "/api/conversations/{conversation_id}/turns", add_conversation_turn
    )
    r.add_delete(
        "/api/conversations/{conversation_id}/turns/{turn_id}",
        delete_conversation_turn,
    )
    r.add_post("/api/conversations/{conversation_id}/render", render_conversation)
    r.add_delete("/api/conversations/{conversation_id}", delete_conversation)
    r.add_post("/api/composer/render", render_composer)
    r.add_get("/api/composer/renders", list_composer_renders)
    r.add_get(
        "/api/composer/render/{composition_id}/audio", get_composer_audio
    )
    r.add_delete("/api/composer/render/{composition_id}", delete_composer_render)
    # web UI
    r.add_get("/web", web_ui)
    if STATIC_DIR.is_dir():
        r.add_static("/static", str(STATIC_DIR))

    app.on_startup.append(_on_startup)
    app.on_cleanup.append(_on_cleanup)
    return app


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    # multi-host: join the jax.distributed runtime BEFORE any jax device
    # touch (no-op unless OS_DIST_* is set — see parallel/distributed.py
    # for the DP-replica serving topology)
    from open_speech_tpu.parallel.distributed import maybe_init_distributed

    maybe_init_distributed()
    app = create_app()
    ssl_context = None
    if settings.os_ssl_enabled:
        import ssl as _ssl

        from open_speech_tpu.server.ssl_utils import (
            DEFAULT_CERT_FILE,
            DEFAULT_KEY_FILE,
            ensure_ssl_certs,
        )

        cert = settings.os_ssl_certfile or DEFAULT_CERT_FILE
        key = settings.os_ssl_keyfile or DEFAULT_KEY_FILE
        ensure_ssl_certs(cert, key)
        ssl_context = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
        ssl_context.load_cert_chain(cert, key)
        logger.info("Listening on https://%s:%d", settings.os_host, settings.os_port)
    else:
        logger.info("Listening on http://%s:%d", settings.os_host, settings.os_port)
    web.run_app(
        app, host=settings.os_host, port=settings.os_port, ssl_context=ssl_context
    )


if __name__ == "__main__":
    main()
