"""Benchmark: the full BASELINE target set on one chip.

Emits one JSON line per metric (the headline ASR RTFx first):

  1. ASR RTFx, whisper-large-v3-turbo — target >=50x real-time/chip
     (BASELINE.md north star; int8 weights + int8 cross-KV by default,
     BENCH_COMPUTE=bf16 for the pure-bf16 number).
  2. TTS TTFA p50 at 1 concurrent stream (kokoro-82M, blockwise vocoder).
  3. TTS TTFA p50 at 64 concurrent streams — target <200 ms (the batched
     encode + first generator block; full-utterance B=64 rendering would
     overflow HBM, which is exactly what the blockwise vocoder fixes).
  4. Kokoro-82M throughput — reference baselines 2.9x (CPU) / ~10x (CUDA)
     real-time (docs/TTS-BACKENDS.md:79-80); target here 10x.
  5. Piper (VITS medium geometry) throughput — no published reference
     number; measured against the same 10x bar.
  6. Streaming STT per-chunk device latency — must stay under the 100 ms
     chunk interval for real-time streaming.

Weights are random-init (no egress in this environment); that changes no
FLOPs/bandwidth. The ASR decode budget is fixed at 96 tokens/window since
random weights never emit EOT.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

MODEL = os.environ.get("BENCH_MODEL", "large-v3-turbo")
COMPUTE = os.environ.get("BENCH_COMPUTE", "int8")
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
TOKENS_PER_WINDOW = int(os.environ.get("BENCH_TOKENS", "96"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))
ONLY = os.environ.get("BENCH_ONLY", "")  # comma list: asr,ttfa,tts,stream
TARGET_RTFX = 50.0  # north star: >=50x real-time per v5e chip
TARGET_TTFA = 0.200  # p50 TTFA under 64 concurrent streams
TARGET_TTS_RTFX = 10.0  # reference kokoro on CUDA ~10x real-time
CHUNK_INTERVAL = 0.100  # streaming chunk cadence


def _prev_bench() -> dict[str, tuple[float, str]]:
    """Metric → (value, unit) from the last committed bench run.

    Primary source: ``bench_results.json`` — the durable full row list
    this script writes at the end of every run (the driver's
    BENCH_r{N}.json keeps only the last ~2 kB of stdout, which silently
    drops the early ASR rows). Fallback: the newest BENCH_r*.json tail.
    Round-3 verdict: two silent regressions in a row — drift must be
    visible the moment it happens, not when a target fails.
    """
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    from_file: dict[str, tuple[float, str]] = {}
    try:
        with open(os.path.join(here, "bench_results.json")) as f:
            rows = json.load(f).get("rows", [])
        from_file = {
            r["metric"]: (float(r["value"]), str(r.get("unit", "")))
            for r in rows
            if "metric" in r and "value" in r
        }
    except Exception:  # noqa: BLE001 — first run has no results file
        pass
    files = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    for path in reversed(files):
        try:
            with open(path) as f:
                tail = json.load(f).get("tail", "")
        except Exception:  # noqa: BLE001 — a corrupt snapshot is not fatal
            continue
        out: dict[str, tuple[float, str]] = {}
        for line in tail.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                row = json.loads(line)
            except ValueError:
                continue
            if "metric" in row and "value" in row:
                out[row["metric"]] = (
                    float(row["value"]),
                    str(row.get("unit", "")),
                )
        if out:
            # the results file wins per metric; the stdout tail fills in
            # metrics a partial (BENCH_ONLY) artifact doesn't carry
            out.update(from_file)
            return out
    return from_file


_PREV: dict[str, tuple[float, str]] | None = None
_ROWS: list[dict] = []  # every emitted row, written to bench_results.json

# units where a delta is meaningful, mapped to their good direction
_GATED_UNITS = {"ms": "lower", "x_realtime_per_chip": "higher"}
_REGRESSION_TOLERANCE = 0.90  # >10% drop ⇒ regression: true


def emit(metric: str, value: float, unit: str, vs_baseline: float) -> None:
    global _PREV
    if _PREV is None:
        _PREV = _prev_bench()
    row = {
        "metric": metric,
        "value": round(value, 4),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 3),
    }
    direction = _GATED_UNITS.get(unit)
    prev = _PREV.get(metric)
    exact = prev is not None
    if prev is None:
        # metric labels carry parenthetical run details that legitimately
        # evolve (acceptance counts, batch notes); fall back to the stable
        # pre-parenthesis stem when it identifies exactly one previous row
        stem = metric.split("(")[0].strip()
        hits = [
            v for m, v in _PREV.items() if m.split("(")[0].strip() == stem
        ]
        prev = hits[0] if len(hits) == 1 else None
    if direction and prev and prev[1] == unit and prev[0] > 0 and value > 0:
        ratio = value / prev[0] if direction == "higher" else prev[0] / value
        row["vs_prev"] = round(ratio, 3)  # >1 improved, <1 regressed
        # only an exact metric-name match can raise the regression flag:
        # a stem-fallback pairs renamed variants whose run conditions may
        # legitimately differ (e.g. a new bench mode under the same stem)
        if exact and ratio < _REGRESSION_TOLERANCE:
            row["regression"] = True
    _ROWS.append(row)
    print(json.dumps(row), flush=True)


def _load_ack() -> dict[str, str]:
    """BENCH_ACK.json: metric-stem → root-cause note.

    A ``regression: true`` row whose stem is NOT listed here fails the
    whole bench run (exit 1). The round-4 lesson: a regression gate that
    flags and is then ignored in the same round normalizes red — the
    allowlist forces every accepted regression to carry a written
    root-cause."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_ACK.json")) as f:
            return {str(k): str(v) for k, v in json.load(f).items()}
    except Exception:  # noqa: BLE001 — no ack file = nothing acknowledged
        return {}


def finalize() -> int:
    """Write the durable full-row artifact and enforce the regression
    gate. Returns the process exit code.

    A BENCH_ONLY partial run MERGES its rows into the existing artifact
    by metric name instead of overwriting it — otherwise one targeted
    re-run would erase every other metric's prev value and silently
    disarm the regression gate for them on the next full run."""
    here = os.path.dirname(os.path.abspath(__file__))
    if os.environ.get("BENCH_NO_PERSIST"):
        # smoke/debug runs (e.g. CPU-backend shakeouts of new rows) must
        # not become the vs_prev reference for real chip runs
        return 0
    rows = list(_ROWS)
    if ONLY:
        try:
            with open(os.path.join(here, "bench_results.json")) as f:
                old = json.load(f).get("rows", [])
        except Exception:  # noqa: BLE001 — no prior artifact to merge
            old = []
        new_metrics = {r["metric"] for r in rows}
        rows = [r for r in old if r.get("metric") not in new_metrics] + rows
    with open(os.path.join(here, "bench_results.json"), "w") as f:
        json.dump(
            {"rows": rows, "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())},
            f, indent=1,
        )
        f.write("\n")
    ack = _load_ack()
    unexplained = []
    for row in _ROWS:
        if not row.get("regression"):
            continue
        stem = row["metric"].split("(")[0].strip()
        if row["metric"] in ack or stem in ack:
            note(f"acknowledged regression: {row['metric']} — "
                 f"{ack.get(row['metric'], ack.get(stem))}")
        else:
            unexplained.append(row["metric"])
    if unexplained:
        note(
            "UNEXPLAINED REGRESSIONS (add a root-cause note to "
            f"BENCH_ACK.json or fix): {unexplained}"
        )
        return 1
    return 0


def note(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


# ── ASR ───────────────────────────────────────────────────────────────


def bench_asr(run_asr: bool = True) -> None:
    from open_speech_tpu.models.whisper.decode import _greedy_impl
    from open_speech_tpu.models.whisper.model import PRESETS, encode, init_params
    from open_speech_tpu.models.whisper.tokenizer import get_tokenizer
    from open_speech_tpu.ops.mel import log_mel_spectrogram

    cfg = PRESETS[MODEL]
    tok = get_tokenizer(n_vocab=cfg.n_vocab, n_langs=cfg.n_langs)
    sp = tok.special
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if COMPUTE == "int8":
        from open_speech_tpu.models.whisper.quantize import quantize_whisper_params

        params = quantize_whisper_params(params)

    window_samples = cfg.n_audio_ctx * 2 * 160  # 480000 = 30 s
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.uniform(-0.3, 0.3, (BATCH, window_samples)).astype(np.float32)
    )
    prompt = jnp.asarray([sp.sot_sequence("en", "transcribe")] * BATCH, jnp.int32)
    suppress = jnp.zeros((cfg.n_vocab,), jnp.float32)
    rng_key = jax.random.PRNGKey(0)

    def run_once():
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        enc_out = encode(params, mel, cfg)
        tokens, *_ = _greedy_impl(
            params, prompt, enc_out, suppress, rng_key, jnp.float32(0.0),
            cfg=cfg, special=sp, max_new=TOKENS_PER_WINDOW, sampled=False,
            timestamps=True, max_init_tok=sp.timestamp_begin + 50,
            blank=(220, sp.eot),
        )
        return tokens

    if run_asr:
        # warmup / compile. NOTE: a host transfer (np.asarray) is the sync
        # point; block_until_ready alone does not synchronize through the
        # axon relay.
        t0 = time.time()
        np.asarray(run_once())
        compile_s = time.time() - t0

        times = []
        for _ in range(ITERS):
            t0 = time.time()
            np.asarray(run_once())
            times.append(time.time() - t0)
        wall = min(times)
        audio_seconds = BATCH * window_samples / 16000
        rtfx = audio_seconds / wall
        emit(
            f"ASR RTFx whisper-{MODEL} ({COMPUTE}, batch={BATCH}, "
            f"greedy {TOKENS_PER_WINDOW} tok/30s)",
            rtfx, "x_realtime_per_chip", rtfx / TARGET_RTFX,
        )
        note(
            f"asr wall={wall:.3f}s for {audio_seconds:.0f}s audio; "
            f"compile={compile_s:.0f}s"
        )
        # roofline accounting (round-4 verdict weak #3: make the
        # achieved-vs-peak gap visible). Matmul FLOPs ≈ 2 * weight-params
        # * positions; attention adds the score/value dots. A v5e peak:
        # 197 TFLOP/s bf16, 394 TOP/s int8.
        d, L_e, L_d = cfg.n_audio_state, cfg.n_audio_layer, cfg.n_text_layer
        T_e, V = cfg.n_audio_ctx, cfg.n_vocab
        p_enc = L_e * 12 * d * d
        p_dec_self = L_d * 4 * d * d
        p_dec_mlp = L_d * 8 * d * d
        p_dec_crossq = L_d * 2 * d * d  # q+o per step (k/v precomputed)
        enc_fl = 2 * p_enc * T_e + 4 * L_e * T_e * T_e * d  # + attn dots
        crosskv_fl = 2 * (L_d * 2 * d * d) * T_e
        per_tok = (
            2 * (p_dec_self + p_dec_mlp + p_dec_crossq)
            + 4 * L_d * T_e * d  # cross attention dots vs 1500 keys
            + 2 * d * V  # logits
        )
        dec_fl = per_tok * TOKENS_PER_WINDOW
        total_fl = BATCH * (enc_fl + crosskv_fl + dec_fl)
        peak = 394e12 if COMPUTE == "int8" else 197e12
        mfu = total_fl / wall / peak
        emit(
            f"ASR MFU whisper-{MODEL} greedy ({COMPUTE}, batch={BATCH}, "
            "achieved matmul FLOP/s vs v5e peak)",
            mfu * 100, "pct_of_peak", mfu,
        )
        note(
            f"mfu: {total_fl / 1e12:.1f} TFLOP per batch, "
            f"{total_fl / wall / 1e12:.1f} TFLOP/s achieved "
            f"(enc {BATCH * enc_fl / 1e12:.1f} + dec "
            f"{BATCH * dec_fl / 1e12:.1f} TFLOP); greedy decode is "
            "HBM-bound by design — the roofline ceiling for the decode "
            "phase is bandwidth, not the MXU"
        )

    # beam-5 batch ASR: the REST endpoint's DEFAULT quality path (the
    # reference calls CT2 with beam_size=5, src/backends/faster_whisper.py:
    # 235-245) — the number a reference user actually compares.
    if _want("beam"):
        from open_speech_tpu.models.whisper.decode import (
            DecodeOptions,
            beam_decode,
        )

        bb = max(1, BATCH // 2)  # beams ride the batch axis: 5x rows
        b_audio = audio[:bb]
        b_prompt = np.asarray(prompt[:bb])
        opts = DecodeOptions(max_new_tokens=TOKENS_PER_WINDOW, beam_size=5)

        def beam_once():
            mel = log_mel_spectrogram(b_audio, n_mels=cfg.n_mels)
            enc_out = encode(params, mel, cfg)
            return beam_decode(params, cfg, sp, enc_out, b_prompt, opts)

        t0 = time.time()
        beam_once()
        note(f"beam5 compile={time.time() - t0:.0f}s")
        laps = []
        for _ in range(ITERS):
            t0 = time.time()
            beam_once()  # DecodeResult holds np arrays: host sync included
            laps.append(time.time() - t0)
        wall = min(laps)
        audio_seconds = bb * window_samples / 16000
        rtfx = audio_seconds / wall
        emit(
            f"ASR RTFx whisper-{MODEL} beam-5 REST default ({COMPUTE}, "
            f"batch={bb}, {TOKENS_PER_WINDOW} tok/30s)",
            rtfx, "x_realtime_per_chip", rtfx / TARGET_RTFX,
        )

    # streaming STT per-chunk device latency: one interim update = mel +
    # encoder + short greedy decode over the padded window (the per-chunk
    # work of server/streaming.py's batched path at batch=8 sessions)
    if _want("stream"):
        sb = 8
        s_audio = audio[:sb]
        s_prompt = prompt[:sb]

        def chunk_step():
            mel = log_mel_spectrogram(s_audio, n_mels=cfg.n_mels)
            enc_out = encode(params, mel, cfg)
            tokens, *_ = _greedy_impl(
                params, s_prompt, enc_out, suppress, rng_key, jnp.float32(0.0),
                cfg=cfg, special=sp, max_new=48, sampled=False,
                timestamps=True, max_init_tok=sp.timestamp_begin + 50,
                blank=(220, sp.eot),
            )
            return tokens

        np.asarray(chunk_step())  # compile
        laps = []
        for _ in range(max(ITERS, 3)):
            t0 = time.time()
            np.asarray(chunk_step())
            laps.append(time.time() - t0)
        per_chunk = float(np.median(laps)) / sb  # amortized per session
        emit(
            f"streaming STT per-chunk latency (batch={sb} sessions, "
            "30s window re-encode, 48-tok interim decode)",
            per_chunk * 1000, "ms", CHUNK_INTERVAL / per_chunk,
        )

    # the REAL streaming interim path: O(n) incremental encoder — only new
    # audio is block-encoded; the interim decode runs over a bucketed
    # prefix (server/streaming.py:_transcribe_incremental). Measures one
    # mid-utterance chunk update (append 100 ms + tail re-encode + decode).
    if _want("stream_inc"):
        from open_speech_tpu.models.whisper.decode import (
            DecodeOptions,
            greedy_decode,
        )
        from open_speech_tpu.models.whisper.streaming import (
            StreamingWhisperEncoder,
            interim_budget,
        )

        enc_inc = StreamingWhisperEncoder(params, cfg)
        rng2 = np.random.default_rng(1)
        enc_inc.append_audio(
            rng2.uniform(-0.3, 0.3, 10 * 16000).astype(np.float32)
        )  # 10 s into the utterance
        chunk = rng2.uniform(-0.3, 0.3, 1600).astype(np.float32)  # 100 ms
        sot = sp.sot_sequence("en", "transcribe", timestamps=False)
        # steady-state serving shape (server/streaming.py): LocalAgreement2's
        # confirmed prefix is FORCED via the parallel prefill, and only the
        # unconfirmed tail is generated — 128 forced + 48-token tail here
        forced = list(
            rng2.integers(sp.timestamp_begin // 2, size=128).astype(np.int32)
        )
        inc_prompt = np.asarray([list(sot) + forced], np.int32)

        def inc_step():
            enc_inc.append_audio(chunk)
            enc_states, bucket = enc_inc.interim_states()
            # the serving path's shape math, not a copy of it — the bench
            # must compile exactly the programs the server runs
            budget = interim_budget(bucket, len(forced))
            opts = DecodeOptions(
                language="en", timestamps=False, beam_size=1,
                max_new_tokens=budget, suppress_blank=True,
            )
            return greedy_decode(
                params, cfg, sp, enc_states, inc_prompt, opts,
                enc_len=np.asarray([enc_inc.real_positions], np.int32),
            )

        inc_step()  # compile (block program + bucketed decode)
        laps = []
        for _ in range(max(ITERS, 5)):
            t0 = time.time()
            inc_step()
            laps.append(time.time() - t0)
        per = float(np.median(laps))
        emit(
            "streaming STT incremental interim (1 session, O(n) block "
            "encoder, bucketed greedy decode, mid-utterance)",
            per * 1000, "ms", CHUNK_INTERVAL / per,
        )
        note(
            "interim > chunk cadence is absorbed at serving: the "
            "newest-wins coalescing scheduler runs at most one interim "
            "per session and one catch-up pass "
            "(server/streaming.py:_schedule_interim); this row is the "
            "raw single-session device cost, no-EOT worst case"
        )


def bench_streaming_ws() -> None:
    """Server-level streaming concurrency: N real WS sessions end-to-end.

    The stream/stream_inc rows measure device programs only; this row
    runs the WHOLE serving path — aiohttp server process, VAD step
    (threshold 0 so noise counts as speech and the VAD compute stays on
    the hot path), coalescing interim scheduler, LocalAgreement2, shared
    continuous batcher — with N clients feeding real-time-paced 100 ms
    PCM16 chunks over ws://.../v1/audio/stream.

    Metrics per N in (8, 16):
      - p95 gap between consecutive interim transcripts per session
        (steady-state cadence; keeping up ⇒ ~chunk interval)
      - p50 final turnaround: stop-sent → speech_final received (full
        decode + scheduler drain on the close path)

    Regime note: through the axon RELAY each device dispatch pays a
    ~50-150 ms round trip, so one interim (~3-4 dispatches) costs
    ~0.5 s and N sessions contend for the 4 streaming-executor threads —
    the relayed numbers measure dispatch latency × contention, not the
    chip. The same bench on a local backend (BENCH_WS_MODEL on a
    chip-local host, or the CPU smoke) shows the serving machinery's own
    overhead: 119 ms p95 gap / 278 ms p50 final @8 sessions.
    """
    import asyncio
    import socket
    import subprocess

    import aiohttp

    here = os.path.dirname(os.path.abspath(__file__))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    # the committed EOT-trained fixture: interim decodes produce REAL text
    # ("beep ...") so transcript events actually flow. A random-weight
    # large model emits EOT-or-garbage and the agreement policy correctly
    # sends nothing — the server transcribes 80/80 chunks and the client
    # sees zero events (observed). This row measures the SERVING path at
    # N sessions (VAD step, coalescing scheduler, LocalAgreement2, event
    # loop, finals); device-heavy decode economics are the asr/stream
    # rows' job.
    ws_model = os.environ.get("BENCH_WS_MODEL", "test-tiny-eot")
    env = dict(os.environ)
    env.update(
        OS_SSL_ENABLED="false",
        OS_PORT=str(port),
        OS_HOST="127.0.0.1",
        OS_STT_MODEL=ws_model,
        STT_MODEL_DIR=os.path.join(here, "tests", "fixtures"),
        OS_STT_COMPUTE_TYPE="bf16",
        OS_PRECOMPILE_ON_LOAD="1",
        OS_STREAM_VAD_THRESHOLD="0.0",
        OS_STT_VAD_THRESHOLD="0.0",
        OS_STREAM_MAX_CONNECTIONS="64",
        OS_MODEL_TTL="7200",
        JAX_COMPILATION_CACHE_DIR="/root/.jax_cache",
    )
    srv_log = open("/tmp/bench_ws_server.log", "w")
    proc = subprocess.Popen(
        [sys.executable, "-m", "open_speech_tpu.server"],
        env=env, cwd=here,
        stdout=srv_log, stderr=subprocess.STDOUT,
    )

    stream_seconds = 8.0
    # final-turnaround phase streams ONE window-sized utterance (the
    # canonical serving shape: real utterances end inside the model
    # window, where finals ride the incremental encoder states); the
    # cadence phase streams 8 s to measure steady-state interim gaps
    final_seconds = 1.0
    chunk_bytes = int(16000 * CHUNK_INTERVAL) * 2
    rng = np.random.default_rng(3)
    pcm = rng.integers(-8000, 8000, int(16000 * stream_seconds)).astype(
        np.int16
    ).tobytes()

    async def one_session(
        http: "aiohttp.ClientSession", results: list, final_wait: float,
        seconds: float = stream_seconds,
    ):
        url = (
            f"ws://127.0.0.1:{port}/v1/audio/stream?model={ws_model}"
            "&language=en&interim_results=true"
        )
        interim_at: list[float] = []
        final_turnaround = None
        async with http.ws_connect(url, max_msg_size=0) as ws:
            loop = asyncio.get_running_loop()
            t0 = loop.time()
            n_chunks = int(seconds * 16000) * 2 // chunk_bytes
            sent = 0
            stop_at = None

            async def reader():
                nonlocal final_turnaround
                async for msg in ws:
                    if msg.type != aiohttp.WSMsgType.TEXT:
                        continue
                    evt = json.loads(msg.data)
                    if evt.get("type") == "session.end":
                        return
                    if evt.get("type") != "transcript":
                        continue
                    if evt.get("speech_final"):
                        if stop_at is not None:
                            final_turnaround = loop.time() - stop_at
                        return
                    interim_at.append(loop.time())

            rtask = asyncio.create_task(reader())
            try:
                for i in range(n_chunks):
                    target = t0 + i * CHUNK_INTERVAL
                    delay = target - loop.time()
                    if delay > 0:
                        await asyncio.sleep(delay)
                    await ws.send_bytes(pcm[sent : sent + chunk_bytes])
                    sent += chunk_bytes
                stop_at = loop.time()
                await ws.send_str(json.dumps({"type": "stop"}))
            except Exception as e:  # noqa: BLE001 — a dropped session
                # must not kill the whole gather; it just contributes no
                # final-turnaround sample
                note(f"ws session send failed: {e!r}")
            try:
                # first-ever session rides every streaming-program compile
                # (minutes through the relay) — give it room; measured runs
                # hit warm programs and finish in well under 30 s
                await asyncio.wait_for(rtask, timeout=final_wait)
            except asyncio.TimeoutError:
                rtask.cancel()
        gaps = [
            (b - a) for a, b in zip(interim_at, interim_at[1:])
        ]
        results.append((gaps, final_turnaround, len(interim_at)))

    async def run_n(n: int, final_wait: float = 30.0, seconds: float = stream_seconds):
        results: list = []
        async with aiohttp.ClientSession() as http:
            await asyncio.gather(
                *(
                    one_session(http, results, final_wait, seconds)
                    for _ in range(n)
                )
            )
        return results

    async def wait_health():
        deadline = time.time() + 600
        async with aiohttp.ClientSession() as http:
            while time.time() < deadline:
                try:
                    async with http.get(
                        f"http://127.0.0.1:{port}/health",
                        timeout=aiohttp.ClientTimeout(total=5),
                    ) as r:
                        if r.status == 200:
                            return
                except Exception:  # noqa: BLE001 — still booting
                    pass
                await asyncio.sleep(2.0)
        raise RuntimeError("server did not become healthy")

    try:
        asyncio.run(wait_health())
        t0 = time.time()
        # warm the streaming buckets end-to-end: two passes, since the
        # first session's interims mostly coalesce behind compiles and
        # later buckets only get hit once earlier ones are warm
        w1 = asyncio.run(run_n(1, final_wait=1800.0))
        w2 = asyncio.run(run_n(2, final_wait=300.0))
        note(
            f"ws warmup took {time.time() - t0:.0f}s "
            f"(events: {[r[2] for r in w1]} then {[r[2] for r in w2]}, "
            f"finals: {[r[1] is not None for r in w1 + w2]})"
        )
        def _dump_server_tail() -> None:
            try:
                with open("/tmp/bench_ws_server.log") as f:
                    tail = [
                        line for line in f.readlines()[-40:]
                        if "access" not in line
                    ]
                note("ws server log tail:\n" + "".join(tail[-25:]))
            except Exception:  # noqa: BLE001 — diagnostics only
                pass

        for n in (8, 16):
            # phase 1 — cadence: long streams, measure interim gaps
            res = asyncio.run(run_n(n, final_wait=120.0))
            gaps = [g for r in res for g in r[0]]
            interims = sum(r[2] for r in res)
            if gaps:
                p95_gap = float(np.percentile(gaps, 95))
                emit(
                    f"streaming WS e2e p95 interim gap (N={n} real-time "
                    f"sessions, full server path, {ws_model})",
                    p95_gap * 1000, "ms",
                    (2 * CHUNK_INTERVAL) / p95_gap,
                )
                note(
                    f"ws @N={n}: {interims} interims across {n} sessions "
                    f"({interims / n / stream_seconds:.1f}/s/session)"
                )
            else:
                note(f"ws cadence @N={n}: zero interims — skipping row")
                _dump_server_tail()
            # phase 2 — final turnaround: one window-sized utterance per
            # session, all N stopping concurrently (finals ride the
            # incremental encoder states; overflow finals are the
            # longform path's job)
            res = asyncio.run(
                run_n(n, final_wait=120.0, seconds=final_seconds)
            )
            finals = [r[1] for r in res if r[1] is not None]
            if finals:
                p50_final = float(np.median(finals))
                emit(
                    f"streaming WS e2e p50 final turnaround (N={n} "
                    f"window-sized utterances, stop -> speech_final, "
                    f"{ws_model})",
                    p50_final * 1000, "ms", 1.0 / p50_final,
                )
            else:
                note(f"ws finals @N={n}: zero speech_finals — skipping row")
                _dump_server_tail()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


# ── TTS ───────────────────────────────────────────────────────────────


def _kokoro_setup(batch: int, frames: int = 240):
    from open_speech_tpu.models.kokoro.model import (
        KokoroConfig,
        encode_utterance,
        init_kokoro_params,
    )

    cfg = KokoroConfig(max_phonemes=128, max_frames=frames)
    params = init_kokoro_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ph = np.zeros((batch, cfg.max_phonemes), np.int32)
    ph[:, :60] = rng.integers(1, 170, (batch, 60))
    style = jnp.asarray(
        (rng.standard_normal((batch, 2 * cfg.style_dim)) * 0.2).astype(np.float32)
    )
    args = (
        jnp.asarray(ph),
        jnp.asarray([60] * batch, jnp.int32),
        style,
        jnp.asarray([1.0] * batch, jnp.float32),
    )
    return params, cfg, encode_utterance, args


def bench_tts_ttfa() -> None:
    from open_speech_tpu.models.kokoro.model import vocode_streaming

    for batch, label in ((1, "1 stream"), (64, "64 concurrent streams")):
        params, cfg, encode_utterance, args = _kokoro_setup(batch)

        def first_block():
            g, n_frames = encode_utterance(params, cfg, *args)
            stream = vocode_streaming(
                params, cfg, g, n_frames, rng=jax.random.PRNGKey(0),
                block_frames=32, first_block_frames=16, wire="i16",
            )
            return next(stream)  # host np array: includes device->host sync

        t0 = time.time()
        first_block()
        note(f"ttfa@{batch} compile={time.time() - t0:.0f}s")
        laps = []
        for _ in range(5):
            t0 = time.time()
            first_block()
            laps.append(time.time() - t0)
        p50 = float(np.median(laps))
        emit(
            f"TTS TTFA p50 kokoro-82M ({label}, blockwise vocoder, "
            "0.4s first block)",
            p50 * 1000, "ms", TARGET_TTFA / p50,
        )


def bench_vad() -> None:
    """Per-chunk VAD cost on the host CPU (where serving pins it).

    Reference claim: Silero VAD costs <5% CPU (README.md:151). One 100 ms
    chunk = 3 windows = one fused vad_scan call; vs_baseline is the
    fraction of the 100 ms budget at 1 core (0.05 = the reference's 5%)."""
    from open_speech_tpu.models.vad.silero import (
        _HIDDEN,
        WINDOW,
        init_vad_params,
        vad_scan,
    )

    cpu = jax.devices("cpu")[0]
    params = jax.device_put(init_vad_params(), cpu)
    rng = np.random.default_rng(0)
    windows = jax.device_put(
        jnp.asarray(rng.uniform(-0.5, 0.5, (4, WINDOW)).astype(np.float32)),
        cpu,
    )
    state = jax.device_put(jnp.zeros((2, 1, _HIDDEN)), cpu)
    n = jnp.int32(3)
    jax.block_until_ready(vad_scan(params, windows, state, n))
    laps = []
    for _ in range(50):
        t0 = time.time()
        jax.block_until_ready(vad_scan(params, windows, state, n))
        laps.append(time.time() - t0)
    per = float(np.median(laps))
    emit(
        "VAD per-chunk cost (100ms chunk = 3 windows, one fused scan, "
        "host CPU)",
        per * 1000, "ms", (0.05 * CHUNK_INTERVAL) / per,
    )


def bench_pocket_ttfa() -> None:
    """Pocket-TTS time-to-first-audio at the real kyutai geometry
    (16-layer/1024 temporal LM + depth transformer + Mimi decoder),
    random weights. The reference's design target is a <1.5 s first
    chunk (docs/TEST-PLAN.md:123); the per-step compute is
    weight-independent, so this is the honest latency proxy."""
    from open_speech_tpu.models.pocket.lm import PocketLMConfig
    from open_speech_tpu.models.pocket.mimi import MimiConfig
    from open_speech_tpu.models.pocket.model import PocketTTS

    tts = PocketTTS.random_init(
        jax.random.PRNGKey(0), PocketLMConfig(), MimiConfig(),
        dtype=jnp.bfloat16,
    )
    text = "The quick brown fox jumps over the lazy dog."

    def first_block():
        return next(iter(tts.generate_stream(text, block_frames=2)))

    t0 = time.time()
    first_block()
    note(f"pocket ttfa compile={time.time() - t0:.0f}s")
    laps = []
    for _ in range(5):
        t0 = time.time()
        first_block()
        laps.append(time.time() - t0)
    p50 = float(np.median(laps))
    emit(
        "TTS TTFA p50 pocket-tts (real 16x1024 geometry, 2-frame first "
        "block = 160ms audio)",
        p50 * 1000, "ms", 1.5 / p50,
    )


def bench_pocket_ttfa64() -> None:
    """Pocket-TTS TTFA p50 at 64 concurrent sessions through the
    slot-pool batcher (runtime/pocket_batcher.py) — the north-star
    concurrency shape. The reference synthesizes pocket one request per
    thread (src/main.py:781-828), which on one chip serializes 64
    autoregressive loops; here all 64 share fused pool steps. Real
    16x1024 LM geometry, bf16, serving max_ctx 768 (the KV pool is
    2*L*H*ctx*Dh*slots ≈ 3.2 GB)."""
    import threading
    from dataclasses import replace

    from open_speech_tpu.models.pocket.lm import PocketLMConfig
    from open_speech_tpu.models.pocket.mimi import MimiConfig
    from open_speech_tpu.models.pocket.model import PocketTTS
    from open_speech_tpu.runtime.pocket_batcher import PocketBatcher

    # free every prior row's device residue first: in a full run the
    # slot-pool KV (2*L*H*ctx*Dh*slots) plus the LM/Mimi weights landed
    # on HBM already carrying earlier models' compiled-program constants
    # — observed RESOURCE_EXHAUSTED, whose crashed worker threads then
    # hung the whole bench. clear_caches costs later rows a recompile;
    # correctness of this row wins.
    import gc

    jax.clear_caches()
    gc.collect()

    n_streams = 64
    # ctx 384 covers the bench utterance (~100 gen frames) at half the
    # serving pool's HBM; the serving default stays 768
    tts = PocketTTS.random_init(
        jax.random.PRNGKey(0),
        replace(PocketLMConfig(), max_ctx=384),
        MimiConfig(),
        dtype=jnp.bfloat16,
    )
    batcher = PocketBatcher(tts, slots=n_streams, block_frames=2)
    text = "The quick brown fox jumps over the lazy dog."

    def burst(n: int) -> list[float]:
        ttfa = [0.0] * n
        failed = [0]

        def run(i: int) -> None:
            try:
                t0 = time.time()
                it = batcher.synthesize(text, None)
                next(it)
                ttfa[i] = time.time() - t0
                for _ in it:  # drain the rest of the utterance
                    pass
            except Exception as e:  # noqa: BLE001 — one dead stream must
                # not hang the join below
                failed[0] += 1
                note(f"pocket64 stream failed: {type(e).__name__}")

        threads = [
            threading.Thread(target=run, args=(i,), daemon=True)
            for i in range(n)
        ]
        for th in threads:
            th.start()
        deadline = time.time() + 300
        for th in threads:
            th.join(timeout=max(1.0, deadline - time.time()))
        if any(th.is_alive() for th in threads) or failed[0]:
            raise RuntimeError(
                f"pocket64 burst incomplete: failed={failed[0]}, "
                f"hung={sum(th.is_alive() for th in threads)}"
            )
        return ttfa

    try:
        t0 = time.time()
        burst(2)  # compile install/prefill/group/mimi programs
        note(f"pocket ttfa@64 compile={time.time() - t0:.0f}s")
        p50s = []
        for _ in range(3):
            t = burst(n_streams)
            p50s.append(float(np.median(t)))
        p50 = float(np.median(p50s))
        emit(
            "TTS TTFA p50 pocket-tts (64 concurrent sessions, slot-pool "
            "batcher, 2-frame first block = 160ms audio)",
            p50 * 1000, "ms", 1.5 / p50,
        )
    finally:
        batcher.stop()


def bench_piper_ttfa64() -> None:
    """Piper TTFA p50 at 64 concurrent requests through PiperBatcher.

    VITS renders the full utterance in one masked feed-forward program,
    so TTFA = wait-for-bucket + one batched synthesize_vits; the
    comparison is the reference's one-onnxruntime-call-per-thread model
    (src/tts/backends/piper_backend.py:296) on the same chip, where 64
    threads would serialize 64 full programs."""
    import threading

    from open_speech_tpu.models.piper.model import (
        PiperConfig,
        init_piper_params,
    )
    from open_speech_tpu.runtime.tts_batcher import PiperBatcher

    n_streams = 64
    cfg = PiperConfig(max_phonemes=128, max_frames=384)
    params = init_piper_params(jax.random.PRNGKey(0), cfg)
    batcher = PiperBatcher(params, cfg)
    rng = np.random.default_rng(1)
    ids = [int(x) for x in rng.integers(1, 120, 60)]

    def burst(n: int) -> list[float]:
        ttfa = [0.0] * n
        failed = [0]

        def run(i: int) -> None:
            try:
                t0 = time.time()
                it = batcher.synthesize(ids, 0, 1.0, i)
                next(it)
                ttfa[i] = time.time() - t0
                for _ in it:
                    pass
            except Exception as e:  # noqa: BLE001 — bounded failure
                failed[0] += 1
                note(f"piper64 stream failed: {type(e).__name__}")

        threads = [
            threading.Thread(target=run, args=(i,), daemon=True)
            for i in range(n)
        ]
        for th in threads:
            th.start()
        deadline = time.time() + 300
        for th in threads:
            th.join(timeout=max(1.0, deadline - time.time()))
        if any(th.is_alive() for th in threads) or failed[0]:
            raise RuntimeError(
                f"piper64 burst incomplete: failed={failed[0]}, "
                f"hung={sum(th.is_alive() for th in threads)}"
            )
        return ttfa

    try:
        t0 = time.time()
        burst(2)
        burst(n_streams)  # compile the 4- and 64-wide buckets
        note(f"piper ttfa@64 compile={time.time() - t0:.0f}s")
        p50s = []
        for _ in range(3):
            p50s.append(float(np.median(burst(n_streams))))
        p50 = float(np.median(p50s))
        emit(
            "TTS TTFA p50 piper VITS-medium (64 concurrent requests, "
            "batched full-utterance render)",
            p50 * 1000, "ms", 1.5 / p50,
        )
    finally:
        batcher.stop()


def bench_tts_throughput() -> None:
    from open_speech_tpu.models.kokoro.model import _unwire, vocode

    params, cfg, encode_utterance, args = _kokoro_setup(16)

    def synth():
        # int16 wire (the serving wire format): through the relayed chip
        # the device->host transfer dominates this row, and serving never
        # ships f32 — see vocode()'s wire_i16 note
        g, n_frames = encode_utterance(params, cfg, *args)
        audio = vocode(
            params, cfg, g, n_frames, jax.random.PRNGKey(0), wire_i16=True
        )
        return _unwire(np.asarray(audio)), np.asarray(n_frames)

    synth()
    laps = []
    for _ in range(ITERS):
        t0 = time.time()
        _a, n = synth()
        laps.append(time.time() - t0)
    wall = min(laps)
    audio_s = float(n.sum()) * cfg.samples_per_frame / cfg.sample_rate
    rtfx = audio_s / wall
    emit(
        "Kokoro-82M TTS throughput (batch=16, full utterances)",
        rtfx, "x_realtime_per_chip", rtfx / TARGET_TTS_RTFX,
    )

    from open_speech_tpu.models.piper.model import (
        PiperConfig,
        init_piper_params,
        synthesize_vits,
    )

    pcfg = PiperConfig(max_phonemes=128, max_frames=384)
    pparams = init_piper_params(jax.random.PRNGKey(0), pcfg)
    pb = 8
    rng = np.random.default_rng(1)
    ph = np.zeros((pb, pcfg.max_phonemes), np.int32)
    ph[:, :60] = rng.integers(1, 120, (pb, 60))
    pargs = (
        jnp.asarray(ph),
        jnp.asarray([60] * pb, jnp.int32),
        jnp.asarray([0] * pb, jnp.int32),
        jnp.asarray([1.0] * pb, jnp.float32),
        jax.random.PRNGKey(0),
    )

    to_i16 = jax.jit(
        lambda a: (jnp.clip(a, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    )

    def psynth():
        # int16 wire, same rationale as the kokoro row: serving ships
        # PCM16 and the relay transfer dominates this row's wall time
        audio, n_frames = synthesize_vits(pparams, pcfg, *pargs)
        return np.asarray(to_i16(audio)), np.asarray(n_frames)

    psynth()
    laps = []
    for _ in range(ITERS):
        t0 = time.time()
        _a, n = psynth()
        laps.append(time.time() - t0)
    wall = min(laps)
    audio_s = float(n.sum()) * pcfg.samples_per_frame / 22050
    rtfx = audio_s / wall
    emit(
        "Piper VITS-medium TTS throughput (batch=8, full utterances)",
        rtfx, "x_realtime_per_chip", rtfx / TARGET_TTS_RTFX,
    )


def bench_longform() -> None:
    """Long-file REST latency: sequential seek loop vs batched chunks.

    One 4-minute upload (8 x 30 s windows), greedy, timestamps off so both
    paths do identical deterministic work (8 encodes + 8 x 96-token
    decodes); the batched path fuses them into one 8-wide device step.
    vs_baseline on the batched row = speedup over the sequential loop.
    """
    from open_speech_tpu.models.whisper.batched import transcribe_batched
    from open_speech_tpu.models.whisper.model import PRESETS, init_params
    from open_speech_tpu.models.whisper.tokenizer import get_tokenizer
    from open_speech_tpu.models.whisper.transcribe import (
        TranscribeOptions,
        transcribe,
    )

    cfg = PRESETS[MODEL]
    tok = get_tokenizer(n_vocab=cfg.n_vocab, n_langs=cfg.n_langs)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if COMPUTE == "int8":
        from open_speech_tpu.models.whisper.quantize import quantize_whisper_params

        params = quantize_whisper_params(params)

    n_win = 8
    window_samples = cfg.n_audio_ctx * 2 * 160
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.3, 0.3, n_win * window_samples).astype(np.float32)
    opts = TranscribeOptions(
        language="en", beam_size=1, temperature=(0.0,),
        max_new_tokens=TOKENS_PER_WINDOW, timestamps=False,
        condition_on_previous_text=False,
        compression_ratio_threshold=None, logprob_threshold=None,
        no_speech_threshold=None,
    )
    audio_seconds = n_win * window_samples / 16000

    def seq():
        return transcribe(params, cfg, tok, audio, opts)

    def bat():
        return transcribe_batched(
            params, cfg, tok, audio, opts, max_batch=8, snap_cuts=False
        )

    seq()  # compile
    t0 = time.time()
    seq()
    seq_wall = time.time() - t0
    bat()  # compile
    t0 = time.time()
    bat()
    bat_wall = time.time() - t0
    emit(
        f"ASR long-file RTFx whisper-{MODEL} batched chunks "
        f"({COMPUTE}, 4min file, 8-wide windows, greedy "
        f"{TOKENS_PER_WINDOW} tok/30s)",
        audio_seconds / bat_wall, "x_realtime_per_chip",
        seq_wall / bat_wall,
    )
    note(
        f"longform seq={seq_wall:.2f}s ({audio_seconds / seq_wall:.0f}x) "
        f"batched={bat_wall:.2f}s for {audio_seconds:.0f}s audio"
    )


def _want(key: str) -> bool:
    return not ONLY or key in ONLY.split(",")


# ── real / converted weights ──────────────────────────────────────────


def bench_asr_eot() -> None:
    """RTFx with EOT-determined decode lengths through the full
    transcribe path — the first bench row NOT bound by the fixed
    96-token budget.

    Random weights never emit <|endoftext|>, so every RTFx row before
    round 5 decoded exactly TOKENS_PER_WINDOW tokens and the EOT stop,
    no-speech gate, and temperature-fallback machinery had never run
    under bench (round-4 verdict weak #2). tests/fixtures/test-tiny-eot
    (trained in-container by tools/finetune_tiny_eot.py) emits EOT after
    content-dependent token counts and <|nospeech|> on silence, matching
    the reference gate semantics (faster_whisper no_speech_threshold /
    log_prob_threshold, src/backends/faster_whisper.py:235-245).

    60 s file alternating beep and silence windows -> the seek loop runs
    ~50 windows; beep windows stop at EOT (6-16 tokens, not 96) and
    silence windows exit via the no-speech gate. Wall time therefore
    reflects real decode-length behavior, not the pessimal budget.
    """
    from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend
    from open_speech_tpu.config import settings
    from open_speech_tpu.ops import audio as codec

    fixtures = os.path.join(os.path.dirname(__file__), "tests", "fixtures")
    old = settings.stt_model_dir, settings.os_precompile_on_load
    settings.stt_model_dir = fixtures
    settings.os_precompile_on_load = False
    try:
        backend = JaxWhisperBackend()
        assert backend._find_checkpoint("test-tiny-eot") is not None
        rng = np.random.default_rng(5)
        sr = 16000
        window = int(1.2 * sr)  # test-tiny geometry: 1.2 s windows
        pieces = []
        for w in range(50):
            if w % 3 == 2:
                pieces.append(rng.normal(0, 0.002, window))
            else:
                clip = rng.normal(0, 0.003, window)
                k = 1 + w % 3
                span = window // k
                for i in range(k):
                    start = i * span
                    dur = int(0.15 * sr)
                    t = np.arange(dur) / sr
                    clip[start : start + dur] += (
                        0.5 * np.sin(2 * np.pi * 440.0 * t) * np.hanning(dur)
                    )
                pieces.append(clip)
        audio = np.concatenate(pieces).astype(np.float32)
        wav = codec.write_wav(audio, sr)
        run = lambda: backend.transcribe(  # noqa: E731
            wav, "test-tiny-eot", language="en", beam_size=1,
            response_format="verbose_json",
        )
        t0 = time.time()
        resp = run()
        note(f"eot bench compile+first={time.time() - t0:.0f}s")
        laps = []
        for _ in range(ITERS):
            t0 = time.time()
            resp = run()
            laps.append(time.time() - t0)
        wall = min(laps)
        audio_s = len(audio) / sr
        segs = resp.get("segments", [])
        tok_counts = [len(s.get("tokens", [])) for s in segs]
        note(
            f"eot decode: {len(segs)} segments, token counts "
            f"p50={float(np.median(tok_counts)) if tok_counts else 0:.0f} "
            f"max={max(tok_counts) if tok_counts else 0} "
            f"(budget would be 96); wall={wall:.2f}s"
        )
        rtfx = audio_s / wall
        emit(
            "ASR RTFx test-tiny-eot EOT-driven decode (full transcribe "
            "path: seek loop, EOT stop, no-speech gate, fallback armed)",
            rtfx, "x_realtime_per_chip", rtfx / TARGET_RTFX,
        )
    except Exception as e:  # noqa: BLE001 — optional row
        note(f"eot bench failed: {e!r}")
    finally:
        settings.stt_model_dir, settings.os_precompile_on_load = old


def bench_converted_ckpt() -> None:
    """Converted checkpoint -> backend -> transcription, every environment.

    Uses the committed tiny HF-layout fixture (tests/fixtures/test-tiny,
    tools/make_tiny_ckpt.py) through the real discovery/converter/serving
    path; value 1.0 = the drive produced a schema-valid transcription."""
    try:
        from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend
        from open_speech_tpu.config import settings
        from open_speech_tpu.ops import audio as codec

        fixtures = os.path.join(os.path.dirname(__file__), "tests", "fixtures")
        old = settings.stt_model_dir, settings.os_precompile_on_load
        settings.stt_model_dir = fixtures
        settings.os_precompile_on_load = False
        try:
            backend = JaxWhisperBackend()
            assert backend._find_checkpoint("test-tiny") is not None
            rng = np.random.default_rng(0)
            wav = codec.write_wav(
                rng.uniform(-0.2, 0.2, 2 * 16000).astype(np.float32), 16000
            )
            t0 = time.time()
            resp = backend.transcribe(
                wav, "test-tiny", language="en", beam_size=1, fallback=False,
                response_format="verbose_json",
            )
            ok = "text" in resp and "segments" in resp
            emit("converted_ckpt_e2e (tiny fixture -> transcription)",
                 1.0 if ok else 0.0, "ok", 1.0 if ok else 0.0)
            note(f"converted_ckpt_e2e wall={time.time() - t0:.1f}s")
        finally:
            settings.stt_model_dir, settings.os_precompile_on_load = old
    except Exception as e:  # noqa: BLE001
        note(f"converted_ckpt_e2e failed: {e!r}")
        emit("converted_ckpt_e2e (tiny fixture -> transcription)",
             0.0, "ok", 0.0)
    try:
        from open_speech_tpu.models.diarize import JaxDiarizer

        fixtures = os.path.join(
            os.path.dirname(__file__), "tests", "fixtures", "diarize"
        )
        old_env = {
            k: os.environ.get(k)
            for k in ("OS_SEGMENTATION_CKPT_PATH", "OS_WESPEAKER_CKPT_PATH")
        }
        os.environ["OS_SEGMENTATION_CKPT_PATH"] = os.path.join(
            fixtures, "segmentation.bin"
        )
        os.environ["OS_WESPEAKER_CKPT_PATH"] = os.path.join(
            fixtures, "wespeaker.bin"
        )
        try:
            t0 = time.time()
            d = JaxDiarizer(threshold=0.2)
            t = np.arange(16000 * 11) / 16000
            wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
            turns = d.diarize_audio(wav)
            ok = (
                d.seg is not None and d.wespeaker is not None
                and isinstance(turns, list)
            )
            emit("converted_ckpt_diarize (tiny fixtures -> turns)",
                 1.0 if ok else 0.0, "ok", 1.0 if ok else 0.0)
            note(f"converted_ckpt_diarize wall={time.time() - t0:.1f}s")
        finally:
            for k, v in old_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    except Exception as e:  # noqa: BLE001
        note(f"converted_ckpt_diarize failed: {e!r}")
        emit("converted_ckpt_diarize (tiny fixtures -> turns)", 0.0, "ok", 0.0)


def bench_real_weights() -> None:
    """WER/spectral vs released checkpoints, the moment weights exist.

    Runs tools/real_weights_parity.py automatically when OS_*_CKPT_PATH or
    an HF cache copy is present (none are downloadable in this container —
    the wiring is what round-2 asked for). Emits one JSON line per model."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    try:
        import real_weights_parity as rwp
    except Exception:  # noqa: BLE001
        return

    audio = os.environ.get("OS_BENCH_AUDIO")
    expected = os.environ.get("OS_BENCH_EXPECTED")
    whisper_dir = os.environ.get("OS_WHISPER_CKPT_PATH")
    if whisper_dir is None:
        from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend

        for mid in ("openai/whisper-large-v3-turbo", "openai/whisper-tiny"):
            found = JaxWhisperBackend()._find_checkpoint(mid)
            if found is not None:
                whisper_dir = str(found)
                break
    if whisper_dir and audio:
        try:
            r = rwp.run_whisper(whisper_dir, audio, expected)
            emit("real_weights whisper WER", float(r.get("wer", -1)),
                 "wer", 1.0 if r.get("wer", 1) <= 0.05 else 0.0)
        except Exception as e:  # noqa: BLE001
            note(f"real_weights whisper failed: {e!r}")
    kokoro_ckpt = os.environ.get("OS_KOKORO_CKPT_PATH")
    if kokoro_ckpt and os.path.exists(kokoro_ckpt):
        try:
            r = rwp.run_kokoro(
                kokoro_ckpt, os.environ.get("OS_KOKORO_VOICES_DIR"),
                "The quick brown fox jumps over the lazy dog.",
                os.environ.get("OS_BENCH_REF_AUDIO"),
            )
            emit(
                "real_weights kokoro spectral",
                float(r.get("log_mel_distance", -1.0)),
                "log_mel_distance", 1.0,
            )
        except Exception as e:  # noqa: BLE001
            note(f"real_weights kokoro failed: {e!r}")


_CPU_FALLBACK = False


def bench_speculative() -> None:
    """Speculative decode, single 30 s clip, adversarial draft.

    Random weights mean the tiny draft never matches the target
    (acceptance ~0), so this is the WORST-CASE latency of the spec path —
    with a real correlated draft checkpoint (tiny vs turbo agree on most
    tokens) the accepted-per-round ratio climbs and the same program gets
    faster than plain greedy. vs_baseline is spec/plain latency (<1 here
    by construction; >1 is the win with real weights)."""
    from open_speech_tpu.models.whisper.decode import (
        DecodeOptions,
        greedy_decode,
    )
    from open_speech_tpu.models.whisper.model import PRESETS, encode, init_params
    from open_speech_tpu.models.whisper.speculative import (
        speculative_greedy_decode,
    )
    from open_speech_tpu.models.whisper.tokenizer import get_tokenizer
    from open_speech_tpu.ops.mel import log_mel_spectrogram

    cfg = PRESETS[MODEL]
    tok = get_tokenizer(n_vocab=cfg.n_vocab, n_langs=cfg.n_langs)
    sp = tok.special
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    # draft = tiny geometry on the target's vocab/mel layout (real
    # deployments pair v3-family targets with distil-large-v3 or a
    # v3-vocab tiny; the draft's quality only moves acceptance, not
    # correctness)
    import dataclasses

    d_cfg = dataclasses.replace(
        PRESETS["tiny"], n_vocab=cfg.n_vocab, n_mels=cfg.n_mels,
        n_langs=cfg.n_langs, n_audio_ctx=cfg.n_audio_ctx,
    )
    d_params = init_params(jax.random.PRNGKey(9), d_cfg, dtype=jnp.bfloat16)

    window = cfg.n_audio_ctx * 2 * 160
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.uniform(-0.3, 0.3, (1, window)).astype(np.float32))
    mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
    enc = encode(params, mel, cfg)
    d_enc = encode(d_params, mel, d_cfg)
    prompt = np.asarray([sp.sot_sequence("en", "transcribe")], np.int32)
    opts = DecodeOptions(max_new_tokens=TOKENS_PER_WINDOW, beam_size=1)

    def plain():
        return greedy_decode(params, cfg, sp, enc, prompt, opts)

    def spec():
        return speculative_greedy_decode(
            params, cfg, d_params, d_cfg, sp, enc, d_enc, prompt, opts,
            gamma=4,
        )

    # BEST case: draft == target. Greedy draft proposals then always match
    # the verifier, acceptance saturates (~100%), and the measured latency
    # bounds what a perfectly-correlated draft could ever deliver on this
    # hardware. Together with the worst case below it brackets the real-
    # weights operating range and locates the acceptance crossover.
    def spec_self():
        return speculative_greedy_decode(
            params, cfg, params, cfg, sp, enc, enc, prompt, opts, gamma=4,
        )

    plain(); spec(); spec_self()  # compile (np arrays: sync included)
    plain_laps = []
    n_tok_plain = 0
    for _ in range(ITERS):
        t0 = time.time()
        rp = plain()
        plain_laps.append(time.time() - t0)
        n_tok_plain = int(rp.lengths[0])
    t_plain = min(plain_laps)
    accepted = rounds = 0
    laps = []
    for _ in range(ITERS):
        t0 = time.time()
        r = spec()
        laps.append(time.time() - t0)
        accepted, rounds = r.spec_accepted, r.spec_rounds
    t_spec = min(laps)
    emit(
        f"spec-decode latency 1x30s clip whisper-{MODEL} (tiny draft, "
        f"random weights: acceptance={accepted}/{rounds * 4} — worst case)",
        t_spec * 1000, "ms", t_plain / t_spec,
    )
    acc_best = rounds_best = 0
    laps = []
    n_tok_self = 0
    for _ in range(ITERS):
        t0 = time.time()
        r = spec_self()
        laps.append(time.time() - t0)
        acc_best, rounds_best = r.spec_accepted, r.spec_rounds
        n_tok_self = int(r.lengths[0])
    t_best = min(laps)
    # a SAME-SIZE draft cannot win (gamma equal-cost draft steps + one
    # verify per gamma tokens = (gamma+1)/gamma of plain); this row exists
    # to prove acceptance saturates and to calibrate the verify-pass cost
    emit(
        f"spec-decode latency 1x30s clip whisper-{MODEL} (self-draft, "
        f"acceptance={acc_best}/{rounds_best * 4}: mechanism saturates; "
        "equal-size draft is expectedly >=1x plain)",
        t_best * 1000, "ms", t_plain / t_best,
    )
    # Component calibration from the three measured runs (per round of
    # gamma=4: worst = 4 draft steps + 1 verify, makes 1 token; self =
    # 4 target-as-draft steps + 1 verify, makes 5 tokens; plain = 1
    # target step per token):
    #   t_target  = t_plain / n_tokens
    #   t_round_self  = t_best / rounds_best  = 4 t_target + t_verify
    #   t_round_worst = t_spec / rounds       = 4 t_draft  + t_verify
    # Projected latency at acceptance=100% with the real tiny draft:
    # one round makes gamma+1 tokens at cost (4 t_draft + t_verify).
    t_target = t_plain / max(1, n_tok_plain)
    t_round_self = t_best / max(1, rounds_best)
    t_round_worst = t_spec / max(1, rounds)
    t_verify = max(0.0, t_round_self - 4 * t_target)
    t_draft4 = max(0.0, t_round_worst - t_verify)
    t_proj = (t_draft4 + t_verify) / 5  # per token at full acceptance
    proj_speedup = t_target / t_proj if t_proj > 0 else 0.0
    # crossover acceptance a* (fraction of the 4 proposals kept) where the
    # spec path breaks even with plain greedy: tokens/round = 4a+1,
    # cost/round = t_draft4 + t_verify  =>  a* = ((cost/t_target) - 1) / 4
    a_star = ((t_draft4 + t_verify) / t_target - 1.0) / 4.0
    emit(
        f"spec-decode projected per-token latency at acceptance=100% "
        f"(tiny draft, components calibrated from the two runs; "
        f"crossover acceptance={min(1.0, max(0.0, a_star)):.2f})",
        t_proj * 1000, "ms", proj_speedup,
    )
    note(
        f"spec plain={t_plain * 1000:.0f}ms worst={t_spec * 1000:.0f}ms "
        f"self={t_best * 1000:.0f}ms t_target={t_target * 1000:.2f}ms "
        f"t_verify={t_verify * 1000:.2f}ms t_draftx4={t_draft4 * 1000:.2f}ms "
        f"proj@100%={t_proj * 1000:.2f}ms/tok ({proj_speedup:.2f}x plain), "
        f"crossover a*={a_star:.2f} (self tokens={n_tok_self})"
    )


def _probe_backend(timeout_s: float) -> str | None:
    """Probe backend init in a child process.

    The relay's two failure modes are errors *and* indefinite hangs, and a
    failed in-process init permanently caches a cpu-only backend set in
    jax.  A subprocess contains both: a hang is bounded by the timeout and
    a failure can't poison this process's backend cache."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    if out.returncode != 0:
        return None
    lines = out.stdout.strip().splitlines()
    return lines[-1] if lines else None


def _wait_for_backend(
    attempts: int = 6, delay_s: float = 30.0, probe_timeout_s: float = 180.0
) -> str:
    """TPU relay init can fail or hang transiently; probe out-of-process
    until it answers so a brief outage doesn't void (or silently
    CPU-degrade) a whole bench run, then init in-process."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # Explicit CPU run: the axon plugin ignores the env var, so pin
        # via jax.config and skip the relay probe entirely.
        jax.config.update("jax_platforms", "cpu")
        return jax.default_backend()
    expected = None
    for i in range(attempts):
        expected = _probe_backend(probe_timeout_s)
        if expected is not None:
            break
        if i == attempts - 1:
            # Relay outage: degrade to a clearly-labeled CPU fallback run
            # instead of dying with zero emitted metrics — the driver
            # records the last JSON line, and "relay down" is a fact worth
            # recording honestly, not a crash.
            global _CPU_FALLBACK
            _CPU_FALLBACK = True
            note(
                f"TPU relay unreachable after {attempts} probes — "
                "CPU fallback (converted-ckpt e2e only; chip metrics "
                "skipped, see previous BENCH_r*.json for TPU numbers)"
            )
            jax.config.update("jax_platforms", "cpu")
            return jax.default_backend()
        note(f"backend probe failed/hung; retry {i + 1}/{attempts}")
        time.sleep(delay_s)
    plat = jax.default_backend()
    if expected is not None and plat != expected:
        # An earlier in-process failure cached a cpu-only backend set while
        # the probe now sees the real platform — clear and re-init.
        try:
            from jax.extend.backend import clear_backends

            clear_backends()
            plat = jax.default_backend()
        except Exception as e:  # noqa: BLE001
            note(f"backend cache clear failed ({e!r}); staying on {plat}")
    return plat


def main() -> None:
    note(f"backend={_wait_for_backend()}")
    if _CPU_FALLBACK:
        emit(
            "TPU relay unreachable — CPU fallback ran functional e2e only "
            "(chip throughput/latency rows intentionally skipped)",
            0.0, "flag", 0.0,
        )
        bench_converted_ckpt()
        bench_real_weights()
        return
    if any(_want(k) for k in ("asr", "stream", "beam", "stream_inc")):
        bench_asr(run_asr=_want("asr"))
    if _want("longform"):
        try:
            bench_longform()
        except Exception as e:  # noqa: BLE001 — optional row
            note(f"longform bench failed: {e!r}")
    if _want("vad"):
        try:
            bench_vad()
        except Exception as e:  # noqa: BLE001 — optional row
            note(f"vad bench failed: {e!r}")
    if _want("ttfa"):
        bench_tts_ttfa()
        try:
            bench_pocket_ttfa()
        except Exception as e:  # noqa: BLE001 — optional row
            note(f"pocket ttfa bench failed: {e!r}")
        try:
            bench_pocket_ttfa64()
        except Exception as e:  # noqa: BLE001 — optional row
            note(f"pocket ttfa@64 bench failed: {e!r}")
        try:
            bench_piper_ttfa64()
        except Exception as e:  # noqa: BLE001 — optional row
            note(f"piper ttfa@64 bench failed: {e!r}")
    if _want("tts"):
        bench_tts_throughput()
    if _want("spec"):
        try:
            bench_speculative()
        except Exception as e:  # noqa: BLE001 — optional row
            note(f"spec bench failed: {e!r}")
    if _want("eot"):
        bench_asr_eot()
    if _want("ckpt"):
        bench_converted_ckpt()
        bench_real_weights()
    # LAST: spawns its own server process and pays a full cold-start
    # precompile sweep (~10 min through the relay) — must not starve the
    # core rows if the driver bounds the whole run
    if _want("ws"):
        try:
            bench_streaming_ws()
        except Exception as e:  # noqa: BLE001 — optional row
            note(f"ws streaming bench failed: {e!r}")


if __name__ == "__main__":
    main()
    sys.exit(finalize())
