"""Benchmark: ASR throughput (RTFx) for whisper-large-v3-turbo on one chip.

Measures the full transcription compute path — log-mel front-end, encoder
with Pallas flash attention, KV-cached greedy decode of a realistic token
budget — on batched 30 s windows, end to end on device. Weights are
random-init (none are downloadable in this environment) which does not
change FLOPs/bandwidth, so RTFx is representative; the decode budget is
fixed at 96 tokens/window (the dense-speech average for 30 s audio) because
random weights never emit EOT.

Runs the production int8 path by default (weight-only int8 matmuls +
int8 cross-attention KV caches with scales folded into the attention
math) — the analogue of the reference's CT2 int8 compute type
(reference: src/backends/faster_whisper.py compute_type). Set
BENCH_COMPUTE=bf16 for the pure-bf16 number.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the 50x real-time north-star target
(BASELINE.md; the reference publishes no RTFx of its own).
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

from open_speech_tpu.models.whisper.decode import _greedy_impl
from open_speech_tpu.models.whisper.model import PRESETS, encode, init_params
from open_speech_tpu.models.whisper.tokenizer import get_tokenizer
from open_speech_tpu.ops.mel import log_mel_spectrogram

MODEL = os.environ.get("BENCH_MODEL", "large-v3-turbo")
COMPUTE = os.environ.get("BENCH_COMPUTE", "int8")
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
TOKENS_PER_WINDOW = int(os.environ.get("BENCH_TOKENS", "96"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))
TARGET_RTFX = 50.0  # north star: >=50x real-time per v5e chip


def main() -> None:
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
    prompt = jnp.asarray(
        [sp.sot_sequence("en", "transcribe")] * BATCH, jnp.int32
    )
    suppress = jnp.zeros((cfg.n_vocab,), jnp.float32)
    rng_key = jax.random.PRNGKey(0)

    def run_once():
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        enc_out = encode(params, mel, cfg)
        tokens, lengths, sum_lp, nsp = _greedy_impl(
            params,
            prompt,
            enc_out,
            suppress,
            rng_key,
            jnp.float32(0.0),
            cfg=cfg,
            special=sp,
            max_new=TOKENS_PER_WINDOW,
            sampled=False,
            timestamps=True,
            max_init_tok=sp.timestamp_begin + 50,
            blank=(220, sp.eot),
        )
        return tokens

    # warmup / compile. NOTE: a host transfer (np.asarray) is the sync point;
    # block_until_ready alone does not synchronize through the axon relay.
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

    result = {
        "metric": f"ASR RTFx whisper-{MODEL} ({COMPUTE}, batch={BATCH}, greedy {TOKENS_PER_WINDOW} tok/30s)",
        "value": round(rtfx, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtfx / TARGET_RTFX, 3),
    }
    print(json.dumps(result))
    print(
        f"# wall={wall:.3f}s for {audio_seconds:.0f}s audio; compile={compile_s:.0f}s;"
        f" backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
