"""Fine-tune the tiny fixture until its decodes are EOT-terminated.

Every RTFx row before round 5 decoded random weights with a FIXED
96-token budget, because random weights never emit <|endoftext|> — so the
EOT-stop path, the temperature-fallback gates, and the no-speech gate had
never run under the bench harness (round-4 verdict weak #2). Real released
weights are not downloadable in this container, but nothing stops training
the committed tiny checkpoint *in-container* on a synthetic beep task
until its decodes terminate realistically:

  - "speech" windows carry 1-3 sine beeps; the target transcript is the
    word "beep" per burst, wrapped in whisper timestamp tokens and
    terminated with <|endoftext|> — decode length now depends on content.
  - silence windows train the <|nospeech|> logit at the <|sot|> position
    (the probability transcribe()'s no-speech gate reads,
    reference gate semantics: faster_whisper no_speech_threshold) and a
    quick <|0.00|><|eot|> decode.

Training runs through the real train.py step (teacher-forced NLL + AdamW)
and the result is exported back to HF safetensors layout (the exact
inverse of models/whisper/convert.params_from_state_dict) at
tests/fixtures/test-tiny-eot/, where the normal checkpoint
discovery/converter/serving path picks it up.

Regenerate with: python tools/finetune_tiny_eot.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Train on host CPU: the axon sitecustomize pins jax_platforms to
# "axon,cpu" in every interpreter; a 0.5 M-param model doesn't need the
# chip, and the CPU backend's mha_reference path is differentiable.
jax.config.update("jax_platforms", "cpu")

from open_speech_tpu.models.whisper.model import PRESETS  # noqa: E402
from open_speech_tpu.models.whisper.tokenizer import FallbackTokenizer  # noqa: E402

CFG = PRESETS["test-tiny"]
SR = 16000
WINDOW = CFG.n_audio_ctx * 2 * 160  # 19200 samples = 1.2 s
SEQ = CFG.n_text_ctx  # 32
SRC = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "test-tiny")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "test-tiny-eot"
)


def _beep_audio(rng: np.random.Generator, k: int) -> np.ndarray:
    """k sine bursts spread over the window, light noise floor."""
    audio = rng.normal(0.0, 0.003, WINDOW).astype(np.float32)
    span = WINDOW // max(k, 1)
    for i in range(k):
        start = i * span + int(rng.integers(0, span // 4))
        dur = int(0.15 * SR)
        t = np.arange(dur) / SR
        freq = 440.0 * (1.0 + 0.1 * rng.standard_normal())
        burst = 0.5 * np.sin(2 * np.pi * freq * t) * np.hanning(dur)
        audio[start : start + dur] += burst.astype(np.float32)
    return audio


def _make_batch(rng: np.random.Generator, sp, b: int):
    """(audio [B, WINDOW], tokens [B, SEQ], mask [B, SEQ]).

    mask follows train.loss_fn's convention: mask[j] = 1 means tokens[j]
    is a real target (predicted from tokens[j-1]); position 0 is never a
    target."""
    audio = np.zeros((b, WINDOW), np.float32)
    tokens = np.full((b, SEQ), sp.eot, np.int32)
    mask = np.zeros((b, SEQ), np.float32)
    ts0 = sp.timestamp_begin
    for i in range(b):
        kind = rng.integers(0, 5)
        if kind == 0:  # silence -> <|nospeech|> at the sot position
            audio[i] = rng.normal(0.0, 0.002, WINDOW)
            seq = [sp.sot, sp.no_speech]
        elif kind == 1:  # silence -> empty timestamped decode
            audio[i] = rng.normal(0.0, 0.002, WINDOW)
            seq = [sp.sot, sp.lang_token("en"), sp.transcribe, ts0, sp.eot]
        else:  # 1-3 beeps -> "beep" per burst, timestamped, EOT-terminated
            k = int(kind - 1)  # 1..3
            audio[i] = _beep_audio(rng, k)
            text = " ".join(["beep"] * k)
            body = list(text.encode("utf-8"))
            end_ts = ts0 + CFG.n_audio_ctx  # window end (1.20 s)
            seq = (
                [sp.sot, sp.lang_token("en"), sp.transcribe, ts0]
                + body
                + [end_ts, sp.eot]
            )
        seq = seq[:SEQ]
        tokens[i, : len(seq)] = seq
        mask[i, 1 : len(seq)] = 1.0
        if kind == 1:
            # don't supervise the sot->lang transition on silence: kind 0
            # owns the sot-position distribution (P(nospeech | silence)
            # must not be diluted by a competing lang target there)
            mask[i, 1] = 0.0
    return audio, tokens, mask


def main() -> None:
    from safetensors.numpy import save_file

    from open_speech_tpu.models.whisper.convert import load_params
    from open_speech_tpu.ops.mel import log_mel_spectrogram
    from open_speech_tpu.train import init_train_state, make_optimizer, train_step

    tok = FallbackTokenizer(n_vocab=CFG.n_vocab, n_langs=CFG.n_langs)
    sp = tok.special
    params, _ = load_params(SRC, CFG, dtype=jnp.float32)
    optimizer = make_optimizer(lr=1e-3, weight_decay=0.01)
    opt_state = init_train_state(params, optimizer)

    rng = np.random.default_rng(20260820)
    steps = int(os.environ.get("EOT_STEPS", "600"))
    for step in range(steps):
        audio, tokens, t_mask = _make_batch(rng, sp, 64)
        mel = log_mel_spectrogram(jnp.asarray(audio), n_mels=CFG.n_mels)
        batch = {
            "mel": mel,
            "tokens": jnp.asarray(tokens),
            "mask": jnp.asarray(t_mask),
        }
        params, opt_state, loss = train_step(
            params, opt_state, batch, CFG, optimizer
        )
        if step % 100 == 0 or step == steps - 1:
            print(f"step {step}: loss {float(loss):.4f}", flush=True)

    # ── verify the trained behavior before exporting ──────────────────
    from open_speech_tpu.models.whisper.decode import (
        DecodeOptions,
        greedy_decode,
    )
    from open_speech_tpu.models.whisper.model import encode

    eval_rng = np.random.default_rng(7)
    clips = np.stack([_beep_audio(eval_rng, k) for k in (1, 2, 3)])
    silence = eval_rng.normal(0.0, 0.002, (1, WINDOW)).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(np.concatenate([clips, silence])),
                              n_mels=CFG.n_mels)
    enc_out = encode(params, mel, CFG)
    prompt = np.array([sp.sot_sequence("en")] * 4, np.int32)
    res = greedy_decode(
        params, CFG, sp, enc_out, prompt,
        DecodeOptions(max_new_tokens=24, beam_size=1),
    )
    lengths = res.lengths.tolist()
    budget_hit = [
        bool((res.tokens[i] != sp.eot).all()) for i in range(4)
    ]
    print(f"decode lengths: {lengths}, budget_hit: {budget_hit}")
    print(f"silence no_speech_prob: {float(res.no_speech_prob[3]):.3f}")
    assert not any(budget_hit), "a decode ran to the token budget (no EOT)"
    assert lengths[0] < lengths[2], "length should grow with content"
    assert res.no_speech_prob[3] > 0.5, "silence must score high no_speech"

    # ── export: exact inverse of convert.params_from_state_dict ───────
    def n(x):
        return np.asarray(x, np.float32)

    def lin(p, w_key, prefix, bias=True):
        out = {f"{prefix}.weight": np.ascontiguousarray(n(p[w_key]["w"]).T)}
        if bias:
            out[f"{prefix}.bias"] = n(p[w_key]["b"])
        return out

    def ln(p, key, prefix):
        return {
            f"{prefix}.weight": n(p[key]["g"]),
            f"{prefix}.bias": n(p[key]["b"]),
        }

    def block_state(blocks, li: int, prefix: str, cross: bool):
        one = jax.tree.map(lambda x: x[li], blocks)
        s = {}
        s |= ln(one, "ln1", f"{prefix}.self_attn_layer_norm")
        s |= lin(one["attn"], "q", f"{prefix}.self_attn.q_proj")
        s |= lin(one["attn"], "k", f"{prefix}.self_attn.k_proj", bias=False)
        s |= lin(one["attn"], "v", f"{prefix}.self_attn.v_proj")
        s |= lin(one["attn"], "o", f"{prefix}.self_attn.out_proj")
        s |= ln(one, "ln_mlp", f"{prefix}.final_layer_norm")
        s |= lin(one, "mlp_in", f"{prefix}.fc1")
        s |= lin(one, "mlp_out", f"{prefix}.fc2")
        if cross:
            s |= ln(one, "ln_cross", f"{prefix}.encoder_attn_layer_norm")
            s |= lin(one["cross"], "q", f"{prefix}.encoder_attn.q_proj")
            s |= lin(one["cross"], "k", f"{prefix}.encoder_attn.k_proj", bias=False)
            s |= lin(one["cross"], "v", f"{prefix}.encoder_attn.v_proj")
            s |= lin(one["cross"], "o", f"{prefix}.encoder_attn.out_proj")
        return s

    enc, dec = params["encoder"], params["decoder"]
    state: dict[str, np.ndarray] = {
        "model.encoder.conv1.weight": np.ascontiguousarray(
            n(enc["conv1"]["w"]).transpose(2, 1, 0)
        ),
        "model.encoder.conv1.bias": n(enc["conv1"]["b"]),
        "model.encoder.conv2.weight": np.ascontiguousarray(
            n(enc["conv2"]["w"]).transpose(2, 1, 0)
        ),
        "model.encoder.conv2.bias": n(enc["conv2"]["b"]),
        "model.encoder.embed_positions.weight": n(enc["pos"]),
        "model.decoder.embed_tokens.weight": n(dec["tok_emb"]),
        "model.decoder.embed_positions.weight": n(dec["pos_emb"]),
    }
    state |= ln(enc, "ln_post", "model.encoder.layer_norm")
    state |= ln(dec, "ln", "model.decoder.layer_norm")
    for i in range(CFG.n_audio_layer):
        state |= block_state(enc["blocks"], i, f"model.encoder.layers.{i}", False)
    for i in range(CFG.n_text_layer):
        state |= block_state(dec["blocks"], i, f"model.decoder.layers.{i}", True)

    os.makedirs(OUT, exist_ok=True)
    save_file(state, os.path.join(OUT, "model.safetensors"))
    with open(os.path.join(SRC, "config.json"), encoding="utf-8") as f:
        cfg_json = json.load(f)
    with open(os.path.join(OUT, "config.json"), "w", encoding="utf-8") as f:
        json.dump(cfg_json, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
