"""Int8 weight quantization: fidelity + end-to-end decode agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_speech_tpu.models.whisper import (
    PRESETS,
    FallbackTokenizer,
    decoder_forward,
    encode,
    init_params,
)
from open_speech_tpu.models.whisper.decode import DecodeOptions, greedy_decode
from open_speech_tpu.models.whisper.quantize import (
    dequantize,
    quantize_tensor,
    quantize_whisper_params,
)

CFG = PRESETS["test-tiny"]


def test_quantize_tensor_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32) * 0.1)
    pack = quantize_tensor(w, axis=-2)
    assert pack["q"].dtype == jnp.int8
    assert pack["s"].shape == (1, 128)
    deq = np.asarray(pack["q"], np.float32) * np.asarray(pack["s"], np.float32)
    err = np.abs(deq - np.asarray(w))
    # per-channel int8: error bounded by scale/2 per channel
    bound = np.asarray(pack["s"])[0] * 0.51
    assert np.all(err <= bound[None, :])
    # bf16 dequant helper stays within bf16 rounding of that
    bf16_err = np.abs(np.asarray(dequantize(pack), np.float32) - deq)
    assert np.all(bf16_err <= np.abs(deq) * 0.01 + 1e-6)


def test_quantized_params_structure():
    params = init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.bfloat16)
    qparams = quantize_whisper_params(params)
    blocks = qparams["encoder"]["blocks"]
    assert blocks["attn"]["q"]["w"]["q"].dtype == jnp.int8
    assert blocks["mlp_in"]["w"]["q"].dtype == jnp.int8
    # convs and layernorms untouched
    assert qparams["encoder"]["conv1"]["w"].dtype == jnp.bfloat16
    assert qparams["encoder"]["ln_post"]["g"].dtype == jnp.float32
    assert qparams["decoder"]["tok_emb"]["q"].dtype == jnp.int8


def test_quantized_forward_close_and_memory_halved():
    params = init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    qparams = quantize_whisper_params(params)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.n_mels, CFG.n_audio_ctx * 2))
    enc_f = encode(params, mel, CFG)
    enc_q = encode(qparams, mel, CFG)
    # relative error small (bf16 compute in the quantized path)
    scale = float(jnp.abs(enc_f).max())
    assert float(jnp.abs(enc_q.astype(jnp.float32) - enc_f).max()) / scale < 0.15

    from open_speech_tpu.models.whisper.quantize import dequant_size_ratio

    ratio = dequant_size_ratio(params, qparams)
    assert ratio < 0.45  # f32 -> int8(+scales): ~4x smaller


def test_quantized_greedy_decode_runs():
    params = init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.bfloat16)
    qparams = quantize_whisper_params(params)
    tok = FallbackTokenizer(n_vocab=CFG.n_vocab, n_langs=CFG.n_langs)
    sp = tok.special
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.n_mels, CFG.n_audio_ctx * 2))
    enc_out = encode(qparams, mel, CFG)
    prompt = np.array([sp.sot_sequence("en")], np.int32)
    res = greedy_decode(
        qparams, CFG, sp, enc_out, prompt, DecodeOptions(max_new_tokens=6)
    )
    assert res.tokens.shape == (1, 6)
    assert np.isfinite(res.avg_logprob).all()


def test_backend_int8_compute_type(monkeypatch):
    from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend
    from open_speech_tpu.config import settings

    monkeypatch.setattr(settings, "stt_compute_type", "int8")
    monkeypatch.setattr(settings, "os_precompile_on_load", False)
    backend = JaxWhisperBackend()
    backend.load_model("test-tiny")
    entry = backend._models["test-tiny"]
    assert entry["params"]["decoder"]["tok_emb"]["q"].dtype == jnp.int8
    assert backend.loaded_models()[0].compute_type == "int8"


def test_int8_cross_kv_matches_dense():
    """Dict-form int8 cross-KV decodes within quantization error of dense."""
    from open_speech_tpu.models.whisper.model import (
        _precompute_cross_kv_impl,
        _precompute_cross_kv_int8,
        decode_step,
        init_self_kv,
    )

    params = init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    mel = jax.random.normal(jax.random.PRNGKey(4), (2, CFG.n_mels, CFG.n_audio_ctx * 2))
    enc_out = encode(params, mel, CFG)
    dense = _precompute_cross_kv_impl(params, enc_out, CFG.n_text_head)
    packed = _precompute_cross_kv_int8(params, enc_out, CFG.n_text_head)
    assert packed["k"].dtype == jnp.int8 and packed["v"].dtype == jnp.int8
    # per-position scales: [L, B, H, T_enc, 1]
    assert packed["k_s"].shape == dense[:, 0].shape[:-1] + (1,)

    tok = jnp.array([[5], [7]], jnp.int32)
    ld, _ = decode_step(params, tok, jnp.int32(0), init_self_kv(CFG, 2, 16), dense, CFG)
    lq, _ = decode_step(params, tok, jnp.int32(0), init_self_kv(CFG, 2, 16), packed, CFG)
    scale = float(jnp.abs(ld).max())
    assert float(jnp.abs(lq - ld).max()) / scale < 0.05
    # greedy choice unaffected by int8 KV noise on this input
    assert bool(jnp.all(jnp.argmax(lq, -1) == jnp.argmax(ld, -1)))


def test_precompute_cross_kv_dispatch():
    """precompute_cross_kv returns packed form iff the params are int8."""
    from open_speech_tpu.models.whisper.model import precompute_cross_kv

    params = init_params(jax.random.PRNGKey(5), CFG, dtype=jnp.bfloat16)
    mel = jax.random.normal(jax.random.PRNGKey(6), (1, CFG.n_mels, CFG.n_audio_ctx * 2))
    enc = encode(params, mel, CFG)
    assert not isinstance(precompute_cross_kv(params, enc, CFG), dict)
    qp = quantize_whisper_params(params)
    out = precompute_cross_kv(qp, encode(qp, mel, CFG), CFG)
    assert isinstance(out, dict) and set(out) == {"k", "k_s", "v", "v_s"}
