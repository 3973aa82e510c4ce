"""JAX Whisper: encoder/decoder with flash attention and KV-cached decoding.

TPU-native replacement for the reference's faster-whisper/CTranslate2 backend
(reference: src/backends/faster_whisper.py). The architecture follows
openai/whisper; the implementation is functional JAX — params are pytrees
with layers stacked for lax.scan, compute in bfloat16 with float32
layernorm/softmax, and decoding runs as jitted device loops.
"""

from open_speech_tpu.models.whisper.model import (
    WhisperConfig,
    PRESETS,
    init_params,
    encode,
    decode_step,
    decoder_forward,
    precompute_cross_kv,
    init_self_kv,
)
from open_speech_tpu.models.whisper.tokenizer import (
    SpecialTokens,
    WhisperTokenizer,
    FallbackTokenizer,
    get_tokenizer,
)

__all__ = [
    "WhisperConfig",
    "PRESETS",
    "init_params",
    "encode",
    "decode_step",
    "decoder_forward",
    "precompute_cross_kv",
    "init_self_kv",
    "SpecialTokens",
    "WhisperTokenizer",
    "FallbackTokenizer",
    "get_tokenizer",
]
