"""JAX pocket-TTS (Kyutai): Mimi codec + delayed-streams LM, voice cloning."""

from open_speech_tpu.models.pocket.lm import (
    PocketLMConfig,
    TEST_TINY_LM,
    init_pocket_lm_params,
)
from open_speech_tpu.models.pocket.mimi import (
    MimiConfig,
    TEST_TINY as MIMI_TEST_TINY,
    MimiStreamingDecoder,
    init_mimi_params,
    mimi_decode,
    mimi_encode,
)
from open_speech_tpu.models.pocket.model import (
    SAMPLE_RATE,
    PocketTTS,
    PromptState,
)

__all__ = [
    "PocketLMConfig",
    "TEST_TINY_LM",
    "init_pocket_lm_params",
    "MimiConfig",
    "MIMI_TEST_TINY",
    "MimiStreamingDecoder",
    "init_mimi_params",
    "mimi_decode",
    "mimi_encode",
    "SAMPLE_RATE",
    "PocketTTS",
    "PromptState",
]
