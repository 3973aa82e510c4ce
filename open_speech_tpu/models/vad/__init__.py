"""JAX voice-activity detection (Silero-style conv+LSTM stepper)."""

from open_speech_tpu.models.vad.silero import (
    Segment,
    SileroVAD,
    VADParams,
    get_vad_model,
    init_vad_params,
    vad_step,
)

__all__ = [
    "Segment",
    "SileroVAD",
    "VADParams",
    "get_vad_model",
    "init_vad_params",
    "vad_step",
]
