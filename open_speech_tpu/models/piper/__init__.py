"""JAX Piper TTS: VITS (text encoder + flow + HiFiGAN decoder)."""

from open_speech_tpu.models.piper.model import (
    PiperConfig,
    init_piper_params,
    synthesize_vits,
)

__all__ = ["PiperConfig", "init_piper_params", "synthesize_vits"]
