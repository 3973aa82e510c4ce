"""Subprocess body for test_batched_longform_shapes_warm.

XLA:CPU's LLVM codegen segfaults intermittently when this test's
batched-warmup compiles run late in a long single-process suite (the
crash never reproduces in a fresh interpreter — it needs hundreds of
prior in-process compiles). Running the body in its own interpreter
removes that state entirely; the parent test asserts on this script's
exit code and output.

Prints ``WARMUP_OK compiles=<n>`` on success; any compile after load is
reported in the count (the parent asserts it is zero).
"""

from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    from open_speech_tpu.backends.jax_whisper import JaxWhisperBackend
    from open_speech_tpu.config import settings
    from open_speech_tpu.ops import audio as codec

    settings.os_precompile_on_load = True
    settings.os_stt_precompile_budgets = "48"
    settings.os_stt_batched_longform = True
    settings.os_stt_batch_windows = 2

    backend = JaxWhisperBackend()
    backend.load_model("test-tiny")
    wav = codec.write_wav(
        np.random.default_rng(0)
        .uniform(-0.2, 0.2, 4 * 16000)
        .astype(np.float32),
        16000,
    )

    compiles: list[str] = []

    class Counter(logging.Handler):
        def emit(self, record: logging.LogRecord) -> None:
            msg = record.getMessage()
            if msg.startswith("Compiling "):
                compiles.append(msg)

    pxla_logger = logging.getLogger("jax._src.interpreters.pxla")
    handler = Counter(level=logging.DEBUG)
    pxla_logger.addHandler(handler)
    pxla_logger.setLevel(logging.DEBUG)
    jax.config.update("jax_log_compiles", True)
    try:
        for beam in (1, 5):
            backend.transcribe(
                wav, "test-tiny", language="en", beam_size=beam,
                fallback=False,
            )
        # prompted upload: the [startofprev]+BATCHED_PREV_LEN prefix is
        # the one extra warmed shape per rung (round-3 advice: an
        # un-warmed prompt shape compiled mid-request on the first
        # prompted upload)
        backend.transcribe(
            wav, "test-tiny", language="en", beam_size=5, fallback=False,
            prompt="style hint",
        )
    finally:
        jax.config.update("jax_log_compiles", False)
        pxla_logger.removeHandler(handler)
    print(f"WARMUP_OK compiles={len(compiles)}")
    for msg in compiles[:5]:
        print("COMPILED:", msg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
