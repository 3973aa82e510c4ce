"""Example: transcribe a file, synthesize speech, and stream a microphone-like
PCM source against a running Open Speech TPU server.

    OS_SSL_ENABLED=false python -m open_speech_tpu.server &
    python examples/python_client.py clip.wav
"""

from __future__ import annotations

import sys

import numpy as np

from open_speech_tpu.client import OpenSpeechClient
from open_speech_tpu.ops.audio import write_wav


def main() -> None:
    client = OpenSpeechClient("http://localhost:8100")

    # 1. batch transcription
    if len(sys.argv) > 1:
        audio = open(sys.argv[1], "rb").read()
    else:
        t = np.arange(16000 * 2) / 16000
        audio = write_wav(
            (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), 16000
        )
    result = client.transcribe(audio, model="whisper-large-v3-turbo")
    print("transcript:", result.get("text"))

    # 2. speech synthesis with a voice blend
    wav = client.speak(
        "Hello from the TPU speech server.",
        voice="af_bella(2)+af_sky(1)",
        response_format="wav",
    )
    open("/tmp/tts_out.wav", "wb").write(wav)
    print("synthesized /tmp/tts_out.wav,", len(wav), "bytes")

    # 3. streaming transcription over the WebSocket
    def pcm_chunks():
        rng = np.random.default_rng(0)
        for _ in range(10):  # 10 x 100 ms of audio
            yield (rng.uniform(-0.3, 0.3, 1600) * 32767).astype("<i2").tobytes()

    for event in client.stream_transcribe(pcm_chunks(), vad=False):
        print("event:", event["type"], event.get("text", ""))


if __name__ == "__main__":
    main()
