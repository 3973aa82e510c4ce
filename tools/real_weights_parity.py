"""Real-checkpoint parity harness (runs wherever weights are available).

This deployment has no network egress and no model weights on disk, so CI
proves correctness with torch-oracle parity at random init
(tests/test_hf_parity.py, test_kokoro_convert.py, test_piper_convert.py,
test_vad_convert.py, test_ge2e.py). On a machine WITH the released
checkpoints, this script closes the last inch: load real weights through
the same converters and report WER / spectral numbers against reference
outputs.

Usage:
  python tools/real_weights_parity.py --whisper /path/to/hf-whisper-dir \
      --audio clip.wav --expected "reference transcript"
  python tools/real_weights_parity.py --kokoro kokoro-v1_0.pth \
      --voices-dir voices/ --text "Hello world" --ref-audio ref.wav
  python tools/real_weights_parity.py --vad silero_vad.onnx --audio clip.wav
"""

from __future__ import annotations

import argparse
import json
import sys


def wer(ref: str, hyp: str) -> float:
    r, h = ref.lower().split(), hyp.lower().split()
    d = [[0] * (len(h) + 1) for _ in range(len(r) + 1)]
    for i in range(len(r) + 1):
        d[i][0] = i
    for j in range(len(h) + 1):
        d[0][j] = j
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            d[i][j] = min(
                d[i - 1][j] + 1, d[i][j - 1] + 1,
                d[i - 1][j - 1] + (r[i - 1] != h[j - 1]),
            )
    return d[-1][-1] / max(len(r), 1)


def run_whisper(model_dir: str, audio_path: str, expected: str | None) -> dict:
    import numpy as np

    from open_speech_tpu.models.whisper.convert import load_params
    from open_speech_tpu.models.whisper.tokenizer import get_tokenizer
    from open_speech_tpu.models.whisper.transcribe import (
        TranscribeOptions,
        transcribe,
    )
    from open_speech_tpu.ops import audio as codec

    params, cfg = load_params(model_dir)
    tok = get_tokenizer(model_dir, n_vocab=cfg.n_vocab, n_langs=cfg.n_langs)
    pcm, rate = codec.read_wav(open(audio_path, "rb").read())
    if rate != 16000:
        from open_speech_tpu.ops.resample import resample_poly
        import jax.numpy as jnp

        pcm = np.asarray(resample_poly(jnp.asarray(pcm), 16000, rate))
    segments, info = transcribe(params, cfg, tok, pcm, TranscribeOptions())
    text = " ".join(s["text"].strip() for s in segments).strip()
    out = {"text": text, "language": info.language}
    if expected:
        out["wer"] = wer(expected, text)
    return out


def run_kokoro(ckpt: str, voices_dir: str | None, text: str,
               ref_audio: str | None) -> dict:
    import os

    import numpy as np

    os.environ["OS_KOKORO_CKPT_PATH"] = ckpt
    if voices_dir:
        os.environ["OS_KOKORO_VOICES_DIR"] = voices_dir
    from open_speech_tpu.tts.backends.kokoro_backend import KokoroBackend

    b = KokoroBackend()
    b.load_model("kokoro")
    audio = np.concatenate(list(b.synthesize(text, "af_heart")))
    out = {"samples": int(audio.size), "seconds": audio.size / 24000,
           "rms": float(np.sqrt((audio**2).mean()))}
    if ref_audio:
        from open_speech_tpu.audio.spectral import log_mel_distance
        from open_speech_tpu.ops import audio as codec

        ref, rate = codec.read_wav(open(ref_audio, "rb").read())
        out["log_mel_distance"] = log_mel_distance(audio, ref, 24000)
    return out


def run_vad(onnx_path: str, audio_path: str) -> dict:
    import numpy as np

    from open_speech_tpu.models.vad.silero import SileroVAD, convert_silero
    from open_speech_tpu.ops import audio as codec

    params = convert_silero(onnx_path)
    vad = SileroVAD(params)
    pcm, _rate = codec.read_wav(open(audio_path, "rb").read())
    pcm16 = (np.clip(pcm, -1, 1) * 32767).astype(np.int16).tobytes()
    segments = vad.get_speech_segments(pcm16)
    return {
        "speech_prob_max": vad(pcm),
        "segments": [[s.start_ms, s.end_ms] for s in segments],
    }


def run_wespeaker(ckpt: str, audio_path: str) -> dict:
    """WeSpeaker checkpoint -> embedding self-consistency on a real file."""
    import numpy as np

    from open_speech_tpu.models.wespeaker import (
        convert_wespeaker,
        kaldi_fbank,
        wespeaker_embed,
    )
    from open_speech_tpu.ops import audio as codec

    params, cfg = convert_wespeaker(ckpt)
    pcm, _rate = codec.read_wav(open(audio_path, "rb").read())
    pcm = np.asarray(pcm, np.float32)
    win = 24000
    if len(pcm) < 2 * win:
        pcm = np.tile(pcm, -(-2 * win // max(len(pcm), 1)))
    wins = np.stack([pcm[:win], pcm[win : 2 * win]])
    emb = np.asarray(wespeaker_embed(params, kaldi_fbank(wins)))
    return {
        "embed_dim": int(emb.shape[1]),
        "same_file_cosine": float(emb[0] @ emb[1]),
    }


def run_segmentation(ckpt: str, audio_path: str) -> dict:
    """PyanNet checkpoint -> speaker turns on a real file (+ overlaps)."""
    import numpy as np

    from open_speech_tpu.models.diarize import JaxDiarizer
    from open_speech_tpu.models.segmentation import convert_segmentation
    from open_speech_tpu.ops import audio as codec

    seg = convert_segmentation(ckpt)
    pcm, _rate = codec.read_wav(open(audio_path, "rb").read())
    turns = JaxDiarizer(seg=seg).diarize_audio(np.asarray(pcm))
    overlap = sum(
        1
        for a in turns
        for b in turns
        if a is not b and a["start"] < b["start"] < a["end"]
        and a["speaker"] != b["speaker"]
    )
    return {
        "n_turns": len(turns),
        "n_speakers": len({t["speaker"] for t in turns}),
        "overlapping_pairs": overlap,
        "turns": turns[:20],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--whisper")
    ap.add_argument("--kokoro")
    ap.add_argument("--vad")
    ap.add_argument("--segmentation")
    ap.add_argument("--wespeaker")
    ap.add_argument("--voices-dir")
    ap.add_argument("--audio")
    ap.add_argument("--expected")
    ap.add_argument("--text", default="The quick brown fox.")
    ap.add_argument("--ref-audio")
    args = ap.parse_args()

    report: dict = {}
    if args.whisper:
        report["whisper"] = run_whisper(args.whisper, args.audio, args.expected)
    if args.kokoro:
        report["kokoro"] = run_kokoro(
            args.kokoro, args.voices_dir, args.text, args.ref_audio
        )
    if args.vad:
        report["vad"] = run_vad(args.vad, args.audio)
    if args.segmentation:
        report["segmentation"] = run_segmentation(args.segmentation, args.audio)
    if args.wespeaker:
        report["wespeaker"] = run_wespeaker(args.wespeaker, args.audio)
    if not report:
        ap.print_help()
        sys.exit(1)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
