"""Generate committed tiny diarization checkpoint fixtures.

Writes random-init torch state_dicts in the exact key layouts the
released pyannote checkpoints use — PyanNet segmentation
(pyannote/segmentation-3.0 names) and WeSpeaker ResNet (wespeaker-
voxceleb-resnet34-LM names) at tiny geometry — to
tests/fixtures/diarize/. License-clean (random weights); they exist so
one *checkpoint -> converter -> diarization* drive runs in every
environment, matching the whisper test-tiny fixture precedent
(tools/make_tiny_ckpt.py). The converters infer all sizes from the
state_dict shapes, so tiny geometry exercises the same code path as the
released full-size files.

Regenerate with: python tools/make_tiny_diarize_ckpts.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch  # noqa: E402

from test_segmentation import _PyanNetOracle  # noqa: E402
from test_wespeaker import _ResNet34Oracle  # noqa: E402

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "diarize"
)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    torch.manual_seed(40)
    seg = _PyanNetOracle(conv_hidden=12, hidden=16, lstm_layers=1,
                         linear_hidden=16)
    torch.save(seg.state_dict(), os.path.join(OUT, "segmentation.bin"))

    ws = _ResNet34Oracle(m=4, blocks=(1, 1, 1, 1), embed=32)
    torch.save(ws.state_dict(), os.path.join(OUT, "wespeaker.bin"))
    for f in ("segmentation.bin", "wespeaker.bin"):
        print(f, os.path.getsize(os.path.join(OUT, f)), "bytes")


if __name__ == "__main__":
    main()
