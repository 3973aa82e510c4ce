"""Composer mixing matrix: mute/solo/volume/offset/path-guard units.

Mirrors the reference's tests/test_composer_unit.py coverage of the
multi-track mixing math (src/composer.py:128-189)."""

import numpy as np
import pytest

from open_speech_tpu.ops import audio as codec
from open_speech_tpu.studio.composer import MultiTrackComposer


@pytest.fixture()
def composer(tmp_path, monkeypatch):
    from open_speech_tpu.config import settings

    monkeypatch.setattr(settings, "os_composer_dir", str(tmp_path / "comp"))
    monkeypatch.setattr(
        settings, "os_conversations_dir", str(tmp_path / "conv")
    )
    monkeypatch.setattr(settings, "os_voice_library_path", str(tmp_path))
    return MultiTrackComposer(), tmp_path


def _write_tone(path, freq, seconds=0.5, rate=24000, amp=0.3):
    t = np.arange(int(seconds * rate)) / rate
    wav = codec.write_wav(
        (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32), rate
    )
    path.write_bytes(wav)
    return path


def _decode(result_path):
    pcm, rate = codec.read_wav(result_path.read_bytes())
    return pcm, rate


def test_two_tracks_sum(composer):
    comp, root = composer
    a = _write_tone(root / "a.wav", 220)
    b = _write_tone(root / "b.wav", 440)
    out = comp.render(
        name="mix",
        tracks=[
            {"source_path": str(a), "volume": 1.0},
            {"source_path": str(b), "volume": 1.0},
        ],
        sample_rate=24000,
        format="wav",
    )
    pcm, rate = _decode(__import__("pathlib").Path(out["output_path"]))
    assert rate == 24000
    solo_a, _ = codec.read_wav(a.read_bytes())
    assert np.sqrt((pcm**2).mean()) > np.sqrt((solo_a**2).mean())


def test_muted_track_excluded(composer):
    comp, root = composer
    a = _write_tone(root / "a.wav", 220)
    b = _write_tone(root / "b.wav", 1400, amp=0.6)
    out = comp.render(
        name="mutemix",
        tracks=[
            {"source_path": str(a), "volume": 1.0},
            {"source_path": str(b), "volume": 1.0, "muted": True},
        ],
        sample_rate=24000,
        format="wav",
    )
    pcm, _ = _decode(__import__("pathlib").Path(out["output_path"]))
    ref, _ = codec.read_wav(a.read_bytes())
    n = min(len(pcm), len(ref))
    assert np.abs(pcm[:n] - ref[:n]).max() < 2e-3  # only track A audible


def test_solo_overrides_others(composer):
    comp, root = composer
    a = _write_tone(root / "a.wav", 220)
    b = _write_tone(root / "b.wav", 1400)
    out = comp.render(
        name="solomix",
        tracks=[
            {"source_path": str(a), "volume": 1.0},
            {"source_path": str(b), "volume": 1.0, "solo": True},
        ],
        sample_rate=24000,
        format="wav",
    )
    pcm, _ = _decode(__import__("pathlib").Path(out["output_path"]))
    ref, _ = codec.read_wav(b.read_bytes())
    n = min(len(pcm), len(ref))
    assert np.abs(pcm[:n] - ref[:n]).max() < 2e-3


def test_offset_shifts_track(composer):
    comp, root = composer
    a = _write_tone(root / "a.wav", 330, seconds=0.2)
    out = comp.render(
        name="offsetmix",
        tracks=[{"source_path": str(a), "volume": 1.0, "offset_s": 0.1}],
        sample_rate=24000,
        format="wav",
    )
    pcm, _ = _decode(__import__("pathlib").Path(out["output_path"]))
    lead = pcm[: int(0.09 * 24000)]
    assert np.abs(lead).max() < 1e-4  # silence before the offset


def test_volume_scales(composer):
    comp, root = composer
    a = _write_tone(root / "a.wav", 330)
    loud = comp.render(
        name="v1", tracks=[{"source_path": str(a), "volume": 1.0}],
        sample_rate=24000, format="wav",
    )
    quiet = comp.render(
        name="v2", tracks=[{"source_path": str(a), "volume": 0.25}],
        sample_rate=24000, format="wav",
    )
    import pathlib

    p1, _ = _decode(pathlib.Path(loud["output_path"]))
    p2, _ = _decode(pathlib.Path(quiet["output_path"]))
    assert np.sqrt((p1**2).mean()) == pytest.approx(
        4 * np.sqrt((p2**2).mean()), rel=0.05
    )


def test_path_allowlist_rejects_outside(composer, tmp_path):
    comp, _root = composer
    outside = tmp_path.parent / "evil.wav"
    _write_tone(outside, 440)
    with pytest.raises((ValueError, PermissionError, FileNotFoundError)):
        comp.render(
            name="bad",
            tracks=[{"source_path": str(outside), "volume": 1.0}],
            sample_rate=24000,
            format="wav",
        )


def test_resample_track_to_project_rate(composer):
    comp, root = composer
    a = _write_tone(root / "a16.wav", 330, rate=16000)
    out = comp.render(
        name="res", tracks=[{"source_path": str(a), "volume": 1.0}],
        sample_rate=24000, format="wav",
    )
    import pathlib

    pcm, rate = _decode(pathlib.Path(out["output_path"]))
    assert rate == 24000
    assert len(pcm) == pytest.approx(0.5 * 24000, rel=0.02)


def test_render_listing_and_delete(composer):
    comp, root = composer
    a = _write_tone(root / "a.wav", 330)
    out = comp.render(
        name="todelete", tracks=[{"source_path": str(a), "volume": 1.0}],
        sample_rate=24000, format="wav",
    )
    cid = out["composition_id"]
    listed = comp.list_renders()
    assert any(r["id"] == cid for r in listed["items"])
    assert comp.get_render(cid) is not None
    assert comp.delete_render(cid)
    assert comp.get_render(cid) is None
