"""Native libosaudio parity vs numpy implementations."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


@pytest.fixture(scope="module")
def native():
    from open_speech_tpu import native as nat

    if not nat.available():
        # build on demand (g++ is baked into the image)
        subprocess.run(["make", "-C", str(REPO / "native")], check=True)
        nat._lib = None
    if not nat.available():
        pytest.skip("libosaudio not built")
    return nat


def test_pcm_conversion_parity(native):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.5, 1.5, 50000).astype(np.float32)
    ints = native.f32_to_pcm16(x)
    ref = (np.clip(x, -1, 1) * 32767).astype("<i2")
    assert np.array_equal(ints, ref)
    back = native.pcm16_to_f32(ints)
    assert np.array_equal(back, ints.astype(np.float32) / 32768.0)


def test_g711_parity(native):
    from open_speech_tpu.ops import audio as A

    pcm = np.linspace(-32768, 32767, 65536).astype(np.int16)
    for enc_n, dec_n, enc_p, dec_p in (
        (native.ulaw_encode, native.ulaw_decode, A.ulaw_encode, A.ulaw_decode),
        (native.alaw_encode, native.alaw_decode, A.alaw_encode, A.alaw_decode),
    ):
        codes_n = enc_n(pcm)
        codes_p = enc_p(pcm)
        # codes may differ where two codes decode identically; decoded values
        # must agree exactly
        assert np.array_equal(dec_n(codes_n), dec_p(codes_p))
        # cross-decode parity: same code -> same value in both impls
        all_codes = np.arange(256, dtype=np.uint8)
        assert np.array_equal(dec_n(all_codes), dec_p(all_codes))


def test_linear_resample_parity(native):
    rng = np.random.default_rng(1)
    x = (rng.uniform(-20000, 20000, 4800)).astype(np.int16)
    n_out = 1600
    got = native.linear_resample_i16(x, n_out)
    src = np.linspace(0.0, len(x) - 1, n_out)
    ref = np.interp(src, np.arange(len(x)), x.astype(np.float32))
    ref = np.clip(np.round(ref), -32768, 32767).astype(np.int16)
    assert np.max(np.abs(got.astype(int) - ref.astype(int))) <= 1


def test_rms_normalize(native):
    x = (np.sin(np.linspace(0, 30, 8000)) * 0.01).astype(np.float32)
    out = native.rms_normalize_f32(x, -18.0)
    rms = np.sqrt(np.mean(out**2))
    assert abs(20 * np.log10(rms) - (-18.0)) < 0.2


def test_trim_bounds(native):
    x = np.concatenate(
        [np.zeros(100), np.ones(50) * 0.5, np.zeros(70)]
    ).astype(np.float32)
    start, end = native.trim_bounds_f32(x, 0.01)
    assert (start, end) == (100, 150)
    silence = np.zeros(40, np.float32)
    assert native.trim_bounds_f32(silence, 0.01) == (0, 40)


def test_ops_audio_uses_native(native):
    from open_speech_tpu.ops import audio as A

    assert A._native() is not None
    x = np.array([0.5, -0.25], np.float32)
    assert A.float_to_pcm16(x) == (x * 32767).astype("<i2").tobytes()
