"""WeSpeaker ResNet34 embedding: torch-oracle converter parity.

Oracle mirrors wespeaker's ResNet34 (the embedding model inside the
reference's pyannote-3.1 diarization pipeline,
/root/reference/src/diarization/pyannote_diarizer.py:22) with the exact
state_dict names the released checkpoint uses (conv1/bn1, layer{1..4}
BasicBlocks with `shortcut`, TSTP pooling, seg_1 linear).
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from open_speech_tpu.models.wespeaker import (  # noqa: E402
    WeSpeakerConfig,
    convert_wespeaker,
    find_wespeaker_checkpoint,
    init_wespeaker_params,
    kaldi_fbank,
    wespeaker_embed,
)


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.shortcut = nn.Sequential()
        if stride != 1 or cin != cout:
            self.shortcut = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + self.shortcut(x))


class _ResNet34Oracle(nn.Module):
    def __init__(self, m=32, blocks=(3, 4, 6, 3), embed=256, n_mels=80):
        super().__init__()
        self.conv1 = nn.Conv2d(1, m, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m)

        def layer(cin, cout, n, stride):
            mods = [_BasicBlock(cin, cout, stride)]
            mods += [_BasicBlock(cout, cout) for _ in range(n - 1)]
            return nn.Sequential(*mods)

        self.layer1 = layer(m, m, blocks[0], 1)
        self.layer2 = layer(m, 2 * m, blocks[1], 2)
        self.layer3 = layer(2 * m, 4 * m, blocks[2], 2)
        self.layer4 = layer(4 * m, 8 * m, blocks[3], 2)
        self.seg_1 = nn.Linear(2 * 8 * m * (n_mels // 8), embed)

    def forward(self, fbank):  # [B, T, n_mels]
        x = fbank.permute(0, 2, 1).unsqueeze(1)  # [B, 1, F, T]
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        b, c, f, t = x.shape
        x = x.reshape(b, c * f, t)
        stats = torch.cat(
            [x.mean(dim=-1), torch.sqrt(x.var(dim=-1) + 1e-7)], dim=1
        )
        return self.seg_1(stats)


def _oracle(seed=0, **kw):
    torch.manual_seed(seed)
    m = _ResNet34Oracle(**kw).eval()
    with torch.no_grad():
        for p in m.parameters():
            p.add_(0.05 * torch.randn_like(p))
        # non-trivial BN running stats so folding is actually exercised
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.add_(0.3 * torch.randn_like(mod.running_mean))
                mod.running_var.mul_(
                    (1 + 0.2 * torch.rand_like(mod.running_var))
                )
    return m


def test_convert_parity_small():
    """Small ResNet (same topology, m=8, blocks 1/1/1/1) — fast, exact."""
    m = _oracle(seed=1, m=8, blocks=(1, 1, 1, 1), embed=32)
    fb = torch.randn(2, 148, 80)
    with torch.no_grad():
        want = m(fb).numpy()
    want = want / np.maximum(np.linalg.norm(want, axis=-1, keepdims=True), 1e-8)

    params, cfg = convert_wespeaker({k: v.numpy() for k, v in m.state_dict().items()})
    assert cfg.m_channels == 8 and cfg.num_blocks == (1, 1, 1, 1)
    got = np.asarray(wespeaker_embed(params, fb.numpy()))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_convert_parity_resnet34():
    """Full ResNet34 (m=32, 3/4/6/3) on one short window."""
    m = _oracle(seed=2)
    fb = torch.randn(1, 100, 80)
    with torch.no_grad():
        want = m(fb).numpy()
    want = want / np.maximum(np.linalg.norm(want, axis=-1, keepdims=True), 1e-8)

    params, cfg = convert_wespeaker({k: v.numpy() for k, v in m.state_dict().items()})
    assert cfg.num_blocks == (3, 4, 6, 3) and cfg.embed_dim == 256
    got = np.asarray(wespeaker_embed(params, fb.numpy()))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_kaldi_fbank_shape_and_cmn():
    wave = np.random.default_rng(0).normal(0, 0.1, (2, 24000)).astype(np.float32)
    fb = np.asarray(kaldi_fbank(wave))
    assert fb.shape == (2, 1 + (24000 - 400) // 160, 80)
    np.testing.assert_allclose(fb.mean(axis=1), 0.0, atol=1e-4)  # CMN
    assert np.isfinite(fb).all()


def test_kaldi_fbank_discriminates_pitch():
    """Different fundamentals land energy in different mel bands.

    CMN removes each band's time-mean, so a stationary tone flattens to
    zero — use tone-then-silence so active frames keep positive contrast
    in the tone's band.
    """
    t = np.arange(12000) / 16000
    pad = np.zeros(12000, np.float32)
    lo = np.concatenate([np.sin(2 * np.pi * 150 * t).astype(np.float32), pad])
    hi = np.concatenate([np.sin(2 * np.pi * 2500 * t).astype(np.float32), pad])
    fb = np.asarray(kaldi_fbank(np.stack([lo, hi])))
    active = fb[:, :60, :].mean(axis=1)  # tone-on frames, positive post-CMN
    assert active[1].argmax() > active[0].argmax() + 10


def test_random_init_embeds():
    params = init_wespeaker_params(
        jax.random.PRNGKey(0),
        cfg=WeSpeakerConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32),
    )
    fb = np.random.default_rng(1).normal(size=(3, 148, 80)).astype(np.float32)
    e = np.asarray(wespeaker_embed(params, fb))
    assert e.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-5)


def test_find_checkpoint_env(tmp_path, monkeypatch):
    p = tmp_path / "ws.bin"
    p.write_bytes(b"x")
    monkeypatch.setenv("OS_WESPEAKER_CKPT_PATH", str(p))
    assert find_wespeaker_checkpoint() == p


def test_diarizer_prefers_wespeaker(tmp_path, monkeypatch):
    """With a checkpoint on disk the diarizer embeds through WeSpeaker."""
    m = _oracle(seed=5, m=8, blocks=(1, 1, 1, 1), embed=32)
    ckpt = tmp_path / "wespeaker.bin"
    torch.save(m.state_dict(), ckpt)
    monkeypatch.setenv("OS_WESPEAKER_CKPT_PATH", str(ckpt))

    from open_speech_tpu.models.diarize import JaxDiarizer

    d = JaxDiarizer(threshold=0.2)
    assert d.wespeaker is not None and d.ge2e is None
    wins = np.random.default_rng(2).normal(0, 0.1, (3, 24000)).astype(np.float32)
    e = d._embed(wins)
    assert e.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-5)
    # end-to-end mechanics through the energy-gated path
    t = np.arange(16000 * 4) / 16000
    audio = (0.4 * np.sin(2 * np.pi * 220 * t) * np.sin(2 * np.pi * 3 * t)).astype(np.float32)
    turns = d.diarize_audio(audio)
    assert isinstance(turns, list)


def test_fbank_power_spectrum_matches_numpy_rfft():
    """The DFT stage must be a PLAIN rfft of the povey-windowed frame —
    kaldi applies exactly one window (a folded-in Hann double-windows and
    systematically reshapes the spectrum the released checkpoint expects)."""
    from open_speech_tpu.models.wespeaker import (
        FRAME_HOP,
        FRAME_LEN,
        N_FFT,
        _kaldi_mel_banks,
        kaldi_fbank,
    )

    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    # independent numpy reference of the whole kaldi fbank pipeline
    x = audio * 32768.0
    n_frames = 1 + (len(x) - FRAME_LEN) // FRAME_HOP
    idx = np.arange(n_frames)[:, None] * FRAME_HOP + np.arange(FRAME_LEN)
    frames = x[idx]
    frames = frames - frames.mean(axis=-1, keepdims=True)
    pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=-1)
    frames = frames - 0.97 * pre
    n = np.arange(FRAME_LEN)
    povey = (0.5 - 0.5 * np.cos(2 * np.pi * n / (FRAME_LEN - 1))) ** 0.85
    frames = frames * povey
    power = np.abs(np.fft.rfft(frames, N_FFT, axis=-1)) ** 2
    mel = power @ _kaldi_mel_banks(80).T
    logmel = np.log(np.maximum(mel, 1.1920928955078125e-07))
    ref = logmel - logmel.mean(axis=0, keepdims=True)

    import jax.numpy as jnp

    got = np.asarray(kaldi_fbank(jnp.asarray(audio)[None]))[0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)
