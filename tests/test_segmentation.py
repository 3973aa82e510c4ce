"""PyanNet segmentation: torch-oracle converter parity + powerset decoding.

Oracle mirrors pyannote.audio's PyanNet (the pyannote/segmentation-3.0
topology the reference's diarization pipeline loads,
/root/reference/src/diarization/pyannote_diarizer.py:22) with the exact
state_dict names the released checkpoint uses, so `convert_segmentation`
is proven against the same key layout real weights arrive in.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from open_speech_tpu.models.segmentation import (  # noqa: E402
    SegmentationConfig,
    convert_segmentation,
    find_segmentation_checkpoint,
    init_segmentation_params,
    n_frames,
    powerset_classes,
    powerset_to_multilabel,
    segment_chunks,
    sinc_filters,
)


class _SincFB(nn.Module):
    """asteroid ParamSincFB: cos+sin analytic pairs from low/band params."""

    def __init__(self, n_pairs=40, kernel_size=251, sample_rate=16000.0,
                 min_low_hz=50.0, min_band_hz=50.0):
        super().__init__()
        self.kernel_size = kernel_size
        self.sample_rate = sample_rate
        self.min_low_hz = min_low_hz
        self.min_band_hz = min_band_hz
        to_mel = lambda hz: 2595 * np.log10(1 + hz / 700)  # noqa: E731
        to_hz = lambda mel: 700 * (10 ** (mel / 2595) - 1)  # noqa: E731
        mel = np.linspace(
            to_mel(30.0), to_mel(sample_rate / 2 - (min_low_hz + min_band_hz)),
            n_pairs + 1,
        )
        hz = to_hz(mel)
        self.low_hz_ = nn.Parameter(torch.tensor(hz[:-1], dtype=torch.float32).view(-1, 1))
        self.band_hz_ = nn.Parameter(torch.tensor(np.diff(hz), dtype=torch.float32).view(-1, 1))
        half = kernel_size // 2
        n_lin = torch.linspace(0, kernel_size / 2 - 1, steps=half)
        self.register_buffer(
            "window_", 0.54 - 0.46 * torch.cos(2 * np.pi * n_lin / kernel_size)
        )
        self.register_buffer(
            "n_", 2 * np.pi * torch.arange(-half, 0.0).view(1, -1) / sample_rate
        )

    def filters(self):
        low = self.min_low_hz + torch.abs(self.low_hz_)
        high = torch.clamp(
            low + self.min_band_hz + torch.abs(self.band_hz_),
            self.min_low_hz, self.sample_rate / 2,
        )
        band = (high - low)[:, 0]
        ft_low, ft_high = low @ self.n_, high @ self.n_

        def assemble(left, center):
            right = torch.flip(left, dims=[1])
            if center is None:  # sin family: odd symmetry, zero center
                center = torch.zeros_like(band.view(-1, 1))
                right = -right
            f = torch.cat([left * self.window_, center, right * self.window_], dim=1)
            return f / (2 * band[:, None])

        cos_f = assemble(
            (torch.sin(ft_high) - torch.sin(ft_low)) / (self.n_ / 2),
            2 * band.view(-1, 1),
        )
        sin_f = assemble(
            (torch.cos(ft_low) - torch.cos(ft_high)) / (self.n_ / 2), None
        )
        return torch.cat([cos_f, sin_f], dim=0).unsqueeze(1)


class _SincEncoder(nn.Module):
    def __init__(self, stride, **kw):
        super().__init__()
        self.stride = stride
        self.filterbank = _SincFB(**kw)

    def forward(self, x):
        return F.conv1d(x, self.filterbank.filters(), stride=self.stride)


class _SincNet(nn.Module):
    def __init__(self, stride=10, conv_hidden=60):
        super().__init__()
        self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
        self.conv1d = nn.ModuleList([
            _SincEncoder(stride),
            nn.Conv1d(80, conv_hidden, 5, stride=1),
            nn.Conv1d(conv_hidden, conv_hidden, 5, stride=1),
        ])
        self.pool1d = nn.ModuleList([nn.MaxPool1d(3, stride=3) for _ in range(3)])
        self.norm1d = nn.ModuleList([
            nn.InstanceNorm1d(80, affine=True),
            nn.InstanceNorm1d(conv_hidden, affine=True),
            nn.InstanceNorm1d(conv_hidden, affine=True),
        ])

    def forward(self, x):
        x = self.wav_norm1d(x)
        for c, (conv, pool, norm) in enumerate(
            zip(self.conv1d, self.pool1d, self.norm1d)
        ):
            x = conv(x)
            if c == 0:
                x = torch.abs(x)
            x = F.leaky_relu(norm(pool(x)))
        return x


class _PyanNetOracle(nn.Module):
    def __init__(self, conv_hidden=60, hidden=128, lstm_layers=4,
                 linear_hidden=128, n_classes=7):
        super().__init__()
        self.sincnet = _SincNet(conv_hidden=conv_hidden)
        self.lstm = nn.LSTM(
            conv_hidden, hidden, num_layers=lstm_layers,
            bidirectional=True, batch_first=True,
        )
        self.linear = nn.ModuleList([
            nn.Linear(2 * hidden, linear_hidden),
            nn.Linear(linear_hidden, linear_hidden),
        ])
        self.classifier = nn.Linear(linear_hidden, n_classes)

    def forward(self, waveforms):
        x = self.sincnet(waveforms)          # [B, C, T]
        x, _ = self.lstm(x.transpose(1, 2))  # [B, T, 2H]
        for lin in self.linear:
            x = F.leaky_relu(lin(x))
        return F.log_softmax(self.classifier(x), dim=-1)


def _oracle_state(seed=0, **kw):
    torch.manual_seed(seed)
    m = _PyanNetOracle(**kw).eval()
    # stir parameters away from torch defaults so parity is non-trivial
    with torch.no_grad():
        for p in m.parameters():
            p.add_(0.05 * torch.randn_like(p))
    return m


def test_powerset_classes_order():
    assert powerset_classes(3, 2) == [
        (), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2),
    ]
    cfg = SegmentationConfig()
    assert cfg.n_classes == 7
    ml = powerset_to_multilabel(np.array([0, 1, 4, 6]), cfg)
    np.testing.assert_array_equal(
        ml, [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 1]]
    )


def test_sinc_filters_match_oracle():
    fb = _SincFB()
    with torch.no_grad():
        want = fb.filters().numpy()[:, 0]
    got = sinc_filters(
        fb.low_hz_.detach().numpy(), fb.band_hz_.detach().numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_frame_count_math():
    cfg = SegmentationConfig()
    assert n_frames(160000, cfg) == 589  # pyannote's 10 s -> 589 frames
    m = _oracle_state()
    with torch.no_grad():
        out = m(torch.randn(1, 1, 32000))
    assert out.shape[1] == n_frames(32000, cfg)


def test_convert_parity():
    m = _oracle_state(seed=3)
    wave = torch.randn(2, 1, 32000) * 0.3
    with torch.no_grad():
        want = m(wave).numpy()

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params, cfg = convert_segmentation(sd)
    assert cfg.lstm_layers == 4 and cfg.n_sinc == 80
    got = np.asarray(segment_chunks(params, wave.numpy()[:, 0], cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
    # log-probabilities: rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, atol=1e-4)


def test_convert_rejects_wrong_classes():
    m = _oracle_state(n_classes=5)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    with pytest.raises(ValueError, match="classes"):
        convert_segmentation(sd)


def test_random_init_runs_real_shape():
    params = init_segmentation_params(None)
    out = np.asarray(segment_chunks(params, np.zeros((1, 160000), np.float32)))
    assert out.shape == (1, 589, 7)


def test_find_checkpoint_env(tmp_path, monkeypatch):
    p = tmp_path / "seg.bin"
    p.write_bytes(b"x")
    monkeypatch.setenv("OS_SEGMENTATION_CKPT_PATH", str(p))
    assert find_segmentation_checkpoint() == p
    monkeypatch.setenv("OS_SEGMENTATION_CKPT_PATH", str(tmp_path / "missing"))
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    assert find_segmentation_checkpoint() is None
