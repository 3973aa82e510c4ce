"""GE2E speaker encoder: torch-oracle parity + diarizer integration.

Closes the round-1 gap "diarization … no parity evidence": the JAX GE2E
graph must reproduce a torch replica of resemblyzer's VoiceEncoder
(3-layer LSTM + Linear + ReLU + L2 norm) through the checkpoint
converter, exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from open_speech_tpu.models.ge2e import (
    GE2EConfig,
    convert_ge2e,
    ge2e_embed,
    ge2e_mel,
    init_ge2e_params,
)


class TorchVoiceEncoder(torch.nn.Module):
    """resemblyzer VoiceEncoder graph (module names match the checkpoint)."""

    def __init__(self, n_mels=40, hidden=64, layers=3, embed=32):
        super().__init__()
        self.lstm = torch.nn.LSTM(n_mels, hidden, layers, batch_first=True)
        self.linear = torch.nn.Linear(hidden, embed)
        self.relu = torch.nn.ReLU()

    def forward(self, mels):
        _, (hidden, _) = self.lstm(mels)
        raw = self.relu(self.linear(hidden[-1]))
        return raw / torch.clamp(
            torch.norm(raw, dim=1, keepdim=True), min=1e-8
        )


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(5)
    return TorchVoiceEncoder().eval()


def test_converted_embeddings_match_torch(oracle):
    params, cfg = convert_ge2e(
        {k: v.numpy() for k, v in oracle.state_dict().items()}
    )
    assert cfg == GE2EConfig(n_mels=40, hidden=64, layers=3, embed_dim=32)
    rng = np.random.default_rng(0)
    mels = rng.standard_normal((4, 120, 40)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(mels)).numpy()
    out = np.asarray(ge2e_embed(params, jnp.asarray(mels)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_random_init_matches_converted_tree(oracle):
    params, cfg = convert_ge2e(
        {k: v.numpy() for k, v in oracle.state_dict().items()}
    )
    rand = init_ge2e_params(jax.random.PRNGKey(0), cfg)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(rand)
    assert [x.shape for x in jax.tree_util.tree_leaves(params)] == [
        x.shape for x in jax.tree_util.tree_leaves(rand)
    ]


def test_ge2e_mel_matches_librosa_convention():
    """Power mel: non-negative, frame count len//hop + 1, energy follows
    the signal (resemblyzer applies no log)."""
    t = np.arange(16000) / 16000
    loud = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = np.asarray(ge2e_mel(jnp.asarray(loud)))
    assert mel.shape == (16000 // 160 + 1, 40)
    assert (mel >= 0).all()
    quiet = np.asarray(ge2e_mel(jnp.asarray(loud * 0.1)))
    assert mel.sum() > quiet.sum() * 50  # power scale (amplitude² = 100x)


def test_embeddings_separate_speakers(oracle):
    """Distinct spectral content → distant embeddings; same content →
    near-identical (the property clustering builds on)."""
    params, _cfg = convert_ge2e(
        {k: v.numpy() for k, v in oracle.state_dict().items()}
    )
    t = np.arange(24000) / 16000

    def mel_of(freq):
        sig = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        return np.asarray(ge2e_mel(jnp.asarray(sig)))[None]

    a1 = np.asarray(ge2e_embed(params, jnp.asarray(mel_of(220))))[0]
    a2 = np.asarray(ge2e_embed(params, jnp.asarray(mel_of(225))))[0]
    b = np.asarray(ge2e_embed(params, jnp.asarray(mel_of(1400))))[0]
    assert a1 @ a2 > a1 @ b


def test_diarizer_uses_ge2e_when_checkpoint_present(tmp_path, oracle, monkeypatch):
    torch.save(oracle.state_dict(), tmp_path / "pretrained.pt")
    monkeypatch.setenv("OS_DIARIZER_CKPT_PATH", str(tmp_path / "pretrained.pt"))
    from open_speech_tpu.models.diarize import JaxDiarizer

    d = JaxDiarizer()
    assert d.ge2e is not None
    t = np.arange(16000 * 4) / 16000
    audio = np.concatenate(
        [
            0.4 * np.sin(2 * np.pi * 220 * t[: 2 * 16000]),
            0.4 * np.sin(2 * np.pi * 1400 * t[: 2 * 16000]),
        ]
    ).astype(np.float32)
    turns = d.diarize_audio(audio)
    assert turns
    assert all({"speaker", "start", "end"} <= set(t_) for t_ in turns)
