"""Silero VAD weight conversion: ONNX round-trip + torch-replica parity.

Mirrors the HF-parity strategy of tests/test_hf_parity.py: build the
reference graph (here: a torch replica of the silero-vad v5 ONNX topology
the reference downloads, src/vad/silero.py:196-204) with random weights,
serialize it with the silero initializer names through our minimal ONNX
writer, convert with ``convert_silero``, and require output parity.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from open_speech_tpu.models.onnx_io import (
    read_onnx_initializers,
    write_onnx_initializers,
)
from open_speech_tpu.models.vad.silero import convert_silero, vad_step


class TorchSileroV5(torch.nn.Module):
    """The silero-vad v5 inference graph, torch edition (test oracle)."""

    def __init__(self):
        super().__init__()
        self.stft = torch.nn.Conv1d(1, 258, 256, stride=128, bias=False)
        self.enc = torch.nn.ModuleList(
            [
                torch.nn.Conv1d(129, 128, 3, stride=1, padding=1),
                torch.nn.Conv1d(128, 64, 3, stride=2, padding=1),
                torch.nn.Conv1d(64, 64, 3, stride=2, padding=1),
                torch.nn.Conv1d(64, 128, 3, stride=1, padding=1),
            ]
        )
        self.rnn = torch.nn.LSTMCell(128, 128)
        self.head = torch.nn.Conv1d(128, 1, 1)

    def forward(self, x, h, c):
        x = F.pad(x.unsqueeze(1), (64, 64), mode="reflect")
        spec = self.stft(x)  # [B, 258, F]
        re, im = spec[:, :129], spec[:, 129:]
        mag = torch.sqrt(re * re + im * im + 1e-12)
        feat = mag
        for conv in self.enc:
            feat = torch.relu(conv(feat))  # [B, C, F']
        for t in range(feat.shape[-1]):
            h, c = self.rnn(feat[:, :, t], (h, c))
        out = torch.relu(h)
        prob = torch.sigmoid(self.head(out.unsqueeze(-1))).squeeze(-1).squeeze(-1)
        return prob, h, c

    def export_tensors(self) -> dict:
        """State dict under the names the silero ONNX file uses."""
        sd = {k: v.detach().numpy() for k, v in self.state_dict().items()}
        return {
            "_model.stft.forward_basis_buffer": sd["stft.weight"],
            "_model.encoder.0.reparam_conv.weight": sd["enc.0.weight"],
            "_model.encoder.0.reparam_conv.bias": sd["enc.0.bias"],
            "_model.encoder.1.reparam_conv.weight": sd["enc.1.weight"],
            "_model.encoder.1.reparam_conv.bias": sd["enc.1.bias"],
            "_model.encoder.2.reparam_conv.weight": sd["enc.2.weight"],
            "_model.encoder.2.reparam_conv.bias": sd["enc.2.bias"],
            "_model.encoder.3.reparam_conv.weight": sd["enc.3.weight"],
            "_model.encoder.3.reparam_conv.bias": sd["enc.3.bias"],
            "_model.decoder.rnn.weight_ih": sd["rnn.weight_ih"],
            "_model.decoder.rnn.weight_hh": sd["rnn.weight_hh"],
            "_model.decoder.rnn.bias_ih": sd["rnn.bias_ih"],
            "_model.decoder.rnn.bias_hh": sd["rnn.bias_hh"],
            "_model.decoder.decoder.2.weight": sd["head.weight"],
            "_model.decoder.decoder.2.bias": sd["head.bias"],
        }


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(7)
    return TorchSileroV5().eval()


def test_onnx_initializer_roundtrip(tmp_path, oracle):
    tensors = oracle.export_tensors()
    path = tmp_path / "silero_vad.onnx"
    write_onnx_initializers(tensors, path)
    back = read_onnx_initializers(path)
    assert set(back) == set(tensors)
    for name, arr in tensors.items():
        np.testing.assert_array_equal(back[name], arr)


def test_converted_weights_match_torch_single_step(tmp_path, oracle):
    path = tmp_path / "silero_vad.onnx"
    write_onnx_initializers(oracle.export_tensors(), path)
    params = convert_silero(path)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((3, 512)).astype(np.float32) * 0.1
    h0 = rng.standard_normal((3, 128)).astype(np.float32) * 0.1
    c0 = rng.standard_normal((3, 128)).astype(np.float32) * 0.1

    with torch.no_grad():
        t_prob, t_h, t_c = oracle(
            torch.from_numpy(audio), torch.from_numpy(h0), torch.from_numpy(c0)
        )
    j_prob, j_state = vad_step(
        params, jnp.asarray(audio), jnp.stack([jnp.asarray(h0), jnp.asarray(c0)])
    )
    np.testing.assert_allclose(np.asarray(j_prob), t_prob.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_state[0]), t_h.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_state[1]), t_c.numpy(), atol=1e-5)


def test_converted_weights_match_torch_recurrent(oracle):
    """State carried across 10 sequential windows stays in agreement."""
    params = convert_silero(oracle.export_tensors())
    rng = np.random.default_rng(1)
    h = np.zeros((1, 128), np.float32)
    c = np.zeros((1, 128), np.float32)
    state = jnp.zeros((2, 1, 128))
    for _ in range(10):
        audio = rng.standard_normal((1, 512)).astype(np.float32) * 0.3
        with torch.no_grad():
            t_prob, th, tc = oracle(
                torch.from_numpy(audio), torch.from_numpy(h), torch.from_numpy(c)
            )
        h, c = th.numpy(), tc.numpy()
        j_prob, state = vad_step(params, jnp.asarray(audio), state)
        np.testing.assert_allclose(
            float(j_prob[0]), float(t_prob[0]), atol=1e-4
        )


def test_convert_errors_on_missing_tensor(oracle):
    tensors = oracle.export_tensors()
    tensors.pop("_model.decoder.rnn.weight_ih")
    with pytest.raises(KeyError, match="rnn.weight_ih"):
        convert_silero(tensors)
