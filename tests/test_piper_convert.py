"""Piper/VITS weight conversion: torch-oracle parity for the full graph.

Strategy per VERDICT/SURVEY: instantiate the reference graph (the VITS
SynthesizerTrn inference path that piper exports to ONNX,
src/tts/backends/piper_backend.py:296) in torch with random weights,
convert its state dict with ``convert_piper_state_dict``, and require
numerical parity stage by stage and end-to-end with shared noise.

The oracle runs on the same padded static shapes as the JAX model (VITS
itself is mask-based), so comparisons are exact on valid positions.
Weight norm is applied to the WN/decoder convs like VITS does — old-style
(weight_g/weight_v) on the flow, parametrizations-style on the decoder —
so both folding paths are exercised.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from open_speech_tpu.models.piper.convert import (
    config_from_state_dict,
    convert_piper_state_dict,
)
from open_speech_tpu.models.piper.model import (
    PiperConfig,
    init_piper_params,
    synthesize_vits,
)

# small-but-structurally-complete geometry
HID, FFN, HEADS, LAYERS = 32, 64, 2, 2
DPF, BINS, TAIL = 24, 10, 5.0
FLOWS, WN_LAYERS, WN_K = 2, 2, 5
RATES, KERNELS, INIT_CH = (4, 4), (8, 8), 32
RES_K, RES_D = (3,), ((1, 3),)
GIN, SPK = 8, 3
P_MAX, F_MAX = 16, 64


class LayerNormC(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(c))
        self.beta = nn.Parameter(torch.zeros(c))
        self.c = c

    def forward(self, x):  # [B, C, T]
        x = x.transpose(1, -1)
        x = F.layer_norm(x, (self.c,), self.gamma, self.beta, 1e-5)
        return x.transpose(1, -1)


class RelMHA(nn.Module):
    def __init__(self, c, heads, window):
        super().__init__()
        self.heads, self.k_ch, self.window = heads, c // heads, window
        self.conv_q = nn.Conv1d(c, c, 1)
        self.conv_k = nn.Conv1d(c, c, 1)
        self.conv_v = nn.Conv1d(c, c, 1)
        self.conv_o = nn.Conv1d(c, c, 1)
        self.emb_rel_k = nn.Parameter(
            torch.randn(1, 2 * window + 1, self.k_ch) * self.k_ch**-0.5
        )
        self.emb_rel_v = nn.Parameter(
            torch.randn(1, 2 * window + 1, self.k_ch) * self.k_ch**-0.5
        )

    def _rel_emb(self, emb, t):
        pad = max(t - 1 - self.window, 0)
        start = max(self.window + 1 - t, 0)
        padded = F.pad(emb, (0, 0, pad, pad))
        return padded[:, start : start + 2 * t - 1]

    @staticmethod
    def _rel_to_abs(x):
        b, h, t, _ = x.shape
        x = F.pad(x, (0, 1)).view(b, h, t * 2 * t)
        x = F.pad(x, (0, t - 1)).view(b, h, t + 1, 2 * t - 1)
        return x[:, :, :t, t - 1 :]

    @staticmethod
    def _abs_to_rel(x):
        b, h, t, _ = x.shape
        x = F.pad(x, (0, t - 1)).view(b, h, t * t + t * (t - 1))
        x = F.pad(x, (t, 0)).view(b, h, t, 2 * t)
        return x[:, :, :, 1:]

    def forward(self, x, attn_mask):  # x [B,C,T]
        b, c, t = x.shape
        q = self.conv_q(x).view(b, self.heads, self.k_ch, t).transpose(2, 3)
        k = self.conv_k(x).view(b, self.heads, self.k_ch, t).transpose(2, 3)
        v = self.conv_v(x).view(b, self.heads, self.k_ch, t).transpose(2, 3)
        scale = self.k_ch**-0.5
        scores = torch.matmul(q * scale, k.transpose(-2, -1))
        rel_k = self._rel_emb(self.emb_rel_k, t)
        rel_logits = torch.matmul(q * scale, rel_k.unsqueeze(0).transpose(-2, -1))
        scores = scores + self._rel_to_abs(rel_logits)
        scores = scores.masked_fill(attn_mask == 0, -1e4)
        w = F.softmax(scores, dim=-1)
        out = torch.matmul(w, v)
        rel_v = self._rel_emb(self.emb_rel_v, t)
        out = out + torch.matmul(self._abs_to_rel(w), rel_v.unsqueeze(0))
        out = out.transpose(2, 3).reshape(b, c, t)
        return self.conv_o(out)


class FFNBlock(nn.Module):
    def __init__(self, c, filt, k):
        super().__init__()
        self.conv_1 = nn.Conv1d(c, filt, k, padding=k // 2)
        self.conv_2 = nn.Conv1d(filt, c, k, padding=k // 2)

    def forward(self, x, mask):
        x = torch.relu(self.conv_1(x * mask))
        return self.conv_2(x * mask) * mask


class EncoderT(nn.Module):
    def __init__(self):
        super().__init__()
        self.attn_layers = nn.ModuleList(
            [RelMHA(HID, HEADS, 4) for _ in range(LAYERS)]
        )
        self.norm_layers_1 = nn.ModuleList([LayerNormC(HID) for _ in range(LAYERS)])
        self.ffn_layers = nn.ModuleList(
            [FFNBlock(HID, FFN, 3) for _ in range(LAYERS)]
        )
        self.norm_layers_2 = nn.ModuleList([LayerNormC(HID) for _ in range(LAYERS)])

    def forward(self, x, mask):
        attn_mask = mask.unsqueeze(2) * mask.unsqueeze(-1)
        x = x * mask
        for attn, n1, ffn, n2 in zip(
            self.attn_layers, self.norm_layers_1, self.ffn_layers, self.norm_layers_2
        ):
            x = n1(x + attn(x, attn_mask))
            x = n2(x + ffn(x, mask))
        return x * mask


class TextEncoderT(nn.Module):
    def __init__(self, n_vocab):
        super().__init__()
        self.emb = nn.Embedding(n_vocab, HID)
        self.encoder = EncoderT()
        self.proj = nn.Conv1d(HID, 2 * HID, 1)

    def forward(self, tokens, mask):
        x = self.emb(tokens) * math.sqrt(HID)
        x = x.transpose(1, -1)
        x = self.encoder(x * mask, mask)
        stats = self.proj(x) * mask
        m, logs = stats.split(HID, dim=1)
        return x, m, logs


class DDSConvT(nn.Module):
    def __init__(self, c, k, n):
        super().__init__()
        self.convs_sep = nn.ModuleList(
            [
                nn.Conv1d(c, c, k, groups=c, dilation=k**i, padding=(k**i * (k - 1)) // 2)
                for i in range(n)
            ]
        )
        self.convs_1x1 = nn.ModuleList([nn.Conv1d(c, c, 1) for _ in range(n)])
        self.norms_1 = nn.ModuleList([LayerNormC(c) for _ in range(n)])
        self.norms_2 = nn.ModuleList([LayerNormC(c) for _ in range(n)])

    def forward(self, x, mask, g=None):
        if g is not None:
            x = x + g
        for sep, one, n1, n2 in zip(
            self.convs_sep, self.convs_1x1, self.norms_1, self.norms_2
        ):
            y = F.gelu(n1(sep(x * mask)))
            y = F.gelu(n2(one(y)))
            x = x + y
        return x * mask


def _rq_spline_inverse_t(x, uw, uh, ud):
    """torch edition of the VITS unconstrained RQ spline (inverse)."""
    inside = (x >= -TAIL) & (x <= TAIL)
    xi = torch.clamp(x, -TAIL, TAIL)
    const = math.log(math.exp(1 - 1e-3) - 1)
    ud = F.pad(ud, (1, 1), value=const)
    widths = 1e-3 + (1 - 1e-3 * BINS) * F.softmax(uw, dim=-1)
    cumw = F.pad(torch.cumsum(widths, -1), (1, 0)) * 2 * TAIL - TAIL
    cumw[..., 0], cumw[..., -1] = -TAIL, TAIL
    widths = cumw[..., 1:] - cumw[..., :-1]
    derivs = 1e-3 + F.softplus(ud)
    heights = 1e-3 + (1 - 1e-3 * BINS) * F.softmax(uh, dim=-1)
    cumh = F.pad(torch.cumsum(heights, -1), (1, 0)) * 2 * TAIL - TAIL
    cumh[..., 0], cumh[..., -1] = -TAIL, TAIL
    heights = cumh[..., 1:] - cumh[..., :-1]
    located = cumh.clone()
    located[..., -1] += 1e-6
    idx = (xi.unsqueeze(-1) >= located).sum(-1) - 1
    idx = idx.clamp(0, BINS - 1).unsqueeze(-1)
    gather = lambda t: t.gather(-1, idx)[..., 0]
    in_cw, in_w = gather(cumw), gather(widths)
    in_ch, in_h = gather(cumh), gather(heights)
    delta = gather(heights / widths)
    d0, d1 = gather(derivs), derivs.gather(-1, idx + 1)[..., 0]
    dy = xi - in_ch
    a = dy * (d0 + d1 - 2 * delta) + in_h * (delta - d0)
    b = in_h * d0 - dy * (d0 + d1 - 2 * delta)
    c = -delta * dy
    disc = (b * b - 4 * a * c).clamp_min(0)
    root = 2 * c / (-b - torch.sqrt(disc))
    return torch.where(inside, root * in_w + in_cw, x)


class ConvFlowT(nn.Module):
    def __init__(self):
        super().__init__()
        self.pre = nn.Conv1d(1, DPF, 1)
        self.convs = DDSConvT(DPF, 3, 3)
        self.proj = nn.Conv1d(DPF, 3 * BINS - 1, 1)

    def forward(self, x, mask, g):  # reverse only
        x0, x1 = x.split(1, dim=1)
        h = self.pre(x0)
        h = self.convs(h, mask, g=g)
        h = self.proj(h) * mask
        h = h.transpose(1, 2)  # [B,T,29]
        s = DPF**-0.5
        x1 = _rq_spline_inverse_t(
            x1[:, 0], h[..., :BINS] * s, h[..., BINS : 2 * BINS] * s, h[..., 2 * BINS :]
        ).unsqueeze(1)
        return torch.cat([x0, x1], dim=1) * mask


class ElementwiseAffineT(nn.Module):
    def __init__(self):
        super().__init__()
        self.m = nn.Parameter(torch.randn(2, 1) * 0.1)
        self.logs = nn.Parameter(torch.randn(2, 1) * 0.1)

    def forward(self, x, mask):  # reverse
        return (x - self.m) * torch.exp(-self.logs) * mask


class SDPT(nn.Module):
    def __init__(self):
        super().__init__()
        self.pre = nn.Conv1d(HID, DPF, 1)
        self.convs = DDSConvT(DPF, 3, 3)
        self.proj = nn.Conv1d(DPF, DPF, 1)
        self.cond = nn.Conv1d(GIN, DPF, 1)
        # flows list mirrors VITS: [EA, CF, Flip, CF, Flip, ...]
        self.flows = nn.ModuleList([ElementwiseAffineT()])
        for _ in range(FLOWS * 2):  # placeholder count; real CFs below
            pass
        self.flows.extend(
            m for _ in range(FLOWS) for m in (ConvFlowT(), nn.Identity())
        )

    def reverse(self, x, mask, g, noise):
        h = self.pre(x)
        if g is not None:
            h = h + self.cond(g)
        h = self.convs(h, mask)
        h = self.proj(h) * mask
        z = noise
        # inference order: reversed(flows)[:-2] + [flows[-1]] — the first
        # ConvFlow is skipped ("useless vflow"); Identity = Flip placeholder
        cf = [m for m in self.flows if isinstance(m, ConvFlowT)]
        for i in reversed(range(1, FLOWS)):
            z = torch.flip(z, [1])
            z = cf[i](z, mask, h)
        z = torch.flip(z, [1])
        z = self.flows[0](z, mask)
        return z[:, 0:1]


class WNT(nn.Module):
    def __init__(self):
        super().__init__()
        self.in_layers = nn.ModuleList()
        self.res_skip_layers = nn.ModuleList()
        for j in range(WN_LAYERS):
            self.in_layers.append(
                torch.nn.utils.weight_norm(
                    nn.Conv1d(HID, 2 * HID, WN_K, padding=WN_K // 2)
                )
            )
            out_c = 2 * HID if j < WN_LAYERS - 1 else HID
            self.res_skip_layers.append(
                torch.nn.utils.weight_norm(nn.Conv1d(HID, out_c, 1))
            )
        self.cond_layer = torch.nn.utils.weight_norm(
            nn.Conv1d(GIN, 2 * HID * WN_LAYERS, 1)
        )

    def forward(self, x, mask, g):
        out = torch.zeros_like(x)
        g_all = self.cond_layer(g)
        for j in range(WN_LAYERS):
            x_in = self.in_layers[j](x)
            x_in = x_in + g_all[:, j * 2 * HID : (j + 1) * 2 * HID]
            acts = torch.tanh(x_in[:, :HID]) * torch.sigmoid(x_in[:, HID:])
            rs = self.res_skip_layers[j](acts)
            if j < WN_LAYERS - 1:
                x = (x + rs[:, :HID]) * mask
                out = out + rs[:, HID:]
            else:
                out = out + rs
        return out * mask


class RCLT(nn.Module):
    def __init__(self):
        super().__init__()
        half = HID // 2
        self.pre = nn.Conv1d(half, HID, 1)
        self.enc = WNT()
        self.post = nn.Conv1d(HID, half, 1)

    def reverse(self, x, mask, g):
        half = HID // 2
        x0, x1 = x.split(half, dim=1)
        h = self.pre(x0) * mask
        h = self.enc(h, mask, g)
        m = self.post(h) * mask
        return torch.cat([x0, (x1 - m) * mask], dim=1)


class GeneratorT(nn.Module):
    def __init__(self):
        super().__init__()
        wn = torch.nn.utils.parametrizations.weight_norm
        self.conv_pre = nn.Conv1d(HID, INIT_CH, 7, padding=3)
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        ch = INIT_CH
        for u, k in zip(RATES, KERNELS):
            self.ups.append(
                wn(nn.ConvTranspose1d(ch, ch // 2, k, stride=u, padding=(k - u) // 2))
            )
            ch //= 2
            for rk, rds in zip(RES_K, RES_D):
                blk = nn.Module()
                blk.convs1 = nn.ModuleList(
                    [
                        wn(nn.Conv1d(ch, ch, rk, dilation=d, padding=(rk * d - d) // 2))
                        for d in rds
                    ]
                )
                blk.convs2 = nn.ModuleList(
                    [
                        wn(nn.Conv1d(ch, ch, rk, padding=rk // 2))
                        for _ in rds
                    ]
                )
                self.resblocks.append(blk)
        self.conv_post = nn.Conv1d(ch, 1, 7, padding=3)
        self.cond = nn.Conv1d(GIN, INIT_CH, 1)

    def forward(self, x, g):
        x = self.conv_pre(x) + self.cond(g)
        nk = len(RES_K)
        for i in range(len(RATES)):
            x = F.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            xs = None
            for j in range(nk):
                blk = self.resblocks[i * nk + j]
                r = x
                for c1, c2 in zip(blk.convs1, blk.convs2):
                    rt = c1(F.leaky_relu(r, 0.1))
                    rt = c2(F.leaky_relu(rt, 0.1))
                    r = r + rt
                xs = r if xs is None else xs + r
            x = xs / nk
        x = F.leaky_relu(x)  # default slope 0.01, as in HiFiGAN
        return torch.tanh(self.conv_post(x))[:, 0]


class SynthesizerT(nn.Module):
    """VITS SynthesizerTrn.infer on padded static shapes."""

    def __init__(self, n_vocab=40):
        super().__init__()
        self.enc_p = TextEncoderT(n_vocab)
        self.dp = SDPT()
        self.flow = nn.ModuleList()  # [RCL, Flip, RCL, Flip]
        for _ in range(2):
            self.flow.extend([RCLT(), nn.Identity()])
        self.dec = GeneratorT()
        self.emb_g = nn.Embedding(SPK, GIN)

    def state_dict_numpy(self):
        sd = {}
        for k, v in self.state_dict().items():
            # rename flow.{2i}.* → flow.flows.{2i}.* (VITS module tree)
            if k.startswith("flow."):
                k = "flow.flows." + k[len("flow.") :]
            sd[k] = v.detach().numpy()
        return sd

    @torch.no_grad()
    def infer(self, tokens, lengths, sid, speed, dp_noise, z_noise,
              noise_scale=0.667):
        b = tokens.shape[0]
        mask = (
            torch.arange(P_MAX)[None, :] < lengths[:, None]
        ).float().unsqueeze(1)  # [B,1,P]
        x, m_p, logs_p = self.enc_p(tokens, mask)
        g = self.emb_g(sid).unsqueeze(-1)  # [B,GIN,1]
        logw = self.dp.reverse(x, mask, g, dp_noise)  # [B,1,P]
        w = torch.exp(logw) * mask / speed[:, None, None]
        w_ceil = torch.ceil(w)[:, 0]  # [B,P]
        ends = torch.cumsum(w_ceil, dim=1)
        n_frames = ends[:, -1].long().clamp(1, F_MAX)

        # VITS generate_path: hard monotonic alignment matrix
        fmask = (
            torch.arange(F_MAX)[None, :] < n_frames[:, None]
        ).float().unsqueeze(1)  # [B,1,F]
        path = (
            torch.arange(F_MAX)[None, None, :] < ends[:, :, None]
        ).float()  # [B,P,F]: frame f covered once cumdur passes it
        path = path - F.pad(path, (0, 0, 1, 0))[:, :-1]  # one-hot per frame
        attn = path.transpose(1, 2) * fmask.transpose(1, 2)  # [B,F,P]
        m_f = torch.matmul(attn, m_p.transpose(1, 2)).transpose(1, 2)
        logs_f = torch.matmul(attn, logs_p.transpose(1, 2)).transpose(1, 2)

        z_p = m_f + z_noise * torch.exp(logs_f) * noise_scale
        z = z_p
        for mod in reversed(self.flow):
            if isinstance(mod, nn.Identity):
                z = torch.flip(z, [1])
            else:
                z = mod.reverse(z, fmask, g)
        # decode EXACT-LENGTH per row — what real piper (onnxruntime, no
        # frame bucket) does. Decoding the padded bucket would leak
        # bias-activated garbage from padded frames back into the valid
        # audio tail through the 'same'-padded convs, making the oracle
        # share the very contamination the JAX masked decoder eliminates.
        z = z * fmask
        outs = []
        for i in range(b):
            n = int(n_frames[i])
            a = self.dec(z[i : i + 1, :, :n], g[i : i + 1])  # [1, n*spf]
            spf = a.shape[-1] // n
            outs.append(F.pad(a, (0, (F_MAX - n) * spf)))
        return torch.cat(outs, dim=0), n_frames


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(3)
    return SynthesizerT().eval()


@pytest.fixture(scope="module")
def converted(oracle):
    return convert_piper_state_dict(
        oracle.state_dict_numpy(), max_phonemes=P_MAX, max_frames=F_MAX
    )


def test_config_inference_from_shapes(converted):
    _, cfg = converted
    assert cfg.hidden == HID
    assert cfg.ffn_filter == FFN
    assert cfg.n_heads == HEADS
    assert cfg.n_layers == LAYERS
    assert cfg.dp_filter == DPF
    assert cfg.dp_flows == FLOWS
    assert cfg.dp_bins == BINS
    assert cfg.flow_layers == 2
    assert cfg.wn_layers == WN_LAYERS
    assert cfg.upsample_rates == RATES
    assert cfg.upsample_kernels == KERNELS
    assert cfg.upsample_initial == INIT_CH
    assert cfg.resblock_kernels == RES_K
    assert cfg.resblock_dilations == RES_D
    assert cfg.n_speakers == SPK and cfg.gin == GIN


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    tokens = np.zeros((2, P_MAX), np.int64)
    lens = np.array([11, 7], np.int64)
    for i, n in enumerate(lens):
        tokens[i, :n] = rng.integers(1, 40, n)
    sid = np.array([1, 2], np.int64)
    speed = np.array([1.0, 1.25], np.float32)
    dp_noise = (rng.standard_normal((2, 2, P_MAX)) * 0.8).astype(np.float32)
    z_noise = rng.standard_normal((2, HID, F_MAX)).astype(np.float32)
    return tokens, lens, sid, speed, dp_noise, z_noise


def test_full_graph_parity(oracle, converted):
    params, cfg = converted
    tokens, lens, sid, speed, dp_noise, z_noise = _inputs()

    t_audio, t_frames = oracle.infer(
        torch.from_numpy(tokens),
        torch.from_numpy(lens),
        torch.from_numpy(sid),
        torch.from_numpy(speed),
        torch.from_numpy(dp_noise),
        torch.from_numpy(z_noise),
        noise_scale=cfg.noise_scale,
    )
    j_audio, j_frames = synthesize_vits(
        params,
        cfg,
        jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray(lens.astype(np.int32)),
        jnp.asarray(sid.astype(np.int32)),
        jnp.asarray(speed),
        jax.random.PRNGKey(0),
        dp_noise=jnp.asarray(dp_noise.transpose(0, 2, 1)),  # [B,P,2]
        z_noise=jnp.asarray(z_noise.transpose(0, 2, 1)),  # [B,F,H]
    )
    np.testing.assert_array_equal(np.asarray(j_frames), t_frames.numpy())
    spf = cfg.samples_per_frame
    for i, n in enumerate(np.asarray(j_frames)):
        valid = int(n) * spf
        np.testing.assert_allclose(
            np.asarray(j_audio[i, :valid]),
            t_audio[i, :valid].numpy(),
            atol=2e-4,
            err_msg=f"row {i}",
        )


def test_speed_changes_duration(converted):
    params, cfg = converted
    tokens, lens, sid, _, dp_noise, z_noise = _inputs()
    frames = []
    for s in (0.7, 1.0, 1.4):
        _, n = synthesize_vits(
            params, cfg,
            jnp.asarray(tokens.astype(np.int32)),
            jnp.asarray(lens.astype(np.int32)),
            jnp.asarray(sid.astype(np.int32)),
            jnp.asarray(np.full(2, s, np.float32)),
            jax.random.PRNGKey(0),
            dp_noise=jnp.asarray(dp_noise.transpose(0, 2, 1)),
            z_noise=jnp.asarray(z_noise.transpose(0, 2, 1)),
        )
        frames.append(int(np.asarray(n)[0]))
    assert frames[0] > frames[1] > frames[2]  # slower speech → more frames


def test_backend_loads_converted_onnx_voice(tmp_path, oracle, monkeypatch):
    """Full serving path: ONNX file + JSON sidecar → backend → audio."""
    import json

    from open_speech_tpu.models.onnx_io import write_onnx_initializers
    from open_speech_tpu.tts.backends.piper_jax import PiperBackend

    voice_dir = tmp_path / "voices"
    voice_dir.mkdir()
    onnx_path = voice_dir / "en_US-lessac-medium.onnx"
    write_onnx_initializers(oracle.state_dict_numpy(), onnx_path)
    (voice_dir / "en_US-lessac-medium.onnx.json").write_text(
        json.dumps(
            {
                "audio": {"sample_rate": 16000},
                "inference": {"noise_scale": 0.5, "noise_w": 0.6},
                "num_symbols": 40,
                "num_speakers": SPK,
                "phoneme_id_map": {"^": [1], "$": [2], "_": [0]},
                "espeak": {"voice": "en-us"},
            }
        )
    )
    monkeypatch.setenv("OS_PIPER_VOICES_DIR", str(voice_dir))
    backend = PiperBackend()
    backend.load_model("piper/en_US-lessac-medium")
    params, cfg, meta = backend._models["piper/en_US-lessac-medium"]
    assert cfg.hidden == HID and cfg.n_speakers == SPK
    assert cfg.sample_rate == 16000
    assert abs(cfg.noise_scale - 0.5) < 1e-9
    assert meta["phoneme_id_map"] == {"^": [1], "$": [2], "_": [0]}
    chunks = list(backend.synthesize("hello world", "piper/en_US-lessac-medium"))
    assert chunks and all(c.dtype == np.float32 for c in chunks)
    assert all(np.isfinite(c).all() for c in chunks)


def test_random_init_matches_converted_tree(converted):
    """init_piper_params produces the exact pytree structure the converter
    emits, so random-init serving and converted serving share code paths."""
    params, cfg = converted
    rand = init_piper_params(jax.random.PRNGKey(0), cfg)
    t1 = jax.tree_util.tree_structure(params)
    t2 = jax.tree_util.tree_structure(rand)
    assert t1 == t2
    shapes1 = [x.shape for x in jax.tree_util.tree_leaves(params)]
    shapes2 = [x.shape for x in jax.tree_util.tree_leaves(rand)]
    assert shapes1 == shapes2


def test_generator_padding_does_not_contaminate_valid_tail():
    """A padded-bucket decoder run must equal the exact-length run on the
    valid prefix: real piper runs exact-length, so bias garbage activated
    in padded frames must never leak back through 'same'-padded convs."""
    from open_speech_tpu.models.piper.model import (
        PiperConfig,
        generator,
        init_piper_params,
    )

    cfg = PiperConfig(
        hidden=16, ffn_filter=32, n_layers=1, dp_flows=1, flow_layers=1,
        upsample_rates=(4, 4), upsample_kernels=(8, 8),
        upsample_initial=32, max_phonemes=16, max_frames=32,
    )
    params = init_piper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    n_valid = 9
    z_exact = jnp.asarray(
        rng.standard_normal((1, n_valid, cfg.hidden)), jnp.float32
    )
    exact = np.asarray(generator(params, cfg, z_exact, None))

    z_pad = jnp.pad(z_exact, ((0, 0), (0, cfg.max_frames - n_valid), (0, 0)))
    fmask = (
        jnp.arange(cfg.max_frames)[None, :] < n_valid
    ).astype(jnp.float32)[..., None]
    padded = np.asarray(generator(params, cfg, z_pad * fmask, None, fmask))

    spf = cfg.samples_per_frame
    np.testing.assert_allclose(
        padded[:, : n_valid * spf], exact[:, : n_valid * spf], atol=2e-5
    )
