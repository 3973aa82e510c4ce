"""Torch oracle for kokoro parity tests: the KModel inference graph.

Mirrors the hexgrad/kokoro (StyleTTS2-derived) architecture the reference
serves through KPipeline (reference: src/tts/backends/kokoro.py), at a
reduced geometry, with module names matching the checkpoint layout so
``convert_kokoro`` consumes ``state_dict()`` directly. PL-BERT is the real
``transformers`` AlbertModel. Randomness (harmonic initial phases, sine
noise) is injected so JAX and torch see identical draws.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn
from transformers import AlbertConfig, AlbertModel

# tiny-but-complete geometry (shared with tests/test_kokoro_convert.py)
N_SYMBOLS = 30
PL_EMB, PL_HID, PL_HEADS, PL_INTERM, PL_LAYERS, PL_MAXPOS = 16, 32, 4, 64, 2, 64
HID, STY, MAX_DUR = 64, 16, 10
TEXT_K, TEXT_DEPTH, DUR_LAYERS = 5, 2, 2
DEC_MID, ASR_RES = 96, 16
RATES, KERNELS = (2, 2), (4, 4)  # k = 2u like kokoro's (10,6)/(20,12)
RES_K = (3, 5)
NOISE_RES_K = (3, 5)
N_FFT, HOP, HARMONICS = 8, 2, 4
SR = 24_000
UPSAMPLE_TOTAL = 2 * RATES[0] * RATES[1] * HOP  # samples per alignment frame
SINE_AMP, NOISE_STD, VOICED_TH = 0.1, 0.003, 10.0

wn = torch.nn.utils.weight_norm


class LayerNormS(nn.Module):
    """StyleTTS2 channel LayerNorm (gamma/beta names)."""

    def __init__(self, c):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(c))
        self.beta = nn.Parameter(torch.zeros(c))
        self.c = c

    def forward(self, x):  # [B, C, T]
        x = x.transpose(1, -1)
        x = F.layer_norm(x, (self.c,), self.gamma, self.beta, 1e-5)
        return x.transpose(1, -1)


class TextEncoderS(nn.Module):
    def __init__(self):
        super().__init__()
        self.embedding = nn.Embedding(N_SYMBOLS, HID)
        self.cnn = nn.ModuleList(
            [
                nn.Sequential(
                    wn(nn.Conv1d(HID, HID, TEXT_K, padding=TEXT_K // 2)),
                    LayerNormS(HID),
                    nn.LeakyReLU(0.2),
                )
                for _ in range(TEXT_DEPTH)
            ]
        )
        self.lstm = nn.LSTM(HID, HID // 2, 1, batch_first=True, bidirectional=True)

    def forward(self, tokens, pad_mask):  # pad_mask True at padding
        x = self.embedding(tokens).transpose(1, 2)
        x = x.masked_fill(pad_mask.unsqueeze(1), 0.0)
        for c in self.cnn:
            x = c(x)
            x = x.masked_fill(pad_mask.unsqueeze(1), 0.0)
        x, _ = self.lstm(x.transpose(1, 2))
        return x.masked_fill(pad_mask.unsqueeze(-1), 0.0)  # [B, T, HID]


class AdaLayerNormS(nn.Module):
    def __init__(self, sty, c):
        super().__init__()
        self.fc = nn.Linear(sty, 2 * c)
        self.c = c

    def forward(self, x, s):  # x [B, T, C]
        h = self.fc(s)
        gamma, beta = h.chunk(2, dim=-1)
        x = F.layer_norm(x, (self.c,), eps=1e-5)
        return (1 + gamma.unsqueeze(1)) * x + beta.unsqueeze(1)


class AdaIN1dS(nn.Module):
    def __init__(self, sty, c):
        super().__init__()
        self.norm = nn.InstanceNorm1d(c, affine=False)
        self.fc = nn.Linear(sty, 2 * c)

    def forward(self, x, s):  # x [B, C, T]
        h = self.fc(s).unsqueeze(-1)
        gamma, beta = h.chunk(2, dim=1)
        return (1 + gamma) * self.norm(x) + beta


class AdainResBlk1dS(nn.Module):
    def __init__(self, cin, cout, upsample=False):
        super().__init__()
        self.upsample_type = "double" if upsample else "none"
        self.conv1 = wn(nn.Conv1d(cin, cout, 3, padding=1))
        self.conv2 = wn(nn.Conv1d(cout, cout, 3, padding=1))
        self.norm1 = AdaIN1dS(STY, cin)
        self.norm2 = AdaIN1dS(STY, cout)
        if upsample:
            self.pool = wn(
                nn.ConvTranspose1d(
                    cin, cin, 3, stride=2, groups=cin, padding=1, output_padding=1
                )
            )
            self.upsample_layer = nn.Upsample(scale_factor=2, mode="nearest")
        if cin != cout:
            self.conv1x1 = wn(nn.Conv1d(cin, cout, 1, bias=False))

    def forward(self, x, s):
        sc = x
        if self.upsample_type != "none":
            sc = self.upsample_layer(sc)
        if hasattr(self, "conv1x1"):
            sc = self.conv1x1(sc)
        h = self.norm1(x, s)
        h = F.leaky_relu(h, 0.2)
        if self.upsample_type != "none":
            h = self.pool(h)
        h = self.conv1(h)
        h = self.norm2(h, s)
        h = F.leaky_relu(h, 0.2)
        h = self.conv2(h)
        return (h + sc) / math.sqrt(2.0)


class DurationEncoderS(nn.Module):
    def __init__(self):
        super().__init__()
        layers = []
        for _ in range(DUR_LAYERS):
            layers.append(
                nn.LSTM(HID + STY, HID // 2, 1, batch_first=True, bidirectional=True)
            )
            layers.append(AdaLayerNormS(STY, HID))
        self.lstms = nn.ModuleList(layers)

    def forward(self, d_en, style, pad_mask):  # d_en [B, HID, T]
        t = d_en.shape[-1]
        s_seq = style.unsqueeze(1).expand(-1, t, -1)  # [B, T, STY]
        x = torch.cat([d_en.transpose(1, 2), s_seq], dim=-1)
        x = x.masked_fill(pad_mask.unsqueeze(-1), 0.0)
        for block in self.lstms:
            if isinstance(block, AdaLayerNormS):
                x = block(x, style)
                x = torch.cat([x, s_seq], dim=-1)
                x = x.masked_fill(pad_mask.unsqueeze(-1), 0.0)
            else:
                x, _ = block(x)
        return x  # [B, T, HID+STY]


class ProsodyPredictorS(nn.Module):
    def __init__(self):
        super().__init__()
        self.text_encoder = DurationEncoderS()
        self.lstm = nn.LSTM(
            HID + STY, HID // 2, 1, batch_first=True, bidirectional=True
        )
        self.duration_proj = nn.Module()
        self.duration_proj.linear_layer = nn.Linear(HID, MAX_DUR)
        self.shared = nn.LSTM(
            HID + STY, HID // 2, 1, batch_first=True, bidirectional=True
        )
        self.F0 = nn.ModuleList(
            [
                AdainResBlk1dS(HID, HID),
                AdainResBlk1dS(HID, HID // 2, upsample=True),
                AdainResBlk1dS(HID // 2, HID // 2),
            ]
        )
        self.F0_proj = nn.Conv1d(HID // 2, 1, 1)
        self.N = nn.ModuleList(
            [
                AdainResBlk1dS(HID, HID),
                AdainResBlk1dS(HID, HID // 2, upsample=True),
                AdainResBlk1dS(HID // 2, HID // 2),
            ]
        )
        self.N_proj = nn.Conv1d(HID // 2, 1, 1)

    def f0n_train(self, en, s):  # en [B, HID+STY, F]
        x, _ = self.shared(en.transpose(1, 2))
        f0 = x.transpose(1, 2)
        for block in self.F0:
            f0 = block(f0, s)
        f0 = self.F0_proj(f0)
        n = x.transpose(1, 2)
        for block in self.N:
            n = block(n, s)
        n = self.N_proj(n)
        return f0.squeeze(1), n.squeeze(1)


class SineGenS(nn.Module):
    def forward(self, f0, rand_phase, sine_noise):
        """f0 [B, S, 1]; rand_phase [B, H+1]; sine_noise [B, S, H+1]."""
        nh = HARMONICS + 1
        fn = f0 * torch.arange(1, nh + 1, dtype=f0.dtype)[None, None, :]
        rad = (fn / SR) % 1.0
        rad = rad.clone()
        rad[:, 0, :] = rad[:, 0, :] + rand_phase
        rad_d = F.interpolate(
            rad.transpose(1, 2), scale_factor=1 / UPSAMPLE_TOTAL, mode="linear"
        ).transpose(1, 2)
        phase = torch.cumsum(rad_d, dim=1) * 2 * math.pi
        phase = F.interpolate(
            phase.transpose(1, 2) * UPSAMPLE_TOTAL,
            scale_factor=UPSAMPLE_TOTAL,
            mode="linear",
        ).transpose(1, 2)
        sines = torch.sin(phase)
        uv = (f0 > VOICED_TH).float()
        sine_waves = sines * SINE_AMP
        noise_amp = uv * NOISE_STD + (1 - uv) * SINE_AMP / 3
        return sine_waves * uv + noise_amp * sine_noise


class SourceModuleHnNSFS(nn.Module):
    def __init__(self):
        super().__init__()
        self.l_sin_gen = SineGenS()
        self.l_linear = nn.Linear(HARMONICS + 1, 1)

    def forward(self, f0, rand_phase, sine_noise):
        sine_wavs = self.l_sin_gen(f0, rand_phase, sine_noise)
        return torch.tanh(self.l_linear(sine_wavs))  # [B, S, 1]


class AdaINResBlock1S(nn.Module):
    def __init__(self, c, k, dilations=(1, 3, 5)):
        super().__init__()
        self.convs1 = nn.ModuleList(
            [
                wn(nn.Conv1d(c, c, k, dilation=d, padding=(k * d - d) // 2))
                for d in dilations
            ]
        )
        self.convs2 = nn.ModuleList(
            [wn(nn.Conv1d(c, c, k, padding=(k - 1) // 2)) for _ in dilations]
        )
        self.adain1 = nn.ModuleList([AdaIN1dS(STY, c) for _ in dilations])
        self.adain2 = nn.ModuleList([AdaIN1dS(STY, c) for _ in dilations])
        self.alpha1 = nn.ParameterList(
            [nn.Parameter(torch.ones(1, c, 1)) for _ in dilations]
        )
        self.alpha2 = nn.ParameterList(
            [nn.Parameter(torch.ones(1, c, 1)) for _ in dilations]
        )

    def forward(self, x, s):
        for c1, c2, n1, n2, a1, a2 in zip(
            self.convs1, self.convs2, self.adain1, self.adain2,
            self.alpha1, self.alpha2,
        ):
            xt = n1(x, s)
            xt = xt + (1 / a1) * torch.sin(a1 * xt) ** 2
            xt = c1(xt)
            xt = n2(xt, s)
            xt = xt + (1 / a2) * torch.sin(a2 * xt) ** 2
            xt = c2(xt)
            x = xt + x
        return x


class TorchSTFTS(nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer("window", torch.hann_window(N_FFT), persistent=False)

    def transform(self, x):
        spec = torch.stft(
            x, N_FFT, HOP, N_FFT, window=self.window, return_complex=True
        )
        return torch.abs(spec), torch.angle(spec)

    def inverse(self, mag, phase):
        return torch.istft(
            mag * torch.exp(1j * phase), N_FFT, HOP, N_FFT, window=self.window
        )


class GeneratorS(nn.Module):
    def __init__(self):
        super().__init__()
        self.m_source = SourceModuleHnNSFS()
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        self.noise_convs = nn.ModuleList()
        self.noise_res = nn.ModuleList()
        ch = HID
        for i, (u, k) in enumerate(zip(RATES, KERNELS)):
            cout = ch // 2
            self.ups.append(
                wn(nn.ConvTranspose1d(ch, cout, k, stride=u, padding=(k - u) // 2))
            )
            for rk in RES_K:
                self.resblocks.append(AdaINResBlock1S(cout, rk))
            if i + 1 < len(RATES):
                stride_f0 = int(np.prod(RATES[i + 1 :]))
                self.noise_convs.append(
                    nn.Conv1d(
                        N_FFT + 2, cout, 2 * stride_f0,
                        stride=stride_f0, padding=stride_f0 // 2,
                    )
                )
            else:
                self.noise_convs.append(nn.Conv1d(N_FFT + 2, cout, 1))
            self.noise_res.append(AdaINResBlock1S(cout, NOISE_RES_K[i]))
            ch = cout
        self.conv_post = wn(nn.Conv1d(ch, N_FFT + 2, 7, padding=3))
        self.reflection_pad = nn.ReflectionPad1d((1, 0))
        self.stft = TorchSTFTS()

    def forward(self, x, s, f0_curve, rand_phase, sine_noise):
        f0 = F.interpolate(
            f0_curve[:, None], scale_factor=UPSAMPLE_TOTAL // 2, mode="nearest"
        ).transpose(1, 2)  # [B, S, 1]
        har_source = self.m_source(f0, rand_phase, sine_noise)  # [B, S, 1]
        har_source = har_source.transpose(1, 2).squeeze(1)
        har_spec, har_phase = self.stft.transform(har_source)
        har = torch.cat([har_spec, har_phase], dim=1)
        nk = len(RES_K)
        for i in range(len(RATES)):
            x = F.leaky_relu(x, 0.1)
            x_source = self.noise_convs[i](har)
            x_source = self.noise_res[i](x_source, s)
            x = self.ups[i](x)
            if i == len(RATES) - 1:
                x = self.reflection_pad(x)
            x = x + x_source[:, :, : x.shape[-1]]
            xs = None
            for j in range(nk):
                r = self.resblocks[i * nk + j](x, s)
                xs = r if xs is None else xs + r
            x = xs / nk
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        spec = torch.exp(x[:, : N_FFT // 2 + 1])
        phase = torch.sin(x[:, N_FFT // 2 + 1 :])
        return self.stft.inverse(spec, phase)


class DecoderS(nn.Module):
    def __init__(self):
        super().__init__()
        self.encode = AdainResBlk1dS(HID + 2, DEC_MID)
        self.decode = nn.ModuleList(
            [
                AdainResBlk1dS(DEC_MID + ASR_RES + 2, DEC_MID),
                AdainResBlk1dS(DEC_MID + ASR_RES + 2, DEC_MID),
                AdainResBlk1dS(DEC_MID + ASR_RES + 2, HID, upsample=True),
            ]
        )
        self.F0_conv = wn(nn.Conv1d(1, 1, 3, stride=2, padding=1))
        self.N_conv = wn(nn.Conv1d(1, 1, 3, stride=2, padding=1))
        self.asr_res = nn.Sequential(wn(nn.Conv1d(HID, ASR_RES, 1)))
        self.generator = GeneratorS()

    def forward(self, asr, f0_curve, n_curve, s, rand_phase, sine_noise):
        f0 = self.F0_conv(f0_curve.unsqueeze(1))
        n = self.N_conv(n_curve.unsqueeze(1))
        x = torch.cat([asr, f0, n], dim=1)
        x = self.encode(x, s)
        asr_res = self.asr_res(asr)
        res = True
        for block in self.decode:
            if res:
                x = torch.cat([x, asr_res, f0, n], dim=1)
            x = block(x, s)
            if block.upsample_type != "none":
                res = False
        return self.generator(x, s, f0_curve, rand_phase, sine_noise)


class KModelS(nn.Module):
    """The kokoro KModel graph (reduced geometry), exact-length inference."""

    def __init__(self):
        super().__init__()
        self.bert = AlbertModel(
            AlbertConfig(
                vocab_size=N_SYMBOLS,
                embedding_size=PL_EMB,
                hidden_size=PL_HID,
                num_attention_heads=PL_HEADS,
                intermediate_size=PL_INTERM,
                num_hidden_layers=PL_LAYERS,
                max_position_embeddings=PL_MAXPOS,
                hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0,
            ),
            add_pooling_layer=False,
        )
        self.bert_encoder = nn.Linear(PL_HID, HID)
        self.predictor = ProsodyPredictorS()
        self.text_encoder = TextEncoderS()
        self.decoder = DecoderS()

    def nested_state_dict(self):
        """Checkpoint layout: {module: state_dict} with numpy values."""
        out = {}
        for mod in ("bert", "bert_encoder", "predictor", "text_encoder", "decoder"):
            sub = getattr(self, mod)
            out[mod] = {k: v.detach().numpy() for k, v in sub.state_dict().items()}
        return out

    @torch.no_grad()
    def forward_exact(self, tokens, ref_s, speed, rand_phase, sine_noise):
        """tokens [1, T] (exact length), ref_s [1, 2*STY]."""
        t = tokens.shape[1]
        pad_mask = torch.zeros(1, t, dtype=torch.bool)
        attn = torch.ones(1, t, dtype=torch.long)
        bert_dur = self.bert(tokens, attention_mask=attn).last_hidden_state
        d_en = self.bert_encoder(bert_dur).transpose(-1, -2)  # [1, HID, T]
        s_pred = ref_s[:, STY:]
        s_dec = ref_s[:, :STY]
        d = self.predictor.text_encoder(d_en, s_pred, pad_mask)
        x, _ = self.predictor.lstm(d)
        duration = self.predictor.duration_proj.linear_layer(x)
        duration = torch.sigmoid(duration).sum(dim=-1) / speed
        pred_dur = torch.round(duration).clamp(min=1).long()[0]
        total = int(pred_dur.sum())
        indices = torch.repeat_interleave(torch.arange(t), pred_dur)
        aln = torch.zeros(t, total)
        aln[indices, torch.arange(total)] = 1
        en = d.transpose(-1, -2) @ aln  # [1, HID+STY, F]
        f0, n = self.predictor.f0n_train(en, s_pred)
        t_en = self.text_encoder(tokens, pad_mask)  # [1, T, HID]
        asr = t_en.transpose(1, 2) @ aln  # [1, HID, F]
        audio = self.decoder(asr, f0, n, s_dec, rand_phase, sine_noise)
        return audio, total, pred_dur, f0, n
