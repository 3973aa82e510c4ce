"""JAX speaker diarization: embedding network + clustering.

Replaces the reference's optional pyannote dependency
(src/diarization/pyannote_diarizer.py — torch/CUDA, RuntimeError when
missing) with an on-device pipeline:

  log-mel -> strided conv encoder -> per-window L2-normalized speaker
  embeddings (one jitted program over fixed window buckets) -> VAD-gated
  agglomerative clustering on cosine distance (host, tiny) -> speaker turns.

Random-init embeddings still separate speakers that differ spectrally (the
conv features are discriminative even untrained); converted weights from any
d-vector checkpoint drop into the same pytree.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from open_speech_tpu.ops.mel import log_mel_spectrogram
from open_speech_tpu.ops.vocoder import conv1d

WINDOW_S = 1.5
HOP_S = 0.75
SAMPLE_RATE = 16000
_MEL_FRAMES = int(WINDOW_S * 100)  # 150 mel frames per window


@dataclass(frozen=True)
class DiarizerConfig:
    n_mels: int = 80
    hidden: int = 128
    embed_dim: int = 64
    max_windows: int = 256  # 256 windows = ~3.2 min per batch


def init_diarizer_params(key=None, cfg: DiarizerConfig = DiarizerConfig()):
    key = key if key is not None else jax.random.PRNGKey(23)
    ks = jax.random.split(key, 4)

    def conv(k, width, cin, cout):
        return {
            "w": jax.random.normal(k, (width, cin, cout)) * (width * cin) ** -0.5,
            "b": jnp.zeros((cout,)),
        }

    return {
        "conv1": conv(ks[0], 5, cfg.n_mels, cfg.hidden),
        "conv2": conv(ks[1], 5, cfg.hidden, cfg.hidden),
        "conv3": conv(ks[2], 3, cfg.hidden, cfg.hidden),
        "proj": {
            "w": jax.random.normal(ks[3], (2 * cfg.hidden, cfg.embed_dim))
            * (2 * cfg.hidden) ** -0.5,
            "b": jnp.zeros((cfg.embed_dim,)),
        },
    }


@partial(jax.jit, static_argnames=("cfg",))
def embed_windows(params, cfg: DiarizerConfig, mels):
    """mels [N, n_mels, 150] -> L2-normalized embeddings.

    Output = learned conv-stat projection ++ raw per-band mel statistics
    ([N, embed_dim + 2*n_mels]): the raw spectral signature keeps the
    embedding discriminative even before any training, trained weights
    sharpen it.
    """
    x = mels.transpose(0, 2, 1)  # [N, T, mels]
    raw = jnp.concatenate([x.mean(axis=1), x.std(axis=1)], axis=-1)
    h = jax.nn.relu(conv1d(x, params["conv1"], stride=2))
    h = jax.nn.relu(conv1d(h, params["conv2"], stride=2))
    h = jax.nn.relu(conv1d(h, params["conv3"]))
    stats = jnp.concatenate([h.mean(axis=1), h.std(axis=1)], axis=-1)
    learned = stats @ params["proj"]["w"] + params["proj"]["b"]
    emb = jnp.concatenate([learned, raw], axis=-1)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)


def _agglomerate(embeddings: np.ndarray, threshold: float) -> np.ndarray:
    """Average-linkage clustering on cosine distance; returns labels."""
    n = len(embeddings)
    clusters: list[list[int]] = [[i] for i in range(n)]
    centroids = [embeddings[i].copy() for i in range(n)]
    while len(clusters) > 1:
        best, bi, bj = -1.0, -1, -1
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                sim = float(
                    centroids[i]
                    @ centroids[j]
                    / (
                        np.linalg.norm(centroids[i])
                        * np.linalg.norm(centroids[j])
                        + 1e-9
                    )
                )
                if sim > best:
                    best, bi, bj = sim, i, j
        if best < 1.0 - threshold:
            break
        clusters[bi].extend(clusters[bj])
        centroids[bi] = embeddings[clusters[bi]].mean(axis=0)
        del clusters[bj], centroids[bj]
    labels = np.zeros(n, np.int32)
    for idx, members in enumerate(clusters):
        labels[np.asarray(members)] = idx
    return labels


class JaxDiarizer:
    """Windowed embedding diarizer with energy-based speech gating."""

    def __init__(
        self,
        params=None,
        cfg: DiarizerConfig = DiarizerConfig(),
        threshold: float = 0.35,
        max_speakers: int = 8,
    ):
        self.cfg = cfg
        self.params = params if params is not None else init_diarizer_params()
        self.threshold = threshold
        self.max_speakers = max_speakers
        # trained d-vector path: converted GE2E (resemblyzer) weights give
        # real speaker embeddings; the conv fallback keeps the pipeline
        # runnable without a checkpoint
        self.ge2e = None
        from open_speech_tpu.models.ge2e import (
            convert_ge2e,
            find_ge2e_checkpoint,
        )

        ckpt = find_ge2e_checkpoint()
        if ckpt is not None:
            try:
                self.ge2e = convert_ge2e(ckpt)
            except Exception:  # noqa: BLE001 — fall back to conv embedder
                import logging

                logging.getLogger(__name__).exception(
                    "GE2E checkpoint %s failed to convert", ckpt
                )

    def _embed(self, windows: np.ndarray) -> np.ndarray:
        """[N, win_samples] → [N, E] L2-normalized speaker embeddings."""
        if self.ge2e is not None:
            from open_speech_tpu.models.ge2e import ge2e_embed, ge2e_mel

            params, _cfg = self.ge2e
            # one batched dispatch: per-window eager calls each pay a
            # device roundtrip (hundreds for long audio on a remote TPU)
            mels = jax.vmap(ge2e_mel)(jnp.asarray(windows))
            return np.asarray(ge2e_embed(params, mels))
        mels = np.asarray(
            log_mel_spectrogram(jnp.asarray(windows), n_mels=self.cfg.n_mels)
        )[..., :_MEL_FRAMES]
        return np.asarray(
            embed_windows(self.params, self.cfg, jnp.asarray(mels))
        )

    def diarize_audio(self, audio: np.ndarray) -> list[dict]:
        """float32 16 kHz mono -> [{speaker, start, end}] turns."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        win = int(WINDOW_S * SAMPLE_RATE)
        hop = int(HOP_S * SAMPLE_RATE)
        if len(audio) < win:
            audio = np.pad(audio, (0, win - len(audio)))
        starts = list(range(0, len(audio) - win + 1, hop))[: self.cfg.max_windows]
        if not starts:
            return []

        windows = np.stack([audio[s : s + win] for s in starts])
        rms = np.sqrt((windows**2).mean(axis=1))
        voiced = rms > max(0.005, float(np.median(rms)) * 0.3)
        if not voiced.any():
            return []

        emb = self._embed(windows)
        active_idx = np.where(voiced)[0]
        active = emb[active_idx]
        # center across the utterance so between-speaker variation dominates,
        # then re-normalize (standard d-vector clustering preprocessing)
        active = active - active.mean(axis=0, keepdims=True)
        norms = np.linalg.norm(active, axis=1, keepdims=True)
        active = active / np.maximum(norms, 1e-8)
        labels_active = _agglomerate(active, self.threshold)
        # cap speaker count by merging smallest clusters
        uniq, counts = np.unique(labels_active, return_counts=True)
        if len(uniq) > self.max_speakers:
            keep = set(uniq[np.argsort(-counts)][: self.max_speakers])
            biggest = uniq[np.argmax(counts)]
            labels_active = np.asarray(
                [lab if lab in keep else biggest for lab in labels_active]
            )

        # stitch consecutive same-speaker windows into turns
        turns: list[dict] = []
        for pos, wi in enumerate(active_idx):
            speaker = f"SPEAKER_{int(labels_active[pos]):02d}"
            start = starts[wi] / SAMPLE_RATE
            end = (starts[wi] + win) / SAMPLE_RATE
            if turns and turns[-1]["speaker"] == speaker and start <= turns[-1]["end"] + HOP_S:
                turns[-1]["end"] = end
            else:
                turns.append({"speaker": speaker, "start": start, "end": end})
        for t in turns:
            t["start"] = round(t["start"], 3)
            t["end"] = round(t["end"], 3)
        return turns
