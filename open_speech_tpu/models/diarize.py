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


def _agglomerate(
    embeddings: np.ndarray, threshold: float, s_floor: float = 0.15
) -> np.ndarray:
    """Average-linkage clustering: threshold cut + small-cluster absorption.

    The plain threshold cut leaves speaker-switch windows (which blend two
    voices and resemble each other across switches) as spurious
    mid-distance clusters. On utterance-centered embeddings the structure
    is visible per merge: within-speaker merges sit near 1, boundary-blend
    clusters are SMALL and join a bigger cluster at moderate positive
    similarity, and cross-speaker merges join two SUBSTANTIAL clusters at
    near-zero/negative similarity (centered d-vectors of distinct speakers
    point apart). So merging proceeds while sim >= 1-threshold as usual,
    and past that cut it continues ONLY for absorption merges — a small
    cluster joining a larger one at sim >= s_floor. The threshold keeps
    its meaning for speaker-vs-speaker decisions; the floor only governs
    boundary-blend cleanup. Stops online (no full merge trace).
    Ref bar: pyannote's clustering
    (/root/reference/src/diarization/pyannote_diarizer.py:22).
    """
    n = len(embeddings)
    if n == 1:
        return np.zeros(1, np.int32)
    stop = 1.0 - threshold
    small = max(2, int(0.2 * n))
    clusters: list[list[int]] = [[i] for i in range(n)]
    centroids = [embeddings[i].copy() for i in range(n)]
    while len(clusters) > 1:
        # best pair among ELIGIBLE merges (not the global best pair:
        # two large near-stop clusters must not mask a qualifying
        # small-cluster absorption elsewhere)
        best, bi, bj = -2.0, -1, -1
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
                absorption = (
                    min(len(clusters[i]), len(clusters[j])) <= small
                    and sim >= s_floor
                )
                if (sim >= stop or absorption) and sim > best:
                    best, bi, bj = sim, i, j
        if bi < 0:
            break
        clusters[bi].extend(clusters[bj])
        centroids[bi] = embeddings[clusters[bi]].mean(axis=0)
        del clusters[bj], centroids[bj]
    labels = np.zeros(n, np.int32)
    for idx, members in enumerate(clusters):
        labels[np.asarray(members)] = idx
    return labels


def diarization_error_rate(
    ref: list[dict], hyp: list[dict], step_s: float = 0.01
) -> float:
    """Frame-based DER with optimal speaker mapping, overlap-aware.

    ref/hyp: [{speaker, start, end}] turns; turns of different speakers
    MAY overlap (simultaneous speech — the segmented pipeline emits such
    turns). Per frame with Nref/Nhyp active speakers and Ncorrect matched
    under the best global label mapping (NIST md-eval accounting):
    miss = max(0, Nref-Nhyp), fa = max(0, Nhyp-Nref), confusion =
    min(Nref, Nhyp) - Ncorrect; DER = sum / total ref speaker-time — the
    metric pyannote (the reference's quality bar,
    src/diarization/pyannote_diarizer.py:22) is evaluated with.
    """
    if not ref:
        return 0.0 if not hyp else float("inf")
    end = max(t["end"] for t in ref + hyp)
    n = int(round(end / step_s)) + 1

    def activity_of(turns):
        names = sorted({t["speaker"] for t in turns})
        idx = {s: i for i, s in enumerate(names)}
        act = np.zeros((n, max(len(names), 1)), bool)
        for t in turns:
            a = int(round(t["start"] / step_s))
            b = int(round(t["end"] / step_s))
            act[a:b, idx[t["speaker"]]] = True
        return act, len(names)

    r, nr = activity_of(ref)
    h, nh = activity_of(hyp)
    n_ref = r.sum(axis=1)
    n_hyp = h.sum(axis=1)
    ref_speech = int(n_ref.sum())
    if ref_speech == 0:
        return 0.0
    miss = int(np.maximum(n_ref - n_hyp, 0).sum())
    fa = int(np.maximum(n_hyp - n_ref, 0).sum())
    matched_cap = np.minimum(n_ref, n_hyp)
    # best 1:1 assignment of hyp labels onto ref labels: the objective
    # sum_j overlap(ref[map(j)], hyp[j]) is separable per pair, so the
    # Hungarian algorithm finds the md-eval-optimal mapping in
    # O(max(nr,nh)^3) instead of brute-forcing k! permutations
    from scipy.optimize import linear_sum_assignment

    overlap = (
        r[:, :nr].astype(np.int64).T @ h[:, :nh].astype(np.int64)
    )  # [nr, nh] frames where ref i and hyp j are both active
    rows, cols = linear_sum_assignment(overlap, maximize=True)
    best_correct = int(overlap[rows, cols].sum())
    confusion = int(matched_cap.sum()) - best_correct
    return (miss + fa + confusion) / ref_speech


def turns_from_local_activity(
    starts: list[int],
    active: np.ndarray,  # [n_chunks, T, local_speakers] binary
    keys: list[tuple[int, int]],  # (chunk, local_speaker) with an embedding
    labels: np.ndarray,  # global label per key
    n_samples: int,
    frame_step: int,
    min_on_s: float = 0.25,
    max_gap_s: float = 0.25,
) -> list[dict]:
    """Stitch per-chunk local speaker activity into global speaker turns.

    Overlap-add: chunks vote on shared frames per global speaker (>= half
    the covering chunks must mark the frame active), then per-speaker runs
    become turns — turns of DIFFERENT speakers may overlap (simultaneous
    speech), matching pyannote's output contract. Short gaps are bridged
    and sub-``min_on_s`` blips dropped.
    """
    if not keys:
        return []
    n_frames_total = -(-n_samples // frame_step)
    n_global = int(np.max(labels)) + 1
    votes = np.zeros((n_frames_total, n_global), np.float32)
    cover = np.zeros((n_frames_total, n_global), np.float32)
    t_chunk = active.shape[1]
    for (ci, spk), g in zip(keys, labels):
        f0 = starts[ci] // frame_step
        hi = min(f0 + t_chunk, n_frames_total)
        votes[f0:hi, g] += active[ci, : hi - f0, spk]
        cover[f0:hi, g] += 1.0
    act = votes >= np.maximum(cover, 1.0) / 2.0

    sec = frame_step / SAMPLE_RATE
    min_on = max(1, int(round(min_on_s / sec)))
    max_gap = int(round(max_gap_s / sec))
    raw: list[dict] = []
    for g in range(n_global):
        on = act[:, g]
        runs: list[list[int]] = []
        f = 0
        while f < len(on):
            if on[f]:
                e = f
                while e + 1 < len(on) and on[e + 1]:
                    e += 1
                if runs and f - runs[-1][1] - 1 <= max_gap:
                    runs[-1][1] = e  # bridge the short gap
                else:
                    runs.append([f, e])
                f = e + 1
            else:
                f += 1
        for a, b in runs:
            if b - a + 1 < min_on:
                continue
            raw.append(
                {
                    "_g": g,
                    "start": round(a * sec, 3),
                    "end": round(min((b + 1) * sec, n_samples / SAMPLE_RATE), 3),
                }
            )
    raw.sort(key=lambda t: (t["start"], t["end"]))
    # number speakers by first appearance in time
    first_seen: dict[int, int] = {}
    for t in raw:
        if t["_g"] not in first_seen:
            first_seen[t["_g"]] = len(first_seen)
    return [
        {
            "speaker": f"SPEAKER_{first_seen[t['_g']]:02d}",
            "start": t["start"],
            "end": t["end"],
        }
        for t in raw
    ]


class JaxDiarizer:
    """Windowed embedding diarizer with energy-based speech gating.

    When a PyanNet segmentation checkpoint is available (the model inside
    the reference's pyannote-3.1 pipeline, src/diarization/
    pyannote_diarizer.py:22), diarization runs the full local-segmentation
    -> speaker-embedding -> clustering recipe instead: per-frame speaker
    activity over 10 s chunks gives VAD, speaker-change boundaries, AND
    overlapping speech (the energy-gated path smears overlaps by
    construction).
    """

    def __init__(
        self,
        params=None,
        cfg: DiarizerConfig = DiarizerConfig(),
        threshold: float = 0.35,
        max_speakers: int = 8,
        seg=None,
    ):
        self.cfg = cfg
        self.params = params if params is not None else init_diarizer_params()
        self.threshold = threshold
        self.max_speakers = max_speakers
        # PyanNet segmentation (params, cfg) — explicit, or auto-converted
        # from an on-disk checkpoint
        self.seg = seg
        if self.seg is None:
            from open_speech_tpu.models.segmentation import (
                convert_segmentation,
                find_segmentation_checkpoint,
            )

            ckpt = find_segmentation_checkpoint()
            if ckpt is not None:
                try:
                    self.seg = convert_segmentation(ckpt)
                except Exception:  # noqa: BLE001 — fall back to energy gating
                    import logging

                    logging.getLogger(__name__).exception(
                        "Segmentation checkpoint %s failed to convert", ckpt
                    )
        # trained embedding path, preferred first: WeSpeaker ResNet34 (the
        # model pyannote-3.1 itself embeds with), then GE2E (resemblyzer)
        # d-vectors; the conv fallback keeps the pipeline runnable without
        # any checkpoint
        self.wespeaker = None
        self.ge2e = None
        from open_speech_tpu.models.wespeaker import (
            convert_wespeaker,
            find_wespeaker_checkpoint,
        )

        ws_ckpt = find_wespeaker_checkpoint()
        if ws_ckpt is not None:
            try:
                self.wespeaker = convert_wespeaker(ws_ckpt)
            except Exception:  # noqa: BLE001 — fall through to GE2E/conv
                import logging

                logging.getLogger(__name__).exception(
                    "WeSpeaker checkpoint %s failed to convert", ws_ckpt
                )
        if self.wespeaker is None:
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
        if self.wespeaker is not None:
            from open_speech_tpu.models.wespeaker import (
                kaldi_fbank,
                wespeaker_embed,
            )

            params, _cfg = self.wespeaker
            fb = kaldi_fbank(jnp.asarray(windows))
            return np.asarray(wespeaker_embed(params, fb))
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

    def _diarize_segmented(self, audio: np.ndarray) -> list[dict]:
        """PyanNet path: local activity -> per-(chunk, speaker) embeddings
        -> global clustering -> overlap-aware turns."""
        from open_speech_tpu.models.segmentation import (
            CHUNK_SAMPLES,
            powerset_to_multilabel,
            segment_chunks,
        )

        seg_params, seg_cfg = self.seg
        n = len(audio)
        hop = CHUNK_SAMPLES // 2
        padded = (
            np.pad(audio, (0, CHUNK_SAMPLES - n)) if n < CHUNK_SAMPLES else audio
        )
        starts = list(range(0, max(1, len(padded) - CHUNK_SAMPLES + 1), hop))
        if starts[-1] + CHUNK_SAMPLES < len(padded):  # tail chunk, padded
            starts.append(len(padded) - CHUNK_SAMPLES)
        chunks = np.stack(
            [
                np.pad(padded[s : s + CHUNK_SAMPLES],
                       (0, max(0, s + CHUNK_SAMPLES - len(padded))))
                for s in starts
            ]
        )
        # fixed-size batches: one compiled program regardless of file length
        seg_batch = 8
        logp_parts = []
        for i in range(0, len(chunks), seg_batch):
            part = chunks[i : i + seg_batch]
            fill = np.pad(part, ((0, seg_batch - len(part)), (0, 0)))
            lp = np.asarray(segment_chunks(seg_params, jnp.asarray(fill), seg_cfg))
            logp_parts.append(lp[: len(part)])
        logp = np.concatenate(logp_parts)
        active = powerset_to_multilabel(logp.argmax(-1), seg_cfg)  # [N,T,S]
        # frame stride = product of the conv-stack strides (10 * 3^3 = 270)
        frame_step = seg_cfg.sinc_stride * 27
        # zero activity on frames past the real audio (padded tails)
        for ci, s0 in enumerate(starts):
            real = max(0, min(n - s0, CHUNK_SAMPLES)) // frame_step
            active[ci, real:] = 0.0

        win = int(WINDOW_S * SAMPLE_RATE)
        hop_w = int(HOP_S * SAMPLE_RATE)
        n_wins = 16  # fixed per-(chunk,speaker) window count: static shapes
        win_sets, keys = [], []
        for ci, s0 in enumerate(starts):
            for spk in range(seg_cfg.max_speakers):
                frames = np.where(active[ci, :, spk] > 0)[0]
                if len(frames) * frame_step < 0.4 * SAMPLE_RATE:
                    continue  # <0.4 s of local speech: too little to embed
                picks = [
                    audio[s0 + f * frame_step : s0 + (f + 1) * frame_step]
                    for f in frames
                    if s0 + f * frame_step < n
                ]
                speech = np.concatenate(picks) if picks else np.zeros(0, np.float32)
                if len(speech) < 0.4 * SAMPLE_RATE:
                    continue
                # tile cyclically so exactly n_wins strided windows exist —
                # every (chunk, speaker) embeds with the same array shape
                need = win + (n_wins - 1) * hop_w
                if len(speech) < need:
                    speech = np.tile(speech, -(-need // len(speech)))[:need]
                win_sets.append(
                    np.stack(
                        [speech[o : o + win]
                         for o in range(0, hop_w * n_wins, hop_w)]
                    )
                )
                keys.append((ci, spk))
        if not win_sets:
            return []
        # batched dispatches, rows padded to a power-of-2 bucket capped at
        # 512 so long files reuse a handful of compiled programs AND never
        # allocate unbounded arrays (an hour of audio is ~2000 win_sets;
        # one flat dispatch would be tens of GB of fbank intermediates)
        flat = np.concatenate(win_sets)  # [K*n_wins, win]
        cap = 512
        parts = []
        for i in range(0, len(flat), cap):
            part = flat[i : i + cap]
            rows = min(cap, 1 << (len(part) - 1).bit_length())
            part = np.pad(part, ((0, rows - len(part)), (0, 0)))
            parts.append(self._embed(part)[: min(cap, len(flat) - i)])
        all_emb = np.concatenate(parts)
        emb = all_emb.reshape(len(win_sets), n_wins, -1).mean(axis=1)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-8)
        centered = emb - emb.mean(axis=0, keepdims=True)
        centered /= np.maximum(np.linalg.norm(centered, axis=1, keepdims=True), 1e-8)
        labels = (
            _agglomerate(centered, self.threshold)
            if len(emb) > 1
            else np.zeros(1, np.int32)
        )
        uniq, counts = np.unique(labels, return_counts=True)
        if len(uniq) > self.max_speakers:
            big = uniq[np.argsort(-counts)][: self.max_speakers]
            cents = np.stack([centered[labels == u].mean(axis=0) for u in big])
            cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-8)
            labels = big[np.argmax(centered @ cents.T, axis=1)]
        return turns_from_local_activity(
            starts, active, keys, labels, n, frame_step
        )

    def diarize_audio(self, audio: np.ndarray) -> list[dict]:
        """float32 16 kHz mono -> [{speaker, start, end}] turns.

        Turns may overlap when the segmentation model is active (real
        simultaneous speech); the energy-gated fallback emits
        non-overlapping turns only.
        """
        audio = np.asarray(audio, np.float32).reshape(-1)
        if self.seg is not None and len(audio) > 0:
            return self._diarize_segmented(audio)
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
        # cap speaker count: windows of clusters beyond the max_speakers
        # largest reassign to the nearest surviving centroid (boundary-blend
        # clusters were already absorbed inside _agglomerate)
        uniq, counts = np.unique(labels_active, return_counts=True)
        if len(uniq) > self.max_speakers:
            big = uniq[np.argsort(-counts)][: self.max_speakers]
            cents = np.stack(
                [active[labels_active == u].mean(axis=0) for u in big]
            )
            cents = cents / np.maximum(
                np.linalg.norm(cents, axis=1, keepdims=True), 1e-8
            )
            labels_active = big[np.argmax(active @ cents.T, axis=1)]
        # temporal median: a lone-window label between two agreeing
        # neighbors is a boundary artifact, not a 0.75 s speaker
        for pos in range(1, len(labels_active) - 1):
            if (
                labels_active[pos - 1] == labels_active[pos + 1]
                and labels_active[pos] != labels_active[pos - 1]
            ):
                labels_active[pos] = labels_active[pos - 1]

        # stitch into turns with midpoint attribution: each overlapping
        # window votes for its center hop-segment, so turns are contiguous
        # and boundaries land within one hop of the true change
        margin = (WINDOW_S - HOP_S) / 2
        total_s = len(audio) / SAMPLE_RATE
        relabel = {int(u): i for i, u in enumerate(dict.fromkeys(int(x) for x in labels_active))}
        turns: list[dict] = []
        for pos, wi in enumerate(active_idx):
            speaker = f"SPEAKER_{relabel[int(labels_active[pos])]:02d}"
            w0 = starts[wi] / SAMPLE_RATE
            start = 0.0 if wi == 0 else w0 + margin
            end = total_s if wi == len(starts) - 1 else w0 + WINDOW_S - margin
            if turns and turns[-1]["speaker"] == speaker and start <= turns[-1]["end"] + HOP_S:
                turns[-1]["end"] = max(turns[-1]["end"], end)
            else:
                if turns and start < turns[-1]["end"]:
                    start = turns[-1]["end"]
                turns.append({"speaker": speaker, "start": start, "end": end})
        for t in turns:
            t["start"] = round(t["start"], 3)
            t["end"] = round(t["end"], 3)
        return turns
