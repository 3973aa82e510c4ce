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
    emb = np.asarray(embeddings, np.float64)
    members: list[list[int]] = [[i] for i in range(n)]
    sizes = np.ones(n, np.int64)
    alive = np.ones(n, bool)
    norm = lambda c: c / (np.linalg.norm(c) + 1e-9)  # noqa: E731
    cn = np.stack([norm(emb[i]) for i in range(n)])
    # cached pairwise centroid similarity, refreshed only for merged rows:
    # vectorized O(n²) per merge instead of Python-loop O(n²) dots per merge
    sim = cn @ cn.T
    np.fill_diagonal(sim, -2.0)
    while alive.sum() > 1:
        # best pair among ELIGIBLE merges (not the global best pair:
        # two large near-stop clusters must not mask a qualifying
        # small-cluster absorption elsewhere)
        pair_small = np.minimum(sizes[:, None], sizes[None, :]) <= small
        elig = (sim >= stop) | (pair_small & (sim >= s_floor))
        elig &= alive[:, None] & alive[None, :]
        if not elig.any():
            break
        masked = np.where(elig, sim, -2.0)
        bi, bj = np.unravel_index(int(np.argmax(masked)), masked.shape)
        members[bi].extend(members[bj])
        sizes[bi] += sizes[bj]
        alive[bj] = False
        cn[bi] = norm(emb[members[bi]].mean(axis=0))
        row = cn @ cn[bi]
        sim[bi, :] = row
        sim[:, bi] = row
        sim[bi, bi] = -2.0
        sim[bj, :] = -2.0
        sim[:, bj] = -2.0
    labels = np.zeros(n, np.int32)
    for idx, ci in enumerate(np.where(alive)[0]):
        labels[np.asarray(members[ci])] = idx
    return labels


def _center_normalize(emb: np.ndarray) -> np.ndarray:
    """Clustering preprocessing: mean-center (so between-speaker variation
    dominates) then L2-normalize — but center only with enough rows. With
    K=2 embeddings, centering makes them exactly antipodal (cosine −1), so
    single-speaker audio would deterministically split into two speakers;
    small K in general drives same-speaker cosines negative (centered rows
    sum to zero)."""
    if len(emb) >= 8:
        emb = emb - emb.mean(axis=0, keepdims=True)
    return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-8)


def _cap_speakers(
    labels: np.ndarray, emb: np.ndarray, max_speakers: int
) -> np.ndarray:
    """Cap cluster count: rows of clusters beyond the ``max_speakers``
    largest reassign to the nearest surviving centroid."""
    uniq, counts = np.unique(labels, return_counts=True)
    if len(uniq) <= max_speakers:
        return labels
    big = uniq[np.argsort(-counts)][:max_speakers]
    cents = np.stack([emb[labels == u].mean(axis=0) for u in big])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-8)
    return big[np.argmax(emb @ cents.T, axis=1)]


def _assignment_max(score: np.ndarray) -> int:
    """Exact max-sum 1:1 assignment (Hungarian, O(n³)) — scipy-free
    fallback so diarization_error_rate works in production installs
    (scipy is a dev-only extra)."""
    r, c = score.shape
    n = max(r, c)
    cost = np.zeros((n, n))
    cost[:r, :c] = -score  # minimize
    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (n + 1)
    p = [0] * (n + 1)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, n + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    total = 0
    for j in range(1, n + 1):
        if p[j] and p[j] - 1 < r and j - 1 < c:
            total += int(score[p[j] - 1, j - 1])
    return total


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
    overlap = (
        r[:, :nr].astype(np.int64).T @ h[:, :nh].astype(np.int64)
    )  # [nr, nh] frames where ref i and hyp j are both active
    try:
        from scipy.optimize import linear_sum_assignment

        rows, cols = linear_sum_assignment(overlap, maximize=True)
        best_correct = int(overlap[rows, cols].sum())
    except ImportError:  # scipy is a dev extra; production uses our own
        best_correct = _assignment_max(overlap)
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

        def _try_convert(find_fn, convert_fn, name):
            """Find + convert an on-disk checkpoint; any failure logs and
            falls back (diarization must stay runnable checkpoint-less)."""
            ckpt = find_fn()
            if ckpt is None:
                return None
            try:
                return convert_fn(ckpt)
            except Exception:  # noqa: BLE001
                import logging

                logging.getLogger(__name__).exception(
                    "%s checkpoint %s failed to convert", name, ckpt
                )
                return None

        if self.seg is None:
            from open_speech_tpu.models.segmentation import (
                convert_segmentation,
                find_segmentation_checkpoint,
            )

            self.seg = _try_convert(
                find_segmentation_checkpoint, convert_segmentation,
                "Segmentation",
            )
        # trained embedding path, preferred first: WeSpeaker ResNet34 (the
        # model pyannote-3.1 itself embeds with), then GE2E (resemblyzer)
        # d-vectors; the conv fallback keeps the pipeline runnable without
        # any checkpoint
        from open_speech_tpu.models.wespeaker import (
            convert_wespeaker,
            find_wespeaker_checkpoint,
        )

        self.wespeaker = _try_convert(
            find_wespeaker_checkpoint, convert_wespeaker, "WeSpeaker"
        )
        self.ge2e = None
        if self.wespeaker is None:
            from open_speech_tpu.models.ge2e import (
                convert_ge2e,
                find_ge2e_checkpoint,
            )

            self.ge2e = _try_convert(
                find_ge2e_checkpoint, convert_ge2e, "GE2E"
            )

    def _embed_bucketed(self, flat: np.ndarray) -> np.ndarray:
        """Batched embed dispatches, rows padded to a power-of-2 bucket
        capped at 512: long files reuse a handful of compiled programs AND
        never allocate unbounded arrays (an hour of audio is ~2000 window
        sets; one flat dispatch would be tens of GB of fbank
        intermediates)."""
        cap = 512
        parts = []
        for i in range(0, len(flat), cap):
            part = flat[i : i + cap]
            rows = min(cap, 1 << (len(part) - 1).bit_length())
            part = np.pad(part, ((0, rows - len(part)), (0, 0)))
            parts.append(self._embed(part)[: min(cap, len(flat) - i)])
        return np.concatenate(parts)

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
        all_emb = self._embed_bucketed(np.concatenate(win_sets))
        emb = all_emb.reshape(len(win_sets), n_wins, -1).mean(axis=1)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-8)
        centered = _center_normalize(emb)
        labels = (
            _agglomerate(centered, self.threshold)
            if len(emb) > 1
            else np.zeros(1, np.int32)
        )
        labels = _cap_speakers(labels, centered, self.max_speakers)
        # compact to consecutive ints: turns_from_local_activity sizes its
        # vote arrays by max(labels)+1, and capped labels keep original
        # (possibly large, sparse) cluster ids
        labels = np.unique(labels, return_inverse=True)[1]
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
        # NO window-count truncation: the whole file is analyzed (embedding
        # runs in bucketed batches), so the final turn's end never gets
        # stretched over unexamined audio
        starts = list(range(0, len(audio) - win + 1, hop))
        if not starts:
            return []

        windows = np.stack([audio[s : s + win] for s in starts])
        rms = np.sqrt((windows**2).mean(axis=1))
        voiced = rms > max(0.005, float(np.median(rms)) * 0.3)
        if not voiced.any():
            return []

        active_idx = np.where(voiced)[0]
        # embed ONLY voiced windows, padded to shape buckets: unvoiced rows
        # are never used, and raw counts would compile one XLA program per
        # distinct clip length
        active = self._embed_bucketed(windows[active_idx])
        active = _center_normalize(active)
        labels_active = _agglomerate(active, self.threshold)
        # cap speaker count: windows of clusters beyond the max_speakers
        # largest reassign to the nearest surviving centroid (boundary-blend
        # clusters were already absorbed inside _agglomerate)
        labels_active = _cap_speakers(labels_active, active, self.max_speakers)
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
