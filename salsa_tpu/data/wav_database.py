"""Raw-waveform split loading for fused (no-offline-features) training.

SURVEY §7: the reference's workflow is wav -> offline extraction CLI -> HDF5
feature store -> training (salsa_feature_extraction.py:265-391 feeding
database.py:121-173). The TPU-native workflow collapses that: `load_wav_split`
reads the split's raw audio once, builds the SAME chunk/label tables as
`SeldDatabase.load_split` (so shuffle order, steps/epoch and loss traces are
identical between the two paths), and the trainer keeps the waveforms
device-resident, extracting each chunk's features inside the jitted train step
(features/chunked.py). The scaler and the validation features are computed
on-device at startup (`fit_scaler_from_waves`, `extract_split_to_store`) — no
HDF5 is ever written or read.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from salsa_tpu.data.database import (
    SplitData,
    chunk_starts,
    classwise_targets,
    parse_gt_csv,
)
from salsa_tpu.data.feature_store import StreamingScaler
from salsa_tpu.data.meta import split_filenames
from salsa_tpu.features.chunked import n_full_frames, pad_waveform
from salsa_tpu.utils.audio_io import read_wav


class MemoryFeatureStore:
    """FeatureStore-compatible in-memory store (read side only), letting
    SeldDatabase.load_split build a standard SplitData from features that were
    extracted on-device at startup instead of read from HDF5."""

    def __init__(self, clips: dict[str, np.ndarray],
                 scaler: tuple[np.ndarray, np.ndarray]):
        self._clips = clips
        self._scaler = scaler
        self.scaler_path = "<memory>"

    def clip_path(self, split_kind: str, clip_name: str) -> str:
        return f"<memory>/{split_kind}/{clip_name}"

    def read_clip(self, split_kind: str, clip_name: str) -> np.ndarray:
        return self._clips[clip_name]

    def read_scaler(self) -> tuple[np.ndarray, np.ndarray]:
        return self._scaler


@dataclass
class WavSplitData(SplitData):
    """Train split held as raw waveforms. Inherits every chunk/label table from
    SplitData (identical construction order => identical shuffle behavior);
    `features` is a placeholder recording (n_channels, 0, n_features).

    waves: (n_clips, n_ch, S_pad_max) center-padded waveforms, zero tail past each
    clip's true length; int16 (wav-native, half the memory) or float32.
    """

    waves: np.ndarray | None = None
    wav_scale: float = 1.0                 # dequantization factor (1/32768 for int16)
    wav_pad: int = 0                       # center-pad samples per side
    clip_of_chunk: np.ndarray | None = None      # chunk -> clip index
    within_clip_start: np.ndarray | None = None  # chunk -> clip-local frame start
    clip_full_frames: np.ndarray | None = None   # untrimmed STFT frames (wrap modulus)
    clip_trimmed_frames: np.ndarray | None = None  # frames used for chunking/labels
    clip_wavs: list[np.ndarray] = field(default_factory=list)  # per-clip float, unpadded


def load_clip_waves(names: list[str], audio_dir: str, fs: int) -> list[np.ndarray]:
    """Read (and if needed resample to fs) each clip's multichannel float waveform."""
    waves = []
    for name in names:
        audio, _ = read_wav(os.path.join(audio_dir, name + ".wav"), target_fs=fs)
        waves.append(audio)
    return waves


def load_wav_split(
    db,
    split: str,
    audio_dir: str,
    split_meta_dir: str | None = None,
    wav_dtype: str = "float32",
    n_channels: int = 7,
    n_features: int = 200,
    pad: int | None = None,
) -> WavSplitData:
    """Build a train-stage WavSplitData whose chunk/label tables exactly match
    db.load_split(split, stage='fit') — db is a SeldDatabase carrying the
    chunking geometry (fs, hop, chunk lengths, label rate, n_classes). `pad`
    is the center-pad per side (chunked.required_pad; default n_fft//2)."""
    names = split_filenames(split, split_meta_dir)
    chunk_len, chunk_hop = db.train_chunk_len, db.train_chunk_hop
    label_chunk_len = chunk_len // db.label_upsample

    clip_wavs = load_clip_waves(names, audio_dir, db.fs)
    n_fft = getattr(db, "n_fft", 512)
    if pad is None:
        pad = n_fft // 2

    seds, doas, names_per_chunk = [], [], []
    f_starts, l_starts = [], []
    clip_of_chunk, within_clip_start = [], []
    clip_chunk_counts, clip_label_frames = [], []
    clip_full, clip_trimmed = [], []
    f_ptr = l_ptr = 0
    chunks_per_clip = 0
    for clip_idx, (name, wav) in enumerate(zip(names, clip_wavs)):
        n_feat_frames = n_full_frames(wav.shape[1], db.hop_len)
        n_frames = min(n_feat_frames, db.max_label_frames * db.label_upsample)
        n_frames -= n_frames % db.label_upsample
        n_label_frames = n_frames // db.label_upsample
        true_label_frames = n_label_frames
        clip_full.append(n_feat_frames)
        clip_trimmed.append(n_frames)

        gt_path = db.gt_meta_path(split, name)
        if gt_path and os.path.isfile(gt_path):
            sed, doa = classwise_targets(
                parse_gt_csv(gt_path), n_label_frames, db.n_classes)
        else:
            sed = np.zeros((n_label_frames, db.n_classes), dtype=np.float32)
            doa = np.zeros((n_label_frames, 3 * db.n_classes), dtype=np.float32)

        if n_frames < chunk_len:  # short clip: single zero-padded chunk
            pad_l = label_chunk_len - n_label_frames
            sed = np.pad(sed, ((0, pad_l), (0, 0)))
            doa = np.pad(doa, ((0, pad_l), (0, 0)))
            n_frames, n_label_frames = chunk_len, label_chunk_len

        starts_f = chunk_starts(n_frames, chunk_len, chunk_hop, f_ptr)
        starts_l = chunk_starts(
            n_label_frames, label_chunk_len, chunk_hop // db.label_upsample, l_ptr)
        assert len(starts_f) == len(starts_l)
        clip_of_chunk.extend([clip_idx] * len(starts_f))
        within_clip_start.extend(s - f_ptr for s in starts_f)
        f_ptr += n_frames
        l_ptr += n_label_frames
        chunks_per_clip = max(chunks_per_clip, len(starts_f))
        clip_chunk_counts.append(len(starts_f))
        clip_label_frames.append(true_label_frames)
        seds.append(sed)
        doas.append(doa)
        f_starts.extend(starts_f)
        l_starts.extend(starts_l)
        names_per_chunk.extend([name] * len(starts_f))

    # resident tensor: center-pad each clip, zero-pad to the longest
    padded = [pad_waveform(w, n_fft, pad) for w in clip_wavs]
    s_max = max(p.shape[1] for p in padded)
    n_ch = padded[0].shape[0]
    if wav_dtype == "int16":
        waves = np.zeros((len(names), n_ch, s_max), dtype=np.int16)
        for i, p in enumerate(padded):
            waves[i, :, : p.shape[1]] = np.clip(
                np.round(p * 32768.0), -32768, 32767).astype(np.int16)
        wav_scale = 1.0 / 32768.0
    else:
        waves = np.zeros((len(names), n_ch, s_max), dtype=np.float32)
        for i, p in enumerate(padded):
            waves[i, :, : p.shape[1]] = p
        wav_scale = 1.0

    return WavSplitData(
        features=np.zeros((n_channels, 0, n_features), dtype=np.float32),
        sed_targets=np.concatenate(seds, axis=0),
        doa_targets=np.concatenate(doas, axis=0),
        feature_chunk_starts=np.asarray(f_starts, dtype=np.int64),
        label_chunk_starts=np.asarray(l_starts, dtype=np.int64),
        clip_names=names_per_chunk,
        feature_chunk_len=chunk_len,
        feature_chunk_hop=chunk_hop,
        label_chunk_len=label_chunk_len,
        label_chunk_hop=max(1, chunk_hop // db.label_upsample),
        chunks_per_clip=chunks_per_clip,
        unique_clip_names=list(names),
        clip_chunk_counts=np.asarray(clip_chunk_counts, dtype=np.int64),
        clip_label_frames=np.asarray(clip_label_frames, dtype=np.int64),
        waves=waves,
        wav_scale=wav_scale,
        wav_pad=pad,
        clip_of_chunk=np.asarray(clip_of_chunk, dtype=np.int32),
        within_clip_start=np.asarray(within_clip_start, dtype=np.int32),
        clip_full_frames=np.asarray(clip_full, dtype=np.int32),
        clip_trimmed_frames=np.asarray(clip_trimmed, dtype=np.int32),
        clip_wavs=clip_wavs,
    )


def _length_groups(items: list, length_of) -> list[list[int]]:
    """Indices grouped by equal length, preserving order within groups."""
    groups: dict[int, list[int]] = {}
    for i, it in enumerate(items):
        groups.setdefault(length_of(it), []).append(i)
    return list(groups.values())


def fit_scaler_from_waves(extractor, clip_wavs: list[np.ndarray],
                          n_spec_channels: int,
                          batch_size: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Device-extract each train clip once and fit the normalization scaler —
    the reference's compute_scaler (salsa_feature_extraction.py:204-262) without
    the HDF5 round trip. Clips are BATCHED per dispatch (the remote-dispatch
    harness charges seconds per call, so per-clip calls would dominate startup);
    per-batch (C, F) sum/sumsq reduce on device and only those tiny arrays
    cross the host boundary."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def batch_stats(waves):  # (B, n_ch, S)
        feats = jax.vmap(extractor.fn)(waves)[:, :n_spec_channels]
        return (jnp.sum(feats, axis=(0, 2)),
                jnp.sum(feats.astype(jnp.float32) ** 2, axis=(0, 2)))

    scaler = StreamingScaler(n_spec_channels)
    hop = _extractor_hop(extractor)
    for group in _length_groups(clip_wavs, lambda w: w.shape[1]):
        for start in range(0, len(group), batch_size):
            idx = group[start : start + batch_size]
            stacked = jnp.asarray(np.stack([clip_wavs[i] for i in idx]))
            s, ss = batch_stats(stacked)
            n_frames = 1 + clip_wavs[idx[0]].shape[1] // hop
            scaler.count += n_frames * len(idx)
            s = np.asarray(s, dtype=np.float64)
            ss = np.asarray(ss, dtype=np.float64)
            if scaler._sum is None:
                scaler._sum, scaler._sumsq = s, ss
            else:
                scaler._sum += s
                scaler._sumsq += ss
    return scaler.finalize()


def _extractor_hop(extractor) -> int:
    """Hop length out of a FeatureExtractor's partial-bound fn."""
    fn = extractor.fn
    wrapped = getattr(fn, "__wrapped__", fn)
    kw = getattr(wrapped, "keywords", None) or {}
    if "hop_length" in kw:
        return kw["hop_length"]
    p = kw.get("params")
    if p is not None:
        return p.hop_length
    raise ValueError("cannot determine extractor hop length")


def extract_split_to_store(extractor, names: list[str], audio_dir: str, fs: int,
                           scaler, batch_size: int = 8) -> MemoryFeatureStore:
    """Device-extract a (small) split's full-clip features into a
    MemoryFeatureStore, so validation/inference reuse the standard SplitData
    path with zero disk I/O. Clips batch per dispatch (equal lengths grouped)."""
    import jax

    waves = [read_wav(os.path.join(audio_dir, n + ".wav"), target_fs=fs)[0]
             for n in names]
    batched_fn = jax.jit(jax.vmap(extractor.fn))
    clips: dict[str, np.ndarray] = {}
    for group in _length_groups(waves, lambda w: w.shape[1]):
        for start in range(0, len(group), batch_size):
            idx = group[start : start + batch_size]
            stacked = np.stack([waves[i] for i in idx])
            if len(idx) < batch_size:  # pad to the static batch shape
                stacked = np.concatenate(
                    [stacked, np.repeat(stacked[-1:], batch_size - len(idx), 0)])
            feats = np.asarray(batched_fn(stacked))
            for j, i in enumerate(idx):
                clips[names[i]] = feats[j]
    return MemoryFeatureStore(clips, scaler)
