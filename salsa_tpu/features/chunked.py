"""Fused per-chunk feature extraction for raw-waveform training.

SURVEY §7's architecture stance: do NOT port the reference's offline-HDF5 design
(salsa_feature_extraction.py:265-391) — stream raw waveforms through feature
extraction inside the training graph. Serving already has this (pipeline.py runs
wav -> prediction in one jit over whole clips); this module supplies the missing
training half: extracting ONE 8-s chunk's features, bit-matching what slicing the
full-clip feature map would give, so the fused path trains on exactly the data the
offline path would.

Two clip-global dependencies make per-chunk extraction non-trivial for SALSA:

  1. the covariance context: each frame's spatial covariance spans ±n_hopframes
     neighbor frames, and the reference wrap-pads the WHOLE clip over frames
     (salsa_feature_extraction.py:43) — so a chunk at the clip edge borrows frames
     from the opposite end. Handled by slicing the chunk's frames contiguously and
     fetching the 2*n_hopframes context frames individually at wrap-corrected
     offsets (all dynamic_slice — no gather).
  2. the noise-floor tracker: a strict frame recurrence from clip frame 0
     (salsa_feature_extraction.py:63-93). Handled by checkpointing the tracker
     state (floor, countdown) at every chunk start in ONE setup scan per clip
     (`salsa_tracker_checkpoints`), then resuming the scan mid-clip inside the
     train step.

SALSA-Lite/IPD features are frame-local (no covariance window, no tracker), so
their chunk extraction is plain windowed extraction.

Known bounded deviation: for clips SHORTER than the chunk window, the last <=
n_hopframes valid frames' covariance context can include frames past the clip's
final STFT frame; the offline path wraps those to the clip start while this path
reads the zero-padded tail. Clips >= chunk length (all TNSSE material) are exact.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from salsa_tpu.dsp.filterbank import high_freq_compression_matrix
from salsa_tpu.dsp.stft import (
    _windowed_dft_matrices,
    cabs2,
    frame_signal,
    power_to_db,
)
from salsa_tpu.features.salsa import (
    SalsaParams,
    eig_features_from_planes,
    noise_floor_scan,
    tracking_magspec_planes,
    tracker_init_state,
)
from salsa_tpu.features.salsa_lite import SalsaLiteParams, SPEED_OF_SOUND


def pad_waveform(wave: np.ndarray, n_fft: int, pad: int | None = None) -> np.ndarray:
    """Host-side librosa-style center padding (reflect n_fft//2 per side), so the
    in-graph framing can use plain offsets: frame t = padded[t*hop : t*hop+n_fft].
    `pad` overrides the amount (GCC features frame a double-length FFT and need
    big_n_fft//2); extractors whose own n_fft is smaller add a pad offset."""
    pad = n_fft // 2 if pad is None else pad
    return np.pad(wave, ((0, 0), (pad, pad)), mode="reflect")


def required_pad(feature_type: str, n_fft: int) -> int:
    """Center-pad the resident waveform must carry for this feature type."""
    if feature_type.endswith("gcc"):
        ncorr = 2 * n_fft - 1
        big_n_fft = int(2 ** np.ceil(np.log2(ncorr)))
        return big_n_fft // 2
    return n_fft // 2


def n_full_frames(n_samples: int, hop_length: int) -> int:
    """STFT frame count of the UNTRIMMED clip (center=True): 1 + n_samples//hop.
    The reference wrap-pads at this length, not at the label-trimmed length."""
    return 1 + n_samples // hop_length


def _dft_frames(frames: jnp.ndarray, n_fft: int, win_length: int) -> jnp.ndarray:
    """(..., n_fft) sample frames -> (..., n_bins) complex spectra via the same
    windowed-DFT matmul stft() uses (bit-matching the full-clip path)."""
    cos_mat, sin_mat = _windowed_dft_matrices(n_fft, win_length)
    return lax.complex(frames @ jnp.asarray(cos_mat), frames @ jnp.asarray(sin_mat))


def _chunk_spectra(wave_padded: jnp.ndarray, n_full: jnp.ndarray, f0: jnp.ndarray,
                   chunk_len: int, n_ctx: int, n_fft: int, hop: int,
                   win_length: int, pad_off: int = 0):
    """STFT of chunk frames f0..f0+chunk_len-1 plus n_ctx context frames per side.

    wave_padded: (C, S_pad) center-padded waveform; n_full: scalar untrimmed frame
    count (wrap modulus); f0: scalar chunk start frame. pad_off: extra samples of
    center pad the resident wave carries beyond this extractor's n_fft//2 (frame
    t then starts at pad_off + t*hop).
    Returns (Xmain, Xpad): (C, chunk_len, n_bins) and (C, chunk_len + 2*n_ctx,
    n_bins) complex — Xpad carries the wrap-corrected context frames.
    """
    n_ch = wave_padded.shape[0]
    main_sz = (chunk_len - 1) * hop + n_fft
    main = lax.dynamic_slice(wave_padded, (0, pad_off + f0 * hop), (n_ch, main_sz))
    frames_main = frame_signal(main, n_fft, hop)              # (C, L, n_fft)
    Xmain = _dft_frames(frames_main, n_fft, win_length)       # (C, L, bins)
    if n_ctx == 0:
        return Xmain, Xmain

    ctx_idx = jnp.concatenate([
        f0 + jnp.arange(-n_ctx, 0), f0 + chunk_len + jnp.arange(0, n_ctx)])
    ctx_idx = jnp.mod(ctx_idx, n_full)                        # wrap like reference
    ctx = jnp.stack([
        lax.dynamic_slice(wave_padded, (0, pad_off + ctx_idx[i] * hop),
                          (n_ch, n_fft))
        for i in range(2 * n_ctx)
    ], axis=1)                                                # (C, 2*n_ctx, n_fft)
    Xctx = _dft_frames(ctx, n_fft, win_length)                # (C, 2*n_ctx, bins)
    Xpad = jnp.concatenate([Xctx[:, :n_ctx], Xmain, Xctx[:, n_ctx:]], axis=1)
    return Xmain, Xpad


def make_salsa_chunk_fn(p: SalsaParams, chunk_len: int,
                        return_tracker_state: bool = False):
    """Fused chunk extractor for SALSA (FOA/MIC).

    Returns fn(wave_padded, n_full, f0, floor0, countdown0) -> (7, chunk_len,
    freq_dim) float32 features, equal to extract_salsa(full clip)[:, f0:f0+len]:
      * wave_padded: (4, S_pad) center-padded float waveform;
      * n_full: scalar int32 untrimmed STFT frame count of this clip;
      * f0: scalar int32 chunk start (feature frames, clip-local);
      * floor0/countdown0: (n_bins_band,) tracker state entering frame f0, from
        `salsa_tracker_checkpoints`.
    With return_tracker_state, fn returns (features, floor, countdown) where the
    extra pair is the tracker state EXITING frame f0+chunk_len-1 — what the next
    contiguous block must resume from (the streaming pipeline chains blocks
    through it; `salsa_tpu/streaming.py`).
    """
    h = p.n_hopframes
    W = jnp.asarray(high_freq_compression_matrix(p.n_fft, p.compress_high_freq))
    win_length = p.win_length or p.n_fft

    def fn(wave_padded, n_full, f0, floor0, countdown0):
        Xmain, Xpad = _chunk_spectra(
            wave_padded, n_full, f0, chunk_len, h, p.n_fft, p.hop_length, win_length)
        power = cabs2(Xmain)
        log_spec = power_to_db(jnp.einsum("ctb,fb->ctf", power, W))

        xr_b = jnp.transpose(jnp.real(Xpad)[:, :, p.lower_bin : p.upper_bin], (0, 2, 1))
        xi_b = jnp.transpose(jnp.imag(Xpad)[:, :, p.lower_bin : p.upper_bin], (0, 2, 1))
        mag = tracking_magspec_planes(xr_b[0], xi_b[0], h, chunk_len)
        (floor, countdown), sig_mask = noise_floor_scan(mag, (floor0, countdown0))
        if not p.is_tracking:
            sig_mask = jnp.ones_like(sig_mask, dtype=bool)
        eig = eig_features_from_planes(xr_b, xi_b, sig_mask, p)  # (3, bins_band, L)
        eig = jnp.transpose(eig, (0, 2, 1))                   # (3, L, bins_band)
        pad_width = p.freq_dim - (p.upper_bin - p.lower_bin)
        eig_full = jnp.pad(eig, ((0, 0), (0, 0), (0, pad_width)))
        feats = jnp.concatenate([log_spec, eig_full], axis=0)
        if return_tracker_state:
            return feats, floor, countdown
        return feats

    return fn


def make_salsa_lite_chunk_fn(p: SalsaLiteParams, chunk_len: int):
    """Fused chunk extractor for SALSA-Lite / SALSA-IPD (frame-local features).

    Returns fn(wave_padded, n_full, f0) -> (7, chunk_len, n_features), equal to
    extract_salsa_lite(full clip)[:, f0:f0+len]."""
    win_length = p.win_length or p.n_fft

    def fn(wave_padded, n_full, f0):
        Xmain, _ = _chunk_spectra(
            wave_padded, n_full, f0, chunk_len, 0, p.n_fft, p.hop_length, win_length)
        log_specs = power_to_db(cabs2(Xmain))
        phase = jnp.angle(Xmain[1:] * jnp.conj(Xmain[0:1]))
        if p.normalize == "ipd":
            phase = phase / np.pi
        else:
            delta = 2.0 * np.pi * p.fs / (p.n_fft * SPEED_OF_SOUND)
            freq_vector = np.arange(p.n_fft // 2 + 1, dtype=np.float32)
            freq_vector[0] = 1.0
            phase = phase / (delta * freq_vector)
        log_specs = log_specs[:, :, p.lower_bin : p.cutoff_bin]
        phase = phase[:, :, p.lower_bin : p.cutoff_bin]
        keep = (np.arange(p.lower_bin, p.cutoff_bin) < p.upper_bin).astype(np.float32)
        return jnp.concatenate([log_specs, phase * keep], axis=0)

    return fn


def make_projected_chunk_fn(proj, chunk_len: int, n_fft: int, hop: int,
                            win_length: int, pad_off: int, with_iv: bool):
    """Chunk extractor for melspec / melspeciv / linspeciv: log projected spec
    (+ FOA intensity vectors) — frame-local, so a plain windowed extraction."""
    from salsa_tpu.features.specs import foa_intensity_vectors, log_projected_spec

    proj = jnp.asarray(proj)

    def fn(wave_padded, n_full, f0, floor0, cd0):
        Xmain, _ = _chunk_spectra(wave_padded, n_full, f0, chunk_len, 0,
                                  n_fft, hop, win_length, pad_off)
        spec = log_projected_spec(Xmain, proj)
        if not with_iv:
            return spec
        iv = foa_intensity_vectors(Xmain, proj)
        return jnp.concatenate([spec, iv], axis=0)

    return fn


def make_gcc_chunk_fn(proj, chunk_len: int, n_fft: int, hop: int,
                      win_length: int, pad_total: int, n_out: int, freq_filter):
    """Chunk extractor for linspecgcc / melspecgcc: log projected spec + GCC-PHAT
    lags. The GCC branch frames a double-length FFT, so the resident waveform
    carries big_n_fft//2 of center pad (required_pad) and the n_fft spec branch
    uses a pad offset."""
    from salsa_tpu.dsp.stft import irfft_selected
    from salsa_tpu.features.specs import log_projected_spec

    proj = jnp.asarray(proj)
    ncorr = 2 * n_fft - 1
    big_n_fft = int(2 ** np.ceil(np.log2(ncorr)))
    lags = tuple(range(big_n_fft - n_out // 2, big_n_fft)) + tuple(range(n_out // 2))

    def fn(wave_padded, n_full, f0, floor0, cd0):
        Xmain, _ = _chunk_spectra(wave_padded, n_full, f0, chunk_len, 0,
                                  n_fft, hop, win_length,
                                  pad_total - n_fft // 2)
        spec = log_projected_spec(Xmain, proj)
        P, _ = _chunk_spectra(wave_padded, n_full, f0, chunk_len, 0,
                              big_n_fft, hop, win_length,
                              pad_total - big_n_fft // 2)
        if freq_filter is not None:
            P = P * jnp.asarray(freq_filter)
        n_ch = P.shape[0]
        sig_idx = np.array([m for n in range(n_ch) for m in range(n + 1, n_ch)])
        ref_idx = np.array([n for n in range(n_ch) for m in range(n + 1, n_ch)])
        R = P[sig_idx] * jnp.conj(P[ref_idx])
        phase = jnp.where(jnp.abs(R) > 0,
                          R / jnp.maximum(jnp.abs(R), 1e-30), 1.0 + 0.0j)
        gcc = irfft_selected(phase, big_n_fft, lags)
        return jnp.concatenate([spec, gcc], axis=0)

    return fn


FUSED_FEATURE_TYPES = ("salsa", "salsa_lite", "salsa_ipd", "melspec",
                       "melspeciv", "linspeciv", "linspecgcc", "melspecgcc")


def make_chunk_extractor(feature_type: str, audio_format: str, chunk_len: int,
                         fs: int, n_fft: int, hop_length: int,
                         win_length: int | None = None,
                         fmin_doa: float = 50.0, fmax_doa: float | None = None,
                         n_mels: int = 128, fmin: float = 50.0,
                         fmax: float | None = None,
                         condition_number: float = 5.0, n_hopframes: int = 3,
                         is_tracking: bool = True, compress_high_freq: bool = True,
                         eig_method: str = "auto",
                         return_tracker_state: bool = False):
    """Uniform fused-chunk extractor factory (mirrors registry.make_extractor's
    parameter defaults so fused features match the offline extractor's exactly).

    Returns (fn, params) where fn(wave_padded, n_full, f0, floor0, cd0) ->
    (7, chunk_len, F); tracker-free types ignore floor0/cd0. params is the
    SalsaParams (or SalsaLiteParams) to feed salsa_tracker_checkpoints / shape
    queries; its `needs_tracker` companion is returned as params having
    is_tracking for salsa only.

    With return_tracker_state, fn returns (features, floor, countdown) for every
    type uniformly (tracker-free types echo floor0/cd0 back) — the streaming
    extractor chains contiguous blocks through this state.
    """
    if feature_type not in FUSED_FEATURE_TYPES:
        raise ValueError(
            f"training.from_wav supports feature types {FUSED_FEATURE_TYPES}; "
            f"'{feature_type}' needs the offline extract CLI")

    def _echo_state(fn):
        if not return_tracker_state:
            return fn

        def wrapped(wave_padded, n_full, f0, floor0, cd0):
            return fn(wave_padded, n_full, f0, floor0, cd0), floor0, cd0

        return wrapped

    win_len = win_length or n_fft
    pad_total = required_pad(feature_type, n_fft)
    if feature_type in ("melspec", "melspeciv", "linspeciv"):
        if feature_type == "linspeciv":
            proj = high_freq_compression_matrix(n_fft, compress_high_freq)
        else:
            from salsa_tpu.dsp.filterbank import mel_filterbank

            proj = mel_filterbank(fs, n_fft, n_mels, fmin,
                                  min(fmax or fs // 2, fs // 2))
        fn = make_projected_chunk_fn(proj, chunk_len, n_fft, hop_length, win_len,
                                     pad_total - n_fft // 2,
                                     with_iv=feature_type != "melspec")
        return _echo_state(fn), None
    if feature_type in ("linspecgcc", "melspecgcc"):
        from salsa_tpu.features.specs import gcc_phat_lowpass_filter

        if feature_type == "linspecgcc":
            proj = high_freq_compression_matrix(n_fft, compress_high_freq)
            n_out, filt = proj.shape[0], None
        else:
            from salsa_tpu.dsp.filterbank import mel_filterbank

            proj = mel_filterbank(fs, n_fft, n_mels, fmin,
                                  min(fmax or fs // 2, fs // 2))
            ncorr = 2 * n_fft - 1
            big_n_fft = int(2 ** np.ceil(np.log2(ncorr)))
            n_out, filt = n_mels, gcc_phat_lowpass_filter(fs, big_n_fft)
        fn = make_gcc_chunk_fn(proj, chunk_len, n_fft, hop_length, win_len,
                               pad_total, n_out, filt)
        return _echo_state(fn), None
    if eig_method == "auto":
        eig_method = ("power" if jax.default_backend() == "cpu" or not is_tracking
                      else "pallas")
    if feature_type == "salsa":
        if fmax_doa is None:
            fmax_doa = 9000.0 if audio_format == "foa" else 4000.0
        p = SalsaParams(
            fs=fs, n_fft=n_fft, hop_length=hop_length,
            win_length=win_length or n_fft, fmin_doa=fmin_doa, fmax_doa=fmax_doa,
            audio_format=audio_format, condition_number=condition_number,
            n_hopframes=n_hopframes, is_tracking=is_tracking,
            compress_high_freq=compress_high_freq, eig_method=eig_method)
        return make_salsa_chunk_fn(p, chunk_len, return_tracker_state), p
    if fmax_doa is None:
        fmax_doa = 2000.0
    p = SalsaLiteParams(
        fs=fs, n_fft=n_fft, hop_length=hop_length, win_length=win_length or n_fft,
        fmin_doa=fmin_doa, fmax_doa=fmax_doa,
        normalize="lite" if feature_type == "salsa_lite" else "ipd")
    lite_fn = make_salsa_lite_chunk_fn(p, chunk_len)

    def fn(wave_padded, n_full, f0, floor0, cd0):
        return lite_fn(wave_padded, n_full, f0)

    return _echo_state(fn), p


@partial(jax.jit, static_argnames=("p",))
def _tracker_states_all(wave_padded: jnp.ndarray, p: SalsaParams):
    """Per-frame tracker pre-states over a full clip: (floor, countdown) each of
    shape (n_frames, n_bins_band)."""
    n_full = 1 + (wave_padded.shape[1] - p.n_fft) // p.hop_length
    # the tracker only reads channel 0 — frame/DFT just that channel
    frames = frame_signal(wave_padded[0:1], p.n_fft, p.hop_length)
    X = _dft_frames(frames, p.n_fft, p.win_length or p.n_fft)
    h = p.n_hopframes
    xr0 = jnp.transpose(jnp.real(X)[0, :, p.lower_bin : p.upper_bin])  # (bins, T)
    xi0 = jnp.transpose(jnp.imag(X)[0, :, p.lower_bin : p.upper_bin])
    xr0 = jnp.concatenate([xr0[:, -h:], xr0, xr0[:, :h]], axis=-1)
    xi0 = jnp.concatenate([xi0[:, -h:], xi0, xi0[:, :h]], axis=-1)
    mag = tracking_magspec_planes(xr0, xi0, h, n_full)
    _, _, (floors, countdowns) = noise_floor_scan(
        mag, tracker_init_state(mag), collect_states=True)
    return floors, countdowns


@partial(jax.jit, static_argnames=("p",))
def _tracker_checkpoints_batch(waves_padded: jnp.ndarray, starts: jnp.ndarray,
                               p: SalsaParams):
    """Batched tracker checkpoints: waves_padded (B, C, S_pad) equal-length
    clips, starts (B, K) per-clip chunk-start frames (pad rows with repeats).
    Returns (floor, countdown) of shape (B, K, n_bins_band) in ONE dispatch —
    the remote harness charges seconds per call, so per-clip calls would
    dominate from_wav startup on large corpora."""
    def one(wave, st):
        floors, countdowns = _tracker_states_all.__wrapped__(wave, p)
        return floors[st], countdowns[st]

    return jax.vmap(one, in_axes=(0, 0))(waves_padded, starts)


def salsa_tracker_checkpoints_batch(
    waves_padded: np.ndarray, starts_per_clip: list[np.ndarray], p: SalsaParams,
    batch_size: int = 8,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Host wrapper over _tracker_checkpoints_batch for equal-length clips:
    pads each clip's start list to the max count, batches clips per dispatch,
    and trims the results. Returns [(floor, countdown)] per clip."""
    n = len(starts_per_clip)
    k_max = max(len(s) for s in starts_per_clip)
    starts_mat = np.stack([
        np.pad(np.asarray(s, np.int32), (0, k_max - len(s)), mode="edge")
        for s in starts_per_clip])
    out: list[tuple[np.ndarray, np.ndarray]] = []
    for b0 in range(0, n, batch_size):
        idx = slice(b0, min(b0 + batch_size, n))
        nb = idx.stop - idx.start
        w = jnp.asarray(waves_padded[idx])
        st = jnp.asarray(starts_mat[idx])
        if nb < batch_size:  # keep the dispatch shape static
            reps = batch_size - nb
            w = jnp.concatenate([w, jnp.repeat(w[-1:], reps, 0)])
            st = jnp.concatenate([st, jnp.repeat(st[-1:], reps, 0)])
        fl, cd = _tracker_checkpoints_batch(w, st, p)
        fl, cd = np.asarray(fl), np.asarray(cd)
        for j in range(nb):
            k = len(starts_per_clip[b0 + j])
            out.append((fl[j, :k], cd[j, :k]))
    return out


def salsa_tracker_checkpoints(
    wave_padded: np.ndarray, starts: np.ndarray, p: SalsaParams
) -> tuple[np.ndarray, np.ndarray]:
    """Tracker state entering each chunk-start frame of one clip.

    wave_padded: (4, S_pad) center-padded float waveform (true length — no zero
    tail); starts: (n_chunks,) clip-local chunk start frames.
    Returns (floor, countdown) arrays of shape (n_chunks, n_bins_band).
    One setup scan per clip; at ~19k x realtime extraction throughput this is
    noise next to a single training epoch.
    """
    floors, countdowns = _tracker_states_all(jnp.asarray(wave_padded), p)
    idx = jnp.asarray(starts, dtype=jnp.int32)
    return np.asarray(floors[idx]), np.asarray(countdowns[idx])
