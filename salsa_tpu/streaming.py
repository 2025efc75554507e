"""Streaming (online) SELD: push raw multichannel samples, pull feature frames and
label-rate predictions block by block — a live-audio serving mode.

The reference has no streaming anything: features are extracted offline over whole
clips (salsa_feature_extraction.py:265-391) and inference consumes whole 60 s files
(inference.py:24-156). SELD is, however, an inherently online task (localize events
as they happen), and the fused chunk extractors built for raw-waveform training
(features/chunked.py — proven equal to full-clip slices) already contain everything
a causal streaming extractor needs: mid-signal tracker resume and explicit
covariance-context frames. This module chains them over a live sample feed.

Semantics vs the offline path
-----------------------------
* frame-local feature types (salsa_lite / salsa_ipd / melspec / melspeciv /
  linspeciv / linspecgcc / melspecgcc): the streamed features are EXACTLY the
  offline features, every frame (flush() reproduces librosa's trailing reflect
  pad).
* salsa: the offline extractor wrap-pads the covariance window at clip edges
  (salsa_feature_extraction.py:43) — acausal by construction (frame 0 reads the
  END of the clip). A live stream cannot wrap, so the first/last `n_hopframes`
  frames use zero context instead; every interior frame is exact. The
  noise-floor tracker state is carried across blocks, so tracking is exact once
  initialized (the init window's first two tracking magnitudes read pre-stream
  zeros instead of the reference's wrapped tail — silence-leading streams are
  bit-identical; tests/test_streaming.py pins both properties).

Latency accounting (feature frames; one frame = hop/fs seconds)
---------------------------------------------------------------
feature stage: `n_hopframes` lookahead (salsa covariance) + the STFT window tail
(sub-frame). prediction stage: `right_context` frames of encoder lookahead +
the block size itself. At the flagship geometry (fs 24 kHz, hop 300, block 160,
right_context 256) that is 160 + 256 + 3 frames = 5.2 s — configurable down to
sub-second blocks for low-latency operation at some boundary-accuracy cost.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from salsa_tpu.dsp.stft import frame_signal
from salsa_tpu.features.chunked import (
    FUSED_FEATURE_TYPES,
    _dft_frames,
    make_chunk_extractor,
    required_pad,
)
from salsa_tpu.features.salsa import (
    tracker_init_state,
    tracking_magspec_planes,
)
from salsa_tpu.models.seld import interpolate_index_repeat


class StreamingExtractor:
    """Push-based feature extraction: feed (n_ch, n) sample arrays of ANY size,
    receive completed (n_feat_ch, block_frames, F) feature blocks.

    Internally keeps a rolling sample buffer on the same padded timeline the
    offline extractor uses (frame t starts at padded sample t*hop; the stream
    start is seeded with the librosa-style reflect pad once enough samples
    arrive), plus the noise-floor tracker state entering the next block (salsa).
    Each completed block is one fixed-shape jitted dispatch.
    """

    def __init__(self, feature_type: str = "salsa", audio_format: str = "foa",
                 fs: int = 24000, n_fft: int = 512, hop_length: int = 300,
                 block_frames: int = 160, n_channels: int = 4, **kwargs):
        if feature_type not in FUSED_FEATURE_TYPES:
            raise ValueError(
                f"streaming supports feature types {FUSED_FEATURE_TYPES}; "
                f"got '{feature_type}'")
        self.feature_type = feature_type
        self.audio_format = audio_format
        self.fs = fs
        self.n_fft = n_fft
        self.hop = hop_length
        self.block_frames = int(block_frames)
        self.n_channels = n_channels

        chunk_fn, params = make_chunk_extractor(
            feature_type, audio_format, self.block_frames, fs, n_fft,
            hop_length, return_tracker_state=True, **kwargs)
        self.params = params
        self._tracking = feature_type == "salsa" and getattr(
            params, "is_tracking", False)
        self._n_band = (params.upper_bin - params.lower_bin
                        if feature_type == "salsa" else 1)
        # halo: covariance context frames each side (salsa only)
        self.halo = params.n_hopframes if feature_type == "salsa" else 0
        self._pad = required_pad(feature_type, n_fft)
        # window span: the largest per-frame sample extent the chunk fn reads
        # (GCC types frame a double-length FFT = 2 * required_pad)
        span = 2 * self._pad
        L, h = self.block_frames, self.halo
        self._win_len = (L + 2 * h - 1) * hop_length + span
        n_win = jnp.int32(L + 2 * h)  # > any frame index used => mod is identity

        def block(window, floor, cd):
            return chunk_fn(window, n_win, jnp.int32(h), floor, cd)

        self._block_fn = jax.jit(block)
        self._init_fn = (jax.jit(self._make_tracker_init())
                         if self._tracking else None)

        self.reset()

    def reset(self):
        """Clear stream state for a new stream (compiled block fns are kept)."""
        self._pending: list[np.ndarray] = []
        self._pending_len = 0
        self._buf: np.ndarray | None = None  # (C, n) from padded sample _pos
        self._pos = 0
        self._next_frame = 0
        self._tracker: tuple[np.ndarray, np.ndarray] | None = None
        self._samples_seen = 0
        self._flushed = False

    # -- feature geometry ---------------------------------------------------

    @property
    def latency_frames(self) -> int:
        """Feature frames of lookahead before a frame's features can be emitted
        (excludes the sub-frame STFT window tail)."""
        return self.halo

    def total_frames(self, n_samples: int) -> int:
        """Offline (librosa center=True) frame count for an n_samples stream."""
        return 1 + n_samples // self.hop

    # -- internals ----------------------------------------------------------

    def _make_tracker_init(self):
        """Jitted fn: first block's window -> reference tracker init state
        (floor = 0.5 * mean of the first 5 tracking magnitudes, countdown = 3;
        salsa_feature_extraction.py:30,58). Computes the full-bin DFT exactly
        like the block fn so the magnitudes (and thus the init) are identical."""
        p = self.params
        h, hop = self.halo, self.hop
        win_length = p.win_length or p.n_fft
        need = (h + 5 - 1) * hop + p.n_fft  # frames -h .. 4 of the stream

        def fn(window):
            frames = frame_signal(window[0:1, :need], p.n_fft, hop)
            X = _dft_frames(frames, p.n_fft, win_length)
            xr = jnp.transpose(jnp.real(X)[0, :, p.lower_bin : p.upper_bin])
            xi = jnp.transpose(jnp.imag(X)[0, :, p.lower_bin : p.upper_bin])
            mag5 = tracking_magspec_planes(xr, xi, h, 5)
            return tracker_init_state(mag5)

        return fn

    def _seed_buffer(self) -> bool:
        """Once required_pad+1 samples have arrived, lay down the stream-start
        prefix: `halo` frames of pre-stream zeros, then the reflect pad, then
        the audio — after which buffer index maps linearly to padded samples."""
        if self._pending_len < self._pad + 1:
            return False
        audio = np.concatenate(self._pending, axis=-1)
        self._pending = []
        self._pending_len = 0
        refl = audio[:, 1 : self._pad + 1][:, ::-1]
        zeros = np.zeros((audio.shape[0], self.halo * self.hop), np.float32)
        self._buf = np.concatenate([zeros, refl, audio], axis=-1)
        self._pos = -self.halo * self.hop
        return True

    def _emit_ready(self) -> list[np.ndarray]:
        out = []
        L, h, hop = self.block_frames, self.halo, self.hop
        while True:
            start = (self._next_frame - h) * hop  # padded-sample window start
            rel = start - self._pos
            if self._buf is None or rel + self._win_len > self._buf.shape[1]:
                break
            window = jnp.asarray(self._buf[:, rel : rel + self._win_len])
            if self._tracking and self._tracker is None:
                fl, cd = self._init_fn(window)
                self._tracker = (fl, cd)
            if self._tracker is None:
                fl = jnp.zeros((self._n_band,), jnp.float32)
                cd = jnp.zeros((self._n_band,), jnp.int32)
            else:
                fl, cd = self._tracker
            feats, fl_out, cd_out = self._block_fn(window, fl, cd)
            if self._tracking:
                self._tracker = (fl_out, cd_out)
            out.append(np.asarray(feats))
            self._next_frame += L
            # drop samples no later window can need
            keep_from = (self._next_frame - h) * hop
            drop = keep_from - self._pos
            if drop > 0:
                self._buf = self._buf[:, drop:]
                self._pos = keep_from
        return out

    # -- public API ----------------------------------------------------------

    def push(self, samples: np.ndarray) -> list[np.ndarray]:
        """Feed (n_channels, n) samples; returns every feature block completed
        by this push (possibly none, possibly several)."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        samples = np.asarray(samples, dtype=np.float32)
        if samples.ndim != 2 or samples.shape[0] != self.n_channels:
            raise ValueError(
                f"expected ({self.n_channels}, n) samples, got {samples.shape}")
        self._samples_seen += samples.shape[1]
        if self._buf is None:
            self._pending.append(samples)
            self._pending_len += samples.shape[1]
            if not self._seed_buffer():
                return []
        else:
            self._buf = np.concatenate([self._buf, samples], axis=-1)
        return self._emit_ready()

    def flush(self) -> np.ndarray:
        """End of stream: reproduce the offline extractor's trailing reflect pad
        and emit the remaining frames. Returns (n_feat_ch, n_remaining, F) —
        possibly zero-length."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        self._flushed = True
        total = self.total_frames(self._samples_seen)
        if self._buf is None:
            if not self._pending:
                return np.zeros((0, 0, 0), np.float32)
            # stream shorter than the reflect pad: pad by reflection of what
            # exists (numpy reflect supports width < length only; tile if not)
            audio = np.concatenate(self._pending, axis=-1)
            self._pending = []
            w = min(self._pad, audio.shape[1] - 1)
            refl = audio[:, 1 : w + 1][:, ::-1]
            zeros = np.zeros((audio.shape[0], self.halo * self.hop), np.float32)
            lead = np.zeros((audio.shape[0], self._pad - w), np.float32)
            self._buf = np.concatenate([zeros, lead, refl, audio], axis=-1)
            self._pos = -self.halo * self.hop
        remaining = total - self._next_frame
        if remaining <= 0:
            return np.zeros((0, 0, 0), np.float32)
        # trailing reflect pad (librosa center=True right edge), then zeros to
        # complete the final fixed-shape block window(s)
        tail = self._buf[:, -(self._pad + 1) : -1][:, ::-1]
        L, h = self.block_frames, self.halo
        n_blocks = -(-remaining // L)
        last_start = (self._next_frame + (n_blocks - 1) * L - h) * self.hop
        need = last_start + self._win_len - self._pos
        filler_len = max(0, need - self._buf.shape[1] - tail.shape[1])
        filler = np.zeros((self._buf.shape[0], filler_len), np.float32)
        self._buf = np.concatenate([self._buf, tail, filler], axis=-1)
        blocks = self._emit_ready()
        feats = (np.concatenate(blocks, axis=1) if blocks
                 else np.zeros((0, 0, 0), np.float32))
        return feats[:, :remaining]


class StreamingSeldPipeline:
    """Online SELD predictions from a live sample feed.

    Chains a StreamingExtractor with the trained CRNN: completed feature blocks
    enter a rolling (normalized) feature buffer; each block is predicted from a
    fixed window [left_context | block | right_context] and only the block's
    interior label frames are emitted, so every prediction sees `right_context`
    frames of real future (and the CRNN's conv receptive field of real past).
    The window predictions converge to the offline full-clip predictions as the
    contexts grow (tests pin the monotone convergence); contexts and block size
    trade latency against boundary accuracy.

    Emits (event_prob, doa_xyz) at label rate per completed block, like
    SeldInferencePipeline but incrementally.
    """

    def __init__(self, extractor: StreamingExtractor, model, variables, scaler,
                 interp_ratio: float, n_classes: int,
                 output_format: str = "reg_xyz",
                 left_context: int = 128, right_context: int | None = None):
        self.extractor = extractor
        self.model = model
        self.variables = variables
        mean, std = scaler
        self._mean = np.asarray(mean, np.float32)
        self._std = np.asarray(std, np.float32)
        self.interp_ratio = float(interp_ratio)
        self.n_classes = n_classes
        self.output_format = output_format
        ds = model.time_downsample_ratio
        self.ds = ds
        L = extractor.block_frames
        right_context = left_context if right_context is None else right_context
        for name, v in (("block_frames", L), ("left_context", left_context),
                        ("right_context", right_context)):
            if v % ds != 0:
                raise ValueError(f"{name}={v} must be a multiple of the "
                                 f"encoder's time downsample ratio {ds}")
        self.left, self.right = left_context, right_context
        self._W = left_context + L + right_context
        self._label_per_block = int(round(L / ds * self.interp_ratio))
        self._fwd = jax.jit(self._window_forward)
        self.reset(reset_extractor=False)

    def reset(self, reset_extractor: bool = True):
        """Clear stream state for a new stream (compiled fns are kept)."""
        if reset_extractor:
            self.extractor.reset()
        self._feat: np.ndarray | None = None  # normalized rolling buffer
        self._feat_start = 0  # stream frame index of _feat[:, 0]
        self._next_block = 0

    @property
    def latency_frames(self) -> int:
        """Feature frames between a frame arriving and its prediction emitting:
        worst case one full block + right context + the feature lookahead."""
        return (self.extractor.block_frames + self.right
                + self.extractor.latency_frames)

    def _window_forward(self, featw, params, batch_stats):
        out = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, featw[None],
            train=False)
        e0, en = self.left // self.ds, self.extractor.block_frames // self.ds
        ev = interpolate_index_repeat(
            out["event_frame_logit"][:, e0 : e0 + en], self.interp_ratio)
        doa = interpolate_index_repeat(
            out["doa_frame_output"][:, e0 : e0 + en], self.interp_ratio)
        if self.output_format == "accdoa":
            n = self.n_classes
            x, y, z = doa[..., :n], doa[..., n : 2 * n], doa[..., 2 * n :]
            event_prob = jnp.sqrt(x**2 + y**2 + z**2)
        else:
            event_prob = jax.nn.sigmoid(ev)
        return event_prob, doa

    def _normalize(self, feat: np.ndarray) -> np.ndarray:
        n_sc = self._mean.shape[0]
        out = feat.copy()
        out[:n_sc] = (out[:n_sc] - self._mean) / self._std
        return out

    def _append(self, feat_block: np.ndarray):
        nb = self._normalize(feat_block)
        if self._feat is None:
            self._feat = nb
        else:
            self._feat = np.concatenate([self._feat, nb], axis=1)

    def _drain(self, final_total: int | None = None):
        """Emit every block whose right context is available (all remaining
        blocks when final_total is set, zero-padding the tail context)."""
        results: list[tuple[np.ndarray, np.ndarray]] = []
        if self._feat is None:
            return results
        L = self.extractor.block_frames
        while True:
            b0 = self._next_block * L
            end_needed = b0 + L + self.right
            have = self._feat_start + self._feat.shape[1]
            if final_total is None:
                if have < end_needed:
                    break
            else:
                if b0 >= final_total:
                    break
            lo, hi = b0 - self.left, b0 + L + self.right
            lpad = max(0, self._feat_start - lo)
            seg = self._feat[:, max(0, lo - self._feat_start):
                             max(0, hi - self._feat_start)]
            rpad = self._W - lpad - seg.shape[1]
            window = np.pad(seg, ((0, 0), (lpad, rpad), (0, 0)))
            ev, doa = self._fwd(jnp.asarray(window),
                                self.variables["params"],
                                self.variables["batch_stats"])
            ev, doa = np.asarray(ev[0]), np.asarray(doa[0])
            if final_total is not None and b0 + L > final_total:
                n_valid = int(round(np.floor((final_total - b0) / self.ds)
                                    * self.interp_ratio))
                ev, doa = ev[:n_valid], doa[:n_valid]
            results.append((ev, doa))
            self._next_block += 1
            # trim: frames before the next window's left edge are dead
            keep_from = self._next_block * L - self.left
            drop = keep_from - self._feat_start
            if drop > 0:
                self._feat = self._feat[:, drop:]
                self._feat_start = keep_from
        return results

    def push(self, samples: np.ndarray) -> list[tuple[np.ndarray, np.ndarray]]:
        """Feed samples; returns [(event_prob, doa_xyz)] — label-rate arrays of
        self.label_frames_per_block frames — for each block completed."""
        for block in self.extractor.push(samples):
            self._append(block)
        return self._drain()

    @property
    def label_frames_per_block(self) -> int:
        return self._label_per_block

    def flush(self) -> list[tuple[np.ndarray, np.ndarray]]:
        """End of stream: extract the tail frames and predict every remaining
        block (tail context zero-padded). The final block's predictions are
        trimmed to the stream's true label-frame count."""
        tail = self.extractor.flush()
        if tail.size:
            self._append(tail)
        total = (self._feat_start + self._feat.shape[1]
                 if self._feat is not None else 0)
        return self._drain(final_total=total)
