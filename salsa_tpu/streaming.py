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


def _window_to_float(window):
    """On-device PCM decode: int16 sample windows become float32/32768 —
    identical to the offline wav reader (utils/audio_io.py int16 branch).
    Exact: every int16/2**15 is representable in float32, so an int16 stream
    produces bit-identical features to pushing the converted floats, while the
    host->device transfer is half the bytes (the dominant per-block cost on
    transport-bound links)."""
    if window.dtype == jnp.int16:
        return window.astype(jnp.float32) * (1.0 / 32768.0)
    return window


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
                 block_frames: int = 160, n_channels: int = 4,
                 n_streams: int = 1, **kwargs):
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
        # N synchronized streams share one block clock (one fused dispatch
        # extracts + predicts all of them): push (N, C, n) packets. N=1 keeps
        # the plain (C, n) API. All device math is vmapped over the stream
        # axis; the host buffer holds the N streams stacked as N*C rows.
        self.n_streams = int(n_streams)

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
            return chunk_fn(_window_to_float(window), n_win, jnp.int32(h),
                            floor, cd)

        # all device math carries a leading stream axis (size 1 for the plain
        # single-stream API) so N streams cost one dispatch, not N
        self._block_fn = jax.jit(jax.vmap(block))
        self._init_fn = (jax.jit(jax.vmap(self._make_tracker_init()))
                         if self._tracking else None)

        # device-resident ingestion (see enable_device_ingest)
        self._dev_enabled = False
        self._dev_B = 0
        self._dev_R = 0
        self._dev_write = None
        self._dev_slide = None

        self.reset()

    def reset(self):
        """Clear stream state for a new stream (compiled block fns are kept)."""
        self._reinit: dict[int, list[int]] = {}  # frame -> slots to re-init
        self._pending: list[np.ndarray] = []
        self._pending_len = 0
        self._buf: np.ndarray | None = None  # (C, n) from padded sample _pos
        self._pos = 0
        self._next_frame = 0
        self._tracker: tuple[np.ndarray, np.ndarray] | None = None
        self._samples_seen = 0
        self._flushed = False
        self._in_dtype: np.dtype | None = None
        self._dev: jax.Array | None = None  # (rows, R) mirror of _buf's head
        self._dev_len = 0                   # mirrored prefix length of _buf

    # -- feature geometry ---------------------------------------------------

    @property
    def latency_frames(self) -> int:
        """Feature frames of lookahead before a frame's features can be emitted
        (excludes the sub-frame STFT window tail)."""
        return self.halo

    @property
    def in_dtype(self) -> np.dtype:
        """The stream's sample dtype (int16 PCM or float32), float32 until the
        first ingest fixes it."""
        return self._in_dtype if self._in_dtype is not None else np.dtype(
            np.float32)

    def total_frames(self, n_samples: int) -> int:
        """Offline (librosa center=True) frame count for an n_samples stream."""
        return 1 + n_samples // self.hop

    # -- dynamic slot attachment (stream_pool.py) ------------------------------

    def write_slot_seed(self, slot: int, first_samples: np.ndarray,
                        boundary_frame: int) -> None:
        """Retroactively lay down a joining stream's start prefix — `halo`
        frames of pre-stream zeros plus the librosa-style reflect pad — into
        ONE slot's rows of the shared sample buffer, so that from
        `boundary_frame` onward the slot's padded timeline is exactly what a
        solo stream's would be. The caller must align the slot's feed so its
        sample 0 is the pool's global sample `boundary_frame * hop`, and pass
        the stream's first `required_pad + 1` samples (the reflect source).
        The prefix lands on global samples already ingested (as the joining
        slot's pre-attach zeros), hence the retro-write; the device mirror is
        rewound past the touched region so the next sync re-ships it."""
        C = self.n_channels
        first = np.asarray(first_samples)
        if first.dtype != self.in_dtype:
            raise ValueError(f"seed dtype {first.dtype} != stream dtype "
                             f"{self.in_dtype}")
        if first.shape[0] != C or first.shape[1] < self._pad + 1:
            raise ValueError(f"need ({C}, >={self._pad + 1}) seed samples, "
                             f"got {first.shape}")
        refl = first[:, 1 : self._pad + 1][:, ::-1]
        i0 = (boundary_frame - self.halo) * self.hop - self._pos
        i1 = boundary_frame * self.hop - self._pos
        if self._buf is None or i0 < 0 or i1 + self._pad > self._buf.shape[1]:
            raise RuntimeError(
                f"slot seed region [{i0}, {i1 + self._pad}) not resident "
                "(attach must happen exactly at the ingest boundary)")
        rows = slice(slot * C, (slot + 1) * C)
        self._buf[rows, i0:i1] = 0
        self._buf[rows, i1 : i1 + self._pad] = refl
        if self._dev is not None and self._dev_len > i0:
            self._dev_len = max(0, i0) // self._dev_B * self._dev_B

    def schedule_tracker_reinit(self, slot: int, frame: int) -> None:
        """Arrange for `slot`'s noise-tracker row to be re-initialized from
        the block window starting at feature frame `frame` (a block boundary)
        — the same init a solo stream computes from its first window
        (tracker_init_state on frames -halo..4). No-op feature types without
        tracking."""
        if self._tracking:
            self._reinit.setdefault(frame, []).append(slot)

    def _apply_reinit(self, fl, cd, init_pair):
        """Scatter freshly-computed init rows into the tracker state for the
        slots scheduled at the current block start."""
        slots = self._reinit.pop(self._next_frame, None)
        if not slots:
            return fl, cd
        fl_i, cd_i = init_pair()
        sel = np.zeros((self.n_streams, 1), bool)
        sel[slots] = True
        sel = jnp.asarray(sel)
        return jnp.where(sel, fl_i, fl), jnp.where(sel, cd_i, cd)

    # -- device-resident ingestion -------------------------------------------

    def enable_device_ingest(self, chunk: int | None = None) -> None:
        """Mirror the live sample buffer on the device, fed bucket by bucket as
        samples arrive, so the per-block prediction dispatch uploads NOTHING —
        it slices its window from the mirror on device. Block latency is then
        pure compute (flat in n_streams), and the raw-sample transport rides
        the stream's own cadence (a few small async writes per block) instead
        of bursting a full window at every block boundary. Used by
        StreamingSeldPipeline; the plain feature-block API keeps the simple
        host-window dispatch."""
        block_samples = self.block_frames * self.hop
        self._dev_B = int(chunk) if chunk else max(2048, block_samples // 4)
        self._dev_R = self._win_len + 4 * self._dev_B
        B, R = self._dev_B, self._dev_R

        def write(dev, packet, start, n):
            cur = jax.lax.dynamic_slice_in_dim(dev, start, B, axis=1)
            new = jnp.where(jnp.arange(B) < n, packet, cur)
            return jax.lax.dynamic_update_slice_in_dim(dev, new, start, axis=1)

        self._dev_write = jax.jit(write)
        self._dev_slide = jax.jit(lambda dev, k: jnp.roll(dev, -k, axis=1))
        self._dev_enabled = True

    def _dev_sync(self, upto: int) -> None:
        """Mirror _buf[:, :upto] onto the device (invariant: _dev[:, :_dev_len]
        == _buf[:, :_dev_len], same start position _pos). Bucket-granular;
        a trailing partial bucket is only forced when a window needs it."""
        if self._dev is None:
            self._dev = jnp.zeros((self._buf.shape[0], self._dev_R),
                                  self.in_dtype)
        B = self._dev_B
        upto = min(upto, self._dev_R - B)
        while self._dev_len < upto:
            n = min(B, self._buf.shape[1] - self._dev_len)
            packet = self._buf[:, self._dev_len : self._dev_len + n]
            if n < B:
                packet = np.concatenate(
                    [packet, np.zeros((packet.shape[0], B - n),
                                      packet.dtype)], axis=1)
            self._dev = self._dev_write(self._dev, jnp.asarray(packet),
                                        jnp.int32(self._dev_len), jnp.int32(n))
            self._dev_len += n

    def _next_input_dev(self):
        """Device-mirror variant of `_next_input`: same bookkeeping, but
        returns (dev, rel_start, floor, countdown) — the window is sliced from
        the mirror inside the caller's fused dispatch, uploading nothing."""
        h, hop = self.halo, self.hop
        start = (self._next_frame - h) * hop
        rel = start - self._pos
        if self._buf is None or rel + self._win_len > self._buf.shape[1]:
            return None
        self._dev_sync(rel + self._win_len)
        if self._tracking and self._tracker is None:
            fl, cd = self._init_fn_dev(self._dev, jnp.int32(rel))
            self._tracker = (fl, cd)
        if self._tracker is None:
            fl = jnp.zeros((self.n_streams, self._n_band), jnp.float32)
            cd = jnp.zeros((self.n_streams, self._n_band), jnp.int32)
        else:
            fl, cd = self._tracker
        if self._reinit:
            fl, cd = self._apply_reinit(
                fl, cd, lambda: self._init_fn_dev(self._dev, jnp.int32(rel)))
        return self._dev, jnp.int32(rel), fl, cd

    def slice_window(self, dev, rel):
        """Inside-jit: the (n_streams, n_channels, win_len) sample window at
        mirror offset `rel` (traced scalar)."""
        w = jax.lax.dynamic_slice_in_dim(dev, rel, self._win_len, axis=1)
        return w.reshape(self.n_streams, self.n_channels, self._win_len)

    @property
    def _init_fn_dev(self):
        fn = getattr(self, "_init_fn_dev_cached", None)
        if fn is None:
            init = jax.vmap(self._make_tracker_init())
            fn = jax.jit(lambda dev, rel: init(self.slice_window(dev, rel)))
            self._init_fn_dev_cached = fn
        return fn

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
            window = _window_to_float(window)
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
        zeros = np.zeros((audio.shape[0], self.halo * self.hop), audio.dtype)
        self._buf = np.concatenate([zeros, refl, audio], axis=-1)
        self._pos = -self.halo * self.hop
        return True

    def _next_input(self):
        """The next complete block's raw inputs (window, floor, countdown), or
        None. The caller dispatches a block fn of its choice on them and MUST
        then call `_commit(floor_out, countdown_out)` to advance the stream —
        this split lets StreamingSeldPipeline fuse extraction into its own
        single-dispatch step while sharing all buffer/tracker bookkeeping."""
        h, hop = self.halo, self.hop
        start = (self._next_frame - h) * hop  # padded-sample window start
        rel = start - self._pos
        if self._buf is None or rel + self._win_len > self._buf.shape[1]:
            return None
        window = jnp.asarray(self._buf[:, rel : rel + self._win_len].reshape(
            self.n_streams, self.n_channels, self._win_len))
        if self._tracking and self._tracker is None:
            fl, cd = self._init_fn(window)
            self._tracker = (fl, cd)
        if self._tracker is None:
            fl = jnp.zeros((self.n_streams, self._n_band), jnp.float32)
            cd = jnp.zeros((self.n_streams, self._n_band), jnp.int32)
        else:
            fl, cd = self._tracker
        if self._reinit:
            fl, cd = self._apply_reinit(fl, cd, lambda: self._init_fn(window))
        return window, fl, cd

    def _commit(self, floor_out, countdown_out):
        """Advance past the block whose inputs `_next_input` returned, storing
        the tracker state its dispatch produced and dropping dead samples."""
        if self._tracking:
            self._tracker = (floor_out, countdown_out)
        self._next_frame += self.block_frames
        keep_from = (self._next_frame - self.halo) * self.hop
        drop = keep_from - self._pos
        if drop > 0:
            self._buf = self._buf[:, drop:]
            self._pos = keep_from
            if self._dev is not None:
                self._dev = self._dev_slide(self._dev, jnp.int32(drop))
                self._dev_len = max(0, self._dev_len - drop)

    def _emit_ready(self) -> list[np.ndarray]:
        out = []
        while (inp := self._next_input()) is not None:
            feats, fl_out, cd_out = self._block_fn(*inp)
            self._commit(fl_out, cd_out)
            feats = np.asarray(feats)  # (N, C, L, F)
            out.append(feats[0] if self.n_streams == 1 else feats)
        return out

    # -- public API ----------------------------------------------------------

    def ingest(self, samples: np.ndarray) -> None:
        """Buffer samples without emitting (the bookkeeping half of `push`;
        StreamingSeldPipeline drives emission itself). Shape (n_channels, n)
        for a single stream; (n_streams, n_channels, n) for synchronized
        multi-stream serving — every stream advances by the same n samples.
        Samples may be float (already normalized) or int16 PCM — int16 is
        decoded on-device (window/32768, exact), halving the per-block
        host->device bytes; a stream must keep one dtype throughout."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        samples = np.asarray(samples)
        if samples.dtype != np.int16:  # int16 PCM streams stay int16 end to
            samples = samples.astype(np.float32, copy=False)  # end (see
        if self._in_dtype is None:     # _window_to_float); floats normalize
            self._in_dtype = samples.dtype
        elif samples.dtype != self._in_dtype:
            raise ValueError(
                f"stream dtype changed mid-stream: started {self._in_dtype}, "
                f"got {samples.dtype}")
        if self.n_streams == 1:
            if samples.ndim != 2 or samples.shape[0] != self.n_channels:
                raise ValueError(
                    f"expected ({self.n_channels}, n) samples, got {samples.shape}")
        else:
            if samples.ndim != 3 or samples.shape[:2] != (self.n_streams,
                                                          self.n_channels):
                raise ValueError(
                    f"expected ({self.n_streams}, {self.n_channels}, n) "
                    f"samples, got {samples.shape}")
            samples = samples.reshape(-1, samples.shape[-1])
        self._samples_seen += samples.shape[1]
        if self._buf is None:
            self._pending.append(samples)
            self._pending_len += samples.shape[1]
            self._seed_buffer()
        else:
            self._buf = np.concatenate([self._buf, samples], axis=-1)
        if self._dev_enabled and self._buf is not None:
            # eager bucket-granular mirroring: ship samples to the device as
            # they arrive so block dispatches find their window already there
            n = self._buf.shape[1]
            self._dev_sync(n - n % self._dev_B)

    def push(self, samples: np.ndarray) -> list[np.ndarray]:
        """Feed (n_channels, n) samples; returns every feature block completed
        by this push (possibly none, possibly several)."""
        self.ingest(samples)
        return self._emit_ready()

    def _flush_pad(self) -> int:
        """End-of-stream buffer completion: lay down the offline extractor's
        trailing reflect pad plus zero filler so every remaining frame's block
        window is complete. Returns the number of true frames remaining (the
        final block's trailing frames beyond it are filler, to be trimmed or
        masked by the caller)."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        self._flushed = True
        total = self.total_frames(self._samples_seen)
        if self._buf is None:
            if not self._pending:
                return 0
            # stream shorter than the reflect pad: pad by reflection of what
            # exists (numpy reflect supports width < length only; tile if not)
            audio = np.concatenate(self._pending, axis=-1)
            self._pending = []
            w = min(self._pad, audio.shape[1] - 1)
            refl = audio[:, 1 : w + 1][:, ::-1]
            zeros = np.zeros((audio.shape[0], self.halo * self.hop), audio.dtype)
            lead = np.zeros((audio.shape[0], self._pad - w), audio.dtype)
            self._buf = np.concatenate([zeros, lead, refl, audio], axis=-1)
            self._pos = -self.halo * self.hop
        remaining = total - self._next_frame
        if remaining <= 0:
            return 0
        # trailing reflect pad (librosa center=True right edge), then zeros to
        # complete the final fixed-shape block window(s)
        tail = self._buf[:, -(self._pad + 1) : -1][:, ::-1]
        L, h = self.block_frames, self.halo
        n_blocks = -(-remaining // L)
        last_start = (self._next_frame + (n_blocks - 1) * L - h) * self.hop
        need = last_start + self._win_len - self._pos
        filler_len = max(0, need - self._buf.shape[1] - tail.shape[1])
        filler = np.zeros((self._buf.shape[0], filler_len), self._buf.dtype)
        self._buf = np.concatenate([self._buf, tail, filler], axis=-1)
        return remaining

    def flush(self) -> np.ndarray:
        """End of stream: reproduce the offline extractor's trailing reflect pad
        and emit the remaining frames. Returns (n_feat_ch, n_remaining, F) —
        with a leading n_streams axis for multi-stream; possibly zero-length."""
        empty = np.zeros((0, 0, 0) if self.n_streams == 1 else
                         (self.n_streams, 0, 0, 0), np.float32)
        remaining = self._flush_pad()
        if remaining <= 0:
            return empty
        blocks = self._emit_ready()
        if not blocks:
            return empty
        feats = np.concatenate(blocks, axis=-2)  # time axis in both layouts
        return feats[..., :remaining, :]


class StreamingSeldPipeline:
    """Online SELD predictions from a live sample feed.

    Chains a StreamingExtractor with the trained CRNN: each block is predicted
    from a fixed window [left_context | block | right_context] and only the
    block's interior label frames are emitted, so every prediction sees
    `right_context` frames of real future (and the CRNN's conv receptive field
    of real past). The window predictions converge to the offline full-clip
    predictions as the contexts grow (tests pin the monotone convergence);
    contexts and block size trade latency against boundary accuracy.

    Latency engineering: everything lives on the device. Raw samples are
    mirrored to the device bucket by bucket AS THEY ARRIVE (async writes riding
    the stream's own cadence; int16 PCM stays int16 on the wire), feature
    blocks are kept device-resident (a deque of the `nb` blocks the prediction
    window spans), and extraction + normalization + window assembly + CRNN
    forward are ONE fused jitted dispatch per block that slices its sample
    window from the mirror — at block time the host uploads nothing and
    fetches only the packed label-rate output (a few KB), so per-block latency
    is pure compute and stays flat as n_streams grows. Window edges beyond the
    stream are represented by blocks holding the scaler MEAN (spec channels),
    which normalization maps to exactly 0 — identical to zero-padding a
    normalized buffer, without a second padded layout. The same single
    compiled graph serves push and flush (flush passes valid=0, which
    degenerates the extraction into a pad block).

    Emits (event_prob, doa_xyz) at label rate per completed block, like
    SeldInferencePipeline but incrementally.

    Multi-stream serving: build the StreamingExtractor with n_streams=N to
    serve N synchronized live streams from ONE fused dispatch per block —
    the streams ride the model's batch dimension (and the extractor's vmap),
    so per-block latency stays near the single-stream cost while aggregate
    realtime capacity scales ~N× (the single-stream dispatch is dominated by
    transport + underfilled compute). push() then takes (N, C, n) packets and
    the emitted (event_prob, doa_xyz) carry a leading stream axis.
    """

    def __init__(self, extractor: StreamingExtractor, model, variables, scaler,
                 interp_ratio: float, n_classes: int,
                 output_format: str = "reg_xyz",
                 left_context: int = 128, right_context: int | None = None):
        self.extractor = extractor
        extractor.enable_device_ingest()
        self.model = model
        # commit weights to the device once — checkpoint restores hand back
        # host-numpy leaves, and re-uploading ~46 MB of params per block
        # dispatch would dwarf the compute (measured 1.05 s vs 43 ms p50)
        self.variables = jax.device_put(variables)
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
        # window geometry in whole blocks: block k's window [kL-left, kL+L+right)
        # spans blocks [k - lb, k + d - 1] at a FIXED in-stack offset, so the
        # window assembly is a static slice of the concatenated block deque.
        self._d = -(-(L + self.right) // L)   # lookahead blocks incl. own
        self._lb = -(-self.left // L)         # history blocks
        self._nb = self._d + self._lb
        self._off = self._lb * L - self.left
        # block array shape without running anything (abstract eval)
        N = extractor.n_streams
        self.n_streams = N
        fspec = jax.eval_shape(
            extractor._block_fn,
            jax.ShapeDtypeStruct((N, extractor.n_channels, extractor._win_len),
                                 jnp.float32),
            jax.ShapeDtypeStruct((N, extractor._n_band), jnp.float32),
            jax.ShapeDtypeStruct((N, extractor._n_band), jnp.int32))[0]
        self._block_shape = fspec.shape  # (N, C, L, F)
        pad = np.zeros(self._block_shape, np.float32)
        pad[:, : self._mean.shape[0]] = self._mean  # normalizes to exactly 0
        self._pad_block = jnp.asarray(pad)
        self._zero_n = jnp.zeros((N,), jnp.int32)
        self._step_fn = jax.jit(self._step)
        self.reset(reset_extractor=False)

    def reset(self, reset_extractor: bool = True):
        """Clear stream state for a new stream (compiled fns are kept)."""
        if reset_extractor:
            self.extractor.reset()
        self._blocks = [self._pad_block] * (self._nb - 1)  # device-resident
        self._m = 0  # feature blocks extracted
        self._next_k = 0  # next prediction block to emit

    @property
    def latency_frames(self) -> int:
        """Feature frames between a frame arriving and its prediction emitting:
        worst case one full block + right context + the feature lookahead."""
        return (self.extractor.block_frames + self.right
                + self.extractor.latency_frames)

    # -- the fused per-block dispatch -----------------------------------------

    def _step(self, dev, rel, floor, cd, prev_blocks, lo, hi, params,
              batch_stats):
        """One streaming step: slice the block's sample window of EVERY stream
        from the device-resident mirror (nothing is uploaded at block time),
        extract its feature block (vmapped over the stream axis), mask frames
        outside the per-stream validity range [lo, hi) to the pad value
        (pre-normalization mean, i.e. normalized zero), and predict the block
        `d-1` behind it from the assembled context window — the N streams ride
        the model's batch dimension, so N-stream serving is one dispatch with
        an N-fold larger matmul batch, not N dispatches. The (N,) lo/hi
        vectors let each stream have its own validity window, which is what
        makes dynamic attach/detach (stream_pool.py) ride the same compiled
        graph: a block before a slot's stream starts (or after it ends) is
        simply all-pad for that slot. Everything stays on device; the packed
        label-rate output is the only thing worth fetching."""
        window = self.extractor.slice_window(dev, rel)
        feats, fl_out, cd_out = self.extractor._block_fn(window, floor, cd)
        L = self.extractor.block_frames
        idx = jnp.arange(L, dtype=jnp.int32)[None, None, :, None]
        live = ((idx >= lo[:, None, None, None])
                & (idx < hi[:, None, None, None]))
        feats = jnp.where(live, feats, self._pad_block)
        stacked = jnp.concatenate(prev_blocks + (feats,), axis=2)
        featw = jax.lax.slice_in_dim(stacked, self._off, self._off + self._W,
                                     axis=2)
        n_sc = self._mean.shape[0]
        featw = jnp.concatenate(
            [(featw[:, :n_sc] - self._mean) / self._std, featw[:, n_sc:]],
            axis=1)
        out = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, featw,
            train=False)
        e0, en = self.left // self.ds, L // self.ds
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
        packed = jnp.concatenate([event_prob, doa], axis=-1)  # (N, T, 4n)
        return feats, fl_out, cd_out, packed

    def _run_step(self, dev, rel, floor, cd, valid: int | None = None,
                  lo=None, hi=None):
        """Dispatch one fused step, rotate the device block deque, and return
        the prediction (host arrays) for block self._next_k if it completed.
        `valid` is the shared-scalar form (frames [0, valid) live for every
        stream); lo/hi are the per-stream (N,) form stream_pool.py uses."""
        if lo is None:
            lo = self._zero_n
        if hi is None:
            hi = jnp.full((self.n_streams,), valid, jnp.int32)
        feats, fl_out, cd_out, packed = self._step_fn(
            dev, rel, floor, cd, tuple(self._blocks), jnp.asarray(
                lo, jnp.int32), jnp.asarray(hi, jnp.int32),
            self.variables["params"], self.variables["batch_stats"])
        self._blocks = self._blocks[1:] + [feats]
        self._m += 1
        if self._m - self._d < self._next_k:  # window not yet in stream
            return None, fl_out, cd_out
        packed = np.asarray(packed)  # (N, T, 4n)
        if self.n_streams == 1:
            packed = packed[0]
        self._next_k += 1
        return ((packed[..., : self.n_classes], packed[..., self.n_classes :]),
                fl_out, cd_out)

    def push(self, samples: np.ndarray) -> list[tuple[np.ndarray, np.ndarray]]:
        """Feed samples — (C, n), or (N, C, n) for n_streams=N — and get
        [(event_prob, doa_xyz)] label-rate arrays of
        self.label_frames_per_block frames (leading stream axis when N>1)
        for each block completed."""
        ext = self.extractor
        results = []
        # ingest in <= one-block slices, draining completed blocks between
        # them, so the device mirror's bounded capacity is never outrun even
        # by a whole-clip push
        step = ext.block_frames * ext.hop
        samples = np.asarray(samples)
        for j in range(0, samples.shape[-1], step):
            ext.ingest(samples[..., j : j + step])
            while (inp := ext._next_input_dev()) is not None:
                res, fl_out, cd_out = self._run_step(
                    *inp, valid=ext.block_frames)
                ext._commit(fl_out, cd_out)
                if res is not None:
                    results.append(res)
        return results

    @property
    def label_frames_per_block(self) -> int:
        return self._label_per_block

    def flush(self) -> list[tuple[np.ndarray, np.ndarray]]:
        """End of stream: extract the tail frames (masking the final block's
        filler frames to the pad value) and predict every remaining block with
        pad-block right context. The final block's predictions are trimmed to
        the stream's true label-frame count."""
        ext = self.extractor
        L = ext.block_frames
        remaining = ext._flush_pad()
        total = self._m * L + remaining
        results = []
        while (inp := ext._next_input_dev()) is not None:
            valid = min(L, max(0, total - self._m * L))
            res, fl_out, cd_out = self._run_step(*inp, valid=valid)
            ext._commit(fl_out, cd_out)
            if res is not None:
                results.append(res)
        # predict the blocks still inside the lookahead, feeding pad context
        # (valid=0 turns the step's extraction into a pad block; the mirror's
        # contents are irrelevant and the tracker outputs are discarded)
        n_total_blocks = -(-total // L)
        zf = jnp.zeros((ext.n_streams, ext._n_band), jnp.float32)
        zc = jnp.zeros((ext.n_streams, ext._n_band), jnp.int32)
        if ext._dev is None and n_total_blocks > self._next_k:
            ext._dev_sync(0)  # allocate an (all-zero) mirror to slice from
        while self._next_k < n_total_blocks:
            res, _, _ = self._run_step(ext._dev, jnp.int32(0), zf, zc, valid=0)
            if res is not None:
                results.append(res)
        # trim the final block to the stream's true label-frame count
        if results and total % L:
            b0 = (n_total_blocks - 1) * L
            n_valid = int(round(np.floor((total - b0) / self.ds)
                                * self.interp_ratio))
            ev, doa = results[-1]
            results[-1] = (ev[..., :n_valid, :], doa[..., :n_valid, :])
        return results
