"""Dynamic multi-stream SELD serving: attach/detach live streams to a fixed
pool of slots, all served by ONE fused dispatch per block.

streaming.py's multi-stream mode serves N *synchronized* streams — they must
all start at sample 0 of the same pool clock, which is how a benchmark runs
but not how serving works: real streams come and go. This pool closes that
gap with exactness, not approximation:

* a joining stream is aligned to the NEXT pool block boundary (bounded wait:
  under one block of samples, added once at stream start), where its slot is
  retroactively seeded with the solo stream-start prefix (pre-stream zeros +
  librosa reflect pad, `StreamingExtractor.write_slot_seed`), its noise
  tracker re-initialized from its own first window exactly as a solo stream's
  would be (`schedule_tracker_reinit`), and its pre-attach blocks masked to
  the pad value by the per-stream validity vectors of the shared fused step —
  so every prediction it ever emits equals a solo `StreamingSeldPipeline` run
  on the same samples (test-pinned, tests/test_stream_pool.py);
* a detaching stream drains exactly like a solo flush: its trailing reflect
  pad rides the normal packet path, the shared step's per-slot `hi` masks its
  frames past end-of-stream, and its final block's label frames are trimmed to
  the stream's true count — while the other streams play on, undisturbed;
* slots are reused: a freed slot accepts a new stream, whose seed write +
  tracker re-init erase the previous occupant.

The pool clock advances in lock-step with the slowest LIVE stream (streams at
one sample rate stay naturally in sync; a stalled stream stalls the pool —
detach it to release the clock). When no live streams remain, the pool
fast-forwards on zeros so draining streams' lookahead predictions complete
immediately.

No reference analog: the reference (thomeou/SALSA) serves offline files only
(experiments/inference.py:24-156). This is the serving layer the measured
"~135 concurrent live streams per chip" headroom (BENCH.md) actually needs —
capacity means nothing if streams must all start at the same instant.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from salsa_tpu.streaming import StreamingExtractor, StreamingSeldPipeline


@dataclass
class _Stream:
    slot: int
    state: str  # 'pending' | 'live' | 'draining' | 'done'
    queue: list[np.ndarray] = field(default_factory=list)
    queued: int = 0
    first_block: int | None = None
    samples: int = 0             # true stream samples pushed (pre-tail)
    cache: np.ndarray | None = None  # rolling last pad+1 samples (tail source)
    last_block: int | None = None
    trim: int | None = None      # final-block label frames (None: full block)
    out: list = field(default_factory=list)


class SeldStreamPool:
    """A fixed-capacity pool of live SELD streams over one fused pipeline.

    handle = pool.attach()              # reserve a slot (None if full)
    preds  = pool.push(handle, samples) # (C, n) samples -> [(ev, doa), ...]
    preds += pool.detach(handle)        # end of stream: the tail predictions
    pool.poll(handle)                   # collect without pushing

    Predictions surface per handle as the shared pool clock completes blocks;
    each stream's outputs are exactly a solo StreamingSeldPipeline's for the
    same samples (including the flush tail), label-rate, in stream order.
    """

    def __init__(self, pipeline: StreamingSeldPipeline):
        ext = pipeline.extractor
        if not ext._dev_enabled:
            raise ValueError("the pool needs the pipeline's device-ingest "
                             "mode (StreamingSeldPipeline enables it)")
        self.pipe = pipeline
        self.ext: StreamingExtractor = ext
        self.capacity = ext.n_streams
        self._L = ext.block_frames
        self._hop = ext.hop
        self._tick = self._L * self._hop
        self._pad = ext._pad
        self._total = 0        # pool global samples ingested
        self._dtype: np.dtype | None = None  # fixed by the first push
        self._n_out = 0        # pool block index of the next emitted prediction
        self._next_handle = 0
        self._streams: dict[int, _Stream] = {}
        self._free = list(range(self.capacity))

    # -- public API -----------------------------------------------------------

    def attach(self) -> int | None:
        """Reserve a slot for a new stream; returns its handle, or None when
        the pool is full. The stream goes live at the next pool block boundary
        once at least required_pad+1 of its samples have been pushed."""
        if not self._free:
            return None
        slot = self._free.pop(0)
        h = self._next_handle
        self._next_handle += 1
        self._streams[h] = _Stream(slot=slot, state="pending")
        return h

    def push(self, handle: int, samples: np.ndarray) -> list:
        """Feed (n_channels, n) samples for one stream; returns every
        completed (event_prob, doa_xyz) label-rate block of THAT stream
        (other streams' completed blocks buffer until their own push/poll)."""
        s = self._stream(handle)
        if s.state not in ("pending", "live"):
            raise RuntimeError(f"stream {handle} is {s.state}")
        samples = np.asarray(samples)
        if samples.dtype != np.int16:
            samples = samples.astype(np.float32, copy=False)
        if self._dtype is None:
            self._dtype = samples.dtype
        elif samples.dtype != self._dtype:
            raise ValueError(f"pool dtype is {self._dtype} (fixed by the "
                             f"first push), got {samples.dtype}")
        if samples.ndim != 2 or samples.shape[0] != self.ext.n_channels:
            raise ValueError(f"expected ({self.ext.n_channels}, n) samples, "
                             f"got {samples.shape}")
        if samples.shape[1]:
            s.queue.append(samples)
            s.queued += samples.shape[1]
            s.samples += samples.shape[1]
            tail = (samples if s.cache is None
                    else np.concatenate([s.cache, samples], axis=1))
            s.cache = tail[:, -(self._pad + 1):]
        self._drain()
        return self.poll(handle)

    def poll(self, handle: int) -> list:
        """Collect a stream's buffered predictions without pushing samples.
        A fully-collected finished handle returns [] (it is forgotten once
        drained, so polling after the end is always safe)."""
        s = self._streams.get(handle)
        if s is None:
            return []
        out, s.out = s.out, []
        if s.state == "done" and not out:
            del self._streams[handle]
        return out

    def detach(self, handle: int) -> list:
        """End a stream: enqueue its solo-flush tail (trailing reflect pad),
        mask everything past its true end, and free the slot once its last
        prediction emits. Returns the predictions available immediately —
        when no other live stream gates the pool clock, that is ALL of them
        (the pool fast-forwards on zeros); otherwise the rest surface via
        poll() as the remaining streams advance the clock."""
        s = self._stream(handle)
        if s.state == "pending":
            self._free.append(s.slot)
            del self._streams[handle]
            return []
        if s.state != "live":
            raise RuntimeError(f"stream {handle} is {s.state}")
        total = self.ext.total_frames(s.samples)  # solo frame count
        tail = s.cache[:, -(self._pad + 1) : -1][:, ::-1]  # librosa right refl
        s.queue.append(tail)
        s.queued += tail.shape[1]
        s.state = "draining"
        n_blocks = -(-total // self._L)
        s.last_block = s.first_block + n_blocks - 1
        rem = total - (n_blocks - 1) * self._L
        if rem < self._L:  # partial final block: trim its label frames
            s.trim = int(round(np.floor(rem / self.pipe.ds)
                               * self.pipe.interp_ratio))
        self._drain()
        return self.poll(handle)

    def finished(self, handle: int) -> bool:
        """True once a detached stream's every prediction has been collected
        (poll() forgets the handle at that point); unknown handles are
        finished by definition, so callers can loop `until finished`."""
        s = self._streams.get(handle)
        if s is None:
            return True
        if s.state == "done" and not s.out:
            del self._streams[handle]  # same forget-once-drained as poll()
            return True
        return False

    @property
    def n_live(self) -> int:
        return sum(s.state in ("live", "draining")
                   for s in self._streams.values())

    # -- pool clock -----------------------------------------------------------

    def _stream(self, handle: int) -> _Stream:
        try:
            return self._streams[handle]
        except KeyError:
            raise KeyError(f"unknown stream handle {handle}") from None

    def _drain(self) -> None:
        """Advance the pool clock as far as the streams allow: lock-step with
        the slowest live stream; zeros fast-forward when only draining streams
        remain (their lookahead predictions need the clock, not samples)."""
        ext = self.ext
        guard = 0
        while True:
            guard += 1
            if guard > 100_000:  # a bug, not a workload: fail loudly
                raise RuntimeError("pool clock failed to converge")
            if self._total % self._tick == 0:
                self._activate_ready()
            states = [s.state for s in self._streams.values()]
            feeders = [s for s in self._streams.values() if s.state == "live"]
            to_boundary = self._tick - self._total % self._tick
            if feeders:
                m = min(min(s.queued for s in feeders), to_boundary)
            elif "draining" in states:
                m = to_boundary  # zeros fast-forward to finish the drains
            else:
                return
            if m == 0:
                return
            packet = np.zeros((self.capacity, self.ext.n_channels, m),
                              self._dtype or np.float32)
            for s in self._streams.values():
                if s.state in ("live", "draining") and s.queued:
                    n = min(m, s.queued)
                    packet[s.slot, :, :n] = self._pop(s, m)
            # n_streams=1 extractors keep the plain (C, n) API
            ext.ingest(packet[0] if self.capacity == 1 else packet)
            self._total += m
            self._pump()

    def _activate_ready(self) -> None:
        """Go-live for pending streams at this exact block boundary: seed the
        slot's padded timeline, schedule its tracker re-init, record its block
        offset. Needs required_pad+1 queued samples (the reflect source)."""
        k = self._total // self._tick
        for s in self._streams.values():
            if s.state != "pending" or s.queued < self._pad + 1:
                continue
            if self._total:
                first = s.queue[0]
                while first.shape[1] < self._pad + 1:  # coalesce tiny pushes
                    s.queue = [np.concatenate(s.queue[:2], axis=1)] + s.queue[2:]
                    first = s.queue[0]
                self.ext.write_slot_seed(
                    s.slot, first[:, : self._pad + 1], k * self._L)
                self.ext.schedule_tracker_reinit(s.slot, k * self._L)
            s.state = "live"
            s.first_block = k

    def _pop(self, s: _Stream, m: int) -> np.ndarray:
        take, got = [], 0
        while got < m and s.queue:
            a = s.queue[0]
            n = min(a.shape[1], m - got)
            take.append(a[:, :n])
            got += n
            if n == a.shape[1]:
                s.queue.pop(0)
            else:
                s.queue[0] = a[:, n:]
        s.queued -= got
        return np.concatenate(take, axis=1) if len(take) > 1 else take[0]

    def _pump(self) -> None:
        """Extract+predict every block the ingested samples completed, with
        per-slot validity windows, and distribute the emitted predictions."""
        ext = self.ext
        while (inp := ext._next_input_dev()) is not None:
            blk = ext._next_frame // self._L
            lo, hi = self._lo_hi(blk)
            res, fl_out, cd_out = self.pipe._run_step(*inp, lo=lo, hi=hi)
            ext._commit(fl_out, cd_out)
            if res is not None:
                self._distribute(res)

    def _lo_hi(self, blk: int) -> tuple[np.ndarray, np.ndarray]:
        lo = np.zeros((self.capacity,), np.int32)
        hi = np.zeros((self.capacity,), np.int32)
        for s in self._streams.values():
            if s.first_block is None or blk < s.first_block:
                continue
            if s.state == "live":
                hi[s.slot] = self._L
            elif s.state == "draining":
                # frames of this block before the stream's true end
                end = (s.first_block - blk) * self._L + self.ext.total_frames(
                    s.samples)
                hi[s.slot] = np.clip(end, 0, self._L)
        return lo, hi

    def _distribute(self, res) -> None:
        ev, doa = res
        if self.capacity == 1:  # _run_step squeezes the stream axis at N=1
            ev, doa = ev[None], doa[None]
        k = self._n_out
        self._n_out += 1
        for s in self._streams.values():
            if (s.first_block is None or s.state not in ("live", "draining")
                    or k < s.first_block):
                continue
            if s.last_block is not None and k > s.last_block:
                continue
            e, d = ev[s.slot], doa[s.slot]
            if s.last_block is not None and k == s.last_block:
                if s.trim is not None:
                    e, d = e[: s.trim], d[: s.trim]
                s.state = "done"
                self._free.append(s.slot)
            s.out.append((e, d))
