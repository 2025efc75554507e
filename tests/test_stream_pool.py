"""Dynamic stream pool (salsa_tpu/stream_pool.py) vs solo pipelines.

The contract pinned here: a stream served by a SeldStreamPool slot — attached
at an arbitrary time, sharing the fused dispatch with other live streams,
detached while they play on — emits exactly the predictions a dedicated solo
StreamingSeldPipeline run on the same samples would, including the flush tail
and its final-block label trim. Attach alignment (next block boundary), the
retroactive slot seed (pre-stream zeros + reflect pad), the per-slot tracker
re-init, and the per-slot validity masking are all under this one equality.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from salsa_tpu.features.registry import make_extractor
from salsa_tpu.models.seld import build_model
from salsa_tpu.stream_pool import SeldStreamPool
from salsa_tpu.streaming import StreamingExtractor, StreamingSeldPipeline

FS, N_FFT, HOP, L = 8000, 256, 400, 32
LEFT, RIGHT = 48, 64
TICK = L * HOP


def _tiny_model():
    return build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": "gru",
                 "decoder_size": 16},
        n_classes=3,
    )


def _setup(feature_type="salsa_lite", audio_format="mic", **kw):
    """Model/scaler/ctor kwargs shared by the pool and the solo oracles."""
    probe = (0.1 * np.random.default_rng(0).standard_normal(
        (4, 3 * FS))).astype(np.float32)
    off = make_extractor(feature_type, audio_format, fs=FS, n_fft=N_FFT,
                         hop_length=HOP, jit=False, **kw)
    feat = np.asarray(off(probe))
    mean = feat[:4].mean(axis=1, keepdims=True)
    std = feat[:4].std(axis=1, keepdims=True) + 1e-6
    model = _tiny_model()
    variables = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 7, 64, feat.shape[2]), jnp.float32), train=False)
    interp = 16 * 10 / (FS / HOP)  # = 8 label frames per encoder frame block
    ctor = dict(feature_type=feature_type, audio_format=audio_format, fs=FS,
                n_fft=N_FFT, hop_length=HOP, block_frames=L, **kw)
    return model, variables, (mean, std), interp, ctor


def _solo(model, variables, scaler, interp, ctor, wave, push=2500):
    pipe = StreamingSeldPipeline(
        StreamingExtractor(**ctor), model, variables, scaler, interp,
        n_classes=3, left_context=LEFT, right_context=RIGHT)
    outs = []
    for i in range(0, wave.shape[1], push):
        outs += pipe.push(wave[:, i : i + push])
    outs += pipe.flush()
    return outs


def _pool(model, variables, scaler, interp, ctor, capacity):
    pipe = StreamingSeldPipeline(
        StreamingExtractor(n_streams=capacity, **ctor), model, variables,
        scaler, interp, n_classes=3, left_context=LEFT, right_context=RIGHT)
    return SeldStreamPool(pipe)


def _cat(outs):
    return (np.concatenate([o[0] for o in outs], axis=0),
            np.concatenate([o[1] for o in outs], axis=0))


def _assert_equal(got, want, atol):
    ge, gd = _cat(got)
    we, wd = _cat(want)
    assert ge.shape == we.shape and gd.shape == wd.shape
    np.testing.assert_allclose(ge, we, atol=atol)
    np.testing.assert_allclose(gd, wd, atol=atol)


def _wave(seed, seconds):
    n = int(seconds * FS)
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    return (0.1 * rng.standard_normal((4, n))
            + 0.3 * np.sin(2 * np.pi * (250.0 + 60 * seed) * t)
            ).astype(np.float32)


def test_pool_attach_and_early_detach_match_solo():
    """Stream A runs from pool start; B attaches two blocks in and detaches
    early while A plays on; every prediction of both equals the solo runs."""
    setup = _setup(fmax_doa=2000.0)
    wave_a = _wave(1, 6.5)
    wave_b = _wave(2, 3.3)
    solo_a = _solo(*setup, wave_a)
    solo_b = _solo(*setup, wave_b)

    pool = _pool(*setup, capacity=2)
    ha = pool.attach()
    hb = None
    got_a, got_b = [], []
    pos_a = pos_b = 0
    push = 2500
    while pos_a < wave_a.shape[1]:
        got_a += pool.push(ha, wave_a[:, pos_a : pos_a + push])
        pos_a += push
        # B joins once A has fed two full blocks
        if hb is None and pos_a >= 2 * TICK:
            hb = pool.attach()
        if hb is not None and pos_b < wave_b.shape[1]:
            got_b += pool.push(hb, wave_b[:, pos_b : pos_b + push])
            pos_b += push
            if pos_b >= wave_b.shape[1]:  # B ends first, A keeps going
                got_b += pool.detach(hb)
    got_a += pool.detach(ha)
    got_b += pool.poll(hb)  # tail blocks completed by A's later pushes

    _assert_equal(got_a, solo_a, atol=1e-5)
    _assert_equal(got_b, solo_b, atol=1e-5)
    assert pool.n_live == 0


def test_pool_salsa_tracker_reinit_matches_solo():
    """Same contract with SALSA (noise tracking): the joining slot's tracker
    re-init from its own first window must reproduce the solo init exactly."""
    setup = _setup("salsa", "foa", fmax_doa=3000.0, eig_method="power")
    wave_a = _wave(3, 5.0)
    wave_b = _wave(4, 2.7)
    solo_b = _solo(*setup, wave_b)

    pool = _pool(*setup, capacity=2)
    ha = pool.attach()
    pos_a = 0
    push = 2500
    while pos_a < 2 * TICK:  # A runs two blocks before B joins
        pool.push(ha, wave_a[:, pos_a : pos_a + push])
        pos_a += push
    hb = pool.attach()
    got_b = []
    pos_b = 0
    # interleave: the pool clock advances in lock-step with the slowest LIVE
    # stream, so A must keep feeding while B streams
    while pos_b < wave_b.shape[1] or pos_a < wave_a.shape[1]:
        if pos_a < wave_a.shape[1]:
            pool.push(ha, wave_a[:, pos_a : pos_a + push])
            pos_a += push
        if pos_b < wave_b.shape[1]:
            got_b += pool.push(hb, wave_b[:, pos_b : pos_b + push])
            pos_b += push
            if pos_b >= wave_b.shape[1]:
                got_b += pool.detach(hb)
    pool.detach(ha)  # last live stream: fast-forwards both drains
    got_b += pool.poll(hb)

    # salsa eigenvector numerics at batch 2: extractor-test tolerance
    _assert_equal(got_b, solo_b, atol=2e-4)


def test_pool_slot_reuse_capacity_one():
    """Detach frees the slot for a new stream: with capacity 1, stream C
    reuses A's slot (retro seed + tracker state overwrite the previous
    occupant) and still matches its solo run; detaching the last live stream
    fast-forwards its tail immediately (nothing left to gate the clock)."""
    setup = _setup(fmax_doa=2000.0)
    wave_a = _wave(5, 3.1)
    wave_c = _wave(6, 2.6)
    solo_a = _solo(*setup, wave_a)
    solo_c = _solo(*setup, wave_c)

    pool = _pool(*setup, capacity=1)
    ha = pool.attach()
    assert pool.attach() is None  # full
    got_a = []
    for i in range(0, wave_a.shape[1], 2000):
        got_a += pool.push(ha, wave_a[:, i : i + 2000])
    got_a += pool.detach(ha)  # last live stream: tail arrives right here
    _assert_equal(got_a, solo_a, atol=1e-5)

    hc = pool.attach()
    assert hc is not None and hc != ha
    got_c = []
    for i in range(0, wave_c.shape[1], 2000):
        got_c += pool.push(hc, wave_c[:, i : i + 2000])
    got_c += pool.detach(hc)
    _assert_equal(got_c, solo_c, atol=1e-5)


def test_pool_pending_detach_promotes_to_solo():
    """A clip fully pushed BETWEEN block boundaries (another stream holds the
    clock mid-block) and detached while still 'pending' must not be dropped:
    detach() promotes it — it goes live at the next boundary and immediately
    drains, so its predictions equal the solo run exactly (the CLI relies on
    this for sub-block clips; a discarded pending stream would silently lose
    the clip from downstream evaluation)."""
    setup = _setup(fmax_doa=2000.0)
    wave_a = _wave(8, 4.2)
    wave_b = _wave(9, 1.1)  # shorter than one pool block (TICK/FS = 1.6 s)
    solo_b = _solo(*setup, wave_b)

    pool = _pool(*setup, capacity=2)
    ha = pool.attach()
    push = 2500
    # park the pool clock mid-block: one block plus a fraction
    pos_a = 0
    while pos_a < TICK + push:
        pool.push(ha, wave_a[:, pos_a : pos_a + push])
        pos_a += push
    hb = pool.attach()
    got_b = pool.push(hb, wave_b)       # everything at once, mid-block
    got_b += pool.detach(hb)            # still pending -> promoted, not dropped
    while pos_a < wave_a.shape[1]:      # A's feed advances the shared clock
        pool.push(ha, wave_a[:, pos_a : pos_a + push])
        pos_a += push
        got_b += pool.poll(hb)
    pool.detach(ha)                     # last live stream: fast-forward drains
    got_b += pool.poll(hb)

    _assert_equal(got_b, solo_b, atol=1e-5)
    assert pool.finished(hb) and pool.n_live == 0


def test_pool_no_fill_for_healthy_paced_streams_with_joiner_backlog():
    """Regression for the round-5 hardware verify failure: two equal-pace
    streams fed round-robin, where B misses block-0 activation by push
    ordering and waits one block as pending, accumulating exactly one block
    of backlog. With max_lag SMALLER than a block, the stall policy must NOT
    read that normal join backlog as clock lag — no stream may be
    zero-filled, and both outputs stay exactly their solo runs (B's merely
    delayed by its activation block)."""
    setup = _setup(fmax_doa=2000.0)
    wave_a = _wave(20, 4.0)
    wave_b = _wave(21, 4.0)
    solo_a = _solo(*setup, wave_a)
    solo_b = _solo(*setup, wave_b)

    pool = _pool(*setup, capacity=2)
    pool.max_lag = TICK // 4  # well under one block — the failing geometry
    ha, hb = pool.attach(), pool.attach()
    push = 2500
    got_a, got_b = [], []
    ended_a = ended_b = False
    pos = 0
    while not (ended_a and ended_b):
        if not ended_a:
            got_a += pool.push(ha, wave_a[:, pos : pos + push])
            if pos + push >= wave_a.shape[1]:
                got_a += pool.detach(ha)
                ended_a = True
        if not ended_b:
            # B's first push lands AFTER the clock left boundary 0: B stays
            # pending for a full block while A paces the clock
            got_b += pool.push(hb, wave_b[:, pos : pos + push])
            if pos + push >= wave_b.shape[1]:
                got_b += pool.detach(hb)
                ended_b = True
        pos += push
    got_a += pool.poll(ha)
    got_b += pool.poll(hb)

    assert pool.fill_report(ha) == [] and pool.fill_report(hb) == []
    _assert_equal(got_a, solo_a, atol=1e-5)
    _assert_equal(got_b, solo_b, atol=1e-5)


def test_pool_stall_policy_zero_fills_laggard():
    """max_lag bounds head-of-line blocking: stream B goes live then falls
    silent; A keeps pushing. With max_lag = one block, A's predictions keep
    flowing (and stay exactly its solo run — slots are independent), while
    B's slot is zero-filled and the concealment is reported. Under the
    default exact clock the same scenario would freeze A's output after one
    block."""
    setup = _setup(fmax_doa=2000.0)
    wave_a = _wave(10, 10.0)
    wave_b = _wave(11, 0.5)
    solo_a = _solo(*setup, wave_a)

    pool = _pool(*setup, capacity=2)
    pool.max_lag = TICK  # one pool block of allowed lag
    ha, hb = pool.attach(), pool.attach()
    push = 2500
    got_a = pool.push(ha, wave_a[:, :push])  # A live from block 0
    got_b = pool.push(hb, wave_b)  # B feeds half a second, then never again
    for i in range(push, wave_a.shape[1], push):
        got_a += pool.push(ha, wave_a[:, i : i + push])
        got_b += pool.poll(hb)
    # A's output flowed despite B's stall: several blocks before any detach
    assert len(got_a) >= 2, "laggard froze the healthy stream's predictions"
    got_b += pool.detach(hb)
    got_a += pool.detach(ha)
    got_b += pool.poll(hb)
    _assert_equal(got_a, solo_a, atol=1e-5)

    fills = pool.fill_report(hb)
    assert fills, "stalled stream should have been zero-filled"
    n_fill = sum(b - a for a, b in fills)
    assert n_fill > 0
    # effective length = pushed + filled; every fill starts after B's real feed
    assert all(a >= wave_b.shape[1] for a, _ in fills)
    # B's prediction count covers its effective (pushed + concealed) timeline
    eb, _ = _cat(got_b)
    label_ranges = pool.fill_label_ranges(hb)
    assert label_ranges and label_ranges[0][0] <= eb.shape[0]


def test_pool_tick_finishes_drains_behind_silent_live():
    """tick(): with every live client silent, a detached stream's tail blocks
    would stall forever under the lock-step clock; wall-clock ticks zero-fill
    the silent live stream and complete the drain. The drained stream's
    predictions still equal its solo run exactly (the fill lands in the OTHER
    slot)."""
    setup = _setup(fmax_doa=2000.0)
    wave_a = _wave(12, 2.0)
    wave_b = _wave(13, 2.4)
    solo_b = _solo(*setup, wave_b)

    pool = _pool(*setup, capacity=2)
    ha, hb = pool.attach(), pool.attach()
    pool.push(ha, wave_a)  # A goes live ... then its client falls silent
    got_b = pool.push(hb, wave_b)
    got_b += pool.detach(hb)  # B drains; A (live, silent) gates the clock
    n_before = len(got_b)
    for _ in range(64):
        if pool.finished(hb):
            break
        pool.tick()
        got_b += pool.poll(hb)
    assert pool.finished(hb), "tick() failed to complete the drain"
    assert len(got_b) > n_before
    _assert_equal(got_b, solo_b, atol=1e-5)
    assert pool.fill_report(ha), "silent live stream should carry the fill"


def test_pool_accepts_int16_client_in_float_pool():
    """dtype lift: a float32 pool accepts an int16 client (decoded host-side,
    exact), so mixed clients share one pool; only an all-int16 pool keeps
    int16 on the wire. An int16-first pool stays homogeneous."""
    setup = _setup(fmax_doa=2000.0)
    wave = _wave(14, 2.2)
    q = np.clip(np.round(wave * 32768.0), -32768, 32767).astype(np.int16)
    dec = q.astype(np.float32) / 32768.0
    solo = _solo(*setup, dec)

    pool = _pool(*setup, capacity=2)
    ha, hb = pool.attach(), pool.attach()
    wave_a = _wave(15, 2.2)
    got = []
    for i in range(0, q.shape[1], 2500):
        pool.push(ha, wave_a[:, i : i + 2500])    # float32 fixes pool dtype
        got += pool.push(hb, q[:, i : i + 2500])  # int16 client, same pool
    got += pool.detach(hb)
    pool.detach(ha)
    got += pool.poll(hb)
    _assert_equal(got, solo, atol=1e-5)

    pool2 = _pool(*setup, capacity=2)
    h2 = pool2.attach()
    pool2.push(h2, q[:, :4000])          # int16-first: homogeneous
    with pytest.raises(ValueError):
        pool2.push(h2, wave[:, :1000])


def test_pool_api_guards():
    setup = _setup(fmax_doa=2000.0)
    pool = _pool(*setup, capacity=2)
    h = pool.attach()
    pool.push(h, _wave(7, 0.5))
    with pytest.raises(KeyError):
        pool.push(99, _wave(7, 0.1))
    with pytest.raises(ValueError):
        pool.push(h, np.zeros((3, 100), np.float32))  # wrong channel count
    # detaching a pending (never-activated... here active) stream works; a
    # second detach of the same handle is an error
    pool.detach(h)
    with pytest.raises((RuntimeError, KeyError)):
        pool.detach(h)
