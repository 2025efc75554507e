"""Streaming (online) extraction + inference vs the offline oracles.

Contracts pinned here (salsa_tpu/streaming.py):
  * frame-local feature types stream EXACTLY (every frame, including the flush
    tail's reflect padding) for any push-chunking of the sample feed;
  * salsa streams exactly on [h, T-h) — and everywhere when the stream starts
    and ends in silence, since the live zero context then equals the reference's
    wrapped clip-edge frames (salsa_feature_extraction.py:43);
  * the streaming pipeline's label-frame accounting matches the offline
    pipeline exactly, and its predictions converge to the offline full-clip
    predictions as the context window grows.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from salsa_tpu.features.registry import make_extractor
from salsa_tpu.features.salsa import SalsaParams, extract_salsa
from salsa_tpu.features.salsa_lite import SalsaLiteParams, extract_salsa_lite
from salsa_tpu.models.seld import build_model, interpolate_index_repeat
from salsa_tpu.streaming import StreamingExtractor, StreamingSeldPipeline

FS, N_FFT, HOP = 8000, 256, 150
PUSH_SIZES = (777, 1531, 4096, 50, 9000)


def stream_all(se: StreamingExtractor, wave: np.ndarray,
               sizes=PUSH_SIZES) -> np.ndarray:
    """Push `wave` through in irregular chunks, flush, concatenate."""
    blocks, i, k = [], 0, 0
    while i < wave.shape[-1]:
        m = sizes[k % len(sizes)]
        k += 1
        blocks += se.push(wave[..., i : i + m])
        i += m
    tail = se.flush()
    if tail.size:
        blocks.append(tail)
    return np.concatenate(blocks, axis=-2)


def make_wave(rng, seconds=4.0, silence_edges=False):
    n = int(seconds * FS)
    wave = (0.1 * rng.standard_normal((4, n))).astype(np.float32)
    t = np.arange(n) / FS
    wave += 0.4 * np.sin(2 * np.pi * 500.0 * t).astype(np.float32)
    if silence_edges:
        sil = 4 * HOP + N_FFT
        wave[:, :sil] = 0.0
        wave[:, -sil:] = 0.0
    return wave


def test_streaming_salsa_lite_exact(rng):
    wave = make_wave(rng)
    p = SalsaLiteParams(fs=FS, n_fft=N_FFT, hop_length=HOP, fmax_doa=2000.0)
    full = np.asarray(extract_salsa_lite(wave, p))
    se = StreamingExtractor("salsa_lite", "mic", fs=FS, n_fft=N_FFT,
                            hop_length=HOP, block_frames=32, fmax_doa=2000.0)
    feats = stream_all(se, wave)
    assert feats.shape == full.shape == (7, se.total_frames(wave.shape[1]),
                                         p.n_features)
    np.testing.assert_allclose(feats, full, atol=1e-5)


def test_streaming_melspeciv_exact(rng):
    wave = make_wave(rng, seconds=2.5)
    off = make_extractor("melspeciv", "foa", fs=FS, n_fft=N_FFT, hop_length=HOP,
                         n_mels=64, jit=False)
    full = np.asarray(off(wave))
    se = StreamingExtractor("melspeciv", "foa", fs=FS, n_fft=N_FFT,
                            hop_length=HOP, block_frames=16, n_mels=64)
    feats = stream_all(se, wave, sizes=(501, 3333))
    assert feats.shape == full.shape
    np.testing.assert_allclose(feats, full, atol=2e-4, rtol=1e-4)


def test_streaming_gcc_exact(rng):
    """linspecgcc exercises the double-length-FFT framing (bigger reflect pad +
    per-branch pad offsets) through the streaming buffer."""
    wave = make_wave(rng, seconds=2.5)
    off = make_extractor("linspecgcc", "mic", fs=FS, n_fft=N_FFT,
                         hop_length=HOP, jit=False)
    full = np.asarray(off(wave))
    se = StreamingExtractor("linspecgcc", "mic", fs=FS, n_fft=N_FFT,
                            hop_length=HOP, block_frames=16)
    feats = stream_all(se, wave, sizes=(2000, 111, 5000))
    assert feats.shape == full.shape
    np.testing.assert_allclose(feats, full, atol=2e-4, rtol=1e-4)


def test_streaming_salsa_exact_with_silent_edges(rng):
    """With silence at both stream edges the live zero context equals the
    reference's wrap context, so tracking, masking and eigenvectors all match:
    spec channels everywhere, eig channels on every frame."""
    wave = make_wave(rng, silence_edges=True)
    p = SalsaParams(fs=FS, n_fft=N_FFT, hop_length=HOP, fmax_doa=2000.0,
                    audio_format="foa", eig_method="power")
    full = np.asarray(extract_salsa(wave, p))
    se = StreamingExtractor("salsa", "foa", fs=FS, n_fft=N_FFT, hop_length=HOP,
                            block_frames=32, fmax_doa=2000.0,
                            eig_method="power")
    assert se.latency_frames == p.n_hopframes
    feats = stream_all(se, wave)
    assert feats.shape == full.shape
    np.testing.assert_allclose(feats, full, atol=2e-4, rtol=1e-4)


def test_streaming_salsa_interior_exact_live(rng):
    """Without silence brackets the stream sees zeros where the offline
    extractor wraps the clip edges (live semantics). With tracking disabled the
    only wrap dependence is the covariance context, so every interior frame is
    exact; spec channels are frame-local and exact everywhere."""
    wave = make_wave(rng, seconds=3.0)
    p = SalsaParams(fs=FS, n_fft=N_FFT, hop_length=HOP, fmax_doa=2000.0,
                    audio_format="foa", eig_method="power", is_tracking=False)
    full = np.asarray(extract_salsa(wave, p))
    se = StreamingExtractor("salsa", "foa", fs=FS, n_fft=N_FFT, hop_length=HOP,
                            block_frames=32, fmax_doa=2000.0,
                            eig_method="power", is_tracking=False)
    feats = stream_all(se, wave)
    h = p.n_hopframes
    T = full.shape[1]
    # spectrogram channels are frame-local: exact on every frame
    np.testing.assert_allclose(feats[:4], full[:4], atol=2e-4, rtol=1e-4)
    # eig channels: exact away from the wrap-context edges
    np.testing.assert_allclose(feats[4:, h : T - h], full[4:, h : T - h],
                               atol=2e-4, rtol=1e-4)


def test_streaming_salsa_live_tracking_agreement(rng):
    """With tracking on, the live tracker init reads pre-stream zeros where the
    reference reads the wrapped clip tail, so the recurrent state can disagree
    on isolated near-threshold (frame, bin) cells. The features must still be
    identical wherever both paths accept the cell, and disagreements must be
    rare (<1%)."""
    wave = make_wave(rng, seconds=3.0)
    p = SalsaParams(fs=FS, n_fft=N_FFT, hop_length=HOP, fmax_doa=2000.0,
                    audio_format="foa", eig_method="power")
    full = np.asarray(extract_salsa(wave, p))
    se = StreamingExtractor("salsa", "foa", fs=FS, n_fft=N_FFT, hop_length=HOP,
                            block_frames=32, fmax_doa=2000.0,
                            eig_method="power")
    feats = stream_all(se, wave)
    np.testing.assert_allclose(feats[:4], full[:4], atol=2e-4, rtol=1e-4)
    h = p.n_hopframes
    T = full.shape[1]
    a, b = feats[4:, h : T - h], full[4:, h : T - h]
    both = (a != 0) & (b != 0)
    np.testing.assert_allclose(a[both], b[both], atol=2e-4, rtol=1e-4)
    disagree = ((a == 0) != (b == 0)).mean()
    assert disagree < 0.01, disagree


def test_streaming_short_stream_flush(rng):
    """A stream shorter than one block (and shorter than the reflect pad)
    still flushes the offline frame count."""
    wave = make_wave(rng, seconds=0.05)  # 400 samples < required_pad+1
    p = SalsaLiteParams(fs=FS, n_fft=N_FFT, hop_length=HOP, fmax_doa=2000.0)
    se = StreamingExtractor("salsa_lite", "mic", fs=FS, n_fft=N_FFT,
                            hop_length=HOP, block_frames=32, fmax_doa=2000.0)
    assert se.push(wave) == []
    tail = se.flush()
    assert tail.shape[1] == se.total_frames(wave.shape[1])


def test_streaming_int16_pcm_exact(rng):
    """int16 PCM ingestion (on-device decode, streaming.py::_window_to_float)
    is bit-identical to pushing the host-converted floats — every int16/2**15
    is exactly representable in float32 — at half the host->device bytes per
    block. Salsa covers the tracker-init trace's dtype path too."""
    wave_f = make_wave(rng, seconds=2.5)
    pcm = np.clip(np.round(wave_f * 32768.0), -32768, 32767).astype(np.int16)
    as_float = pcm.astype(np.float32) / 32768.0
    kw = dict(fs=FS, n_fft=N_FFT, hop_length=HOP, block_frames=32,
              fmax_doa=2000.0, eig_method="power")
    got = stream_all(StreamingExtractor("salsa", "foa", **kw), pcm)
    want = stream_all(StreamingExtractor("salsa", "foa", **kw), as_float)
    np.testing.assert_array_equal(got, want)

    se = StreamingExtractor("salsa", "foa", **kw)
    se.push(pcm[:, :1000])
    with pytest.raises(ValueError, match="dtype changed"):
        se.push(as_float[:, :1000])


def _tiny_model():
    model = build_model(
        encoder={"name": "PannResNet22", "n_input_channels": 7},
        decoder={"name": "SeldDecoder", "decoder_type": "gru",
                 "decoder_size": 16},
        n_classes=3,
    )
    return model


def _offline_predictions(model, variables, feat_norm, interp_ratio):
    out = model.apply(variables, jnp.asarray(feat_norm)[None], train=False)
    ev = np.asarray(jax.nn.sigmoid(interpolate_index_repeat(
        out["event_frame_logit"], interp_ratio)))[0]
    doa = np.asarray(interpolate_index_repeat(
        out["doa_frame_output"], interp_ratio))[0]
    return ev, doa


def test_streaming_pipeline_matches_windowed_reference(rng):
    """The fused single-dispatch pipeline (device-resident blocks, pad blocks
    holding the scaler mean) computes exactly the defining window semantics:
    normalize the whole feature stream, zero-pad it, and for each block k
    forward the window [kL-left, kL+L+right) — including the pad-dominated
    startup and flush-tail windows of a stream shorter than one full window."""
    fs, n_fft, hop = 8000, 256, 400
    n = int(4.3 * fs)  # 87 frames: 2 full blocks of 32 + a 23-frame tail
    wave = (0.1 * rng.standard_normal((4, n))).astype(np.float32)

    off_extract = make_extractor("salsa_lite", "mic", fs=fs, n_fft=n_fft,
                                 hop_length=hop, fmax_doa=2000.0, jit=False)
    feat = np.asarray(off_extract(wave))
    C, T, F = feat.shape
    mean = feat[:4].mean(axis=1, keepdims=True)
    std = feat[:4].std(axis=1, keepdims=True) + 1e-6
    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 7, 64, F), jnp.float32), train=False)
    interp = 16 * 10 / (fs / hop)  # = 8
    L, left, right, ds = 32, 48, 64, 16

    se = StreamingExtractor("salsa_lite", "mic", fs=fs, n_fft=n_fft,
                            hop_length=hop, block_frames=L, fmax_doa=2000.0)
    pipe = StreamingSeldPipeline(se, model, variables, (mean, std), interp,
                                 n_classes=3, left_context=left,
                                 right_context=right)
    outs = []
    for i in range(0, n, 2500):
        outs += pipe.push(wave[:, i : i + 2500])
    outs += pipe.flush()

    # reference: normalized stream, zero-padded windows, one forward per block
    fn = feat.copy()
    fn[:4] = (fn[:4] - mean) / std
    n_blocks = -(-T // L)
    ref = []
    for k in range(n_blocks):
        lo, hi = k * L - left, k * L + L + right
        seg = fn[:, max(0, lo) : min(T, hi)]
        window = np.pad(seg, ((0, 0), (max(0, -lo), max(0, hi - T)), (0, 0)))
        out = model.apply(variables, jnp.asarray(window)[None], train=False)
        e0, en = left // ds, L // ds
        ev = np.asarray(jax.nn.sigmoid(interpolate_index_repeat(
            out["event_frame_logit"][:, e0 : e0 + en], interp)))[0]
        doa = np.asarray(interpolate_index_repeat(
            out["doa_frame_output"][:, e0 : e0 + en], interp))[0]
        if (k + 1) * L > T:
            n_valid = int(round(np.floor((T - k * L) / ds) * interp))
            ev, doa = ev[:n_valid], doa[:n_valid]
        ref.append((ev, doa))

    assert len(outs) == len(ref)
    for (ev_s, doa_s), (ev_r, doa_r) in zip(outs, ref):
        np.testing.assert_allclose(ev_s, ev_r, atol=1e-5)
        np.testing.assert_allclose(doa_s, doa_r, atol=1e-5)


@pytest.mark.slow
def test_streaming_pipeline_converges_to_offline(rng):
    """Streamed predictions: exact label-frame accounting, and deviation from
    the offline full-clip predictions shrinks as the context window grows."""
    fs, n_fft, hop = 8000, 256, 400
    seconds = 12.8  # 257 frames at 20 fps
    n = int(seconds * fs)
    wave = (0.1 * rng.standard_normal((4, n))).astype(np.float32)
    t = np.arange(n) / fs
    wave += 0.3 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    off_extract = make_extractor("salsa_lite", "mic", fs=fs, n_fft=n_fft,
                                 hop_length=hop, fmax_doa=2000.0, jit=False)
    feat = np.asarray(off_extract(wave))
    mean = feat[:4].mean(axis=1, keepdims=True)
    std = feat[:4].std(axis=1, keepdims=True) + 1e-6

    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 7, 64, feat.shape[2]), jnp.float32),
                           train=False)
    interp_ratio = 16 * 10 / (fs / hop)  # = 8
    feat_n = feat.copy()
    feat_n[:4] = (feat_n[:4] - mean) / std
    ev_off, doa_off = _offline_predictions(model, variables, feat_n,
                                           interp_ratio)

    errs = {}
    for ctx in (16, 64):
        se = StreamingExtractor("salsa_lite", "mic", fs=fs, n_fft=n_fft,
                                hop_length=hop, block_frames=32,
                                fmax_doa=2000.0)
        pipe = StreamingSeldPipeline(se, model, variables, (mean, std),
                                     interp_ratio, n_classes=3,
                                     left_context=ctx, right_context=ctx)
        outs = []
        i = 0
        while i < wave.shape[1]:
            outs += pipe.push(wave[:, i : i + 3000])
            i += 3000
        outs += pipe.flush()
        ev_s = np.concatenate([o[0] for o in outs], axis=0)
        doa_s = np.concatenate([o[1] for o in outs], axis=0)
        # exact frame accounting: floor(T/16) encoder frames x interp
        assert ev_s.shape == ev_off.shape
        assert doa_s.shape == doa_off.shape
        errs[ctx] = max(np.abs(ev_s - ev_off).max(),
                        np.abs(doa_s - doa_off).max())

    # more context -> closer to the offline full-clip predictions
    assert errs[64] < errs[16]
    assert errs[64] < 0.1, errs


def test_streaming_pipeline_int16_matches_float(rng):
    """End-to-end pipeline on an int16 PCM stream equals the float stream
    exactly, including the flush lookahead steps (whose zero window must reuse
    the int16-traced step graph, not compile a second one)."""
    fs, n_fft, hop = 8000, 256, 400
    n = int(4.3 * fs)
    wave_f = (0.1 * rng.standard_normal((4, n))).astype(np.float32)
    pcm = np.clip(np.round(wave_f * 32768.0), -32768, 32767).astype(np.int16)
    as_float = pcm.astype(np.float32) / 32768.0

    off_extract = make_extractor("salsa_lite", "mic", fs=fs, n_fft=n_fft,
                                 hop_length=hop, fmax_doa=2000.0, jit=False)
    feat = np.asarray(off_extract(as_float))
    mean = feat[:4].mean(axis=1, keepdims=True)
    std = feat[:4].std(axis=1, keepdims=True) + 1e-6
    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 7, 64, feat.shape[2]), jnp.float32),
                           train=False)
    interp = 16 * 10 / (fs / hop)
    kw = dict(fs=fs, n_fft=n_fft, hop_length=hop, block_frames=32,
              fmax_doa=2000.0)

    def run(w):
        pipe = StreamingSeldPipeline(
            StreamingExtractor("salsa_lite", "mic", **kw), model, variables,
            (mean, std), interp, n_classes=3, left_context=48,
            right_context=64)
        outs = []
        for i in range(0, n, 2500):
            outs += pipe.push(w[..., i : i + 2500])
        outs += pipe.flush()
        return (np.concatenate([o[0] for o in outs], axis=-2),
                np.concatenate([o[1] for o in outs], axis=-2))

    ev_i, doa_i = run(pcm)
    ev_f, doa_f = run(as_float)
    np.testing.assert_array_equal(ev_i, ev_f)
    np.testing.assert_array_equal(doa_i, doa_f)


def test_multistream_extractor_matches_single_streams(rng):
    """n_streams=N batched extraction (salsa: per-stream tracker state) equals
    N independent single-stream runs, frame for frame."""
    N = 3
    waves = np.stack([make_wave(np.random.default_rng(100 + i), seconds=3.0)
                      for i in range(N)])
    kw = dict(fs=FS, n_fft=N_FFT, hop_length=HOP, block_frames=32,
              fmax_doa=3000.0, eig_method="power")
    multi = StreamingExtractor("salsa", "foa", n_streams=N, **kw)
    got = stream_all(multi, waves)  # (N, C, n) pushes
    assert got.shape[0] == N
    for i in range(N):
        solo = StreamingExtractor("salsa", "foa", **kw)
        want = stream_all(solo, waves[i])
        np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=1e-4)


def test_multistream_pipeline_matches_single_streams(rng):
    """One fused dispatch serving N streams (VERDICT r3 item 4): per-stream
    predictions equal N sequential single-stream pipelines."""
    N, fs, n_fft, hop = 3, 8000, 256, 400
    n = int(4.3 * fs)
    waves = np.stack([
        (0.1 * np.random.default_rng(7 + i).standard_normal((4, n))
         + 0.3 * np.sin(2 * np.pi * (300.0 + 140 * i)
                        * np.arange(n) / fs)).astype(np.float32)
        for i in range(N)])

    off_extract = make_extractor("salsa_lite", "mic", fs=fs, n_fft=n_fft,
                                 hop_length=hop, fmax_doa=2000.0, jit=False)
    feat0 = np.asarray(off_extract(waves[0]))
    mean = feat0[:4].mean(axis=1, keepdims=True)
    std = feat0[:4].std(axis=1, keepdims=True) + 1e-6
    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 7, 64, feat0.shape[2]), jnp.float32),
                           train=False)
    interp = 16 * 10 / (fs / hop)
    kw = dict(fs=fs, n_fft=n_fft, hop_length=hop, block_frames=32,
              fmax_doa=2000.0)

    def run(pipe, w):
        outs = []
        for i in range(0, n, 2500):
            outs += pipe.push(w[..., i : i + 2500])
        outs += pipe.flush()
        ev = np.concatenate([o[0] for o in outs], axis=-2)
        doa = np.concatenate([o[1] for o in outs], axis=-2)
        return ev, doa

    multi = StreamingSeldPipeline(
        StreamingExtractor("salsa_lite", "mic", n_streams=N, **kw),
        model, variables, (mean, std), interp, n_classes=3,
        left_context=48, right_context=64)
    ev_m, doa_m = run(multi, waves)
    assert ev_m.shape[0] == N

    for i in range(N):
        solo = StreamingSeldPipeline(
            StreamingExtractor("salsa_lite", "mic", **kw),
            model, variables, (mean, std), interp, n_classes=3,
            left_context=48, right_context=64)
        ev_s, doa_s = run(solo, waves[i])
        np.testing.assert_allclose(ev_m[i], ev_s, atol=1e-5)
        np.testing.assert_allclose(doa_m[i], doa_s, atol=1e-5)
