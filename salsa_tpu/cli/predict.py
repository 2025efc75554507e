"""Direct wav -> submission CSV serving CLI: no offline feature store needed.

Runs the fused on-chip pipeline (feature extraction + normalization + CRNN) over a
directory of multichannel wavs using a trained experiment's best checkpoint and the
train-split scaler:

    python -m salsa_tpu.cli.predict --exp-config configs/seld.yml \
        --exp-group-dir ./outputs --exp-suffix _run1 \
        --wav-dir /data/dcase2021/task3/foa_eval --out-dir ./preds
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from salsa_tpu.data.feature_store import FeatureStore
from salsa_tpu.features.registry import make_extractor
from salsa_tpu.models.seld import build_model
from salsa_tpu.pipeline import SeldInferencePipeline
from salsa_tpu.train import checkpoint as ckpt
from salsa_tpu.train.submission import write_classwise_csv
from salsa_tpu.train.state import create_train_state, make_optimizer
from salsa_tpu.utils.audio_io import read_wav, resampled_length, wav_info
from salsa_tpu.utils.experiments import manage_experiments, logger
from salsa_tpu.cli._errors import cli_entry


def _load_scaler(cfg, audio_format: str):
    """Train-split scaler for serving: the feature store's h5 when the experiment
    used one, else the `feature_scaler.npz` training.from_wav persisted next to
    the checkpoints (mirroring cli/infer.py's from_wav branch — flagship
    configs/seld_tpu.yml sets feature_root_dir: null by design)."""
    root = cfg.get("feature_root_dir")
    if root:
        store = FeatureStore(root, audio_format)
        if store.has_scaler():
            return store.read_scaler()
    npz = os.path.join(os.path.dirname(cfg.dir.model.best), "feature_scaler.npz")
    if os.path.isfile(npz):
        blob = np.load(npz)
        return blob["mean"], blob["std"]
    raise FileNotFoundError(
        "no train-split scaler found: neither a feature-store scaler "
        f"({root or 'feature_root_dir unset'}) nor {npz} — train first")


def predict(exp_config: str, wav_dir: str, out_dir: str,
            exp_group_dir: str = "./outputs", exp_suffix: str = "",
            checkpoint_kind: str = "best", batch_size: int = 4,
            streaming: bool = False, block_frames: int = 160,
            context_frames: int = 256, push_ms: float = 100.0,
            streams: int = 1, pcm16: bool = False, pool: bool = False,
            max_lag_ms: float | None = None,
            use_tuned_threshold: bool = False):
    import jax.numpy as jnp

    cfg = manage_experiments(exp_config, exp_group_dir, exp_suffix, is_train=False)
    if use_tuned_threshold:
        from salsa_tpu.train.threshold import load_tuned_threshold

        tuned = load_tuned_threshold(cfg.dir.model.best)
        if tuned is None:
            raise FileNotFoundError(
                "--use-tuned-threshold: no tuned_threshold.json beside the "
                "checkpoints — run `salsa-infer --tune-threshold` first")
        # every CSV-writing path below reads cfg's sed_threshold, so serving
        # applies the val-calibrated operating point uniformly
        cfg.sed_threshold = tuned
        logger.info("serving with tuned sed_threshold %.2f", tuned)
    d = cfg.data
    extractor = make_extractor(
        cfg.feature_type, d.audio_format, fs=d.fs, n_fft=d.n_fft,
        hop_length=d.hop_len, win_length=d.get("win_len", d.n_fft),
        n_mels=d.get("n_mels", 128), fmin=d.get("fmin", 50),
        fmax=d.get("fmax", None), fmin_doa=d.get("fmin_doa", 50),
        fmax_doa=d.get("fmax_doa", None), jit=False,
    )
    model = build_model(
        encoder=cfg.model.encoder.to_dict(), decoder=cfg.model.decoder.to_dict(),
        n_classes=d.n_classes, output_format=d.get("output_format", "reg_xyz"),
    )

    # restore trained variables
    path = (ckpt.best_checkpoint(cfg.dir.model.best) if checkpoint_kind == "best"
            else None) or ckpt.latest_checkpoint(cfg.dir.model.checkpoint)
    if path is None:
        raise FileNotFoundError("no checkpoint found; train first")
    wavs = sorted(f for f in os.listdir(wav_dir) if f.endswith(".wav"))
    if not wavs:
        raise FileNotFoundError(f"no wavs in {wav_dir}")
    probe, fs = read_wav(os.path.join(wav_dir, wavs[0]), target_fs=d.fs)
    sample_feat_shape = (
        extractor.n_channels,
        1 + probe.shape[1] // d.hop_len,
        extractor.n_features,
    )
    tx = make_optimizer(1)
    state = create_train_state(
        model, jnp.zeros((1,) + sample_feat_shape, jnp.float32), tx
    )
    state = ckpt.restore_checkpoint(path, state)
    logger.info("restored %s", path)

    scaler = _load_scaler(cfg, d.audio_format)
    interp_ratio = model.time_downsample_ratio * d.label_rate / (d.fs / d.hop_len)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if streaming:
        if pool:
            return _predict_streaming_pool(
                cfg, d, model, variables, scaler, interp_ratio, wav_dir,
                out_dir, wavs, block_frames, context_frames, push_ms, streams,
                pcm16, max_lag_ms)
        return _predict_streaming(
            cfg, d, model, variables, scaler, interp_ratio, wav_dir, out_dir,
            wavs, block_frames, context_frames, push_ms, streams, pcm16)
    pipe = SeldInferencePipeline(
        extractor, model, variables,
        scaler, interp_ratio, d.n_classes, d.get("output_format", "reg_xyz"),
    )

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    audio_seconds = 0.0
    done = 0

    def _flush(group):
        nonlocal done
        stacked = np.stack([a for _, a in group])
        ev, doa = pipe(stacked)
        for (w, _), e_row, d_row in zip(group, ev, doa):
            write_classwise_csv(
                os.path.join(out_dir, w[:-4] + ".csv"), e_row, d_row, d.n_classes,
                sed_threshold=cfg.get("sed_threshold", 0.3),
                max_frames=e_row.shape[0],
                version=str(cfg.get("eval_version", "2021")),
            )
        done += len(group)
        logger.info("%d/%d predicted", done, len(wavs))

    # batch clips by EXACT sample count: within a group, stacking is loss-free and
    # each clip's prediction equals its solo run (padding instead would feed pad
    # frames into the biGRU's backward pass; truncating drops tail predictions).
    # Uniform-duration dirs (TNSSE 60 s clips) behave exactly like a plain batch
    # loop; mixed-duration dirs cost one dispatch shape per distinct length.
    buckets: dict[int, list[tuple[str, np.ndarray]]] = {}
    for w in wavs:
        a, _ = read_wav(os.path.join(wav_dir, w), target_fs=d.fs)
        audio_seconds += a.shape[1] / d.fs
        buckets.setdefault(a.shape[1], []).append((w, a))
        if len(buckets[a.shape[1]]) == batch_size:
            _flush(buckets.pop(a.shape[1]))
    for length in sorted(buckets):
        _flush(buckets.pop(length))
    dt = time.time() - t0
    logger.info("served %.0f audio-s in %.1f s (%.0fx realtime)", audio_seconds, dt,
                audio_seconds / max(dt, 1e-9))
    return out_dir


def _predict_streaming(cfg, d, model, variables, scaler, interp_ratio, wav_dir,
                       out_dir, wavs, block_frames, context_frames, push_ms,
                       streams: int = 1, pcm16: bool = False):
    """Simulated-live serving: wavs are fed through the streaming pipeline in
    push_ms packets; predictions accumulate block by block and land in the same
    submission CSVs the batch path writes. With --streams N, N equal-length
    clips ride ONE fused dispatch per block (the multi-stream pipeline) —
    per-block latency stays near the single-stream cost while throughput
    scales ~N x. Clips are grouped by exact sample count (lockstep streams);
    short groups are padded with silent dummy streams so one compiled pipeline
    serves every group. Logs per-block compute latency (the serving overhead
    on top of the algorithmic block+context lookahead)."""
    from salsa_tpu.streaming import StreamingExtractor, StreamingSeldPipeline

    os.makedirs(out_dir, exist_ok=True)
    push = max(1, int(push_ms * d.fs / 1000))
    N = max(1, int(streams))
    se = StreamingExtractor(
        cfg.feature_type, d.audio_format, fs=d.fs, n_fft=d.n_fft,
        hop_length=d.hop_len, block_frames=block_frames,
        n_mels=d.get("n_mels", 128), n_streams=N,
        **({"fmax_doa": d.fmax_doa} if d.get("fmax_doa") else {}))
    pipe = StreamingSeldPipeline(
        se, model, variables, scaler, interp_ratio, d.n_classes,
        d.get("output_format", "reg_xyz"),
        left_context=context_frames, right_context=context_frames)
    lat, audio_seconds = [], 0.0

    buckets: dict[int, list[str]] = {}
    for w in wavs:
        # header-only probe: bucketing by length must not cost a decode pass
        _, n_raw, fs_raw = wav_info(os.path.join(wav_dir, w))
        n_at_fs = resampled_length(n_raw, fs_raw, d.fs)
        audio_seconds += n_at_fs / d.fs
        buckets.setdefault(n_at_fs, []).append(w)
    groups = [(n, names[i : i + N]) for n, names in sorted(buckets.items())
              for i in range(0, len(names), N)]

    t_all = time.time()
    for n_samples, group in groups:
        first, _ = read_wav(os.path.join(wav_dir, group[0]), target_fs=d.fs)
        audio = np.zeros((N,) + first.shape, np.float32)  # pad rows stay silent
        audio[0] = first
        for s, w in enumerate(group[1:], start=1):
            audio[s], _ = read_wav(os.path.join(wav_dir, w), target_fs=d.fs)
        if N == 1:
            audio = audio[0]
        if pcm16:
            # push raw int16 PCM (on-device decode): halves the sample upload.
            # Exact round-trip when the source wav is 16-bit at the target
            # rate (the DCASE recordings are); otherwise quantizes to 1/32768.
            audio = np.clip(np.round(audio * 32768.0), -32768,
                            32767).astype(np.int16)
        pipe.reset()
        outs, i = [], 0
        while i < n_samples:
            t0 = time.time()
            got = pipe.push(audio[..., i : i + push])
            if got:
                lat.append(time.time() - t0)
                outs += got
            i += push
        t0 = time.time()
        outs += pipe.flush()
        lat.append(time.time() - t0)
        ev = np.concatenate([o[0] for o in outs], axis=-2)
        doa = np.concatenate([o[1] for o in outs], axis=-2)
        for s, w in enumerate(group):
            ev_s = ev[s] if N > 1 else ev
            doa_s = doa[s] if N > 1 else doa
            write_classwise_csv(
                os.path.join(out_dir, w[:-4] + ".csv"), ev_s, doa_s, d.n_classes,
                sed_threshold=cfg.get("sed_threshold", 0.3),
                max_frames=ev_s.shape[0],
                version=str(cfg.get("eval_version", "2021")))
    dt = time.time() - t_all
    lat_ms = 1e3 * np.array(lat)
    algo_ms = (block_frames + context_frames + se.latency_frames) \
        * d.hop_len / d.fs * 1e3
    logger.info(
        "streamed %.0f audio-s in %.1f s (%.0fx realtime aggregate, %d "
        "stream(s)/dispatch); per-block compute latency p50 %.0f / p95 %.0f ms "
        "on top of the algorithmic %.0f ms lookahead (block %d + context %d + "
        "halo %d frames)",
        audio_seconds, dt, audio_seconds / max(dt, 1e-9), N,
        np.percentile(lat_ms, 50), np.percentile(lat_ms, 95), algo_ms,
        block_frames, context_frames, se.latency_frames)
    return out_dir


def _predict_streaming_pool(cfg, d, model, variables, scaler, interp_ratio,
                            wav_dir, out_dir, wavs, block_frames,
                            context_frames, push_ms, streams: int = 1,
                            pcm16: bool = False,
                            max_lag_ms: float | None = None):
    """Unsynchronized-live serving through the dynamic stream pool
    (`stream_pool.py`): every wav is an independent live stream that attaches
    to a free slot, streams in push_ms packets at its own length, and detaches
    at its own end — mixed durations welcome, no equal-length grouping, no
    silent padding streams (what `--streams` without `--pool` needs). All live
    slots ride ONE fused dispatch per pool block, and each clip's predictions
    equal a dedicated solo streaming run (the pool's test-pinned contract),
    so the CSVs match the lockstep path's on the same clips."""
    from salsa_tpu.stream_pool import SeldStreamPool
    from salsa_tpu.streaming import StreamingExtractor, StreamingSeldPipeline

    os.makedirs(out_dir, exist_ok=True)
    push = max(1, int(push_ms * d.fs / 1000))
    N = max(1, int(streams))
    se = StreamingExtractor(
        cfg.feature_type, d.audio_format, fs=d.fs, n_fft=d.n_fft,
        hop_length=d.hop_len, block_frames=block_frames,
        n_mels=d.get("n_mels", 128), n_streams=N,
        **({"fmax_doa": d.fmax_doa} if d.get("fmax_doa") else {}))
    pipe = StreamingSeldPipeline(
        se, model, variables, scaler, interp_ratio, d.n_classes,
        d.get("output_format", "reg_xyz"),
        left_context=context_frames, right_context=context_frames)
    max_lag = None if max_lag_ms is None else max(1, int(max_lag_ms * d.fs
                                                         / 1000))
    pool = SeldStreamPool(pipe, max_lag=max_lag)

    def _read(name):
        a, _ = read_wav(os.path.join(wav_dir, name), target_fs=d.fs)
        if pcm16:
            a = np.clip(np.round(a * 32768.0), -32768, 32767).astype(np.int16)
        return a

    def _write(s):
        if not s["outs"]:
            logger.warning("%s: too short to go live; no predictions",
                           s["name"])
            return
        if s.get("fills"):
            logger.warning("%s: stall policy zero-filled label frames %s — "
                           "those predictions are concealment output",
                           s["name"], s["fills"])
        ev = np.concatenate([o[0] for o in s["outs"]], axis=0)
        doa = np.concatenate([o[1] for o in s["outs"]], axis=0)
        write_classwise_csv(
            os.path.join(out_dir, s["name"][:-4] + ".csv"), ev, doa,
            d.n_classes, sed_threshold=cfg.get("sed_threshold", 0.3),
            max_frames=ev.shape[0],
            version=str(cfg.get("eval_version", "2021")))

    todo = list(wavs)
    active: dict[int, dict] = {}
    lat, audio_seconds, done = [], 0.0, 0
    held: tuple[str, np.ndarray] | None = None  # decoded but no free slot yet
    t_all = time.time()
    while todo or held or active:
        # fill freed slots with the next files (slots free as a detached
        # stream's final block emits, so attach() can say "full" mid-drain).
        # Decode BEFORE attaching: an unreadable wav is then skipped without
        # ever reserving a slot (a reserved-but-never-detached handle would
        # shrink pool capacity for the rest of the run).
        while todo or held:
            if held is None:
                name = todo.pop(0)
                try:
                    held = (name, _read(name))
                except Exception as e:
                    logger.error("%s: unreadable (%s); skipped", name, e)
                    done += 1
                    continue
            h = pool.attach()
            if h is None:
                break  # pool full: keep the decoded clip for the next round
            name, audio = held
            held = None
            audio_seconds += audio.shape[1] / d.fs
            active[h] = {"name": name, "audio": audio, "pos": 0,
                         "outs": [], "ended": False}
        for h, s in list(active.items()):
            # time every call that can deliver prediction blocks (push,
            # detach's fast-forward burst, poll) so the logged p50/p95 cover
            # the same work the non-pool path times via push+flush
            t0 = time.time()
            if not s["ended"]:
                got = pool.push(h, s["audio"][:, s["pos"] : s["pos"] + push])
                s["pos"] += push
                if s["pos"] >= s["audio"].shape[1]:
                    got += pool.detach(h)
                    s["fills"] = pool.fill_label_ranges(h)
                    s["ended"] = True
                    s["audio"] = None  # free the samples; only outs remain
            else:
                # draining: the remaining blocks complete as the other live
                # streams advance the shared pool clock
                got = pool.poll(h)
            if got:
                lat.append(time.time() - t0)
            s["outs"] += got
            if s["ended"] and pool.finished(h):
                _write(s)
                del active[h]
                done += 1
                logger.info("%d/%d streamed", done, len(wavs))
    dt = time.time() - t_all
    lat_ms = 1e3 * np.array(lat) if lat else np.zeros(1)
    algo_ms = (block_frames + context_frames + se.latency_frames) \
        * d.hop_len / d.fs * 1e3
    logger.info(
        "pool-streamed %.0f audio-s in %.1f s (%.0fx realtime aggregate, "
        "%d slot(s)); per-block compute latency p50 %.0f / p95 %.0f ms on "
        "top of the algorithmic %.0f ms lookahead",
        audio_seconds, dt, audio_seconds / max(dt, 1e-9), N,
        np.percentile(lat_ms, 50), np.percentile(lat_ms, 95), algo_ms)
    return out_dir


@cli_entry
def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp-config", required=True)
    p.add_argument("--wav-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--exp-group-dir", default="./outputs")
    p.add_argument("--exp-suffix", default="")
    p.add_argument("--checkpoint", default="best", choices=["best", "last"])
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--streaming", action="store_true",
                   help="simulated-live serving through the streaming pipeline")
    p.add_argument("--block-frames", type=int, default=160,
                   help="streaming: feature frames per emitted block")
    p.add_argument("--context-frames", type=int, default=256,
                   help="streaming: model context each side of a block")
    p.add_argument("--push-ms", type=float, default=100.0,
                   help="streaming: sample packet size")
    p.add_argument("--streams", type=int, default=1,
                   help="streaming: serve N equal-length clips per fused "
                        "dispatch (aggregate throughput ~N x)")
    p.add_argument("--pcm16", action="store_true",
                   help="streaming: push raw int16 PCM, decoded on device "
                        "(half the sample upload; exact for 16-bit sources "
                        "at the target rate)")
    p.add_argument("--pool", action="store_true",
                   help="streaming: serve clips as UNSYNCHRONIZED live "
                        "streams through the dynamic slot pool (--streams "
                        "slots) — mixed durations attach/detach mid-flight, "
                        "no equal-length grouping")
    p.add_argument("--max-lag-ms", type=float, default=None,
                   help="pool: bound head-of-line blocking — a live stream "
                        "whose client stops pushing only holds the others "
                        "back this long, then its slot is zero-filled and "
                        "the concealed label frames are reported (default: "
                        "exact lock-step clock, no fill)")
    p.add_argument("--use-tuned-threshold", action="store_true",
                   help="serve at the val-calibrated sed_threshold persisted "
                        "by `salsa-infer --tune-threshold` "
                        "(tuned_threshold.json beside the checkpoints) "
                        "instead of the config value")
    a = p.parse_args()
    predict(a.exp_config, a.wav_dir, a.out_dir, a.exp_group_dir, a.exp_suffix,
            a.checkpoint, a.batch_size, a.streaming, a.block_frames,
            a.context_frames, a.push_ms, a.streams, a.pcm16, a.pool,
            a.max_lag_ms, use_tuned_threshold=a.use_tuned_threshold)


if __name__ == "__main__":
    main()
