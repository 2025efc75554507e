import numpy as np
import pytest

from salsa_tpu.data.meta import split_filenames
from salsa_tpu.data.database import (
    SeldDatabase,
    chunk_starts,
    classwise_targets,
    parse_gt_csv,
)
from salsa_tpu.data.feature_store import FeatureStore, StreamingScaler
from salsa_tpu.data.dataset import SeldChunkDataset, batch_iterator
from salsa_tpu.data import transforms as T


# ---------------------------------------------------------------------------
# split metadata
# ---------------------------------------------------------------------------

def test_split_filenames_match_reference_csvs():
    import os
    ref_meta = "/root/reference/dataset/meta/dcase2021/original"
    if not os.path.isdir(ref_meta):
        pytest.skip("reference not mounted")
    for split in ["train", "val", "test", "dev"]:
        with open(f"{ref_meta}/{split}.csv") as f:
            ref = [ln.strip() for ln in f][1:]
        assert sorted(split_filenames(split)) == sorted(ref), split
    with open("/root/reference/dataset/meta/dcase2021/eval.csv") as f:
        ref = [ln.strip() for ln in f][1:]
    assert sorted(split_filenames("eval")) == sorted(ref)


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------

def reference_segment_idxes(n_frames, downsample, pointer, chunk_len, chunk_hop):
    """Transcription of the reference chunking contract for cross-checking
    (dataset/database.py:98-119)."""
    n_crop = n_frames // downsample
    idxes = list(range(pointer, pointer + n_crop - chunk_len // downsample + 1,
                       chunk_hop // downsample))
    if (n_crop - chunk_len // downsample) % (chunk_hop // downsample) != 0:
        idxes.append(pointer + n_crop - chunk_len // downsample)
    return idxes, pointer + n_crop


@pytest.mark.parametrize("n_frames,chunk,hop", [(4800, 640, 40), (4800, 4800, 4808),
                                                (640, 640, 40), (1000, 640, 48)])
def test_chunk_starts_match_reference_contract(n_frames, chunk, hop):
    ours = chunk_starts(n_frames, chunk, hop, offset=17)
    ref, _ = reference_segment_idxes(n_frames, 1, 17, chunk, hop)
    assert ours == ref
    # label-rate chunking too
    ours_l = chunk_starts(n_frames // 8, chunk // 8, hop // 8, offset=3)
    ref_l, _ = reference_segment_idxes(n_frames, 8, 3, chunk, hop)
    assert ours_l == ref_l


def test_train_chunk_counts_60s_clip():
    # 60 s at 80 fps = 4800 frames, 8 s chunks, 0.5 s hop -> 105 chunks
    starts = chunk_starts(4800, 640, 40, 0)
    assert len(starts) == 105 and starts[0] == 0 and starts[-1] == 4160


# ---------------------------------------------------------------------------
# targets
# ---------------------------------------------------------------------------

def test_classwise_targets_longest_track_wins(tmp_path):
    # class 2 has two overlapping tracks at frame 5: track 0 lasts 1 frame,
    # track 1 lasts 3 frames -> the longer track's DOA should win at frame 5
    rows = [
        "5,2,0,90,0",
        "4,2,1,0,45", "5,2,1,0,45", "6,2,1,0,45",
    ]
    p = tmp_path / "gt.csv"
    p.write_text("\n".join(rows))
    sed, doa = classwise_targets(parse_gt_csv(str(p)), n_label_frames=10, n_classes=3)
    assert sed[5, 2] == 1 and sed[4, 2] == 1 and sed[6, 2] == 1
    n = 3
    # azi=0, ele=45deg -> x = cos0*cos45 = 0.7071, y = 0, z = 0.7071
    np.testing.assert_allclose(doa[5, 2], np.cos(np.pi / 4), atol=1e-6)       # x
    np.testing.assert_allclose(doa[5, n + 2], 0.0, atol=1e-6)                  # y
    np.testing.assert_allclose(doa[5, 2 * n + 2], np.sin(np.pi / 4), atol=1e-6)  # z
    # inactive class/frames are zero
    assert np.all(doa[0] == 0) and sed.sum() == 3


def test_targets_unit_norm_when_active(tmp_path):
    p = tmp_path / "gt.csv"
    p.write_text("0,0,0,-120,30\n3,1,0,179,-45\n")
    sed, doa = classwise_targets(parse_gt_csv(str(p)), 10, 2)
    n = 2
    for f, c in [(0, 0), (3, 1)]:
        v = np.array([doa[f, c], doa[f, n + c], doa[f, 2 * n + c]])
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end database on a synthetic store
# ---------------------------------------------------------------------------

@pytest.fixture
def tiny_db(tmp_path, rng):
    """2 fake clips of 6 s at 80 fps with 7-channel 20-bin features."""
    store = FeatureStore(str(tmp_path / "feat"), "foa")
    scaler = StreamingScaler(4)
    names = ["clipA", "clipB"]
    for name in names:
        feat = rng.standard_normal((7, 480, 20)).astype(np.float32) * 3 + 1
        store.write_clip("dev", name, feat)
        scaler.update(feat)
    store.write_scaler(*scaler.finalize())
    gt_dir = tmp_path / "gt" / "metadata_dev"
    gt_dir.mkdir(parents=True)
    for name in names:
        (gt_dir / f"{name}.csv").write_text("0,0,0,10,20\n12,3,0,-90,0\n")
    (tmp_path / "meta").mkdir()
    (tmp_path / "meta" / "train.csv").write_text("filename\nclipA\nclipB\n")
    db = SeldDatabase(
        feature_root_dir=str(tmp_path / "feat"),
        gt_meta_root_dir=str(tmp_path / "gt"),
        audio_format="foa",
        n_classes=4,
        train_chunk_len_s=2.0,
        train_chunk_hop_len_s=0.5,
        test_chunk_len_s=6.0,
        test_chunk_hop_len_s=6.1,
        max_file_len_s=6.0,
    )
    return db, str(tmp_path / "meta")


def test_database_fit_split(tiny_db):
    db, meta = tiny_db
    split = db.load_split("train", split_meta_dir=meta, stage="fit")
    assert split.features.shape == (7, 960, 20)
    assert split.feature_chunk_len == 160 and split.label_chunk_len == 20
    # 480 frames, chunk 160, hop 40 -> (480-160)/40+1 = 9 chunks per clip
    assert len(split) == 18 and split.chunks_per_clip == 9
    # normalization: first 4 channels ~ N(0,1) (scaler channels), rest untouched scale
    assert abs(split.features[:4].mean()) < 0.1
    assert abs(split.features[:4].std() - 1.0) < 0.1
    assert split.features[4:].std() > 2.0
    # label alignment: chunk at feature start 40 has label start 5
    i = list(split.feature_chunk_starts).index(40)
    assert split.label_chunk_starts[i] == 5


def test_database_inference_split_one_chunk(tiny_db):
    db, meta = tiny_db
    split = db.load_split("train", split_meta_dir=meta, stage="inference")
    assert split.chunks_per_clip == 1 and len(split) == 2
    assert split.feature_chunk_len == 480


def test_dataset_and_batching(tiny_db, rng):
    db, meta = tiny_db
    split = db.load_split("train", split_meta_dir=meta, stage="fit")
    ds = SeldChunkDataset(split)
    x, sed, doa, name = ds[0]
    assert x.shape == (7, 160, 20) and sed.shape == (20, 4) and doa.shape == (20, 12)
    batches = list(batch_iterator(ds, 8, shuffle=True, rng=rng, pad_to_batch=True))
    assert len(batches) == 3
    assert all(b[0].shape == (8, 7, 160, 20) for b in batches)
    assert batches[-1][4] == 2  # 18 = 8+8+2 real samples in final padded batch


# ---------------------------------------------------------------------------
# augmentation algebra
# ---------------------------------------------------------------------------

class FixedRng:
    """Deterministic stand-in driving transform decisions."""

    def __init__(self, ints):
        self._ints = list(ints)

    def integers(self, *a, **k):
        size = k.get("size", a[1] if len(a) > 1 and isinstance(a[1], tuple) else None)
        if "size" in k or (len(a) > 1 and isinstance(a[-1], tuple)):
            return np.array(self._ints)
        return self._ints.pop(0)

    def random(self):
        return 0.0

    def uniform(self, lo, hi, *a):
        return (lo + hi) / 2

    def shuffle(self, x):
        pass


def unit_doa(n_classes, cls, xyz):
    doa = np.zeros((5, 3 * n_classes), dtype=np.float32)
    doa[:, cls] = xyz[0]
    doa[:, n_classes + cls] = xyz[1]
    doa[:, 2 * n_classes + cls] = xyz[2]
    return doa


@pytest.mark.parametrize("m,expect", [
    ((1, 0, 0, 0), (0.2, 0.5, 0.7)),   # swap x,y
    ((0, 1, 0, 0), (-0.5, 0.2, 0.7)),  # negate x
    ((0, 0, 1, 0), (0.5, -0.2, 0.7)),  # negate y
    ((0, 0, 0, 1), (0.5, 0.2, -0.7)),  # negate z
    ((1, 1, 1, 0), (-0.2, -0.5, 0.7)),  # swap then negate both
])
def test_foa_swap_label_algebra(m, expect):
    t = T.SwapChannelFoa(always_apply=True, n_classes=4)
    t.rng = FixedRng(list(m))
    x = np.arange(7 * 5 * 6, dtype=np.float32).reshape(7, 5, 6)
    doa = unit_doa(4, 1, (0.5, 0.2, 0.7))
    sed = np.zeros((5, 4))
    xf, _, df = t.apply(x, sed, doa)
    np.testing.assert_allclose(
        [df[0, 1], df[0, 5], df[0, 9]], expect, atol=1e-6
    )
    # feature algebra for the swap generator
    if m == (1, 0, 0, 0):
        np.testing.assert_array_equal(xf[1], x[3])
        np.testing.assert_array_equal(xf[3], x[1])
        np.testing.assert_array_equal(xf[4], x[6])  # IVy <- IVx
        np.testing.assert_array_equal(xf[6], x[4])


def test_foa_swap_feature_label_consistency():
    """Property: applying the transform twice with the same mask is the identity."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((7, 5, 6)).astype(np.float32)
    doa = unit_doa(4, 2, (0.3, -0.4, 0.8))
    sed = np.zeros((5, 4))
    for m in [(1, 0, 0, 0), (0, 1, 0, 0), (1, 1, 1, 1)]:
        t = T.SwapChannelFoa(always_apply=True, n_classes=4)
        t.rng = FixedRng(list(m))
        x1, _, d1 = t.apply(x, sed, doa)
        t.rng = FixedRng(list(m))
        x2, _, d2 = t.apply(x1, sed, d1)
        np.testing.assert_allclose(x2, x, atol=1e-6)
        np.testing.assert_allclose(d2, doa, atol=1e-6)


def test_mic_swap_phase_channel_algebra():
    # m = [0, 1, 0]: swap M1<->M4: P14'=-P14, P13'=P13-P14, P12'=P12-P14
    t = T.SwapChannelMic(always_apply=True, n_classes=4)
    t.rng = FixedRng([0, 1, 0])
    x = np.random.default_rng(0).standard_normal((7, 5, 6)).astype(np.float32)
    doa = unit_doa(4, 0, (0.6, 0.0, 0.8))
    xf, _, df = t.apply(x, np.zeros((5, 4)), doa)
    np.testing.assert_allclose(xf[0], x[3])
    np.testing.assert_allclose(xf[3], x[0])
    np.testing.assert_allclose(xf[6], -x[6])
    np.testing.assert_allclose(xf[5], x[5] - x[6])
    np.testing.assert_allclose(xf[4], x[4] - x[6])
    # labels: x' = -y, y' = -x
    np.testing.assert_allclose(df[0, 0], -0.0, atol=1e-7)
    np.testing.assert_allclose(df[0, 4], -0.6, atol=1e-7)


def test_cutout_transforms_preserve_shape_and_zero_channels(rng):
    x = rng.standard_normal((7, 40, 30)).astype(np.float32)
    for t in [
        T.RandomCutout(always_apply=True, n_zero_channels=3, rng=rng),
        T.SpecAugment(always_apply=True, n_zero_channels=3, rng=rng),
        T.RandomCutoutHole(always_apply=True, n_zero_channels=3, rng=rng),
        T.CompositeCutout(always_apply=True, n_zero_channels=3, rng=rng),
    ]:
        y = t(x)
        assert y.shape == x.shape
        # cut area in spatial channels is zeroed, never random-filled
        changed = y[4:] != x[4:]
        assert np.all(y[4:][changed] == 0.0)


def test_random_shift_up_down(rng):
    x = rng.standard_normal((7, 10, 30)).astype(np.float32)
    t = T.RandomShiftUpDown(always_apply=True, freq_shift_range=5, direction="up", rng=rng)
    y = t(x)
    assert y.shape == x.shape
    # an 'up' shift moves content toward higher bins
    shift = None
    for s in range(1, 5):
        if np.allclose(y[:, :, s:], x[:, :, : 30 - s]):
            shift = s
            break
    assert shift is not None


def test_lazy_split_matches_preloaded(tiny_db):
    db, meta = tiny_db
    pre = db.load_split("train", split_meta_dir=meta, stage="fit", preload=True)
    lazy = db.load_split("train", split_meta_dir=meta, stage="fit", preload=False)
    assert len(pre) == len(lazy)
    assert lazy.features.shape[1] == 0  # nothing resident
    np.testing.assert_array_equal(pre.label_chunk_starts, lazy.label_chunk_starts)
    for i in [0, 3, len(pre) - 1]:
        np.testing.assert_allclose(
            lazy.get_feature_chunk(i), pre.get_feature_chunk(i), atol=1e-6
        )
    # dataset API works identically on both
    ds_pre = SeldChunkDataset(pre)
    ds_lazy = SeldChunkDataset(lazy)
    xp, sp, dp, np_ = ds_pre[2]
    xl, sl, dl, nl = ds_lazy[2]
    np.testing.assert_allclose(xl, xp, atol=1e-6)
    np.testing.assert_array_equal(sl, sp)
    assert np_ == nl


def test_lazy_streaming_matches_preload_with_short_clip(tmp_path, rng):
    """Streaming (LazySplitData) and preloaded splits must serve IDENTICAL chunk
    features — including zero-padded short clips, where the pad must be applied
    after normalization in both paths."""
    from salsa_tpu.data.feature_store import FeatureStore, StreamingScaler

    store = FeatureStore(str(tmp_path / "feat"), "foa")
    scaler = StreamingScaler(4)
    for name, n in [("full", 480), ("short", 100)]:
        feat = rng.standard_normal((7, n, 20)).astype(np.float32) * 2 + 0.5
        store.write_clip("dev", name, feat)
        scaler.update(feat)
    store.write_scaler(*scaler.finalize())
    (tmp_path / "meta").mkdir()
    (tmp_path / "meta" / "val.csv").write_text("filename\nfull\nshort\n")

    db = SeldDatabase(
        feature_root_dir=str(tmp_path / "feat"), gt_meta_root_dir=None,
        audio_format="foa", n_classes=4, train_chunk_len_s=2.0,
        train_chunk_hop_len_s=1.0, test_chunk_len_s=2.0, test_chunk_hop_len_s=1.0,
        max_file_len_s=6.0,
    )
    pre = db.load_split("val", split_meta_dir=str(tmp_path / "meta"),
                        stage="inference", preload=True)
    lazy = db.load_split("val", split_meta_dir=str(tmp_path / "meta"),
                         stage="inference", preload=False)
    assert len(pre) == len(lazy)
    for i in range(len(pre)):
        np.testing.assert_allclose(lazy.get_feature_chunk(i),
                                   pre.get_feature_chunk(i), atol=1e-6, err_msg=str(i))


def test_batch_iterator_num_workers_matches_serial(tmp_path, rng):
    """Thread-pool window materialization (streaming mode) yields identical batches
    to the serial path, including augmentation rng order."""
    from salsa_tpu.data.dataset import SeldChunkDataset, batch_iterator
    from salsa_tpu.data.feature_store import FeatureStore, StreamingScaler

    store = FeatureStore(str(tmp_path / "feat"), "foa")
    scaler = StreamingScaler(4)
    for i in range(3):
        feat = rng.standard_normal((7, 480, 20)).astype(np.float32)
        store.write_clip("dev", f"c{i}", feat)
        scaler.update(feat)
    store.write_scaler(*scaler.finalize())
    (tmp_path / "meta").mkdir()
    (tmp_path / "meta" / "val.csv").write_text("filename\nc0\nc1\nc2\n")
    db = SeldDatabase(
        feature_root_dir=str(tmp_path / "feat"), gt_meta_root_dir=None,
        audio_format="foa", n_classes=4, train_chunk_len_s=2.0,
        train_chunk_hop_len_s=1.0, test_chunk_len_s=2.0, test_chunk_hop_len_s=1.0,
        max_file_len_s=6.0,
    )
    split = db.load_split("val", split_meta_dir=str(tmp_path / "meta"),
                          stage="fit", preload=False)
    ds = SeldChunkDataset(split)
    serial = list(batch_iterator(ds, 4, shuffle=True, rng=np.random.default_rng(5),
                                 drop_last=True))
    pooled = list(batch_iterator(ds, 4, shuffle=True, rng=np.random.default_rng(5),
                                 drop_last=True, num_workers=4))
    assert len(serial) == len(pooled) > 0
    for (a, b) in zip(serial, pooled):
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        assert a[3] == b[3]


def test_prefetch_early_close_stops_producer(rng):
    """Breaking out of prefetch early (train_fraction path) must stop the producer
    thread and close the inner iterator (pool shutdown), not leak them."""
    import threading
    import time

    from salsa_tpu.data.dataset import prefetch

    closed = {"v": False}

    def gen():
        try:
            for i in range(1000):
                yield i
        finally:
            closed["v"] = True

    before = threading.active_count()
    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()  # what CPython does when the consumer loop is abandoned
    for _ in range(50):
        if closed["v"] and threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert closed["v"], "inner iterator was not closed"
    assert threading.active_count() <= before, "producer thread leaked"
