import os
import sys

import numpy as np
import pytest

from salsa_tpu.metrics import (
    load_output_csv,
    segment_events,
    sed_doa_to_event_dict,
    SeldMetrics2021,
    SeldMetrics2020,
    seld_error_from_scores,
)

REF = "/root/reference"


def _load_reference_scorers():
    """Import the reference (PyTorch repo) scorers as oracles, with compat shims for
    numpy>=2 (np.float removed) and missing IPython."""
    if not os.path.isdir(REF):
        pytest.skip("reference repo not available")
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    if "IPython" not in sys.modules:
        import types

        fake = types.ModuleType("IPython")
        fake.embed = lambda *a, **k: None
        sys.modules["IPython"] = fake
    sys.path.insert(0, REF)
    try:
        import importlib

        m21 = importlib.import_module("metrics.SELD2021_evaluation_metrics")
        m20 = importlib.import_module("metrics.SELD2020_evaluation_metrics")
        du = importlib.import_module("metrics.dcase_utils")
    finally:
        sys.path.remove(REF)
    return m21, m20, du


def random_event_frames(rng, n_frames=600, n_classes=12, density=0.1, polar=True,
                        version="2021"):
    """Random frame event dict in submission-CSV layout."""
    events = {}
    for f in range(n_frames):
        if rng.random() > density:
            continue
        for _ in range(rng.integers(1, 3)):
            cls = int(rng.integers(0, n_classes))
            azi = float(rng.integers(-180, 180))
            ele = float(rng.integers(-45, 46))
            row = [cls, azi, ele, 0] if version == "2021" else [cls, azi, ele]
            events.setdefault(f, []).append(row)
    return events


def write_csv(path, events, version="2021"):
    with open(path, "w") as f:
        for frame in sorted(events):
            for row in events[frame]:
                if version == "2021":
                    f.write(f"{frame},{row[0]},{int(row[3])},{int(row[1])},{int(row[2])}\n")
                else:
                    f.write(f"{frame},{row[0]},{int(row[1])},{int(row[2])}\n")


def test_perfect_prediction_2021(rng):
    events = random_event_frames(rng)
    blocks = segment_events(events)
    m = SeldMetrics2021(n_classes=12)
    m.update(blocks, blocks)
    er, f1, le, lr = m.compute()
    assert er == 0 and abs(f1 - 1) < 1e-9 and le < 1e-4 and abs(lr - 1) < 1e-9
    assert seld_error_from_scores(er, f1, le, lr) < 1e-4


def test_empty_prediction_2021(rng):
    gt = random_event_frames(rng)
    m = SeldMetrics2021(n_classes=12)
    m.update(segment_events({}), segment_events(gt))
    er, f1, le, lr = m.compute()
    assert er >= 1.0 - 1e-9 and f1 == 0 and le == 180.0 and lr == 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_2021_matches_reference_scorer(seed, tmp_path):
    m21, _, du = _load_reference_scorers()
    rng = np.random.default_rng(seed)
    gt = random_event_frames(rng, density=0.3)
    # prediction: perturbed ground truth + random insertions/deletions
    pred = random_event_frames(rng, density=0.12)
    for f, rows in gt.items():
        if rng.random() < 0.7:
            for row in rows:
                if rng.random() < 0.8:
                    pred.setdefault(f, []).append(
                        [row[0],
                         float(np.clip(row[1] + rng.integers(-30, 31), -180, 179)),
                         float(np.clip(row[2] + rng.integers(-20, 21), -45, 45)), 0]
                    )

    # round-trip both through CSV to also exercise the loader
    gt_csv, pred_csv = str(tmp_path / "gt.csv"), str(tmp_path / "pred.csv")
    write_csv(gt_csv, gt)
    write_csv(pred_csv, pred)

    ours = SeldMetrics2021(n_classes=12)
    ours.update(
        segment_events(load_output_csv(pred_csv, "2021")),
        segment_events(load_output_csv(gt_csv, "2021")),
    )

    ref = m21.SELDMetrics(nb_classes=12, doa_threshold=20)
    ref_gt = du.segment_labels(du.load_output_format_file(gt_csv, version="2021"),
                               _max_frames=600, _nb_label_frames_1s=10)
    ref_pred = du.segment_labels(du.load_output_format_file(pred_csv, version="2021"),
                                 _max_frames=600, _nb_label_frames_1s=10)
    ref.update_seld_scores(ref_pred, ref_gt)

    np.testing.assert_allclose(ours.compute(), ref.compute_seld_scores(), rtol=1e-10)


@pytest.mark.parametrize("seed", [3, 4])
def test_2020_matches_reference_scorer(seed, tmp_path):
    _, m20, du = _load_reference_scorers()
    rng = np.random.default_rng(seed)
    gt = random_event_frames(rng, density=0.3, version="2020")
    pred = random_event_frames(rng, density=0.15, version="2020")

    gt_csv, pred_csv = str(tmp_path / "gt.csv"), str(tmp_path / "pred.csv")
    write_csv(gt_csv, gt, version="2020")
    write_csv(pred_csv, pred, version="2020")

    ours = SeldMetrics2020(n_classes=12)
    ours.update(
        segment_events(load_output_csv(pred_csv, "2020")),
        segment_events(load_output_csv(gt_csv, "2020")),
        coords="polar_deg",
    )

    ref = m20.SELDMetrics(nb_classes=12, doa_threshold=20)
    ref_gt = du.segment_labels(du.load_output_format_file(gt_csv, version="2020"),
                               _max_frames=600, _nb_label_frames_1s=10)
    ref_pred = du.segment_labels(du.load_output_format_file(pred_csv, version="2020"),
                                 _max_frames=600, _nb_label_frames_1s=10)
    ref.update_seld_scores(ref_pred, ref_gt)

    np.testing.assert_allclose(ours.compute(), ref.compute_seld_scores(), rtol=1e-10)


def test_sed_doa_to_event_dict_xyz():
    sed = np.zeros((5, 3))
    doa = np.zeros((5, 9))
    sed[2, 1] = 1
    doa[2, 1] = 0.0  # x
    doa[2, 4] = 1.0  # y
    doa[2, 7] = 0.0  # z
    d = sed_doa_to_event_dict(sed, doa, n_classes=3)
    assert list(d.keys()) == [2]
    assert d[2] == [[1, 0.0, 1.0, 0.0]]


def test_classification_grid_labels_match_reference(rng):
    """classification_grid_labels vs the imported reference
    output_format_dict_to_classification_labels (dcase_utils.py:265-302)."""
    from salsa_tpu.metrics.dcase_io import classification_grid_labels

    _, _, du = _load_reference_scorers()
    azimuths = list(range(-180, 180, 20))
    elevations = list(range(-40, 60, 20))
    events = {}
    for f in range(0, 80, 3):
        events[f] = [[int(rng.integers(0, 6)), float(rng.integers(-200, 200)),
                      float(rng.integers(-60, 70))] for _ in range(int(rng.integers(1, 3)))]
    # boundary: a frame at exactly n_max_frames must be ignored, not crash
    # (the reference's <= guard IndexErrors there — intentional deviation)
    from salsa_tpu.metrics.dcase_io import classification_grid_labels as _cgl
    edge = _cgl({100: [[0, 0.0, 0.0]]}, azimuths, elevations, n_classes=6,
                n_max_frames=100)
    assert edge.sum() == 0
    for joint in (True, False):
        got = classification_grid_labels(events, azimuths, elevations, n_classes=6,
                                         n_max_frames=100, joint=joint)
        want = du.output_format_dict_to_classification_labels(
            events, azimuths, elevations, n_classes=6, n_max_frames_per_file=100,
            joint=joint)
        np.testing.assert_array_equal(got, want)
