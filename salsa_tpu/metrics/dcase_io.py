"""DCASE SELD submission/metadata I/O and 1-second segment blocking.

Behavior-parity reimplementation of the DCASE utilities the reference vendors in
metrics/dcase_utils.py (itself copied from the official challenge code):

  * `load_output_csv`      <- load_output_format_file (dcase_utils.py:8-57)
  * `segment_events`       <- segment_labels (dcase_utils.py:185-228)
  * polar/cartesian helpers <- :60-109
  * `sed_doa_to_event_dict` <- regression_label_format_to_output_format (:231-262)

Data model: a *frame event dict* maps frame_idx -> list of per-event rows
[class_idx, coord..., track]; a *block dict* maps block_idx -> {class_idx:
[[frame_offsets, per_frame_event_coord_lists]]} exactly as the scorers expect.
"""
from __future__ import annotations

import numpy as np


def load_output_csv(path: str, version: str = "2021") -> dict[int, list[list[float]]]:
    """Parse a DCASE-format CSV (submission or metadata) into a frame event dict.

    Supported row layouts (comma separated, no header):
      4 cols: frame, class, azi, ele                    (submission)
      5 cols: frame, class, track, azi, ele             (2021 metadata, polar)
      6 cols: frame, class, track, x, y, z              (cartesian metadata)
    Version '2021' keeps the track number as the trailing element of each event row;
    '2020' drops it.
    """
    events: dict[int, list[list[float]]] = {}
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(",")
            frame = int(parts[0])
            cls = int(parts[1])
            row: list[float]
            if len(parts) == 4:
                coords = [float(parts[2]), float(parts[3])]
                track = 0
            elif len(parts) == 5:
                coords = [float(parts[3]), float(parts[4])]
                track = int(parts[2])
            elif len(parts) == 6:
                coords = [float(parts[3]), float(parts[4]), float(parts[5])]
                track = int(parts[2])
            else:
                raise ValueError(f"{path}: unparseable row '{line}'")
            if version == "2021":
                row = [cls, *coords, track]
            elif version == "2020":
                row = [cls, *coords]
            else:
                raise ValueError(f"unknown metric version '{version}'")
            events.setdefault(frame, []).append(row)
    return events


def segment_events(
    frame_events: dict[int, list[list[float]]],
    max_frames: int = 600,
    frames_per_block: int = 10,
) -> dict[int, dict[int, list]]:
    """Group frame-wise events into 1-second blocks, classwise.

    Returns blocks[block_idx][class_idx] = [[frame_offsets, coords_per_frame]] where
    frame_offsets are the within-block frame indices at which the class is active and
    coords_per_frame[i] is the list of coordinate rows (event row minus the class
    column) active at that frame.
    """
    n_blocks = int(np.ceil(max_frames / float(frames_per_block)))
    blocks: dict[int, dict[int, list]] = {b: {} for b in range(n_blocks)}
    for block in range(n_blocks):
        start = block * frames_per_block
        per_class: dict[int, dict[int, list]] = {}
        for offset in range(frames_per_block):
            frame = start + offset
            for row in frame_events.get(frame, ()):  # row: [class, coords..., (track)]
                cls = int(row[0])
                per_class.setdefault(cls, {}).setdefault(offset, []).append(row[1:])
        for cls, frames in per_class.items():
            offsets = list(frames.keys())
            coords = [frames[k] for k in offsets]
            blocks[block].setdefault(cls, []).append([offsets, coords])
    return blocks


def polar_deg_to_xyz(azi_deg, ele_deg):
    azi = np.deg2rad(np.asarray(azi_deg, dtype=np.float64))
    ele = np.deg2rad(np.asarray(ele_deg, dtype=np.float64))
    return np.cos(azi) * np.cos(ele), np.sin(azi) * np.cos(ele), np.sin(ele)


def xyz_to_polar_deg(x, y, z):
    azi = np.rad2deg(np.arctan2(y, x))
    ele = np.rad2deg(np.arctan2(z, np.sqrt(np.asarray(x) ** 2 + np.asarray(y) ** 2)))
    return azi, ele


def sed_doa_to_event_dict(
    sed: np.ndarray, doa: np.ndarray, n_classes: int
) -> dict[int, list[list[float]]]:
    """Binary SED frames + regression DOA -> frame event dict.

    sed: (n_frames, n_classes) 0/1; doa: (n_frames, 3*n_classes) xyz or
    (n_frames, 2*n_classes) polar degrees.
    """
    is_polar = doa.shape[-1] == 2 * n_classes
    out: dict[int, list[list[float]]] = {}
    frames, classes = np.nonzero(sed)
    for f, c in zip(frames.tolist(), classes.tolist()):
        if is_polar:
            row = [c, float(doa[f, c]), float(doa[f, n_classes + c])]
        else:
            row = [
                c,
                float(doa[f, c]),
                float(doa[f, n_classes + c]),
                float(doa[f, 2 * n_classes + c]),
            ]
        out.setdefault(f, []).append(row)
    return out


def classification_grid_labels(
    event_dict: dict[int, list[list[float]]],
    azimuths,
    elevations,
    n_classes: int = 14,
    n_max_frames: int = 600,
    joint: bool = True,
) -> np.ndarray:
    """Frame event dict -> one-hot DOA-grid classification labels.

    Parity with reference output_format_dict_to_classification_labels
    (metrics/dcase_utils.py:265-302): azimuth/elevation are clipped to the grid,
    snapped by integer division with the grid resolution, and marked 1 at
    [frame, class, azi_idx * n_elevations + ele_idx] (joint=True) or
    [frame, class, azi_idx, ele_idx] (joint=False). Events are [class, azi, ele].
    Used by classification-style SELD heads that predict a DOA grid instead of
    regression targets.
    """
    azimuths = np.asarray(azimuths)
    elevations = np.asarray(elevations)
    n_azis, n_eles = len(azimuths), len(elevations)
    azi_res = int(abs(azimuths[1] - azimuths[0]))
    ele_res = int(abs(elevations[1] - elevations[0]))
    shape = ((n_max_frames, n_classes, n_azis * n_eles) if joint
             else (n_max_frames, n_classes, n_azis, n_eles))
    labels = np.zeros(shape, dtype=np.float64)
    for frame_idx, rows in event_dict.items():
        if frame_idx >= n_max_frames:  # valid rows are 0..n_max-1 (the reference's
            continue                   # `<=` guard IndexErrors at exactly n_max)
        for value in rows:
            azi = np.clip(value[1], azimuths[0], azimuths[-1])
            ele = np.clip(value[2], elevations[0], elevations[-1])
            azi_idx = int(azi - azimuths[0]) // azi_res
            ele_idx = int(ele - elevations[0]) // ele_res
            if joint:
                labels[frame_idx, int(value[0]), azi_idx * n_eles + ele_idx] = 1
            else:
                labels[frame_idx, int(value[0]), azi_idx, ele_idx] = 1
    return labels
