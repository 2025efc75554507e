"""Prediction post-processing: overlapping-chunk recombination and DCASE submission
CSV writing (parity with reference models/interfaces.py:97-139, 210-258)."""
from __future__ import annotations

import numpy as np

from salsa_tpu.metrics.dcase_io import xyz_to_polar_deg


def combine_chunks(
    chunk_preds: np.ndarray,
    chunk_len: int,
    chunk_hop: int,
    n_frames: int = 600,
    method: str = "mean",
) -> np.ndarray:
    """(n_chunks, chunk_len, ...) -> (n_frames, ...) by stitching overlapping chunks.

    The first chunk writes its full window; subsequent chunks blend the overlap region
    ('mean': arithmetic with the running value, 'gmean': geometric) then overwrite the
    tail — matching the reference's recombination exactly.
    """
    starts = list(range(0, n_frames - chunk_len + 1, chunk_hop))
    if (n_frames - chunk_len) % chunk_hop != 0:
        starts.append(n_frames - chunk_len)
    assert abs(chunk_preds.shape[0] - len(starts)) < 2, (
        f"{chunk_preds.shape[0]} chunks vs {len(starts)} expected"
    )
    out = np.zeros((n_frames,) + chunk_preds.shape[2:], dtype=np.float32)
    overlap = chunk_len - chunk_hop
    for i, s in enumerate(starts):
        e = s + chunk_len
        if i == 0:
            out[s:e] = chunk_preds[i]
        else:
            if method == "mean":
                out[s : s + overlap] = (out[s : s + overlap] + chunk_preds[i, :overlap]) / 2
            elif method == "gmean":
                out[s : s + overlap] = np.sqrt(out[s : s + overlap] * chunk_preds[i, :overlap])
            else:
                raise ValueError(f"unknown combine method '{method}'")
            out[s + overlap : e] = chunk_preds[i, overlap:]
    return out


def sed_from_accdoa(doa: np.ndarray, n_classes: int) -> np.ndarray:
    """SED probability = norm of the ACCDOA vector per class."""
    x = doa[..., :n_classes]
    y = doa[..., n_classes : 2 * n_classes]
    z = doa[..., 2 * n_classes :]
    return np.sqrt(x**2 + y**2 + z**2)


def write_classwise_csv(
    path: str,
    event_prob: np.ndarray,
    doa_xyz: np.ndarray,
    n_classes: int,
    sed_threshold: float = 0.3,
    max_frames: int = 600,
    version: str = "2021",
) -> None:
    """Threshold SED, convert xyz to rounded polar degrees, write DCASE rows.

    Matches the reference writer including the azi==180 -> -180 wrap
    (interfaces.py:249-251).
    """
    active = event_prob >= sed_threshold
    x = doa_xyz[:, :n_classes]
    y = doa_xyz[:, n_classes : 2 * n_classes]
    z = doa_xyz[:, 2 * n_classes :]
    azi, ele = xyz_to_polar_deg(x, y, z)
    azi = np.around(azi)
    ele = np.around(ele)
    assert event_prob.shape[0] >= max_frames, "prediction shorter than one file"
    lines = []
    for frame in range(max_frames):
        for cls in np.nonzero(active[frame])[0]:
            a = int(azi[frame, cls])
            if a == 180:
                a = -180
            e = int(ele[frame, cls])
            if version == "2021":
                lines.append(f"{frame},{cls},0,{a},{e}")
            else:
                lines.append(f"{frame},{cls},{a},{e}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
