"""Trajectory HDF5 export (component I, SURVEY.md §2.3; BASELINE.json:10).

Layout (deterministic; same writer used by refimpl and the TPU pipeline):
  /trajectories : (N, 5) float64, rows sorted by (track_id, frame),
                  columns attr = ['track_id','frame','x','y','area']
  /tracks       : (K, 4) float64 summary, one row per track:
                  (track_id, first_frame, last_frame, n_points)
Matches the reference's pass-output style: each pass persists its full
result to HDF5 for the next pass (SURVEY.md §5.4).
"""

from __future__ import annotations

import numpy as np

COLUMNS = ["track_id", "frame", "x", "y", "area"]


def _as_table(rows) -> np.ndarray:
    rows = sorted(rows, key=lambda r: (int(r[0]), int(r[1])))
    if not rows:
        return np.zeros((0, 5), np.float64)
    tab = np.array(
        [
            (int(t), int(f), float(x), float(y), float(int(round(a))))
            for t, f, x, y, a in rows
        ],
        np.float64,
    )
    # quantize x/y the same way the CSV writer does so the two export paths
    # stay value-identical
    tab[:, 2:4] = np.round(tab[:, 2:4], 3)
    return tab


def write_tracks_hdf5(path, rows) -> None:
    import h5py

    tab = _as_table(rows)
    ids = np.unique(tab[:, 0]) if len(tab) else np.zeros(0)
    summary = np.zeros((len(ids), 4), np.float64)
    for k, tid in enumerate(ids):
        sel = tab[tab[:, 0] == tid]
        summary[k] = (tid, sel[:, 1].min(), sel[:, 1].max(), len(sel))
    with h5py.File(path, "w", track_order=False) as f:
        d = f.create_dataset("trajectories", data=tab)
        d.attrs["columns"] = COLUMNS
        f.create_dataset("tracks", data=summary)


def read_tracks_hdf5(path) -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as f:
        return f["trajectories"][...]
