"""Trajectory export in DLC format (CSV + HDF5).

ref: eval.py:621-645 (export_pose_like_dlc) — a (scorer, bodyparts,
[x, y, likelihood]) MultiIndex table. CSV layout is byte-compatible with
pandas' MultiIndex serialization; the H5 is written via h5py (pandas
pytables is unavailable here) in a simple self-describing layout.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def export_pose_like_dlc(labels: dict, scorer: str, joints_names: list,
                         save_file: str) -> None:
    """Write <save_file>.csv and <save_file>.h5."""
    x, y, lik = labels["x"], labels["y"], labels["likelihoods"]
    n_frames, nj = x.shape
    data = np.empty((n_frames, 3 * nj), dtype=np.float64)
    data[:, 0::3] = x
    data[:, 1::3] = y
    data[:, 2::3] = lik

    # ---- CSV (pandas MultiIndex-compatible header rows) ----
    with open(save_file + ".csv", "w", newline="") as f:
        f.write("scorer," + ",".join([scorer] * 3 * nj) + "\n")
        f.write("bodyparts," + ",".join(
            [bp for bp in joints_names for _ in range(3)]) + "\n")
        f.write("coords," + ",".join(["x", "y", "likelihood"] * nj) + "\n")
        for i in range(n_frames):
            f.write(str(i) + "," + ",".join(repr(float(v))
                                            for v in data[i]) + "\n")

    write_pose_h5(save_file + ".h5", scorer, joints_names, labels)


def write_pose_h5(path: str | Path, scorer: str, joints_names: list,
                  labels: dict, index=None) -> None:
    """Self-describing h5py trajectory table (pandas pytables is
    unavailable here). Layout: group 'df_with_missing' with 'data'
    (n, 3*nj), 'bodyparts', 'coords', 'index' and a 'scorer' attr."""
    import h5py

    x, y, lik = labels["x"], labels["y"], labels["likelihoods"]
    n_frames, nj = np.asarray(x).shape
    data = np.empty((n_frames, 3 * nj), dtype=np.float64)
    data[:, 0::3] = x
    data[:, 1::3] = y
    data[:, 2::3] = lik
    with h5py.File(str(path), "w") as f:
        g = f.create_group("df_with_missing")
        g.attrs["scorer"] = scorer
        g.create_dataset("data", data=data)
        g.create_dataset("bodyparts",
                         data=np.array(joints_names, dtype="S"))
        g.create_dataset("coords", data=np.array(["x", "y", "likelihood"],
                                                 dtype="S"))
        if index is None:
            g.create_dataset("index", data=np.arange(n_frames))
        else:
            g.create_dataset("index", data=np.array(index, dtype="S"))


def read_pose_table(path: str | Path) -> tuple[str, list, dict, list]:
    """(scorer, bodyparts, {'x','y','likelihoods'}, index) from a pose .h5."""
    import h5py

    with h5py.File(str(path), "r") as f:
        g = f["df_with_missing"]
        data = g["data"][()]
        scorer = g.attrs.get("scorer", "")
        if isinstance(scorer, bytes):
            scorer = scorer.decode()
        bodyparts = [b.decode() if isinstance(b, bytes) else str(b)
                     for b in g["bodyparts"][()]]
        index = list(g["index"][()])
        index = [i.decode() if isinstance(i, bytes) else i for i in index]
    labels = {"x": data[:, 0::3], "y": data[:, 1::3],
              "likelihoods": data[:, 2::3]}
    return scorer, bodyparts, labels, index


def export_multi_pose_like_dlc(pose: "np.ndarray", scorer: str,
                               joints_names: list, save_file: str) -> None:
    """num_outputs > 1 export: (T, nj, k, 3) [x, y, likelihood] per peak.

    Column convention matches the reference (ref: predict_videos.py:188-196):
    per joint, ['x', 'y', 'likelihood', 'x2', 'y2', 'likelihood2', ...] —
    the first peak keeps the unsuffixed names for backwards compatibility.
    """
    import h5py

    t, nj, k, _ = pose.shape
    suffixes = [""] + [str(s + 1) for s in range(1, k)]
    labs = [f"{ax}{s}" for s in suffixes for ax in ("x", "y", "likelihood")]
    # (T, nj, k, 3) -> (T, nj * 3k) with peak-major inner order
    flat = pose.reshape(t, nj * 3 * k)

    with open(save_file + ".csv", "w", newline="") as f:
        f.write("scorer," + ",".join([scorer] * nj * 3 * k) + "\n")
        f.write("bodyparts," + ",".join(
            [bp for bp in joints_names for _ in range(3 * k)]) + "\n")
        f.write("coords," + ",".join(labs * nj) + "\n")
        for i in range(t):
            f.write(str(i) + "," + ",".join(repr(float(v))
                                            for v in flat[i]) + "\n")
    with h5py.File(save_file + ".h5", "w") as f:
        g = f.create_group("df_with_missing")
        g.attrs["scorer"] = scorer
        g.attrs["num_outputs"] = k
        g.create_dataset("data", data=flat)
        g.create_dataset("bodyparts",
                         data=np.array(joints_names, dtype="S"))
        g.create_dataset("coords", data=np.array(labs, dtype="S"))
        g.create_dataset("index", data=np.arange(t))


def load_pose_from_dlc(filename: str) -> dict:
    """Read a DLC-format trajectory CSV back into {'x','y','likelihoods'}
    (ref: eval.py:648-653 load_pose_from_dlc_to_dict)."""
    rows = []
    with open(filename) as f:
        lines = f.read().strip().split("\n")
    for line in lines[3:]:
        rows.append([float(v) for v in line.split(",")[1:]])
    arr = np.asarray(rows, dtype=np.float64)
    return {"x": arr[:, 0::3], "y": arr[:, 1::3], "likelihoods": arr[:, 2::3]}


def load_pose_h5(filename: str) -> dict:
    import h5py

    with h5py.File(filename, "r") as f:
        data = f["df_with_missing"]["data"][()]
    return {"x": data[:, 0::3], "y": data[:, 1::3],
            "likelihoods": data[:, 2::3]}
