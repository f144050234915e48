"""DLC project file readers/writers (labels, training sets, metadata).

Reads the on-disk artifacts of a DeepLabCut project without depending on
pandas-pytables / ruamel (not in this environment):

* ``CollectedData_{scorer}.csv`` — 3 header rows (scorer / bodyparts /
  coords), one row per labeled image (ref layout:
  labeled-data/{video}/CollectedData_*.csv).
* the training ``.mat`` (ref: trainingsetmanipulation.py:686-693 MatlabData:
  struct array with image / size / joints fields).
* ``Documentation_data-*.pickle`` — [data list, train idx, test idx,
  train fraction] (ref: trainingsetmanipulation.py:521-814); may contain
  ruamel objects, handled by a tolerant unpickler.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np


@dataclass
class Labels:
    """Labeled keypoints for one video's frames."""

    scorer: str
    bodyparts: list
    image_paths: list          # relative paths like labeled-data/vid/img001.png
    coords_xy: np.ndarray      # (n_frames, nj, 2) pixel (x, y); NaN = unlabeled

    @property
    def frame_indices(self) -> np.ndarray:
        """Frame numbers parsed from imgNNN.png names."""
        out = []
        for p in self.image_paths:
            stem = Path(p).stem
            digits = "".join(ch for ch in stem if ch.isdigit())
            out.append(int(digits) if digits else -1)
        return np.asarray(out, dtype=np.int64)


def read_collected_data_csv(path: str | Path) -> Labels:
    """Parse a DLC CollectedData CSV."""
    import csv

    with open(path) as f:
        rows = list(csv.reader(f))
    scorer_row, bp_row, coord_row = rows[0], rows[1], rows[2]
    scorer = next(x for x in scorer_row[1:] if x)
    bodyparts: list[str] = []
    for bp in bp_row[1:]:
        if bp and (not bodyparts or bodyparts[-1] != bp):
            bodyparts.append(bp)
    nj = len(bodyparts)
    assert coord_row[1:1 + 2 * nj][0] in ("x", "y")

    image_paths = []
    coords = []
    for row in rows[3:]:
        if not row or not row[0]:
            continue
        image_paths.append(row[0])
        vals = [float(v) if v not in ("", "nan") else np.nan
                for v in row[1:1 + 2 * nj]]
        coords.append(vals)
    arr = np.asarray(coords, dtype=np.float64).reshape(len(image_paths), nj, 2)
    return Labels(scorer=scorer, bodyparts=bodyparts, image_paths=image_paths,
                  coords_xy=arr)


def write_collected_data_csv(path: str | Path, labels: Labels) -> None:
    import csv

    nj = len(labels.bodyparts)
    with open(path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["scorer"] + [labels.scorer] * (2 * nj))
        wr.writerow(["bodyparts"] + [bp for bp in labels.bodyparts for _ in range(2)])
        wr.writerow(["coords"] + ["x", "y"] * nj)
        for p, c in zip(labels.image_paths, labels.coords_xy):
            row = [p]
            for v in c.reshape(-1):
                row.append("" if np.isnan(v) else repr(float(v)))
            wr.writerow(row)


def read_collected_data_h5(path: str | Path) -> Labels:
    """Read a pandas-written CollectedData H5 via raw h5py (no pytables).

    Supports the 'fixed' format layout pandas uses for MultiIndex frames.
    Falls back to the sibling CSV if parsing fails.
    """
    import h5py

    try:
        with h5py.File(path, "r") as f:
            g = f["df_with_missing"]
            # pandas fixed format: axis0 stores column tuples via level arrays
            labels0 = [x.decode() for x in g["axis0_label0"][()]] \
                if "axis0_label0" in g else None
            if labels0 is None:
                raise KeyError("not a fixed-format frame")
            lvl0 = [x.decode() for x in g["axis0_level0"][()]]
            lvl1 = [x.decode() for x in g["axis0_level1"][()]]
            lvl2 = [x.decode() for x in g["axis0_level2"][()]]
            l0 = g["axis0_label0"][()]
            l1 = g["axis0_label1"][()]
            l2 = g["axis0_label2"][()]
            cols = [(lvl0[a], lvl1[b], lvl2[c]) for a, b, c in zip(l0, l1, l2)]
            index = [x.decode() if isinstance(x, bytes) else str(x)
                     for x in g["axis1"][()]]
            values = g["block0_values"][()]
        scorer = cols[0][0]
        bodyparts: list[str] = []
        for _, bp, _ in cols:
            if not bodyparts or bodyparts[-1] != bp:
                bodyparts.append(bp)
        nj = len(bodyparts)
        coords = np.full((len(index), nj, 2), np.nan)
        for ci, (_, bp, coord) in enumerate(cols):
            j = bodyparts.index(bp)
            k = 0 if coord == "x" else 1
            coords[:, j, k] = values[:, ci]
        return Labels(scorer=scorer, bodyparts=bodyparts, image_paths=index,
                      coords_xy=coords)
    except Exception:
        csv_path = Path(path).with_suffix(".csv")
        if csv_path.exists():
            return read_collected_data_csv(csv_path)
        raise


def read_labels(labeled_data_dir: str | Path, scorer: str) -> Labels:
    """Load labels for a video dir, preferring CSV (env has no pytables)."""
    d = Path(labeled_data_dir)
    csv_path = d / f"CollectedData_{scorer}.csv"
    if csv_path.exists():
        return read_collected_data_csv(csv_path)
    h5_path = d / f"CollectedData_{scorer}.h5"
    if h5_path.exists():
        return read_collected_data_h5(h5_path)
    raise FileNotFoundError(f"no CollectedData for scorer {scorer} in {d}")


# ---------------------------------------------------------------------------
# training-set .mat + Documentation pickle
# ---------------------------------------------------------------------------

@dataclass
class TrainingSet:
    """Parsed training dataset (.mat + Documentation pickle)."""

    image_paths: list                    # per item, project-relative
    sizes: np.ndarray                    # (n, 3) channels/height/width
    joints: list                         # per item (k, 3): [joint_id, x, y]
    train_indices: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    test_indices: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    train_fraction: float = 0.95

    def coords_for(self, num_joints: int) -> np.ndarray:
        """(n, nj, 2) pixel (x, y) with NaN for absent joints."""
        out = np.full((len(self.image_paths), num_joints, 2), np.nan)
        for i, j in enumerate(self.joints):
            for row in np.atleast_2d(j):
                jid = int(row[0])
                out[i, jid, 0] = row[1]
                out[i, jid, 1] = row[2]
        return out


def read_training_mat(path: str | Path) -> TrainingSet:
    """Parse the DLC MatlabData training file via scipy.io."""
    import scipy.io as sio

    m = sio.loadmat(path)
    d = m["dataset"]
    image_paths, sizes, joints = [], [], []
    for i in range(d.shape[1]):
        e = d[0, i]
        img = e["image"]
        while isinstance(img, np.ndarray):
            img = img[0]
        image_paths.append(str(img))
        sizes.append(np.asarray(e["size"]).reshape(-1)[:3])
        j = e["joints"]
        while isinstance(j, np.ndarray) and j.dtype == object:
            j = j[0, 0] if j.ndim == 2 else j[0]
        joints.append(np.asarray(j, dtype=np.float64))
    return TrainingSet(image_paths=image_paths,
                       sizes=np.asarray(sizes, dtype=np.int64),
                       joints=joints)


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickler that stubs unavailable classes (e.g. ruamel.yaml scalars)."""

    class _Stub(dict):
        def __setstate__(self, state):
            if isinstance(state, dict):
                self.update(state)

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:
            return type(name, (self._Stub,), {"__module__": module})


def read_documentation_pickle(path: str | Path) -> tuple:
    """(data, train_indices, test_indices, train_fraction)."""
    with open(path, "rb") as f:
        doc = _TolerantUnpickler(f).load()
    data, train_idx, test_idx, frac = doc[0], doc[1], doc[2], doc[3]
    try:
        frac = float(frac)
    except Exception:
        frac = 0.95
    return data, np.asarray(train_idx), np.asarray(test_idx), frac


def write_documentation_pickle(path: str | Path, data: list,
                               train_idx, test_idx, frac: float) -> None:
    with open(path, "wb") as f:
        pickle.dump([data, np.asarray(train_idx), np.asarray(test_idx),
                     float(frac)], f)


def read_training_set(mat_path: str | Path,
                      doc_path: str | Path | None = None) -> TrainingSet:
    ts = read_training_mat(mat_path)
    if doc_path is not None and Path(doc_path).exists():
        _, tr, te, frac = read_documentation_pickle(doc_path)
        ts.train_indices = tr.astype(np.int64)
        ts.test_indices = te.astype(np.int64)
        ts.train_fraction = frac
    else:
        ts.train_indices = np.arange(len(ts.image_paths), dtype=np.int64)
    return ts


def write_training_mat(path: str | Path, image_paths: list,
                       sizes: np.ndarray, joints: list) -> None:
    """Write a DLC-compatible MatlabData .mat training file."""
    import scipy.io as sio

    items = np.zeros((1, len(image_paths)),
                     dtype=[("image", "O"), ("size", "O"), ("joints", "O")])
    for i, (p, s, j) in enumerate(zip(image_paths, sizes, joints)):
        items[0, i]["image"] = np.asarray([p])
        items[0, i]["size"] = np.asarray(s, dtype=np.int64).reshape(1, 3)
        cell = np.zeros((1, 1), dtype="O")
        cell[0, 0] = np.asarray(j)
        items[0, i]["joints"] = cell
    sio.savemat(path, {"dataset": items})
