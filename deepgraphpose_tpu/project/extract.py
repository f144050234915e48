"""Frame extraction for labeling (ref: deeplabcut/generate_training_dataset/
frame_extraction.py + utils/frameselectiontools.py).

Two selection algorithms, matching the reference's semantics:

* ``uniform``  — temporally uniform sampling in the configured
  [start, stop] fraction of the video (ref: frameselectiontools.py:45-69).
* ``kmeans``   — MiniBatchKMeans over downsampled (resizewidth px wide,
  grayscale by default) frames stepped by ``step``; one frame nearest each
  cluster center (ref: frameselectiontools.py:139-247).

Frames are written as ``labeled-data/<video>/img<NNN...>.png`` with the
zero-padding width derived from the frame count, exactly the layout the
labeling and training-set tooling expects.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from deepgraphpose_tpu.core.config import ProjectConfig


def _read_stepped_frames(video_path: Path, start: float, stop: float,
                         step: int, resizewidth: int):
    """(indices, (n, h', w') grayscale f32 array) for the kmeans features."""
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    lo, hi = int(n * start), max(int(n * stop), int(n * start) + 1)
    idxs, frames = [], []
    ratio = None
    for i in range(lo, min(hi, n), step):
        cap.set(cv2.CAP_PROP_POS_FRAMES, i)
        ok, frame = cap.read()
        if not ok:
            continue
        if ratio is None:
            ratio = resizewidth / frame.shape[1]
        small = cv2.resize(frame, (0, 0), fx=ratio, fy=ratio)
        gray = cv2.cvtColor(small, cv2.COLOR_BGR2GRAY)
        idxs.append(i)
        frames.append(gray.astype(np.float32) / 255.0)
    cap.release()
    return np.asarray(idxs), (np.stack(frames) if frames else
                              np.zeros((0, 1, 1), np.float32))


def select_frames_uniform(n_frames: int, numframes2pick: int, start: float,
                          stop: float, rng=None) -> np.ndarray:
    """Uniformly spaced frame indices in [start, stop) fraction of video."""
    lo, hi = int(n_frames * start), max(int(n_frames * stop), 1)
    if hi - lo <= numframes2pick:
        return np.arange(lo, hi)
    return np.unique(np.linspace(lo, hi - 1, numframes2pick).astype(int))


def select_frames_kmeans(video_path: Path, numframes2pick: int,
                         start: float, stop: float, step: int = 25,
                         resizewidth: int = 30, seed: int = 42) -> np.ndarray:
    """Visually diverse frames by clustering downsampled frames."""
    from sklearn.cluster import MiniBatchKMeans

    idxs, frames = _read_stepped_frames(video_path, start, stop, step,
                                        resizewidth)
    if len(idxs) <= numframes2pick:
        return idxs
    flat = frames.reshape(len(idxs), -1)
    km = MiniBatchKMeans(n_clusters=numframes2pick, tol=1e-3,
                         batch_size=max(100, numframes2pick),
                         max_iter=50, n_init=3, random_state=seed)
    assign = km.fit_predict(flat)
    picked = []
    for c in range(numframes2pick):
        members = np.flatnonzero(assign == c)
        if members.size == 0:
            continue
        d = np.linalg.norm(flat[members] - km.cluster_centers_[c], axis=1)
        picked.append(int(idxs[members[np.argmin(d)]]))
    return np.unique(picked)


def extract_frames(config: str | Path, mode: str = "automatic",
                   algo: str = "kmeans", crop: bool = False,
                   userfeedback: bool = False, videos: list | None = None,
                   seed: int = 42) -> dict[str, np.ndarray]:
    """Extract frames for every video in the project's video_sets.

    Returns {video path: selected frame indices}. ``mode`` exists for API
    parity; only 'automatic' is supported (manual extraction is a GUI
    feature in the reference).
    """
    import cv2

    del userfeedback  # headless: never prompt
    if mode != "automatic":
        raise NotImplementedError(
            "only mode='automatic' is supported (the reference's 'manual' "
            "mode is a wx GUI, ref: frame_extraction.py)")

    config = Path(config)
    proj = ProjectConfig.from_yaml(config)
    project_path = Path(proj.project_path or config.parent)
    out: dict[str, np.ndarray] = {}

    vids = videos if videos is not None else list(proj.video_sets)
    for vid in vids:
        vpath = Path(vid)
        if not vpath.is_absolute():
            vpath = project_path / vpath
        if not vpath.exists():
            print(f"warning: {vpath} missing; skipping")
            continue
        cap = cv2.VideoCapture(str(vpath))
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        if algo == "uniform":
            picked = select_frames_uniform(n, proj.numframes2pick,
                                           proj.start, proj.stop)
        elif algo == "kmeans":
            picked = select_frames_kmeans(vpath, proj.numframes2pick,
                                          proj.start, proj.stop, seed=seed)
        else:
            raise ValueError(f"unknown algo {algo!r} (uniform|kmeans)")

        crop_box = None
        if crop:
            spec = (proj.video_sets.get(vid) or {}).get("crop")
            if spec:
                x0, x1, y0, y1 = [int(v) for v in str(spec).split(",")]
                crop_box = (x0, x1, y0, y1)
            else:
                # reference behavior: crop=True with no stored crop pops the
                # selection GUI and writes coords back to config.yaml
                # (ref: frame_extraction.py:149-168); headless resolution
                # order in project/crop_select.py ($DGP_CROP / tty / full)
                from deepgraphpose_tpu.project import crop_select

                cap = cv2.VideoCapture(str(vpath))
                cap.set(cv2.CAP_PROP_POS_FRAMES,
                        int(proj.start * max(n - 1, 0)))
                ok, frame0 = cap.read()
                cap.release()
                if ok:
                    coords = crop_select.show(config, frame0[:, :, ::-1])
                    crop_box = tuple(int(v) for v in coords)
                    import yaml

                    raw = yaml.safe_load(config.read_text())
                    sets = raw.setdefault("video_sets", {})
                    # a YAML-null entry ("video:" with no mapping) reads
                    # back as None — replace, don't setdefault
                    if not isinstance(sets.get(vid), dict):
                        sets[vid] = {}
                    raw["video_sets"][vid]["crop"] = ", ".join(
                        str(v) for v in crop_box)
                    config.write_text(yaml.safe_dump(raw, sort_keys=False))

        dest = project_path / "labeled-data" / vpath.stem
        dest.mkdir(parents=True, exist_ok=True)
        pad = max(int(np.ceil(np.log10(max(n, 1)))), 1)
        cap = cv2.VideoCapture(str(vpath))
        for i in picked:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, frame = cap.read()
            if not ok:
                continue
            if crop_box:
                x0, x1, y0, y1 = crop_box
                frame = frame[y0:y1, x0:x1]
            cv2.imwrite(str(dest / f"img{int(i):0{pad}d}.png"), frame)
        cap.release()
        out[str(vpath)] = picked
        print(f"extracted {len(picked)} frames from {vpath.name} -> {dest}")
    return out
