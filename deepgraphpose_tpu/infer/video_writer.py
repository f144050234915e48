"""Labeled-video rendering.

ref: eval.py:816-874 (plot_dgp), 46-119 (create_annotated_movie), 122-144
(side-by-side comparison) and deeplabcut/utils/make_labeled_video.py
CreateVideo. Markers below ``mask_threshold`` likelihood are hidden
(ref: plot_dgp mask_threshold=0.1).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from deepgraphpose_tpu.data.video import VideoReader, write_video


def colormap_colors(n: int, name: str = "jet") -> list:
    """n RGB tuples 0-255 from a matplotlib colormap."""
    import matplotlib

    cmap = matplotlib.colormaps.get_cmap(name)
    return [tuple(int(255 * c) for c in cmap(i / max(n - 1, 1))[:3])
            for i in range(n)]


def create_annotated_movie(video_file: str | Path, out_file: str | Path,
                           labels: dict, mask_threshold: float = 0.1,
                           dotsize: int = 6, colormap: str = "jet",
                           max_frames: int | None = None) -> Path:
    """Draw per-bodypart circles over every frame and re-encode."""
    import cv2

    reader = VideoReader(video_file)
    x, y, lik = labels["x"], labels["y"], labels["likelihoods"]
    nj = x.shape[1]
    colors = colormap_colors(nj, colormap)
    n = x.shape[0] if max_frames is None else min(max_frames, x.shape[0])

    def frames():
        for i, frame in reader.iter_frames(stop=n):
            frame = frame.copy()
            for j in range(nj):
                if i < len(lik) and lik[i, j] > mask_threshold \
                        and np.isfinite(x[i, j]):
                    cv2.circle(frame, (int(round(x[i, j])),
                                       int(round(y[i, j]))),
                               dotsize, colors[j], -1)
            yield frame

    out_file = Path(out_file)
    out_file.parent.mkdir(parents=True, exist_ok=True)
    write_video(out_file, frames(), reader.fps,
                (reader.width, reader.height))
    reader.close()
    return out_file


def create_comparison_movie(video_file: str | Path, out_file: str | Path,
                            labels_a: dict, labels_b: dict,
                            mask_threshold: float = 0.1, dotsize: int = 6,
                            max_frames: int | None = None) -> Path:
    """Side-by-side annotated comparison (ref: eval.py:122-144)."""
    import cv2

    reader = VideoReader(video_file)
    nj = labels_a["x"].shape[1]
    colors = colormap_colors(nj)
    n = labels_a["x"].shape[0]
    if max_frames is not None:
        n = min(n, max_frames)

    def draw(frame, labels, i):
        f = frame.copy()
        for j in range(nj):
            if (labels["likelihoods"][i, j] > mask_threshold
                    and np.isfinite(labels["x"][i, j])
                    and np.isfinite(labels["y"][i, j])):
                cv2.circle(f, (int(round(labels["x"][i, j])),
                               int(round(labels["y"][i, j]))),
                           dotsize, colors[j], -1)
        return f

    def frames():
        for i, frame in reader.iter_frames(stop=n):
            yield np.concatenate([draw(frame, labels_a, i),
                                  draw(frame, labels_b, i)], axis=1)

    out_file = Path(out_file)
    out_file.parent.mkdir(parents=True, exist_ok=True)
    write_video(out_file, frames(), reader.fps,
                (reader.width * 2, reader.height))
    reader.close()
    return out_file


def plot_dgp(video_file: str | Path, output_dir: str | Path,
             proj_cfg_file: str | Path, dgp_model_file: str | Path,
             shuffle: int = 1, save_str: str = "",
             mask_threshold: float = 0.1, dotsize: int = 6,
             max_frames: int | None = None, **estimate_kwargs) -> Path:
    """Run inference if needed, then write the labeled video
    (ref: eval.py:816-874)."""
    from deepgraphpose_tpu.infer.predict import estimate_pose

    video_file = Path(video_file)
    output_dir = Path(output_dir)
    labels = estimate_pose(proj_cfg_file, dgp_model_file, video_file,
                           output_dir, shuffle=shuffle, save_str=save_str,
                           max_frames=max_frames, **estimate_kwargs)
    out = output_dir / f"{video_file.stem}{save_str}_labeled.mp4"
    return create_annotated_movie(video_file, out, labels,
                                  mask_threshold=mask_threshold,
                                  dotsize=dotsize, max_frames=max_frames)
