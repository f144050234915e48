"""Inference/export/eval tests on the synthetic project."""

import os
from pathlib import Path

import jax
import numpy as np
import pytest
import yaml

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.infer.export import (export_pose_like_dlc,
                                            load_pose_from_dlc, load_pose_h5)
from deepgraphpose_tpu.infer.predict import estimate_pose, make_infer_fn
from deepgraphpose_tpu.infer.video_writer import (colormap_colors,
                                                  create_annotated_movie)
from deepgraphpose_tpu.models.pose_model import init_model
from deepgraphpose_tpu.evaluation.metrics import pairwise_distances


def test_export_roundtrip(tmp_path, rng):
    labels = {"x": rng.uniform(0, 100, (5, 3)),
              "y": rng.uniform(0, 100, (5, 3)),
              "likelihoods": rng.uniform(0, 1, (5, 3))}
    save = str(tmp_path / "traj")
    export_pose_like_dlc(labels, "scorer", ["a", "b", "c"], save)
    back = load_pose_from_dlc(save + ".csv")
    np.testing.assert_allclose(back["x"], labels["x"])
    np.testing.assert_allclose(back["likelihoods"], labels["likelihoods"])
    back_h5 = load_pose_h5(save + ".h5")
    np.testing.assert_allclose(back_h5["y"], labels["y"])


def test_pairwise_distances_pcutoff():
    pred = np.zeros((2, 2, 2))
    true = np.ones((2, 2, 2)) * 3  # distance 3*sqrt(2)
    lik = np.array([[0.9, 0.1], [0.9, 0.9]])
    all_, cut = pairwise_distances(pred, true, lik, pcutoff=0.5)
    np.testing.assert_allclose(all_, 3 * np.sqrt(2))
    assert np.isnan(cut[0, 1]) and np.isfinite(cut[0, 0])


def test_colormap_colors():
    cols = colormap_colors(5)
    assert len(cols) == 5
    assert all(len(c) == 3 for c in cols)
    assert cols[0] != cols[-1]


@pytest.fixture(scope="module")
def infer_setup():
    cfg = PoseConfig(num_joints=3, net_type="mobilenet_v2_0.35",
                     all_joints_names=["a", "b", "c"])
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (64, 80))
    return cfg, model, variables


def test_make_infer_fn_shapes(infer_setup, rng):
    cfg, model, variables = infer_setup
    import jax.numpy as jnp

    images = jnp.asarray(rng.integers(0, 255, (4, 64, 80, 3), dtype=np.uint8))
    infer = make_infer_fn(model, cfg)
    mu, lik = infer(variables, images)
    assert mu.shape == (4, 3, 2)
    assert lik.shape == (4, 3)
    lik = np.asarray(lik)
    assert ((lik >= 0) & (lik <= 1)).all()
    mu = np.asarray(mu)
    assert (mu[..., 0] >= 0).all() and (mu[..., 0] <= 8).all()
    assert (mu[..., 1] >= 0).all() and (mu[..., 1] <= 10).all()


def test_estimate_pose_end_to_end(synthetic_project, infer_setup, tmp_path):
    root, _, _ = synthetic_project
    cfg, model, variables = infer_setup
    video = root + "/videos/synthvid.avi"

    labels = estimate_pose(None, tmp_path / "fake.ckpt", video, tmp_path,
                           pose_cfg=cfg, model=model, variables=variables,
                           batch_size=8, max_frames=20)
    assert labels["x"].shape == (20, 3)
    assert np.isfinite(labels["x"]).all()
    # exports written
    assert (tmp_path / "synthvid.csv").exists()
    assert (tmp_path / "synthvid.h5").exists()
    back = load_pose_from_dlc(str(tmp_path / "synthvid.csv"))
    np.testing.assert_allclose(back["x"], labels["x"], rtol=1e-6)

    # skip-if-exists contract: second call loads from CSV
    again = estimate_pose(None, tmp_path / "fake.ckpt", video, tmp_path,
                          pose_cfg=cfg, model=model, variables=variables,
                          batch_size=8, max_frames=20)
    np.testing.assert_allclose(again["x"], labels["x"], rtol=1e-6)


def test_estimate_pose_scale_crop_compose(synthetic_project, infer_setup,
                                          tmp_path):
    """scale= + crop= compose: crop box is in resized pixels (applied after
    the resize, matching _batch_producer), and returned coordinates map
    back to original-video pixels as (coord_px + crop_offset) * 1/scale."""
    import cv2

    from deepgraphpose_tpu.data.video import VideoReader

    root, _, _ = synthetic_project
    cfg, model, variables = infer_setup
    video = root + "/videos/synthvid.avi"
    crop = (12, 8, 44, 40)  # (x0, y0, x1, y1) in RESIZED (48, 60) pixels

    labels = estimate_pose(None, tmp_path / "fake.ckpt", video, tmp_path,
                           pose_cfg=cfg, model=model, variables=variables,
                           save_pose=False, scale=0.75, crop=crop,
                           batch_size=4, max_frames=4)

    # manual replay of the documented contract
    reader = VideoReader(video)
    frames = []
    for i in range(4):
        f = cv2.resize(reader.read_frame(i), (60, 48))
        frames.append(f[crop[1]:crop[3], crop[0]:crop[2]])
    reader.close()
    infer = make_infer_fn(model, cfg)
    mu, _ = infer(variables, np.stack(frames))
    mu = np.asarray(mu)
    s = cfg.stride
    x_exp = (mu[:, :, 1] * s + 0.5 * s + crop[0]) * (80 / 60)
    y_exp = (mu[:, :, 0] * s + 0.5 * s + crop[1]) * (64 / 48)
    np.testing.assert_allclose(labels["x"], x_exp, atol=1e-3)
    np.testing.assert_allclose(labels["y"], y_exp, atol=1e-3)

    # bad scales fail loudly instead of producing garbage
    import pytest

    with pytest.raises(ValueError, match="scale"):
        estimate_pose(None, tmp_path / "fake.ckpt", video, tmp_path,
                      pose_cfg=cfg, model=model, variables=variables,
                      save_pose=False, scale=0.0)


def test_annotated_movie(synthetic_project, tmp_path, rng):
    root, _, _ = synthetic_project
    video = root + "/videos/synthvid.avi"
    labels = {"x": rng.uniform(5, 70, (10, 3)),
              "y": rng.uniform(5, 55, (10, 3)),
              "likelihoods": np.ones((10, 3))}
    out = create_annotated_movie(video, tmp_path / "lab.mp4", labels,
                                 max_frames=10)
    assert out.exists() and out.stat().st_size > 1000
    from deepgraphpose_tpu.data.video import VideoReader

    r = VideoReader(out)
    assert r.n_frames == 10
    # the drawn marker color should appear in the frame
    f0 = r.read_frame(0)
    assert f0.shape == (64, 80, 3)
    r.close()


def test_comparison_movie(synthetic_project, tmp_path, rng):
    from deepgraphpose_tpu.data.video import VideoReader
    from deepgraphpose_tpu.infer.video_writer import create_comparison_movie

    root, _, _ = synthetic_project
    video = Path(root) / "videos" / "synthvid.avi"
    T, nj = 10, 3
    mk = lambda off: {"x": rng.uniform(5, 70, (T, nj)) + off,
                      "y": rng.uniform(5, 55, (T, nj)),
                      "likelihoods": np.full((T, nj), 0.9)}
    out = create_comparison_movie(video, tmp_path / "cmp.mp4",
                                  mk(0), mk(3), max_frames=T)
    r = VideoReader(out)
    assert r.n_frames == T
    assert r.width == 2 * 80 and r.height == 64  # side-by-side
    r.close()


def test_estimate_pose_quantized(synthetic_project, infer_setup, tmp_path):
    """estimate_pose(quantize=True) calibrates on the video's first frames
    and runs the int8 backbone; outputs stay close to the f32 path."""
    root, _, _ = synthetic_project
    cfg, model, variables = infer_setup
    video = root + "/videos/synthvid.avi"

    f32 = estimate_pose(None, tmp_path / "fake.ckpt", video, tmp_path,
                        pose_cfg=cfg, model=model, variables=variables,
                        batch_size=8, max_frames=16, save_pose=False)
    q = estimate_pose(None, tmp_path / "fake.ckpt", video, tmp_path,
                      pose_cfg=cfg, model=model, variables=variables,
                      batch_size=8, max_frames=16, save_pose=False,
                      quantize=True, calib_frames=4)
    assert np.isfinite(q["x"]).all()
    # random-weight net: just bound the decode drift to a few pixels
    med = np.median(np.hypot(q["x"] - f32["x"], q["y"] - f32["y"]))
    assert med < 8.0, f"median int8-vs-f32 drift {med:.2f} px"


def test_estimate_pose_model_variables_resolution(synthetic_project,
                                                  infer_setup, tmp_path):
    """The model/variables resolution contract: variables-only constructs
    the module without a snapshot load; a quantized model without its
    variables is rejected instead of loading the float snapshot into a
    mismatched template."""
    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.models.pose_model import PoseModel
    from deepgraphpose_tpu.models.quant import quantize_model

    root, _, _ = synthetic_project
    cfg, model, variables = infer_setup
    video = root + "/videos/synthvid.avi"
    snap = ckpt_lib.save_snapshot(tmp_path, 0, "final--0", variables)
    assert snap.name == "snapshot-step0-final--0.ckpt"

    # variables only: no snapshot on disk is even needed
    vars_only = estimate_pose(None, tmp_path / "missing.ckpt", video,
                              tmp_path, pose_cfg=cfg, variables=variables,
                              batch_size=8, max_frames=8, save_pose=False)
    # model only: snapshot loads into the default template
    model_only = estimate_pose(None, snap, video, tmp_path, pose_cfg=cfg,
                               model=PoseModel(cfg), batch_size=8,
                               max_frames=8, save_pose=False)
    np.testing.assert_allclose(vars_only["x"], model_only["x"], atol=1e-3)

    # quantized model without its variables must raise
    frame0 = np.zeros((2, 64, 80, 3), np.uint8)
    qmodel, _ = quantize_model(cfg, variables, frame0)
    with pytest.raises(ValueError, match="quantized"):
        estimate_pose(None, snap, video, tmp_path, pose_cfg=cfg,
                      model=qmodel, batch_size=8, max_frames=8,
                      save_pose=False)
