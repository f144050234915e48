"""3-D layer: synthetic-geometry tests for stereo calibration +
triangulation, and the full triangulate() flow over exported pose tables."""

from pathlib import Path

import numpy as np
import pytest

from deepgraphpose_tpu.threed import (CameraSystem, calibrate_stereo,
                                      create_new_project_3d, triangulate,
                                      triangulate_points, undistort_points)
from deepgraphpose_tpu.threed.calibration import checkerboard_object_points

cv2 = pytest.importorskip("cv2")


def _make_cameras():
    """Two synthetic pinhole cameras looking at the origin."""
    K1 = np.array([[800.0, 0, 320], [0, 800, 240], [0, 0, 1]])
    K2 = np.array([[820.0, 0, 330], [0, 820, 235], [0, 0, 1]])
    R, _ = cv2.Rodrigues(np.array([0.0, 0.35, 0.0]))  # yawed second view
    T = np.array([[-3.0], [0.1], [0.4]])
    P1 = K1 @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K2 @ np.hstack([R, T])
    return K1, K2, R, T, P1, P2


def _project(P, X):
    Xh = np.hstack([X, np.ones((len(X), 1))])
    x = (P @ Xh.T).T
    return x[:, :2] / x[:, 2:3]


def test_triangulate_points_recovers_geometry(rng):
    _, _, _, _, P1, P2 = _make_cameras()
    X = rng.uniform([-1, -1, 8], [1, 1, 12], (40, 3))
    x1 = _project(P1, X)
    x2 = _project(P2, X)
    got = triangulate_points(P1, P2, x1, x2)
    np.testing.assert_allclose(got, X, atol=1e-6)


def test_triangulate_points_propagates_nan(rng):
    _, _, _, _, P1, P2 = _make_cameras()
    X = rng.uniform([-1, -1, 8], [1, 1, 12], (5, 3))
    x1 = _project(P1, X)
    x2 = _project(P2, X)
    x1[2] = np.nan
    got = triangulate_points(P1, P2, x1, x2)
    assert np.isnan(got[2]).all()
    np.testing.assert_allclose(got[[0, 1, 3, 4]], X[[0, 1, 3, 4]], atol=1e-6)


def test_undistort_points_identity_when_no_distortion():
    K1, _, _, _, _, _ = _make_cameras()
    pts = np.array([[100.0, 200.0], [320.0, 240.0], [np.nan, 5.0]])
    out = undistort_points(pts, K1, np.zeros(5), K1)
    np.testing.assert_allclose(out[:2], pts[:2], atol=1e-6)
    assert np.isnan(out[2]).all()


def test_calibrate_stereo_from_synthetic_views(rng):
    """Project a checkerboard through known cameras; the solve must recover
    the extrinsics well enough to triangulate fresh points."""
    K1, K2, R, T, P1, P2 = _make_cameras()
    objp = checkerboard_object_points(6, 8, square_size=0.5)

    objpoints, img1, img2 = [], [], []
    for i in range(12):
        rvec = np.array([0.2, -0.1, 0.05]) * (i % 5 - 2)
        Rb, _ = cv2.Rodrigues(rvec)
        tb = np.array([-1.0 + 0.15 * i, -0.8 + 0.1 * i, 9.0 + 0.2 * i])
        Xw = objp @ Rb.T + tb
        objpoints.append(objp)
        img1.append(_project(P1, Xw).reshape(-1, 1, 2).astype(np.float32))
        img2.append(_project(P2, Xw).reshape(-1, 1, 2).astype(np.float32))

    system = calibrate_stereo(objpoints, img1, img2, (640, 480))
    assert system.rms < 1.0

    X = rng.uniform([-1, -1, 8], [1, 1, 12], (20, 3))
    got = triangulate_points(system.P["camera-1"], system.P["camera-2"],
                             _project(P1, X), _project(P2, X))
    # calibration recovered from projections alone: sub-5% geometry error
    assert np.abs(got - X).max() < 0.5


def test_create_project_3d_and_triangulate_flow(tmp_path, rng):
    from deepgraphpose_tpu.infer.export import write_pose_h5

    cfg3d = create_new_project_3d("Tri", "bob", str(tmp_path),
                                  date="2026-08-16")
    root = Path(cfg3d).parent
    assert (root / "calibration_images").is_dir()

    # install a known camera system
    K1, K2, R, T, P1, P2 = _make_cameras()
    system = CameraSystem(
        camera_names=["camera-1", "camera-2"],
        K={"camera-1": K1, "camera-2": K2},
        dist={"camera-1": np.zeros(5), "camera-2": np.zeros(5)},
        R=R, T=T, P={"camera-1": P1, "camera-2": P2},
        image_size=(640, 480))
    system.save(root / "camera_matrix" / "stereo_params.pickle")

    # synthetic 3-D trajectories -> per-camera pose tables
    Tn, nj = 25, 3
    X = np.stack([
        np.stack([np.sin(np.arange(Tn) / 5 + j),
                  np.cos(np.arange(Tn) / 7 + j),
                  10 + 0.5 * np.sin(np.arange(Tn) / 3 + j)], -1)
        for j in range(nj)], axis=1)          # (T, nj, 3)
    bps = [f"bp{j}" for j in range(nj)]
    lik = np.full((Tn, nj), 0.99)
    lik[5, 1] = 0.01  # one masked point
    for cam, P in (("cam1", P1), ("cam2", P2)):
        xy = _project(P, X.reshape(-1, 3)).reshape(Tn, nj, 2)
        write_pose_h5(root / f"vid_{cam}.h5", "s", bps,
                      {"x": xy[..., 0], "y": xy[..., 1],
                       "likelihoods": lik})

    result = triangulate(cfg3d, root / "vid_cam1.h5", root / "vid_cam2.h5")
    xyz = result["xyz"]
    assert xyz.shape == (Tn, nj, 3)
    assert np.isnan(xyz[5, 1]).all()
    finite = np.isfinite(xyz[..., 0])
    np.testing.assert_allclose(xyz[finite], X[finite], atol=1e-5)
    assert (root / "vid_cam1_DGP_3D_3d.csv").exists()
    assert (root / "vid_cam1_DGP_3D_3d.h5").exists()


def test_plotting3d(tmp_path, rng):
    from deepgraphpose_tpu.threed.plotting3d import (create_labeled_video_3d,
                                                     plot_trajectories_3d)

    T, nj = 8, 3
    xyz = rng.standard_normal((T, nj, 3)) + [0, 0, 10]
    xyz[2, 1] = np.nan
    bps = ["bp0", "bp1", "bp2"]
    fig = plot_trajectories_3d(xyz, bps, tmp_path / "traj3d.png")
    assert fig.exists()

    import yaml

    cfg3d = tmp_path / "config.yaml"
    with open(cfg3d, "w") as f:
        yaml.safe_dump({"skeleton": [["bp0", "bp1"]],
                        "skeleton_color": "black"}, f)
    vid = create_labeled_video_3d(cfg3d, xyz, bps, tmp_path / "v3d.mp4",
                                  trailpoints=3)
    assert vid.exists() and vid.stat().st_size > 0
