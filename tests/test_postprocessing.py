"""Post-processing layer: filtering, outlier extraction, analyze_videos,
plot_trajectories, CLI wiring."""

from pathlib import Path

import numpy as np

import pytest

from deepgraphpose_tpu.evaluation.filtering import (filter_pose_arrays,
                                                    kalman_smooth,
                                                    median_filter)
from deepgraphpose_tpu.evaluation.outliers import outlier_frame_indices


def _synthetic_labels(T=60, nj=2, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(T)
    x = 40 + 10 * np.sin(t[:, None] / 7 + np.arange(nj))
    y = 30 + 8 * np.cos(t[:, None] / 9 + np.arange(nj))
    return {"x": x + rng.normal(0, noise, x.shape),
            "y": y + rng.normal(0, noise, y.shape),
            "likelihoods": np.full((T, nj), 0.95)}, x, y


def test_median_filter_removes_spike():
    x = np.zeros((21, 1))
    x[10] = 50.0
    out = median_filter(x, windowlength=5)
    assert out[10, 0] == 0.0


def test_kalman_smooth_tracks_and_denoises():
    labels, x_true, y_true = _synthetic_labels(noise=1.5)
    j = 0
    sm = kalman_smooth(np.stack([labels["x"][:, j], labels["y"][:, j]], -1),
                       labels["likelihoods"][:, j])
    raw_err = np.abs(labels["x"][:, j] - x_true[:, j]).mean()
    sm_err = np.abs(sm[5:, 0] - x_true[5:, j]).mean()
    assert sm_err < raw_err


def test_kalman_smooth_bridges_uncertain_gap():
    labels, x_true, _ = _synthetic_labels(noise=0.2)
    j = 0
    lik = labels["likelihoods"][:, j].copy()
    # corrupt a stretch and mark it uncertain
    labels["x"][25:30, j] += 200.0
    lik[25:30] = 0.01
    sm = kalman_smooth(np.stack([labels["x"][:, j], labels["y"][:, j]], -1),
                       lik, pcutoff=0.4)
    assert np.abs(sm[25:30, 0] - x_true[25:30, j]).max() < 20.0


def test_filter_pose_arrays_modes():
    labels, _, _ = _synthetic_labels()
    for ft in ("median", "kalman"):
        out = filter_pose_arrays(labels, filtertype=ft)
        assert out["x"].shape == labels["x"].shape
        assert np.isfinite(out["x"]).all()
    with pytest.raises(ValueError):
        filter_pose_arrays(labels, filtertype="nope")


def test_outlier_indices_jump_uncertain_fitting():
    labels, _, _ = _synthetic_labels(noise=0.1)
    labels["x"][17, 0] += 100.0            # jump in and out at 17/18
    labels["likelihoods"][40, 1] = 0.001   # uncertain at 40

    jump = outlier_frame_indices(labels, "jump", epsilon=20)
    assert 17 in jump and 18 in jump
    unc = outlier_frame_indices(labels, "uncertain", p_bound=0.01)
    assert list(unc) == [40]
    fit = outlier_frame_indices(labels, "fitting", epsilon=10)
    assert 17 in fit


def _write_analysis_h5(folder: Path, vname: str, scorer: str, labels: dict,
                       bodyparts: list) -> Path:
    from deepgraphpose_tpu.infer.export import write_pose_h5

    path = folder / f"{vname}{scorer}.h5"
    write_pose_h5(path, scorer, bodyparts, labels)
    return path


def test_filterpredictions_and_outlier_extraction(synthetic_project):
    from deepgraphpose_tpu.evaluation.filtering import filterpredictions
    from deepgraphpose_tpu.evaluation.outliers import extract_outlier_frames

    root, _, _ = synthetic_project
    root = Path(root)
    video = root / "videos_dgp" / "synthvid.avi"
    labels, _, _ = _synthetic_labels(T=30, nj=3)
    labels["x"][12] += 150.0  # jump outlier
    scorer = "DLC_resnet50_SynthJan1shuffle1_5"
    _write_analysis_h5(video.parent, video.stem, scorer, labels,
                       ["bp0", "bp1", "bp2"])

    out = filterpredictions(str(root / "config.yaml"), [video],
                            filtertype="median", windowlength=5,
                            scorer=scorer)
    assert len(out) == 1 and out[0].exists()
    from deepgraphpose_tpu.infer.export import read_pose_table

    fsc, fbps, flabels, _ = read_pose_table(out[0])
    assert fsc == scorer and fbps == ["bp0", "bp1", "bp2"]
    assert flabels["x"].shape == (30, 3)
    # the jump spike at frame 12 is removed by the median filter
    assert abs(flabels["x"][12, 0] - labels["x"][12, 0]) > 100

    picked = extract_outlier_frames(
        str(root / "config.yaml"), [video], outlieralgorithm="jump",
        epsilon=30, numframes2pick=4, scorer=scorer)
    idxs = picked[str(video)]
    assert len(idxs) >= 1
    pngs = list((root / "labeled-data" / "synthvid").glob("img*.png"))
    assert pngs
    mfile = root / "labeled-data" / "synthvid" / "machinelabels-iter0.h5"
    assert mfile.exists()
    from deepgraphpose_tpu.infer.export import read_pose_table

    _, _, mlabels, mindex = read_pose_table(mfile)
    assert mlabels["x"].shape[0] == len(idxs) == len(mindex)
    assert all(i.startswith("labeled-data/synthvid/img") for i in mindex)


def test_plot_trajectories(synthetic_project):
    from deepgraphpose_tpu.infer.plotting import plot_trajectories

    root, _, _ = synthetic_project
    root = Path(root)
    video = root / "videos_dgp" / "synthvid.avi"
    labels, _, _ = _synthetic_labels(T=30, nj=3)
    scorer = "DLC_resnet50_SynthJan1shuffle1_7"
    _write_analysis_h5(video.parent, video.stem, scorer, labels,
                       ["bp0", "bp1", "bp2"])
    out = plot_trajectories(str(root / "config.yaml"), [video],
                            scorer=scorer)
    assert len(out) == 1 and out[0].exists()


def test_cli_help_all_commands():
    from click.testing import CliRunner

    from deepgraphpose_tpu.cli import main

    runner = CliRunner()
    result = runner.invoke(main, ["--help"])
    assert result.exit_code == 0
    for cmd in ("create-project", "extract-frames", "create-training-dataset",
                "train", "evaluate", "analyze-videos", "filter-predictions",
                "extract-outlier-frames", "create-labeled-video",
                "plot-trajectories", "run-demo", "check-labels",
                "add-videos", "analyze-skeleton", "analyze-time-lapse-frames",
                "extract-maps", "create-project-3d", "calibrate-cameras",
                "triangulate"):
        assert cmd in result.output
        sub = runner.invoke(main, [cmd, "--help"])
        assert sub.exit_code == 0, f"{cmd} --help failed: {sub.output}"


def test_cli_create_and_scaffold(tmp_path):
    """create-project + extract-frames + create-training-dataset via CLI."""
    import cv2
    from click.testing import CliRunner

    from deepgraphpose_tpu.cli import main

    src = tmp_path / "vid.avi"
    wr = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"MJPG"), 20.0,
                         (48, 32))
    rng = np.random.default_rng(0)
    for _ in range(20):
        wr.write(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
    wr.release()

    runner = CliRunner()
    r = runner.invoke(main, ["create-project", "T", "x", str(src),
                             "-d", str(tmp_path)])
    assert r.exit_code == 0, r.output
    cfg = r.output.strip().splitlines()[-1]
    r = runner.invoke(main, ["extract-frames", cfg, "-a", "uniform"])
    assert r.exit_code == 0, r.output
    # label the extracted frames, then build the training set
    from deepgraphpose_tpu.core.config import ProjectConfig
    from deepgraphpose_tpu.data import project as project_io

    root = Path(cfg).parent
    proj = ProjectConfig.from_yaml(cfg)
    frames = sorted((root / "labeled-data" / "vid").glob("*.png"))
    nj = len(proj.bodyparts)
    coords = np.tile(np.arange(1, nj + 1)[None, :, None] * 3.0,
                     (len(frames), 1, 2))
    project_io.write_collected_data_csv(
        root / "labeled-data/vid" / f"CollectedData_{proj.scorer}.csv",
        project_io.Labels(
            scorer=proj.scorer, bodyparts=list(proj.bodyparts),
            image_paths=[f"labeled-data/vid/{p.name}" for p in frames],
            coords_xy=coords))
    r = runner.invoke(main, ["create-training-dataset", cfg])
    assert r.exit_code == 0, r.output
    assert list((root / "training-datasets").rglob("*.mat"))


def test_cli_no_int8_residual_conflict(tmp_path):
    """--no-int8 --residual-int8 is a contradiction: the help text says
    --no-int8 forces bf16, so the pair must be rejected, not silently run
    residual int8 (round-4 advisor finding)."""
    from click.testing import CliRunner

    from deepgraphpose_tpu.cli import main

    cfg = tmp_path / "config.yaml"
    cfg.write_text("Task: t\n")
    vid = tmp_path / "v.avi"
    vid.write_bytes(b"")
    runner = CliRunner()
    for cmd in (["analyze-videos", str(cfg), str(vid)],
                ["export-model", str(cfg), str(tmp_path / "e")]):
        res = runner.invoke(main, cmd + ["--no-int8", "--residual-int8"])
        assert res.exit_code == 2, res.output
        assert "conflict" in res.output
