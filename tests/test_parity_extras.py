"""Capability-surface extras: skeleton analysis, video utils,
analyze_time_lapse_frames, multi-snapshot evaluate_network."""

from pathlib import Path

import numpy as np
import pytest

from deepgraphpose_tpu.evaluation.skeleton import (analyzeskeleton,
                                                   bone_statistics)


def test_bone_statistics_geometry():
    labels = {
        "x": np.array([[0.0, 3.0], [0.0, 0.0]]),
        "y": np.array([[0.0, 4.0], [0.0, 2.0]]),
        "likelihoods": np.array([[0.9, 0.5], [0.8, 0.7]]),
    }
    bones = bone_statistics(labels, ["a", "b"], [["a", "b"]])
    st = bones["a_b"]
    np.testing.assert_allclose(st["length"], [5.0, 2.0])
    np.testing.assert_allclose(st["orientation_deg"],
                               [np.degrees(np.arctan2(4, 3)), 90.0])
    np.testing.assert_allclose(st["likelihood"], [0.5, 0.7])


def test_analyzeskeleton_flow(synthetic_project):
    from deepgraphpose_tpu.infer.export import write_pose_h5

    root, _, _ = synthetic_project
    root = Path(root)
    video = root / "videos_dgp" / "synthvid.avi"
    T, nj = 20, 3
    rng = np.random.default_rng(0)
    labels = {"x": rng.uniform(0, 50, (T, nj)),
              "y": rng.uniform(0, 50, (T, nj)),
              "likelihoods": np.full((T, nj), 0.9)}
    scorer = "DLC_resnet50_SynthJan1shuffle1_9"
    write_pose_h5(video.parent / f"{video.stem}{scorer}.h5", scorer,
                  ["bp0", "bp1", "bp2"], labels)
    out = analyzeskeleton(str(root / "config.yaml"), [video], scorer=scorer)
    assert len(out) == 1 and out[0].exists()
    assert out[0].with_suffix(".csv").exists()
    # project skeleton is [[bp0, bp1]]
    import h5py

    with h5py.File(out[0]) as f:
        assert "bp0_bp1" in f
        want = np.hypot(labels["x"][:, 1] - labels["x"][:, 0],
                        labels["y"][:, 1] - labels["y"][:, 0])
        np.testing.assert_allclose(f["bp0_bp1"]["length"][()], want)


def test_video_utils_roundtrip(tmp_path):
    import cv2

    from deepgraphpose_tpu.data.video import (VideoReader, crop_video,
                                              downsample_video,
                                              shorten_video)

    src = tmp_path / "v.avi"
    wr = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                         (64, 48))
    for i in range(30):
        wr.write(np.full((48, 64, 3), i * 8, np.uint8))
    wr.release()

    short = shorten_video(src, start_s=1.0, stop_s=2.0)
    r = VideoReader(short)
    assert 8 <= r.n_frames <= 12
    r.close()

    down = downsample_video(src, height=24)
    r = VideoReader(down)
    assert r.height == 24 and r.width == 32
    r.close()

    crop = crop_video(src, 8, 40, 4, 28)
    r = VideoReader(crop)
    assert (r.width, r.height) == (32, 24)
    r.close()


@pytest.fixture(scope="module")
def project_with_snapshot(synthetic_project):
    """Synthetic project + a random-init snapshot saved as step-2 final."""
    import jax

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.train.fit import resolve_project

    root, lab_idx, coords = synthetic_project
    _, cfg, train_dir = resolve_project(root, 1)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (64, 80))
    ckpt_lib.save_snapshot(train_dir, 2, "final--0", variables)
    return root, train_dir


def test_analyze_time_lapse_frames(project_with_snapshot):
    from deepgraphpose_tpu.infer.analyze import analyze_time_lapse_frames
    from deepgraphpose_tpu.infer.export import read_pose_table

    root, _ = project_with_snapshot
    frames_dir = Path(root) / "labeled-data" / "synthvid"
    scorer = analyze_time_lapse_frames(Path(root) / "config.yaml",
                                       frames_dir, frametype=".png")
    assert scorer.startswith("DLC_resnet50_SynthJan1shuffle1_")
    h5 = frames_dir / f"{frames_dir.name}{scorer}.h5"
    assert h5.exists()
    sc, bps, labels, _ = read_pose_table(h5)
    n_pngs = len(list(frames_dir.glob("*.png")))
    assert labels["x"].shape == (n_pngs, 3)
    assert np.isfinite(labels["x"]).all()


def test_evaluate_dgp_dlc_decode_mode(project_with_snapshot):
    from deepgraphpose_tpu.evaluation.metrics import evaluate_dgp

    root, train_dir = project_with_snapshot
    snap = Path(train_dir) / "snapshot-step2-final--0.ckpt"
    res = evaluate_dgp(Path(root) / "config.yaml", snap, decode="dlc")
    assert np.isfinite(res["train_error"])
    assert res["pred_xy"].shape == res["true_xy"].shape
    # DLC argmax decode lands on stride-grid + locref offsets: all finite
    assert np.isfinite(res["pred_xy"]).all()


def test_evaluate_dgp_scale_maps_back_to_label_space(project_with_snapshot):
    """evaluate_dgp(scale=) runs inference at reduced resolution but keeps
    RMSE in ORIGINAL pixels (the reference's analysis-time global_scale
    lever, ref: predict_videos.py:132-139): predictions must land inside
    the original image bounds, not the downscaled ones."""
    from deepgraphpose_tpu.evaluation.metrics import evaluate_dgp

    root, train_dir = project_with_snapshot
    snap = Path(train_dir) / "snapshot-step2-final--0.ckpt"
    res = evaluate_dgp(Path(root) / "config.yaml", snap, scale=0.5)
    assert np.isfinite(res["train_error"])
    assert np.isfinite(res["pred_xy"]).all()
    # synthetic frames are 64x80: at scale=0.5 the net sees 32x40; mapped
    # back, coords must span beyond the downscaled frame's pixel range
    # whenever the full-res eval does (both decode from the same snapshot)
    full = evaluate_dgp(Path(root) / "config.yaml", snap)
    assert res["pred_xy"].shape == full["pred_xy"].shape
    # scaled-run predictions live in label space [0, 80)x[0, 64) (plus up
    # to one upscaled stride cell of decode overshoot at the frame edge),
    # not in downscaled space [0, 40)x[0, 32)
    assert res["pred_xy"][..., 0].max() <= 80.0 + 16.0
    assert res["pred_xy"][..., 1].max() <= 64.0 + 16.0
    if full["pred_xy"][..., 0].max() > 40.0:
        assert res["pred_xy"][..., 0].max() > 40.0


def test_evaluate_network_combined_csv(project_with_snapshot):
    from deepgraphpose_tpu.evaluation.metrics import evaluate_network

    root, _ = project_with_snapshot
    results = evaluate_network(Path(root) / "config.yaml", shuffle=1,
                               snapshots="snapshot-step2-final--0")
    assert len(results) == 1
    assert np.isfinite(results[0]["train_error"])
    csv_path = (Path(root) / "evaluation-results" / "iteration-0" /
                "CombinedEvaluation-results.csv")
    assert csv_path.exists()
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0].startswith("snapshot,")
    assert lines[-1].startswith("snapshot-step2-final--0,1,")


def test_evaluate_network_plotting_writes_labeled_images(
        project_with_snapshot):
    """plotting=True parity: per-frame labeled evaluation images with
    Training-/Test- prefixes (ref: evaluate.py:34-39, 382-392)."""
    from deepgraphpose_tpu.evaluation.metrics import evaluate_network

    root, _ = project_with_snapshot
    results = evaluate_network(Path(root) / "config.yaml", shuffle=1,
                               snapshots="snapshot-step2-final--0",
                               plotting=True)
    folder = (Path(root) / "evaluation-results" / "iteration-0" /
              "LabeledImages_snapshot-step2-final--0")
    assert folder.is_dir()
    pngs = sorted(folder.glob("*.png"))
    assert len(pngs) == len(results[0]["image_paths"])
    # file prefixes encode the split
    prefixes = {p.name.split("-")[0] for p in pngs}
    assert prefixes <= {"Training", "Test"}
    n_train = int(np.sum(results[0]["is_train"]))
    assert sum(p.name.startswith("Training-") for p in pngs) == n_train
    # images are non-trivial files
    assert all(p.stat().st_size > 1000 for p in pngs)


def test_analyze_videos_num_outputs(project_with_snapshot, tmp_path):
    import h5py

    from deepgraphpose_tpu.infer.analyze import analyze_videos

    root, _ = project_with_snapshot
    video = Path(root) / "videos" / "synthvid.avi"
    scorer = analyze_videos(Path(root) / "config.yaml", [video],
                            destfolder=tmp_path, num_outputs=2,
                            max_frames=8, batchsize=4)
    h5 = tmp_path / f"{video.stem}{scorer}.h5"
    assert h5.exists()
    with h5py.File(h5) as f:
        g = f["df_with_missing"]
        assert g.attrs["num_outputs"] == 2
        assert g["data"].shape == (8, 3 * 2 * 3)  # nj=3, k=2, xyl


def test_extract_save_all_maps(project_with_snapshot, tmp_path):
    from deepgraphpose_tpu.evaluation.maps import extract_save_all_maps

    root, _ = project_with_snapshot
    out = extract_save_all_maps(Path(root) / "config.yaml", shuffle=1,
                                indices=[0, 1], dest_folder=tmp_path)
    assert len(out) == 2
    assert all(p.exists() and p.stat().st_size > 0 for p in out)


def test_display_dataset_targets(project_with_snapshot, tmp_path):
    """Raw dataset target-scoremap grids (ref: vis_dataset.py) — no
    network, straight from the trainer's rasterizer."""
    from deepgraphpose_tpu.evaluation.maps import display_dataset

    root, _ = project_with_snapshot
    out = display_dataset(Path(root) / "config.yaml", shuffle=1,
                          indices=[0, 1], dest_folder=tmp_path)
    assert len(out) == 2
    assert all(p.name.endswith("_targets.png") for p in out)
    assert all(p.stat().st_size > 1000 for p in out)


def test_analyze_videos_scale_lever(project_with_snapshot, tmp_path):
    """scale= resizes frames before inference but keeps coordinates in
    original-video pixels (the reference's analyze-time resize lever;
    PERF.md 'Downscaled inference')."""
    from deepgraphpose_tpu.infer.analyze import analyze_videos
    from deepgraphpose_tpu.infer.export import load_pose_from_dlc
    from deepgraphpose_tpu.infer.predict import estimate_pose

    root, train_dir = project_with_snapshot
    video = Path(root) / "videos" / "synthvid.avi"
    scorer = analyze_videos(Path(root) / "config.yaml", [video],
                            destfolder=tmp_path, max_frames=6, batchsize=3,
                            scale=0.75)
    back = load_pose_from_dlc(str(tmp_path / f"{video.stem}{scorer}.csv"))
    assert back["x"].shape == (6, 3)
    assert np.isfinite(back["x"]).all()

    # plumbing parity: scale= is exactly estimate_pose(new_size=round(s*hw))
    direct = estimate_pose(
        proj_cfg_file=Path(root) / "config.yaml",
        dgp_model_file=Path(train_dir) / "snapshot-step2-final--0.ckpt",
        video_file=video, output_dir=tmp_path, save_pose=False,
        new_size=(48, 60), batch_size=3, max_frames=6)
    np.testing.assert_allclose(back["x"], direct["x"], atol=0.02)
    np.testing.assert_allclose(back["y"], direct["y"], atol=0.02)
    # coordinates were rescaled back to original pixels
    assert back["x"].max() <= 80 and back["y"].max() <= 64

    # an explicit quantize=False/--no-int8 overrides the preset's residual
    # int8 choice: preset+quantize=False == plain bf16 scale=0.75
    scorer = analyze_videos(Path(root) / "config.yaml", [video],
                            destfolder=tmp_path / "noq", max_frames=6,
                            batchsize=3, preset="fast", quantize=False)
    noq = load_pose_from_dlc(
        str(tmp_path / "noq" / f"synthvid{scorer}.csv"))
    np.testing.assert_allclose(noq["x"], back["x"], atol=1e-6)


def test_analyze_videos_fast_preset(project_with_snapshot, tmp_path):
    """preset='fast' = scale 0.75 + residual-int8, the measured
    above-target full-frame operating point (PERF.md)."""
    import pytest

    from deepgraphpose_tpu.infer.analyze import analyze_videos
    from deepgraphpose_tpu.infer.export import load_pose_from_dlc

    root, _ = project_with_snapshot
    video = Path(root) / "videos" / "synthvid.avi"
    with pytest.raises(ValueError, match="preset"):
        analyze_videos(Path(root) / "config.yaml", [video],
                       destfolder=tmp_path, preset="turbo")
    scorer = analyze_videos(Path(root) / "config.yaml", [video],
                            destfolder=tmp_path, max_frames=4, batchsize=2,
                            preset="fast")
    back = load_pose_from_dlc(str(tmp_path / f"{video.stem}{scorer}.csv"))
    assert back["x"].shape == (4, 3)
    assert np.isfinite(back["x"]).all()
    assert back["x"].max() <= 80 and back["y"].max() <= 64


def test_analyze_videos_dynamic(project_with_snapshot, tmp_path):
    """The reference's dynamic=(state, threshold, margin) switch routes to
    the batched fixed-size tracker (ref: predict_videos.py:37,90-101)."""
    from deepgraphpose_tpu.infer.analyze import analyze_videos
    from deepgraphpose_tpu.infer.export import load_pose_from_dlc

    root, _ = project_with_snapshot
    video = Path(root) / "videos" / "synthvid.avi"
    scorer = analyze_videos(Path(root) / "config.yaml", [video],
                            destfolder=tmp_path, max_frames=12, batchsize=4,
                            dynamic=(True, 0.5, 10))
    csv = tmp_path / f"{video.stem}{scorer}.csv"
    assert csv.exists()
    back = load_pose_from_dlc(str(csv))
    assert back["x"].shape == (12, 3)
    assert np.isfinite(back["x"]).all()


def test_create_labeled_video_expands_directory(project_with_snapshot,
                                                monkeypatch, tmp_path):
    """A videos DIRECTORY entry expands to its video files before plot_dgp
    (ref: predict_videos.py GetVideoList semantics; round-4 advisor
    finding — the loop previously handed the directory itself to a
    video-file API)."""
    from deepgraphpose_tpu import compat
    from deepgraphpose_tpu.infer import video_writer

    root, _ = project_with_snapshot
    vdir = Path(root) / "videos"
    expect = sorted(str(p) for p in vdir.iterdir()
                    if p.suffix.lower() in (".avi", ".mp4", ".mov"))
    assert expect, "fixture should ship at least one video"

    calls = []
    monkeypatch.setattr(
        video_writer, "plot_dgp",
        lambda video, out, **kw: calls.append(str(video)) or str(out))
    outs = compat.create_labeled_video(Path(root) / "config.yaml", [vdir])
    assert sorted(calls) == expect
    assert len(outs) == len(expect)


def test_evaluate_comparisonbodyparts_and_rescale(project_with_snapshot):
    """comparisonbodyparts restricts the summary errors to the subset
    (ref: evaluate.py:265,367); rescale=True evaluates at pose_cfg
    global_scale, errors staying in original label pixels (intentional
    difference, docs/MIGRATION.md)."""
    import pytest
    import yaml

    from deepgraphpose_tpu.compat import return_evaluate_network_data
    from deepgraphpose_tpu.evaluation.metrics import (evaluate_dgp,
                                                      evaluate_network)

    root, train_dir = project_with_snapshot
    cfg_file = Path(root) / "config.yaml"
    snap = Path(train_dir) / "snapshot-step2-final--0.ckpt"

    full = evaluate_dgp(cfg_file, snap)
    sub = evaluate_dgp(cfg_file, snap, comparisonbodyparts=["bp1"])
    assert sub["bodypart_columns"] == [1]
    # the subset summary is exactly the bp1 column of the full table
    expect = float(np.nanmean(full["rmse"][:, 1][full["is_train"]]))
    assert sub["train_error"] == pytest.approx(expect, rel=1e-6)
    assert sub["rmse"].shape == full["rmse"].shape  # tables stay full
    with pytest.raises(ValueError, match="unknown bodyparts"):
        evaluate_dgp(cfg_file, snap, comparisonbodyparts=["nosuch"])

    # rescale=True runs at pose_cfg global_scale; set 0.75 and restore
    pc = Path(train_dir) / "pose_cfg.yaml"
    orig = pc.read_text()
    try:
        raw = yaml.safe_load(orig)
        raw["global_scale"] = 0.75
        pc.write_text(yaml.safe_dump(raw, sort_keys=False))
        res = evaluate_network(cfg_file, snapshots="snapshot-step2-final--0",
                               comparisonbodyparts=["bp0", "bp2"],
                               rescale=True)[0]
        assert res["bodypart_columns"] == [0, 2]
        assert np.isfinite(res["train_error"])
        # errors are in original pixels: preds stay in original bounds
        h, w = 64, 80
        ok = np.isfinite(res["pred_xy"])
        assert res["pred_xy"][..., 0][ok[..., 0]].max() <= w
        assert res["pred_xy"][..., 1][ok[..., 1]].max() <= h

        rows = return_evaluate_network_data(
            cfg_file, comparisonbodyparts=["bp1"], rescale=True,
            Snapindex=0, show_errors=False)
        assert rows and np.isfinite(rows[0][3])
    finally:
        pc.write_text(orig)
