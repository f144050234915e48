"""Top-level API surface: the reference's import styles work here."""

import pytest

import deepgraphpose_tpu as dgp


def test_lazy_api_resolves():
    for name in ("fit_dlc", "fit_dgp_labeledonly", "fit_dgp",
                 "estimate_pose", "plot_dgp", "evaluate_dgp",
                 "create_new_project", "add_new_videos", "extract_frames",
                 "create_training_dataset", "merge_datasets", "mergeandsplit",
                 "analyze_videos", "analyze_time_lapse_frames",
                 "evaluate_network", "filterpredictions",
                 "extract_outlier_frames", "analyzeskeleton",
                 "plot_trajectories", "check_labels", "LabelServer",
                 "extract_save_all_maps", "create_new_project_3d",
                 "compare_video_lists_and_data_folders",
                 "drop_duplicates_in_annotation_files",
                 "drop_annotations_for_deleted_images",
                 "drop_unannotated_images",
                 "calibrate_cameras", "triangulate"):
        assert callable(getattr(dgp, name)), name


def test_dir_lists_lazy_api():
    assert "analyze_videos" in dir(dgp)
    # resolution caches into module globals
    _ = dgp.analyze_videos
    assert "analyze_videos" in vars(dgp)


def test_unknown_attribute_raises():
    with pytest.raises(AttributeError):
        dgp.nonexistent_thing


def test_configs_exported_eagerly():
    assert dgp.PoseConfig(num_joints=2).num_joints == 2
    assert dgp.ProjectConfig(Task="t").Task == "t"


REFERENCE_EXPORTS = [
    # ref: DeepLabCut __init__.py:30-58 — the full import-deeplabcut surface
    "label_frames", "dropannotationfileentriesduetodeletedimages",
    "comparevideolistsanddatafolders", "dropimagesduetolackofannotation",
    "adddatasetstovideolistandviceversa", "dropduplicatesinannotatinfiles",
    "refine_labels", "extract_outlier_frames", "merge_datasets",
    "filterpredictions", "analyzeskeleton", "train_network",
    "return_train_network_path", "evaluate_network",
    "return_evaluate_network_data", "analyze_videos",
    "analyze_time_lapse_frames", "calibrate_cameras", "check_undistortion",
    "triangulate", "create_labeled_video_3d", "create_new_project",
    "create_new_project_3d", "add_new_videos", "load_demo_data",
    "create_pretrained_human_project", "extract_frames", "check_labels",
    "create_training_dataset", "mergeandsplit",
    "create_training_model_comparison", "create_labeled_video",
    "plot_trajectories", "convertcsv2h5",
    "convertannotationdata_fromwindows2unixstyle",
    "analyze_videos_converth5_to_csv", "ShortenVideo", "DownSampleVideo",
]


def test_reference_top_level_exports_resolve():
    import deepgraphpose_tpu as dgp

    missing = [n for n in REFERENCE_EXPORTS if n not in dir(dgp)]
    assert not missing, missing
    for n in REFERENCE_EXPORTS:
        assert callable(getattr(dgp, n)), n


def test_compat_project_helpers(tmp_path):
    import shutil

    import yaml

    from conftest import make_synthetic_project

    import deepgraphpose_tpu as dgp

    root, _, _ = make_synthetic_project(tmp_path / "proj")
    cfg_file = str(tmp_path / "proj" / "config.yaml")

    # load_demo_data re-roots a moved project
    moved = tmp_path / "moved"
    shutil.copytree(root, moved)
    dgp.load_demo_data(moved / "config.yaml", createtrainingset=False)
    cfg = yaml.safe_load(open(moved / "config.yaml"))
    assert cfg["project_path"] == str(moved)
    assert all(str(moved) in v for v in cfg["video_sets"])

    # adddatasetstovideolistandviceversa: add an orphan labeled folder +
    # an orphan video entry, then reconcile
    (moved / "labeled-data" / "orphanvid").mkdir()
    cfg["video_sets"]["videos/ghost.avi"] = {"crop": "0, 10, 0, 10"}
    yaml.safe_dump(cfg, open(moved / "config.yaml", "w"), sort_keys=False)
    added, removed = dgp.adddatasetstovideolistandviceversa(
        moved / "config.yaml", width=80, height=64)
    assert (added, removed) == (1, 1)
    cfg2 = yaml.safe_load(open(moved / "config.yaml"))
    assert any("orphanvid" in v for v in cfg2["video_sets"])
    assert not any("ghost" in v for v in cfg2["video_sets"])

    # create_training_model_comparison builds per-net shuffles
    shuffles = dgp.create_training_model_comparison(
        cfg_file, num_shuffles=1,
        net_types=["resnet_50", "mobilenet_v2_0.35"])
    assert shuffles == [1, 2]

    # return_train_network_path points at real files
    tr, te, td = dgp.return_train_network_path(cfg_file, shuffle=1)
    assert tr.exists() and td.is_dir()


def test_pretrained_weights_shim(tmp_path, monkeypatch):
    """Local Check4weights contract (ref: auxfun_models.py:15-56)."""
    from deepgraphpose_tpu.models import pretrained

    # unknown net type -> num_shuffles=-1, as the reference signals it
    _, n = pretrained.check_for_weights("alexnet", num_shuffles=3)
    assert n == -1

    # known type, absent locally: canonical path returned, shuffles kept
    monkeypatch.delenv("DGP_PRETRAINED_DIR", raising=False)
    path, n = pretrained.check_for_weights("resnet_50", num_shuffles=2)
    assert n == 2 and path.endswith("resnet_v1_50.ckpt")

    # env-root resolution finds a checkpoint prefix by its .index file
    root = tmp_path / "weights"
    root.mkdir()
    (root / "resnet_v1_101.ckpt.index").write_bytes(b"")
    monkeypatch.setenv("DGP_PRETRAINED_DIR", str(root))
    assert pretrained.find_pretrained("resnet_101") == (
        root / "resnet_v1_101.ckpt")
    got, n = pretrained.check_for_weights("resnet_101")
    assert got == str(root / "resnet_v1_101.ckpt") and n == 1

    # the download surface is a documented no-egress error
    with pytest.raises(RuntimeError, match="egress"):
        pretrained.download_weights("resnet_50", root / "x.ckpt")


def test_create_pretrained_human_project(tmp_path):
    """Local-checkpoint human project (ref: human_dataset.py:46-143)."""
    import cv2
    import numpy as np
    import yaml

    import deepgraphpose_tpu as dgp
    from deepgraphpose_tpu.compat import MPII_BODYPARTS

    vid = tmp_path / "person.avi"
    wr = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                         (64, 48))
    for _ in range(4):
        wr.write(np.zeros((48, 64, 3), np.uint8))
    wr.release()

    snap = tmp_path / "mpii-local.ckpt"  # our-format branch: copied verbatim
    snap.write_bytes(b"msgpack-snapshot-bytes")

    cfg_path, pose_cfg_path = dgp.create_pretrained_human_project(
        "human", "tester", [str(vid)], working_directory=str(tmp_path),
        copy_videos=True, analyzevideo=False, createlabeledvideo=False,
        ckpt_path=str(snap))

    cfg = yaml.safe_load(open(cfg_path))
    assert cfg["bodyparts"] == MPII_BODYPARTS
    assert cfg["default_net_type"] == "resnet_101"
    from pathlib import Path
    train_dir = Path(pose_cfg_path).parent
    pc = yaml.safe_load(open(pose_cfg_path))
    assert pc["num_joints"] == 14 and pc["net_type"] == "resnet_101"
    assert (train_dir.parent / "test" / "pose_cfg.yaml").exists()
    # the local checkpoint materialized under the snapshot naming contract
    assert (train_dir / "snapshot-step0-final--0.ckpt").read_bytes() == \
        b"msgpack-snapshot-bytes"
