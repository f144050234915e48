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
