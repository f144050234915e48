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
