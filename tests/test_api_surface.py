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
                 "plot_trajectories", "check_labels",
                 "extract_save_all_maps", "create_new_project_3d",
                 "calibrate_cameras", "triangulate"):
        assert callable(getattr(dgp, name)), name


def test_unknown_attribute_raises():
    with pytest.raises(AttributeError):
        dgp.nonexistent_thing


def test_configs_exported_eagerly():
    assert dgp.PoseConfig(num_joints=2).num_joints == 2
    assert dgp.ProjectConfig(Task="t").Task == "t"
